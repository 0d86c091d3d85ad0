"""Index snapshot / restore — the ES snapshot-repository analog.

A snapshot is a content-addressed copy of a built index: every stage
directory plus its manifests, with a ``_snapshot.json`` inventory
recording each file's byte size and sha256.  Restore verifies every
file against the inventory BEFORE the index is opened, so silent
corruption in the repository (truncated parquet, bit rot, partial
copy) fails loudly instead of surfacing as wrong query results.

Reference scope note: the reference has no index persistence at all
(embeddings are recomputed per run, AbsTaskRetrieval.py); snapshots are
fulltext-engine surface like compaction and tombstones.  At cluster
scale the copy runs through the object store (the paths are just URIs
to Spark); the inventory hash pass is embarrassingly parallel and the
restore verify reads each file once — this module keeps the logic
driver-side because snapshot/restore is an OPS operation on index
artifacts, not a data-plane query (the artifacts are the reduced
output of the build, orders of magnitude smaller than the corpus).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

#: stage directories that make up a restorable index (positions and
#: tombstones are optional — present only if the build stored them)
_STAGES = ("segments", "doc_lens", "term_stats", "doc_stats",
           "positions", "tombstones")
_MANIFEST_DIR = "_manifest"
_SNAP_FILE = "_snapshot.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for base, _, files in os.walk(root):
        for f in files:
            out.append(os.path.relpath(os.path.join(base, f), root))
    return sorted(out)


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Copy the index's stage dirs + manifests into ``snap_dir`` and
    write the content inventory.  Returns the inventory dict."""
    if os.path.exists(os.path.join(snap_dir, _SNAP_FILE)):
        raise ValueError(f"snapshot already exists at {snap_dir}")
    os.makedirs(snap_dir, exist_ok=True)
    copied: dict[str, dict] = {}
    for stage in _STAGES + (_MANIFEST_DIR,):
        src = os.path.join(index_dir, stage)
        if not os.path.exists(src):
            continue
        dst = os.path.join(snap_dir, stage)
        shutil.copytree(src, dst)
        for rel in _walk_files(dst):
            full = os.path.join(dst, rel)
            copied[f"{stage}/{rel}"] = {
                "bytes": os.path.getsize(full),
                "sha256": _sha256(full),
            }
    inventory = {
        "source_index": os.path.abspath(index_dir),
        "n_files": len(copied),
        "total_bytes": sum(v["bytes"] for v in copied.values()),
        "files": copied,
    }
    tmp = os.path.join(snap_dir, f"{_SNAP_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump(inventory, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(snap_dir, _SNAP_FILE))
    return inventory


def verify_snapshot(snap_dir: str) -> dict:
    """Re-hash every file against the inventory; raises ValueError on
    the first mismatch (missing, truncated, or corrupted file).
    Returns the inventory on success."""
    with open(os.path.join(snap_dir, _SNAP_FILE)) as f:
        inventory = json.load(f)
    for rel, meta in inventory["files"].items():
        full = os.path.join(snap_dir, rel)
        if not os.path.exists(full):
            raise ValueError(f"snapshot missing file: {rel}")
        size = os.path.getsize(full)
        if size != meta["bytes"]:
            raise ValueError(
                f"snapshot size mismatch for {rel}: "
                f"{size} != {meta['bytes']}"
            )
        digest = _sha256(full)
        if digest != meta["sha256"]:
            raise ValueError(f"snapshot corrupted: {rel} sha256 mismatch")
    return inventory


def restore_index(spark, snap_dir: str, dest_dir: str):
    """Verify the snapshot, copy it into ``dest_dir``, and open the
    restored index.  Returns an IndexHandle equivalent to the source
    (same stats, same segments — query results are identical)."""
    from instructor_embedding_spark.index.build import load_index

    verify_snapshot(snap_dir)
    if os.path.exists(dest_dir) and os.listdir(dest_dir):
        raise ValueError(f"restore target not empty: {dest_dir}")
    os.makedirs(dest_dir, exist_ok=True)
    for stage in _STAGES + (_MANIFEST_DIR,):
        src = os.path.join(snap_dir, stage)
        if os.path.exists(src):
            shutil.copytree(src, os.path.join(dest_dir, stage),
                            dirs_exist_ok=True)
    return load_index(spark, dest_dir)
