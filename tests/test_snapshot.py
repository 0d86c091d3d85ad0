"""Index snapshot/restore: content-addressed copy, corruption detection,
and query identity across restore."""

from __future__ import annotations

import os

import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.index import snapshot
from instructor_embedding_spark.query.wand import wand_topk


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("snapidx"))
    docs = datagen.corpus(spark, 180, partitions=3)
    h = build_index(
        spark, docs, idx,
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="snap", store_positions=True),
        text_col="content",
    )
    return h


def test_snapshot_restore_query_identity(spark, built, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap")) + "/s1"
    dest = str(tmp_path_factory.mktemp("restored")) + "/idx"
    inv = snapshot.snapshot_index(built.index_dir, snap)
    assert inv["n_files"] > 0 and inv["total_bytes"] > 0
    restored = snapshot.restore_index(spark, snap, dest)
    # handle stats survive the round trip
    assert restored.n_docs == built.n_docs
    assert restored.avgdl == built.avgdl
    assert restored.params.doc_block_span == built.params.doc_block_span
    # query results are identical through the restored index
    qs = datagen.queries_df(spark)
    assert _rows(wand_topk(spark, restored, qs, k=10)) == \
        _rows(wand_topk(spark, built, qs, k=10))


def test_verify_catches_corruption_and_missing(built, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap2")) + "/s1"
    inv = snapshot.snapshot_index(built.index_dir, snap)
    snapshot.verify_snapshot(snap)  # pristine passes
    # flip one byte in the largest file
    rel = max(inv["files"], key=lambda r: inv["files"][r]["bytes"])
    full = os.path.join(snap, rel)
    with open(full, "r+b") as f:
        f.seek(inv["files"][rel]["bytes"] // 2)
        b = f.read(1)
        f.seek(-1, os.SEEK_CUR)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        snapshot.verify_snapshot(snap)
    # repair, then delete a file
    with open(full, "r+b") as f:
        f.seek(inv["files"][rel]["bytes"] // 2)
        f.write(b)
    snapshot.verify_snapshot(snap)
    os.remove(full)
    with pytest.raises(ValueError, match="missing file"):
        snapshot.verify_snapshot(snap)


def test_snapshot_and_restore_refuse_clobber(spark, built,
                                             tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap3")) + "/s1"
    snapshot.snapshot_index(built.index_dir, snap)
    with pytest.raises(ValueError, match="already exists"):
        snapshot.snapshot_index(built.index_dir, snap)
    dest = str(tmp_path_factory.mktemp("occupied"))
    os.makedirs(os.path.join(dest, "junk"), exist_ok=True)
    with pytest.raises(ValueError, match="not empty"):
        snapshot.restore_index(spark, snap, dest)
