"""Stage manifests: checkpoint/restart bookkeeping + per-partition lineage.

Restart logic is keyed on the manifest (atomic rename of a JSON file written
only after the stage's parquet is fully committed), never on directory
existence — Spark's own ``_SUCCESS`` marker guards the parquet, the manifest
additionally pins the parameter hash so a params change invalidates the
checkpoint (SURVEY.md §7.3 "checkpoint atomicity").

The reference's analog of this metrics trail is the per-task
``evaluation_time`` JSON field (MTEB.py:243) and stage timers
(AbsTaskRetrieval.py:646-649); we extend it to per-partition lineage
(docs / postings / bytes per doc_block) per the north rule.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


def params_hash(params: dict[str, Any]) -> str:
    return hashlib.sha256(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


@dataclass
class StageManifest:
    stage: str
    phash: str
    status: str = "incomplete"
    rows: int = 0
    wall_ms: int = 0
    metrics: dict[str, Any] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "stage": self.stage,
            "phash": self.phash,
            "status": self.status,
            "rows": self.rows,
            "wall_ms": self.wall_ms,
            "metrics": self.metrics,
            "lineage": self.lineage,
        }


class ManifestStore:
    """Atomic JSON manifests under ``<index_dir>/_manifest/``."""

    def __init__(self, index_dir: str):
        # no mkdir here: opening a store for READING (load_index) must not
        # leave directories behind on a bad path
        self.dir = os.path.join(index_dir, "_manifest")

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def load(self, stage: str) -> dict[str, Any] | None:
        p = self._path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str, phash: str) -> bool:
        m = self.load(stage)
        return bool(m and m.get("status") == "complete" and m.get("phash") == phash)

    def write(self, manifest: StageManifest) -> None:
        os.makedirs(self.dir, exist_ok=True)
        tmp = self._path(manifest.stage) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(manifest.to_dict(), f, indent=1, sort_keys=True)
        os.replace(tmp, self._path(manifest.stage))

    def write_globals(self, globals_dict: dict[str, Any]) -> None:
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"globals.json.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(globals_dict, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.dir, "globals.json"))

    def load_globals(self) -> dict[str, Any]:
        p = os.path.join(self.dir, "globals.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"no index at {os.path.dirname(self.dir)!r}: missing {p}; "
                "build one first (build_index / cli build)"
            )
        with open(p) as f:
            return json.load(f)


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.ms = int((time.monotonic() - self.t0) * 1000)
        return False
