"""Ship the package to Spark executors (the ``--py-files`` discipline).

Python workers unpickle UDF closures by importing this package; when the
driver process wasn't launched from the repo root (or on a real cluster),
the package must travel with the job.  ``spark-submit --py-files ies.zip``
does that for batch jobs; :func:`ensure_shipped` does the same for an
already-running session via ``sparkContext.addPyFile`` (idempotent).
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def package_zip(out_dir: str) -> str:
    """Zip this package (idempotent; rewritten when sources are newer)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "instructor_embedding_spark.zip")

    newest = 0.0
    srcs: list[tuple[str, str]] = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                newest = max(newest, os.path.getmtime(p))
                arc = os.path.join(
                    "instructor_embedding_spark",
                    os.path.relpath(p, pkg_dir),
                )
                srcs.append((p, arc))
    if os.path.exists(zip_path) and os.path.getmtime(zip_path) >= newest:
        return zip_path
    tmp = zip_path + f".tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w") as zf:
        for p, arc in srcs:
            zf.write(p, arc)
    os.replace(tmp, zip_path)
    return zip_path


def ensure_shipped(spark: SparkSession, work_dir: str = "/root/repo/.runtime") -> None:
    """Make the package importable on executors for this session."""
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    spark.sparkContext.addPyFile(package_zip(work_dir))
    _SHIPPED_SESSIONS.add(key)
