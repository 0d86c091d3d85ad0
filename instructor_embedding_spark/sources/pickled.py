"""Pickle artifact scan (S5).

Reference: prompt_retrieval loads pickled artifacts (score dicts,
selected-prompt lists) driver-side, e.g. main_geo.py:539 ``pickle.load``.
The Spark surface: ``binaryFiles`` reads each ``.pkl`` whole (pickle is
not splittable), unpickles per file in executors, and yields rows — so a
directory of artifact files scans in parallel, one task per file.

SECURITY: pickle executes arbitrary code on load — only ever point this at
trusted, self-produced artifacts (the same caveat the reference inherits).

This is the one deliberate RDD use in the repo: whole-file binary input
has no DataFrame reader, and the per-file payload is opaque until
unpickled.  Rows convert to a DataFrame immediately after.
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame, SparkSession


def read_pickle_rows(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Scan ``path`` (a file or directory of pickle files, each holding a
    list of row tuples/dicts) into a DataFrame with ``schema``."""

    def unpickle(kv):
        rows = pickle.loads(kv[1])
        if not isinstance(rows, list):
            rows = [rows]
        return rows

    rdd = spark.sparkContext.binaryFiles(path).flatMap(unpickle)
    return spark.createDataFrame(rdd, schema)


def write_pickle_rows(rows: list, path: str) -> None:
    """Driver-side artifact writer (test/fixture helper, mirrors the
    reference's pickle.dump usage)."""
    with open(path, "wb") as f:
        pickle.dump(rows, f)
