"""Deterministic-HLL cardinality agg: cross-engine parity + accuracy.

The gate exercises the estimator through text_lang_profile; these tests
pin the module contract directly: Spark and DuckDB produce bit-identical
estimates on random data (both branches), the estimate tracks the true
cardinality within the theoretical error envelope, and the register sum
stays inside exact-int64 territory by construction.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from instructor_embedding_spark.analytics import cardinality as C


def _run_both(spark, rows):
    df = spark.createDataFrame(rows, "g string, v string")
    srows = sorted(
        tuple(r) for r in C.hll_estimate(df, "v", ["g"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    orows = sorted(
        tuple(r)
        for r in con.sql(
            C.hll_estimate_sql("SELECT g, v FROM t", "v", ["g"])
        ).fetchall()
    )
    return srows, orows


def test_parity_and_accuracy_random(spark):
    rng = random.Random(42)
    # three groups spanning linear-counting and raw regimes
    truth = {"lin": 40, "mid": 1500, "big": 8000}
    rows = []
    for g, n in truth.items():
        vals = [f"{g}:{rng.randrange(10**9)}:{i}" for i in range(n)]
        rows += [(g, v) for v in vals]
        # duplicates must not move the estimate
        rows += [(g, v) for v in vals[: n // 3]]
    srows, orows = _run_both(spark, rows)
    assert srows == orows, "Spark and DuckDB HLL estimates diverge"
    est = {g: e for g, e in srows}
    for g, n in truth.items():
        # 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma
        assert abs(est[g] - n) / n < 0.26, (g, est[g], n)


def test_rho_bounds(spark):
    df = spark.createDataFrame(
        [("g", str(i)) for i in range(5000)], "g string, v string"
    )
    bucket, rho = C.hll_rho_cols(df.v)
    from pyspark.sql import functions as F

    row = df.select(
        F.min(rho).alias("lo"), F.max(rho).alias("hi"),
        F.min(bucket).alias("blo"), F.max(bucket).alias("bhi"),
    ).collect()[0]
    assert 1 <= row.lo and row.hi <= C.RHO_MAX
    assert 0 <= row.blo and row.bhi <= C.HLL_M - 1
    # max register sum is exactly representable: m * 2^RHO_MAX << 2^63
    assert C.HLL_M * (1 << C.RHO_MAX) < 2**62


@pytest.mark.parametrize("n", [0, 1, 2])
def test_tiny_groups(spark, n):
    rows = [("g", f"v{i}") for i in range(n)] or [("other", "x")]
    srows, orows = _run_both(spark, rows)
    assert srows == orows
    if n:
        est = dict(srows)["g"]
        assert abs(est - n) <= 1.0  # linear counting is near-exact here
