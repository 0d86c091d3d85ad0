"""Deterministic HyperLogLog cardinality aggregation (ES `cardinality` agg).

Elasticsearch's `cardinality` aggregation answers "how many distinct values
of this field match the query" with a HyperLogLog++ sketch so the answer
costs O(m) memory per group instead of O(n_distinct) — the only viable
shape for distinct counts over 10^12 postings.  Spark ships
`approx_count_distinct` (also HLL++), but its register hashing is engine
private, so its estimate can never be oracle-compared against another
engine.  This module implements classic HLL (Flajolet et al. 2007) from
scratch with every step either exact-integer or a single IEEE-754 double
op, so Spark and DuckDB produce BIT-IDENTICAL estimates:

1. hash: h = md5(value); bucket = first 32 bits mod m; w = next 60 bits
   (15 hex chars — fits signed int64 exactly, same trick as
   dedup.py minhash).
2. rho(w) = leading zeros of w in a 60-bit field + 1 = 61 - length(bin(w)),
   capped at RHO_MAX — pure integer string ops (`bin` exists in both
   engines and both render the minimal binary string).
3. register r_j = max(rho) per bucket: a map-side-combinable groupBy.max —
   the shuffle carries at most m rows per group regardless of input size.
4. estimate: sum(2^-r_j) is accumulated as the EXACT integer
   sum(2^(RHO_MAX - r_j)) (max m * 2^RHO_MAX = 2^48 at m=256 — no
   overflow, no float-order dependence), then one double division by the
   precomputed literal alpha*m^2*2^RHO_MAX.
5. small-range (linear counting) correction when E <= 2.5m and empty
   registers exist: m * ln(m / zeros) — the single transcendental op,
   made gate-safe by the shared half-away r6 rounding.

Reference analog: the evaluation pipeline's distinct-count bookkeeping
(e.g. unique corpus ids per task, evaluation/MTEB/mteb AbsTaskRetrieval.py
top-k set sizes) — re-expressed as the sketch an engine would actually run
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.rounding import r6_col, r6_sql

#: Register-count exponent: m = 2**HLL_P registers.  m=256 keeps the
#: relative error ~1.04/sqrt(m) = 6.5% and the linear-counting threshold
#: (2.5m = 640) low enough that the sf0.01 fixture exercises the raw
#: branch while the per-lang token-vocab kind exercises linear counting.
HLL_P = 8
HLL_M = 1 << HLL_P
#: rho cap: registers live in [1, RHO_MAX]; 2^(RHO_MAX - r) summed over m
#: registers stays <= m * 2^RHO_MAX = 2^48 << 2^63, so the register sum is
#: an EXACT int64 (order-free, partition-count-free).  rho > 40 needs
#: ~2^40 distinct values per bucket to even occur.
RHO_MAX = 40
_SCALE = 1 << RHO_MAX


def _alpha(m: int) -> float:
    # Flajolet et al. 2007, fig. 3 constants.
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _amm_scale(m: int) -> float:
    # alpha * m^2 * 2^RHO_MAX, folded into ONE double literal so the
    # estimate is a single division in both engines (identical rounding).
    return _alpha(m) * m * m * float(_SCALE)


def hll_rho_cols(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) columns for one value — all JVM-side expressions."""
    h = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % HLL_M
    w = F.conv(F.substring(h, 9, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(RHO_MAX)).otherwise(
        F.least(F.lit(61) - F.length(F.bin(w)), F.lit(RHO_MAX))
    )
    return bucket, rho


def hll_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group deterministic HLL distinct-value estimate.

    Returns ``group_cols + [est_distinct]`` with ``est_distinct`` rounded
    by the shared r6 rule.  Two shuffles, both on bounded keysets:
    (group, bucket) then (group); the second stage moves <= m rows per
    group however large the input.
    """
    bucket, rho = hll_rho_cols(F.col(value_col))
    regs = (
        df.select(*group_cols, bucket.alias("hll_b"), rho.alias("hll_rho"))
        .groupBy(*group_cols, "hll_b")
        .agg(F.max("hll_rho").alias("r"))
    )
    # SQL-form shiftleft: the Python wrapper only takes a literal shift.
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_MAX} - r)")
    stats = regs.groupBy(*group_cols).agg(
        F.sum(pow2).alias("s_nonzero"),
        F.count(F.lit(1)).alias("n_nonzero"),
    )
    zeros = F.lit(HLL_M) - F.col("n_nonzero")
    s_total = F.col("s_nonzero") + zeros.cast("long") * F.lit(_SCALE)
    e_raw = F.lit(_amm_scale(HLL_M)) / s_total.cast("double")
    lin = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / zeros.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), lin
    ).otherwise(e_raw)
    return stats.select(*group_cols, r6_col(est).alias("est_distinct"))


def hll_estimate_sql(
    inner_sql: str,
    value_expr: str,
    group_cols: list[str],
) -> str:
    """DuckDB twin of :func:`hll_estimate`.

    ``inner_sql`` must yield ``group_cols`` plus whatever ``value_expr``
    reads.  Spellings differ (``<<`` vs shiftleft, ``::BIGINT`` hex cast)
    but every arithmetic step is the same exact-integer / single-double-op
    sequence, so estimates hash-match.
    """
    g = ", ".join(group_cols)
    amm = repr(_amm_scale(HLL_M))
    m, rmax, scale = HLL_M, RHO_MAX, _SCALE
    return f"""
WITH hll_in AS ({inner_sql}),
hashed AS (
  SELECT {g},
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 8))::BIGINT
           % {m} AS hll_b,
         ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 9, 15))::BIGINT
           AS w
  FROM hll_in
),
regs AS (
  SELECT {g}, hll_b,
         max(CASE WHEN w = 0 THEN {rmax}
                  ELSE least(61 - length(bin(w)), {rmax}) END) AS r
  FROM hashed GROUP BY {g}, hll_b
),
stats AS (
  SELECT {g},
         sum((CAST(1 AS BIGINT) << ({rmax} - r))) AS s_nonzero,
         count(*) AS n_nonzero
  FROM regs GROUP BY {g}
)
SELECT {g},
       {r6_sql(f'''CASE WHEN ({amm} / CAST(s_nonzero
                 + ({m} - n_nonzero) * CAST({scale} AS BIGINT) AS DOUBLE))
                 <= {2.5 * m} AND ({m} - n_nonzero) > 0
            THEN CAST({m} AS DOUBLE)
                 * ln(CAST({m} AS DOUBLE) / ({m} - n_nonzero))
            ELSE {amm} / CAST(s_nonzero
                 + ({m} - n_nonzero) * CAST({scale} AS BIGINT) AS DOUBLE)
       END''')} AS est_distinct
FROM stats
"""
