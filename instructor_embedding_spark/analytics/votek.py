"""fast_votek diverse-example selection (reference two_steps.py:99-134).

The reference builds a kNN vote graph (each point votes for its k nearest
neighbors by cosine), then greedily selects ``select_num`` points: each
round a candidate's score is the sum of ``10**-times(s)`` over its
not-yet-selected supporters ``s``, where ``times(s)`` counts how many
already-selected points ``s`` supported — so supporters whose votes were
already "spent" are exponentially discounted, pushing selection toward
diverse regions of the embedding space.

Determinism pinned for the DuckDB twin (the reference breaks score ties by
dict insertion order — here: EXACT integer score DESC, id ASC, where the
integer score sums weights 10**(select_num - 1 - t) so no float summation
order can flip a pick in either engine; the kNN edges themselves use the
round(cosine, 6) DESC, neighbor ASC order the ``cosine_topk`` oracle
already gates):

Distributed shape: the vote graph is n*k edges, built by the ANN family
(bucketed LSH/IVF at scale, exact top-k here — the same swap every other
similarity consumer uses); each selection round is one broadcast-hash
semi-join against the ≤select_num selected ids plus one groupBy(cand)
aggregation — per-round state shipped to executors is O(select_num), never
O(n), and the argmax is a 1-row TakeOrdered.  The driver loop is inherent
to the algorithm (each pick depends on the previous), matching the
reference's sequential semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructor_embedding_spark.analytics.similarity import (
    cosine_topk,
    cosine_topk_sql,
)

VOTEK_K = 5
VOTEK_SELECT = 5


def fast_votek(embeddings: DataFrame, select_num: int = VOTEK_SELECT,
               k: int = VOTEK_K, id_col: str = "vec_id",
               vec_col: str = "embedding",
               knn: DataFrame | None = None) -> DataFrame:
    """(rank, vec_id, score) — the ``select_num`` picks in selection
    order, with each round's winning (rounded) discounted-vote score.

    ``knn`` overrides the vote-graph source with any precomputed
    (vec_id, neighbor_id) top-k table — pass ``lsh_cosine_topk`` /
    ``ivf_cosine_topk`` output to run the selection over an approximate
    graph at corpus sizes where the exact O(n²) graph is off the table."""
    spark = embeddings.sparkSession
    # Integer-weight scoring: 10**-t becomes the INTEGER 10**(max_exp - t)
    # (t <= select_num - 1 by construction, so the exponent is >= 0), so
    # each round's sum is an exact order-free BIGINT in any engine — a
    # float sum's last-ulp could otherwise flip the argmax between Spark
    # and DuckDB, a discrete id divergence no float tolerance absorbs.
    # The reported float score is derived FROM the integer afterwards.
    max_exp = select_num - 1
    if max_exp > 15:
        # 10**e stops being exact in double at e=16 and the per-candidate
        # BIGINT weight sum would near the int64 ceiling — Spark's
        # non-ANSI cast wraps silently while DuckDB errors, so fail fast
        # instead of diverging (the reference selects handfuls, not 17+)
        raise ValueError(
            f"select_num={select_num} exceeds the exact-integer scoring "
            "range (max 16); shard the selection or lower select_num"
        )
    if knn is None:
        knn = cosine_topk(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    votes = (
        knn.select(
            F.col("neighbor_id").alias("cand"),
            F.col("vec_id").alias("voter"),
        )
        .cache()
    )
    # Bound the per-candidate SUM, not just the per-voter weight: a hub
    # candidate's iscore is at most in_degree * 10**max_exp, and past
    # int64 Spark's non-ANSI sum wraps silently while DuckDB errors — the
    # exact divergence class the integer scoring exists to prevent.  The
    # bound uses the MAX in-degree (one cheap agg on the just-cached
    # table), not the total edge count: a 500k-edge graph with
    # in-degrees in the tens is exactly the documented LSH-graph scale
    # path and must not be rejected.
    max_deg = (
        votes.groupBy("cand").agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d")).collect()[0][0]
    )
    if max_deg is None or int(max_deg) * 10 ** max_exp >= 2 ** 62:
        votes.unpersist()
        raise ValueError(
            f"vote graph too hub-heavy for exact-integer scoring: max "
            f"in-degree {max_deg} * 10^{max_exp} approaches the int64 "
            "ceiling (or the graph is empty) — lower select_num or "
            "shard the selection"
        )
    from instructor_embedding_spark.functions.rounding import r6

    selected: list[int] = []
    out_rows: list[tuple[int, int, float]] = []
    for r in range(1, select_num + 1):
        if selected:
            times = (
                votes.filter(F.col("cand").isin(selected))
                .groupBy("voter")
                .agg(F.count(F.lit(1)).alias("t"))
            )
            live = votes.filter(
                ~F.col("cand").isin(selected)
                & ~F.col("voter").isin(selected)
            ).join(times, "voter", "left")
        else:
            live = votes.withColumn("t", F.lit(None).cast("long"))
        pick = (
            live.withColumn(
                "iwt",
                F.pow(
                    F.lit(10.0),
                    F.lit(max_exp) - F.coalesce(F.col("t"), F.lit(0)),
                ).cast("long"),  # 10**e is exact in double for e <= 15
            )
            .groupBy("cand")
            .agg(F.sum("iwt").cast("long").alias("iscore"))
            .orderBy(F.col("iscore").desc(), F.col("cand").asc())
            .limit(1)
            .collect()[0]
        )
        selected.append(int(pick["cand"]))
        out_rows.append(
            (r, int(pick["cand"]), r6(int(pick["iscore"]) / 10.0 ** max_exp))
        )
    votes.unpersist()
    return spark.createDataFrame(
        out_rows, "rank long, vec_id long, score double"
    )


def fast_votek_sql(table: str, select_num: int = VOTEK_SELECT,
                   k: int = VOTEK_K, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """DuckDB twin: the sequential selection is unrolled as
    (t_r, sc_r, p_r, s_r) CTE quads — one per round.  Scores sum as exact
    integer weights 10**(max_exp - t) (order-free, same as the Spark
    side); the reported float score divides that integer at the end."""
    knn = cosine_topk_sql(table, k=k, id_col=id_col, vec_col=vec_col)
    max_exp = select_num - 1
    if max_exp > 15:
        raise ValueError(
            f"select_num={select_num} exceeds the exact-integer scoring "
            "range (max 16)"
        )
    parts = [
        f"knn AS ({knn})",
        "votes AS (SELECT neighbor_id AS cand, vec_id AS voter FROM knn)",
        "s0 AS (SELECT CAST(NULL AS BIGINT) AS id LIMIT 0)",
    ]
    for r in range(1, select_num + 1):
        prev = f"s{r - 1}"
        parts.append(f"""
t{r} AS (
  SELECT voter, count(*) AS t
  FROM votes JOIN {prev} ON votes.cand = {prev}.id
  GROUP BY voter
)""")
        parts.append(f"""
sc{r} AS (
  SELECT v.cand,
         CAST(sum(CAST(power(10.0, {max_exp} - coalesce(t.t, 0)) AS BIGINT))
              AS BIGINT) AS iscore
  FROM votes v LEFT JOIN t{r} t ON v.voter = t.voter
  WHERE v.cand NOT IN (SELECT id FROM {prev})
    AND v.voter NOT IN (SELECT id FROM {prev})
  GROUP BY v.cand
)""")
        parts.append(
            f"p{r} AS (SELECT {r} AS rank, cand AS id, iscore FROM sc{r} "
            f"ORDER BY iscore DESC, cand ASC LIMIT 1)"
        )
        parts.append(
            f"s{r} AS (SELECT id FROM {prev} UNION ALL SELECT id FROM p{r})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id, "
        f"round(iscore / {10.0 ** max_exp!r}, 6) AS score FROM p{r}"
        for r in range(1, select_num + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union
