"""Ranking metrics — accuracy/precision/recall/MRR/nDCG/MAP @k.

Exact re-expression of the reference's metric loop
(/root/reference/evaluation/MTEB/mteb/evaluation/evaluators/
RetrievalEvaluator.py:195-266) as Spark grouped aggregations:

- accuracy@k  — 1 if ≥1 relevant doc in the top-k, else 0
- precision@k — (#relevant in top-k) / k
- recall@k    — (#relevant in top-k) / |relevant(q)|
- mrr@k       — 1 / rank of first relevant hit within top-k, else 0
- ndcg@k      — Σ_{hits} 1/log2(rank+1) ÷ Σ_{i=1..min(k,|rel|)} 1/log2(i+1)
                (binary relevance, reference's compute_dcg_at_k with the
                0-based i+2 == our 1-based rank+1)
- map@k       — Σ_{hits} (cum_hits(rank)/rank) ÷ min(k, |rel|)

Averages divide by the number of queries WITH qrels (the reference filters
qrels-empty queries first, RetrievalEvaluator.py:44-49) — including queries
that retrieved nothing.  Goldens from the reference's own unit tests are
reproduced in tests/test_metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_KS = (1, 3, 5, 10, 100)


def per_query_metrics(
    spark: SparkSession,
    results: DataFrame,
    qrels: DataFrame,
    ks: tuple[int, ...] = DEFAULT_KS,
) -> DataFrame:
    """(query_id, k, accuracy, precision, recall, mrr, ndcg, map) per query.

    ``results``: (query_id, rank, doc_id, ...) with 1-based rank already
    pinned by the engine's tie-break.  ``qrels``: (query_id, doc_id, ...),
    binary relevance.
    """
    ks_df = spark.createDataFrame([(int(k),) for k in ks], "k int")
    qr = qrels.select("query_id", "doc_id").distinct()

    n_rel = qr.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))

    # idcg@k = Σ_{i=1..min(k, n_rel)} 1/log2(i+1), via a ranked qrels scan
    # (identical formulation runs in the DuckDB oracle).
    qr_ranked = qr.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy("doc_id")
        ),
    )
    idcg = (
        qr_ranked.crossJoin(F.broadcast(ks_df))
        .filter(F.col("i") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.sum(1.0 / F.log2(F.col("i") + 1.0)).alias("idcg"))
    )

    hits = results.join(
        qr.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left"
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    hits = hits.withColumn(
        "cum_rel",
        F.sum("rel").over(
            Window.partitionBy("query_id")
            .orderBy("rank")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    agg = (
        hits.crossJoin(F.broadcast(ks_df))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(
            F.max("rel").cast("double").alias("any_hit"),
            F.sum("rel").alias("n_correct"),
            F.max(
                F.when(F.col("rel") == 1, 1.0 / F.col("rank"))
            ).alias("mrr_raw"),
            F.sum(
                F.when(F.col("rel") == 1, 1.0 / F.log2(F.col("rank") + 1.0))
            ).alias("dcg"),
            F.sum(
                F.when(
                    F.col("rel") == 1, F.col("cum_rel") / F.col("rank")
                )
            ).alias("sum_prec"),
        )
    )

    base = n_rel.crossJoin(F.broadcast(ks_df))
    out = (
        base.join(agg, ["query_id", "k"], "left")
        .join(idcg, ["query_id", "k"], "left")
        .select(
            "query_id",
            "k",
            F.coalesce(F.col("any_hit"), F.lit(0.0)).alias("accuracy"),
            (F.coalesce(F.col("n_correct"), F.lit(0)) / F.col("k")).alias(
                "precision"
            ),
            (
                F.coalesce(F.col("n_correct"), F.lit(0)) / F.col("n_rel")
            ).alias("recall"),
            F.coalesce(F.col("mrr_raw"), F.lit(0.0)).alias("mrr"),
            (
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            ).alias("ndcg"),
            (
                F.coalesce(F.col("sum_prec"), F.lit(0.0))
                / F.least(F.col("k"), F.col("n_rel"))
            ).alias("map"),
        )
    )
    return out


def summary_metrics(per_query: DataFrame) -> DataFrame:
    """(k, accuracy, precision, recall, mrr, ndcg, map) averaged over the
    qrels-bearing query set (rounded to 6dp for hash-stable comparison)."""
    return per_query.groupBy("k").agg(
        *[
            F.round(F.avg(c), 6).alias(c)
            for c in ("accuracy", "precision", "recall", "mrr", "ndcg", "map")
        ]
    )


def rerank_metrics(candidates: DataFrame, k: int = 10) -> DataFrame:
    """(n_queries, mean_mrr, mean_map) over per-query candidate lists —
    the reranking evaluator (W3/M8: RerankingEvaluator.py:281 ranks each
    query's [positives + negatives] by score descending; :308-324 computes
    MRR@k and MAP per query, then averages).

    ``candidates``: (query_id, cand_id, score, is_pos ∈ {0,1}).  Pinned
    semantics: queries need ≥1 positive AND ≥1 negative (reference skips
    degenerate lists); rank order = (round(score,6) DESC, cand_id ASC);
    MRR@k = 1/rank of first positive within top-k else 0; MAP = average
    precision over the FULL ranked list (Σ_{pos at rank r} cum_pos(r)/r
    ÷ n_pos)."""
    elig = (
        candidates.groupBy("query_id")
        .agg(
            F.sum("is_pos").alias("n_pos"),
            F.sum(1 - F.col("is_pos")).alias("n_neg"),
        )
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select("query_id", "n_pos")
    )
    ranked = candidates.join(elig, "query_id").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.round(F.col("score"), 6).desc(), F.col("cand_id").asc()
            )
        ),
    )
    ranked = ranked.withColumn(
        "cum_pos",
        F.sum("is_pos").over(
            Window.partitionBy("query_id")
            .orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    perq = ranked.groupBy("query_id").agg(
        F.coalesce(
            F.max(
                F.when(
                    (F.col("is_pos") == 1) & (F.col("rnk") <= k),
                    1.0 / F.col("rnk"),
                )
            ),
            F.lit(0.0),
        ).alias("mrr"),
        (
            F.sum(
                F.when(
                    F.col("is_pos") == 1,
                    F.col("cum_pos").cast("double") / F.col("rnk"),
                )
            )
            / F.first("n_pos")
        ).alias("ap"),
    )
    return perq.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("ap"), 6).alias("mean_map"),
    )


def rerank_metrics_sql(candidates_sql: str, k: int = 10) -> str:
    """DuckDB oracle for :func:`rerank_metrics` over the same candidate
    SQL (must yield query_id, cand_id, score, is_pos)."""
    return f"""
WITH cand AS ({candidates_sql}),
elig AS (
  SELECT query_id, sum(is_pos) AS n_pos
  FROM cand GROUP BY query_id
  HAVING sum(is_pos) > 0 AND sum(1 - is_pos) > 0
),
ranked AS (
  SELECT c.query_id, c.is_pos, e.n_pos,
         row_number() OVER (
           PARTITION BY c.query_id
           ORDER BY round(c.score, 6) DESC, c.cand_id ASC
         ) AS rnk
  FROM cand c JOIN elig e USING (query_id)
),
cum AS (
  SELECT *, sum(is_pos) OVER (
    PARTITION BY query_id ORDER BY rnk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cum_pos FROM ranked
),
perq AS (
  SELECT query_id,
         coalesce(max(CASE WHEN is_pos = 1 AND rnk <= {k}
                           THEN 1.0 / rnk END), 0.0) AS mrr,
         sum(CASE WHEN is_pos = 1
                  THEN CAST(cum_pos AS DOUBLE) / rnk END)
           / max(n_pos) AS ap
  FROM cum GROUP BY query_id
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       round(avg(mrr), 6) AS mean_mrr,
       round(avg(ap), 6) AS mean_map
FROM perq
"""


def metrics_sql(results_sql: str, qrels_sql: str, ks: tuple[int, ...]) -> str:
    """DuckDB oracle computing the same summary metrics.

    ``results_sql`` must yield (query_id, rank, doc_id, ...); ``qrels_sql``
    must yield (query_id, doc_id).
    """
    ks_vals = ", ".join(f"({k})" for k in ks)
    return f"""
WITH results AS ({results_sql}),
qrels AS (SELECT DISTINCT query_id, doc_id FROM ({qrels_sql})),
ks(k) AS (VALUES {ks_vals}),
n_rel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY query_id),
qr_ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id) AS i
  FROM qrels
),
idcg AS (
  SELECT query_id, k, sum(1.0 / log2(i + 1.0)) AS idcg
  FROM qr_ranked CROSS JOIN ks WHERE i <= k GROUP BY query_id, k
),
hits AS (
  SELECT r.query_id, r.rank,
         CASE WHEN q.doc_id IS NULL THEN 0 ELSE 1 END AS rel
  FROM results r LEFT JOIN qrels q
    ON r.query_id = q.query_id AND r.doc_id = q.doc_id
),
hits_cum AS (
  SELECT *, sum(rel) OVER (
    PARTITION BY query_id ORDER BY rank
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cum_rel FROM hits
),
agg AS (
  SELECT query_id, k,
         CAST(max(rel) AS DOUBLE) AS any_hit,
         sum(rel) AS n_correct,
         max(CASE WHEN rel = 1 THEN 1.0 / rank END) AS mrr_raw,
         sum(CASE WHEN rel = 1 THEN 1.0 / log2(rank + 1.0) END) AS dcg,
         sum(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rank END)
           AS sum_prec
  FROM hits_cum CROSS JOIN ks WHERE rank <= k GROUP BY query_id, k
),
per_query AS (
  SELECT b.query_id, b.k,
         coalesce(a.any_hit, 0.0) AS accuracy,
         coalesce(a.n_correct, 0) * 1.0 / b.k AS "precision",
         coalesce(a.n_correct, 0) * 1.0 / b.n_rel AS recall,
         coalesce(a.mrr_raw, 0.0) AS mrr,
         coalesce(a.dcg, 0.0) / i.idcg AS ndcg,
         coalesce(a.sum_prec, 0.0) / least(b.k, b.n_rel) AS "map"
  FROM (SELECT query_id, n_rel, k FROM n_rel CROSS JOIN ks) b
  LEFT JOIN agg a ON a.query_id = b.query_id AND a.k = b.k
  LEFT JOIN idcg i ON i.query_id = b.query_id AND i.k = b.k
)
SELECT k,
       round(avg(accuracy), 6) AS accuracy,
       round(avg("precision"), 6) AS "precision",
       round(avg(recall), 6) AS recall,
       round(avg(mrr), 6) AS mrr,
       round(avg(ndcg), 6) AS ndcg,
       round(avg("map"), 6) AS "map"
FROM per_query GROUP BY k
"""
