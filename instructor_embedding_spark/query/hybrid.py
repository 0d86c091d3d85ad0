"""Hybrid retrieval: fusing a lexical (BM25) ranking with a dense
(cosine-kNN) ranking — the ES 8 ``rrf`` / ``linear`` retriever analog,
and the standard serving pattern around an embedding model: the
reference produces the dense side (INSTRUCTOR embeddings scored by
cos_sim, /root/reference/evaluation/MTEB/mteb/evaluation/evaluators/
RetrievalEvaluator.py cos_sim path); production rankers fuse that with
a BM25 index.  This module is the fusion layer over the engine's two
existing retrieval families.

Two fusion rules, both integer-exact so Spark and the DuckDB oracle
agree bit-for-bit regardless of aggregation order:

* **RRF** (reciprocal rank fusion): ``score(d) = sum_s 1/(rrf_k +
  rank_s(d))`` over the systems that ranked ``d``.  Each addend is
  quantized to ``floor(SCALE/(rrf_k+rank) + 0.5)`` as BIGINT before the
  sum — ranks are small integers, so the quantized weight is exact and
  the BIGINT sum is order-free (the same trick the join-field sum/avg
  modes and votek use).
* **Linear** (weighted min-max): per (query, system) the retrieved
  scores are min-max normalized (``(s-min)/(max-min)``; a degenerate
  system page where ``max == min`` pins norm = 1.0 — every candidate is
  equally "best"), then ``sum_s w_s * norm_s(d)`` with each weighted
  term quantized to BIGINT the same way.  A doc missing from a system
  contributes 0 for it.

Scale: both inputs are top-``k_each`` PAGES (O(queries x k) rows, not
corpus-sized) — at cluster scale the lexical page comes from the WAND
index path and the dense page from the LSH/IVF ANN path, and the fusion
itself is one small groupBy on (query_id, doc_id) plus a per-query
WindowGroupLimit; it never touches the corpus.  The brute-force twins
used by the gate score from first principles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.query.bm25 import (
    SCORE_DECIMALS,
    bm25_topk,
    bm25_topk_sql,
)
from instructor_embedding_spark.analytics.similarity import (
    cosine_topk,
    cosine_topk_sql,
)

#: ES default rank constant for reciprocal rank fusion.
RRF_K = 60

#: Quantization scale for the order-free integer score sums (matches the
#: repo-wide 1e9 convention in analytics.similarity / query.joins).
FUSE_SCALE = 10 ** 9

#: Default linear-fusion weights (lexical, dense).
LINEAR_WEIGHTS = (0.7, 0.3)


def _rank_fused(iscored: DataFrame, k: int) -> DataFrame:
    """(query_id, doc_id, iscore BIGINT) -> the engine-wide
    (query_id, rank, doc_id, score) page shape; score is the quantized
    sum mapped back to a 6dp double."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("doc_id").asc()
    )
    return (
        iscored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round(F.col("iscore") / F.lit(float(FUSE_SCALE)),
                    SCORE_DECIMALS).alias("score"),
        )
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 10,
             rrf_k: int = RRF_K) -> DataFrame:
    """Fuse ranked pages by reciprocal rank.

    Each input is a (query_id, doc_id, rank) page (extra columns are
    ignored).  Output: (query_id, rank, doc_id, score) with score =
    the quantized RRF sum / SCALE at 6dp, ties broken by doc_id.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    u = rankings[0].select("query_id", "doc_id", "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "doc_id", "rank"))
    # exact integer weight: SCALE/(rrf_k+rank) is one double division on
    # integer operands — bit-identical in both engines — and floor(x+.5)
    # pins the half-away rule before the order-free BIGINT sum
    wcol = F.floor(
        F.lit(float(FUSE_SCALE)) / (F.lit(rrf_k) + F.col("rank")) + F.lit(0.5)
    ).cast("long")
    iscored = u.groupBy("query_id", "doc_id").agg(
        F.sum(wcol).alias("iscore")
    )
    return _rank_fused(iscored, k)


def linear_fuse(rankings: list[DataFrame], weights: tuple[float, ...],
                k: int = 10) -> DataFrame:
    """Weighted min-max fusion of scored pages.

    Each input is a (query_id, doc_id, score) page; ``weights`` aligns
    with ``rankings``.  Per (query, system) min-max normalization over
    the page (max == min -> norm 1.0), then the weighted contributions
    are quantized to BIGINT and summed order-free.
    """
    if len(rankings) != len(weights):
        raise ValueError("one weight per ranking")
    # tag by input position so normalization stays per-system even if
    # two systems share score ranges
    tagged = []
    for i, (r, w) in enumerate(zip(rankings, weights)):
        tagged.append(
            r.select(
                "query_id", "doc_id",
                F.col("score").cast("double").alias("s"),
                F.lit(i).alias("sys"),
                F.lit(float(w)).alias("w"),
            )
        )
    u = tagged[0]
    for p in tagged[1:]:
        u = u.unionByName(p)
    mw = Window.partitionBy("query_id", "sys")
    norm = F.when(
        F.max("s").over(mw) == F.min("s").over(mw), F.lit(1.0)
    ).otherwise(
        (F.col("s") - F.min("s").over(mw))
        / (F.max("s").over(mw) - F.min("s").over(mw))
    )
    contrib = F.floor(
        F.col("w") * norm * F.lit(float(FUSE_SCALE)) + F.lit(0.5)
    ).cast("long")
    iscored = (
        u.withColumn("ic", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ic").alias("iscore"))
    )
    return _rank_fused(iscored, k)


def _dense_page(embeddings: DataFrame, probe_map: DataFrame,
                k_each: int) -> DataFrame:
    """Dense retrieval page: probe_map is (query_id, vec_id); the probe
    vectors are looked up in ``embeddings`` and cosine-kNN'd against the
    full corpus, neighbor vec_id serving as doc_id (the fixture domain
    aligns vec_id with doc_id)."""
    probes = embeddings.join(
        F.broadcast(probe_map.select("vec_id")), "vec_id"
    )
    knn = cosine_topk(embeddings, k=k_each, queries=probes)
    return (
        knn.join(F.broadcast(probe_map), "vec_id")
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            "rank",
            F.col("cosine").alias("score"),
        )
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    probe_map: DataFrame,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    text_col: str = "text",
    dense_page: DataFrame | None = None,
    lex_page: DataFrame | None = None,
) -> DataFrame:
    """BM25 + dense cosine, fused by RRF.

    ``queries`` is the usual (query_id, query_text) table; ``probe_map``
    (query_id, vec_id) names each query's dense probe vector.  Both
    systems retrieve ``k_each``; the fused page is top ``k``.

    ``dense_page`` swaps the exact O(|probes| x n) default for any
    pre-computed (query_id, doc_id, rank) page — at corpus scale wire
    the LSH/IVF ANN top-k here (tests do; the exact default is the
    fixture-scale oracle, same contract as bitext_mine's
    ``candidates=``).  ``lex_page`` is the symmetric lexical hook: wire
    the WAND index page there (the brute-force default is the oracle
    twin's shape).
    """
    lex = (bm25_topk(docs, queries, k=k_each, text_col=text_col)
           if lex_page is None else lex_page)
    dense = (_dense_page(embeddings, probe_map, k_each)
             if dense_page is None else dense_page)
    return rrf_fuse([lex, dense], k=k, rrf_k=rrf_k)


def hybrid_linear_topk(
    docs: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    probe_map: DataFrame,
    k: int = 10,
    k_each: int = 20,
    weights: tuple[float, float] = LINEAR_WEIGHTS,
    text_col: str = "text",
    dense_page: DataFrame | None = None,
    lex_page: DataFrame | None = None,
) -> DataFrame:
    """BM25 + dense cosine, fused by weighted min-max (ES ``linear``
    retriever semantics, pinned as documented in the module header).
    ``dense_page`` / ``lex_page`` are the scale hooks: pre-computed
    (query_id, doc_id, score) pages replace the exact/brute-force
    defaults (see :func:`hybrid_rrf_topk`)."""
    lex = (bm25_topk(docs, queries, k=k_each, text_col=text_col)
           if lex_page is None else lex_page)
    dense = (_dense_page(embeddings, probe_map, k_each)
             if dense_page is None else dense_page)
    return linear_fuse([lex, dense], weights, k=k)


# ---------------------------------------------------------------- SQL twins


def _probe_map_values(probe_map_values: list[tuple[int, int]]) -> str:
    return ", ".join(f"({int(q)}, {int(v)})" for q, v in probe_map_values)


def _dense_page_sql(emb_table: str, probe_map_values: list[tuple[int, int]],
                    k_each: int) -> str:
    probe_ids = [v for _, v in probe_map_values]
    knn = cosine_topk_sql(emb_table, k=k_each, probe_ids=probe_ids)
    return f"""
SELECT pm.query_id, d.neighbor_id AS doc_id, d.rank, d.cosine AS score
FROM ({knn}) d
JOIN (VALUES {_probe_map_values(probe_map_values)}) AS pm(query_id, vec_id)
  ON pm.vec_id = d.vec_id
"""


def _rank_fused_sql(iscored_sql: str, k: int) -> str:
    return f"""
WITH iscored AS ({iscored_sql}),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY iscore DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id,
         round(iscore / {float(FUSE_SCALE)}, {SCORE_DECIMALS}) AS score
  FROM iscored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


def hybrid_rrf_topk_sql(
    docs_table: str,
    queries_values: list[tuple[int, str]],
    emb_table: str,
    probe_map_values: list[tuple[int, int]],
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    text_col: str = "text",
) -> str:
    """DuckDB oracle computing exactly :func:`hybrid_rrf_topk`."""
    lex = bm25_topk_sql(docs_table, queries_values, k=k_each,
                        text_col=text_col)
    dense = _dense_page_sql(emb_table, probe_map_values, k_each)
    iscored = f"""
  SELECT query_id, doc_id,
         SUM(CAST(floor({float(FUSE_SCALE)} / ({rrf_k} + rank) + 0.5)
                  AS BIGINT)) AS iscore
  FROM (
    SELECT query_id, doc_id, rank FROM ({lex})
    UNION ALL
    SELECT query_id, doc_id, rank FROM ({dense})
  )
  GROUP BY query_id, doc_id
"""
    return _rank_fused_sql(iscored, k)


def hybrid_linear_topk_sql(
    docs_table: str,
    queries_values: list[tuple[int, str]],
    emb_table: str,
    probe_map_values: list[tuple[int, int]],
    k: int = 10,
    k_each: int = 20,
    weights: tuple[float, float] = LINEAR_WEIGHTS,
    text_col: str = "text",
) -> str:
    """DuckDB oracle computing exactly :func:`hybrid_linear_topk`."""
    lex = bm25_topk_sql(docs_table, queries_values, k=k_each,
                        text_col=text_col)
    dense = _dense_page_sql(emb_table, probe_map_values, k_each)
    w_lex, w_dense = (float(weights[0]), float(weights[1]))
    iscored = f"""
  SELECT query_id, doc_id, SUM(ic) AS iscore
  FROM (
    SELECT query_id, doc_id,
           CAST(floor(w * (CASE WHEN mx = mn THEN 1.0
                                ELSE (s - mn) / (mx - mn) END)
                      * {float(FUSE_SCALE)} + 0.5) AS BIGINT) AS ic
    FROM (
      SELECT query_id, doc_id, s, w,
             min(s) OVER (PARTITION BY query_id, sys) AS mn,
             max(s) OVER (PARTITION BY query_id, sys) AS mx
      FROM (
        SELECT query_id, doc_id, CAST(score AS DOUBLE) AS s,
               0 AS sys, {w_lex} AS w FROM ({lex})
        UNION ALL
        SELECT query_id, doc_id, CAST(score AS DOUBLE) AS s,
               1 AS sys, {w_dense} AS w FROM ({dense})
      )
    )
  )
  GROUP BY query_id, doc_id
"""
    return _rank_fused_sql(iscored, k)
