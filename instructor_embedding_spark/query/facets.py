"""Faceted search: per-query aggregations over the FULL matching set
(the Elasticsearch terms-aggregation analog, run alongside retrieval).

Unlike top-k retrieval the output IS the aggregate, so the plan needs no
per-query global sort and no top-k window: scan → score → one
hash-aggregate per (query, facet), map-side combinable end-to-end.  At
cluster scale this is the right shape — facet cardinality (languages,
sources, years) is tiny, so the final shuffle moves |queries| × |facets|
rows no matter how many documents matched.

Reference parity: the reference evaluates retrieval only (top-k hits,
RetrievalEvaluator.py); facets are the standard engine companion feature
(every fulltext store pairs hits with aggregations over the match set),
re-expressed as Spark hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import sql_tokens_expr
from instructor_embedding_spark.query.bm25 import (
    B,
    K1,
    SCORE_DECIMALS,
    bm25_score_col,
    corpus_stats,
    query_terms,
    term_stats,
    tf_table,
    tokenized,
)


def facet_counts(
    docs: DataFrame,
    queries: DataFrame,
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_should_match: int | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, top_score) — one row per (query, facet
    bucket) over every matching document (OR semantics, full match set).

    ``top_score`` is the bucket's best BM25 score (round 6dp, the pinned
    score quantum), so a UI can order buckets by best-hit quality as well
    as by count.  ``min_should_match`` applies the same distinct-term
    floor as retrieval before bucketing.
    """
    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)
    qt = query_terms(queries)

    contrib = bm25_score_col(
        F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl
    )
    scored = (
        tf.join(ts.select("term", "idf"), "term")
        .join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_raw"),
             F.count(F.lit(1)).alias("matched"))
    )
    if min_should_match is not None and min_should_match > 1:
        scored = scored.filter(F.col("matched") >= min_should_match)
    facets = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet")
    )
    return (
        scored.join(facets, "doc_id")
        .groupBy("query_id", "facet")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.max("score_raw"), SCORE_DECIMALS).alias("top_score"),
        )
    )


def facet_counts_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_should_match: int | None = None,
) -> str:
    """DuckDB oracle computing exactly :func:`facet_counts`."""
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
    msm = ""
    if min_should_match is not None and min_should_match > 1:
        msm = f"WHERE matched >= {int(min_should_match)}"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens FROM {table}
),
dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
q(query_id, query_text) AS (VALUES {vals}),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id,
               unnest({sql_tokens_expr('query_text')}) AS term
        FROM q)
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS score_raw,
         count(*) AS matched
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY qt.query_id, tf.doc_id
)
SELECT s.query_id, d.{facet_col} AS facet,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(max(s.score_raw), {SCORE_DECIMALS}) AS top_score
FROM scored s
JOIN {table} d ON s.doc_id = d.{id_col}
{msm}
GROUP BY s.query_id, d.{facet_col}
"""
