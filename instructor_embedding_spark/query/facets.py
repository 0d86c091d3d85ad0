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


def _scored_matches(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    min_should_match: int | None,
) -> DataFrame:
    """(query_id, doc_id, dl, score_raw) — the full OR-semantics match
    set with each doc's length carried through (dl rides the tf rows, so
    keeping it costs nothing — it is functionally dependent on doc_id)."""
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
        .groupBy("query_id", "doc_id", "dl")
        .agg(F.sum(contrib).alias("score_raw"),
             F.count(F.lit(1)).alias("matched"))
    )
    if min_should_match is not None and min_should_match > 1:
        scored = scored.filter(F.col("matched") >= min_should_match)
    return scored


def _bucket_agg(scored: DataFrame) -> DataFrame:
    """The shared per-(query, facet) aggregate: count, best score, and
    the dl stats sub-aggregation (the ES ``stats`` sub-agg analog) — one
    hash aggregate, every expression map-side combinable."""
    return scored.groupBy("query_id", "facet").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.max("score_raw"), SCORE_DECIMALS).alias("top_score"),
        F.min("dl").alias("min_dl"),
        F.max("dl").alias("max_dl"),
        # sum of BIGINT is exact, so the average is order-free in any
        # engine; rounded to the pinned 6dp quantum anyway
        F.round(F.sum("dl") / F.count(F.lit(1)), SCORE_DECIMALS)
        .alias("avg_dl"),
    )


def facet_counts(
    docs: DataFrame,
    queries: DataFrame,
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_should_match: int | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, top_score, min_dl, max_dl, avg_dl) — one
    row per (query, facet bucket) over every matching document (OR
    semantics, full match set): the Elasticsearch terms aggregation with
    a stats sub-aggregation over document length.

    ``top_score`` is the bucket's best BM25 score (round 6dp, the pinned
    score quantum), so a UI can order buckets by best-hit quality as well
    as by count.  ``min_should_match`` applies the same distinct-term
    floor as retrieval before bucketing.
    """
    scored = _scored_matches(docs, queries, text_col, id_col,
                             min_should_match)
    facets = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet")
    )
    return _bucket_agg(scored.join(facets, "doc_id"))


def _histo_bucket(interval: int):
    return (
        F.floor(F.col("dl") / interval) * interval
    ).cast("long").cast("string")


def facet_histogram(
    docs: DataFrame,
    queries: DataFrame,
    interval: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_should_match: int | None = None,
) -> DataFrame:
    """Histogram facet over document LENGTH: buckets of ``interval``
    tokens (floor(dl / interval) · interval, rendered as a string facet
    key so terms and histogram buckets union into one result shape).
    Same stats sub-aggregation as :func:`facet_counts`."""
    scored = _scored_matches(docs, queries, text_col, id_col,
                             min_should_match)
    return _bucket_agg(scored.withColumn("facet", _histo_bucket(interval)))


# ---------------------------------------------------------------------------
# index-backed variants: identical aggregates over the match set decoded
# from the compressed segments (query/wand.py scored_matches_from_index)
# instead of a corpus re-tokenize — the serving shape at index scale
# (term In() pushdown prunes the segment scan; the facet hash aggregate
# is unchanged).  Parity with the brute-force pair is pytest-asserted;
# the driver gate's SQL oracle covers whichever path the entry wires.


def facet_counts_from_index(spark, handle, queries: DataFrame,
                            facets_df: DataFrame) -> DataFrame:
    """``facets_df`` is a (doc_id, facet) projection of the doc store —
    the doc-values column an engine keeps alongside the inverted index."""
    from instructor_embedding_spark.query.wand import (
        scored_matches_from_index,
    )
    m = scored_matches_from_index(spark, handle, queries)
    return _bucket_agg(m.join(facets_df, "doc_id"))


def facet_histogram_from_index(spark, handle, queries: DataFrame,
                               interval: int) -> DataFrame:
    """dl comes straight off the index's packed doc_lens — no doc-store
    access at all for the length histogram."""
    from instructor_embedding_spark.query.wand import (
        scored_matches_from_index,
    )
    m = scored_matches_from_index(spark, handle, queries)
    return _bucket_agg(m.withColumn("facet", _histo_bucket(interval)))


def _scored_ctes_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    text_col: str,
    id_col: str,
) -> str:
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
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
  SELECT qt.query_id, tf.doc_id, dl.dl,
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
  GROUP BY qt.query_id, tf.doc_id, dl.dl
)"""


_STATS_SELECT = f"""CAST(count(*) AS BIGINT) AS n_docs,
       round(max(s.score_raw), {SCORE_DECIMALS}) AS top_score,
       min(s.dl) AS min_dl, max(s.dl) AS max_dl,
       round(CAST(sum(s.dl) AS DOUBLE) / count(*), {SCORE_DECIMALS}) AS avg_dl"""


def facet_counts_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_should_match: int | None = None,
) -> str:
    """DuckDB oracle computing exactly :func:`facet_counts`."""
    msm = ""
    if min_should_match is not None and min_should_match > 1:
        msm = f"WHERE matched >= {int(min_should_match)}"
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)}
SELECT s.query_id, d.{facet_col} AS facet,
       {_STATS_SELECT}
FROM scored s
JOIN {table} d ON s.doc_id = d.{id_col}
{msm}
GROUP BY s.query_id, d.{facet_col}
"""


def facet_histogram_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    interval: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_should_match: int | None = None,
) -> str:
    """DuckDB oracle computing exactly :func:`facet_histogram`."""
    msm = ""
    if min_should_match is not None and min_should_match > 1:
        msm = f"WHERE matched >= {int(min_should_match)}"
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)}
SELECT s.query_id,
       CAST(CAST(floor(s.dl / {int(interval)}) AS BIGINT)
            * {int(interval)} AS VARCHAR) AS facet,
       {_STATS_SELECT}
FROM scored s
{msm}
GROUP BY s.query_id, facet
"""
