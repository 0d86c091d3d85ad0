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

from pyspark.sql import DataFrame, Window
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


def _bucket_agg(scored: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """The shared per-(query, facet[, extra]) aggregate: count, best
    score, and the dl stats sub-aggregation (the ES ``stats`` sub-agg
    analog) — one hash aggregate, every expression map-side combinable.
    ``extra_keys`` appends bucket-source columns (composite agg)."""
    return scored.groupBy("query_id", "facet", *extra_keys).agg(
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



def _decoded(spark, handle, queries: DataFrame,
             scored: DataFrame | None) -> DataFrame:
    """The shared index-decoded match set (query_id, doc_id, dl,
    score_raw).  Every *_from_index aggregation takes an optional
    pre-decoded ``scored`` so one decode (cached by the caller) can
    feed the whole kind union — the gated entry decodes ONCE; a None
    keeps each function self-contained."""
    if scored is not None:
        return scored
    from instructor_embedding_spark.query.wand import (
        scored_matches_from_index,
    )
    return scored_matches_from_index(spark, handle, queries)


def _matched_doc_terms(docs: DataFrame, matches: DataFrame,
                       text_col: str, id_col: str) -> DataFrame:
    """Distinct (doc_id, term) pairs of ONLY the matched documents —
    the semi-join-pruned doc-store re-tokenize every term-level
    aggregation shares (the engine's term-vectors analog)."""
    from instructor_embedding_spark.query.bm25 import tokenized

    matched_docs = docs.join(
        matches.select(F.col("doc_id").alias(id_col)).distinct(), id_col
    )
    return tokenized(matched_docs, text_col, id_col).select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )


def _sample_cut(scored: DataFrame, shard_size: int) -> DataFrame:
    """The deterministic sampler cut: each query's top-``shard_size``
    scored docs by (round-6 score DESC, doc_id ASC).  sampler_stats and
    significant_text compose over exactly this one definition."""
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shard_size)
    )


def facet_counts_from_index(spark, handle, queries: DataFrame,
                            facets_df: DataFrame,
                            scored: DataFrame | None = None) -> DataFrame:
    """``facets_df`` is a (doc_id, facet) projection of the doc store —
    the doc-values column an engine keeps alongside the inverted index."""
    m = _decoded(spark, handle, queries, scored)
    return _bucket_agg(m.join(facets_df, "doc_id"))


def facet_histogram_from_index(spark, handle, queries: DataFrame,
                               interval: int,
                               scored: DataFrame | None = None) -> DataFrame:
    """dl comes straight off the index's packed doc_lens — no doc-store
    access at all for the length histogram."""
    m = _decoded(spark, handle, queries, scored)
    return _bucket_agg(m.withColumn("facet", _histo_bucket(interval)))


# ---------------------------------------------------------- percentiles
#
# Elasticsearch `percentiles` sub-aggregation over document length,
# pinned to the DISCRETE variant with an engine-independent rank rule:
# the p-th percentile of a bucket of n values is the value at sorted row
# ceil(p·n) (ties broken by doc_id before ranking, so the selected VALUE
# is deterministic in both engines).  ES serves approximate TDigest
# percentiles at scale; the discrete rule is the exact analog this
# engine can hash-gate.  Unlike the count/stats facets this one needs a
# per-bucket sort — the one aggregation in this module that is not a
# pure hash aggregate, which is why it is a separate opt-in function.


PCT_PS: tuple[float, ...] = (0.5, 0.9)


def _pct_agg(joined: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id", "facet").orderBy("dl", "doc_id")
    wc = Window.partitionBy("query_id", "facet")
    t = (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for p in PCT_PS:
        aggs.append(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(p) * F.col("n")),
                    F.col("dl"),
                )
            ).alias(f"p{int(p * 100)}_dl")
        )
    return t.groupBy("query_id", "facet").agg(*aggs)


def facet_percentiles(
    docs: DataFrame,
    queries: DataFrame,
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, facet, n_docs, p50_dl, p90_dl) — discrete dl
    percentiles per (query, facet bucket) over the full match set."""
    scored = _scored_matches(docs, queries, text_col, id_col, None)
    facets = docs.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet")
    )
    return _pct_agg(scored.join(facets, "doc_id"))


def facet_percentiles_from_index(spark, handle, queries: DataFrame,
                                 facets_df: DataFrame,
                                 scored: DataFrame | None = None) -> DataFrame:
    """Index-served twin of :func:`facet_percentiles` (dl rides the
    decoded match set straight off packed doc_lens)."""
    m = _decoded(spark, handle, queries, scored)
    return _pct_agg(m.join(facets_df, "doc_id"))


def facet_percentiles_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`facet_percentiles`."""
    pct_cols = ",\n       ".join(
        f"max(CASE WHEN rn = CAST(ceil({p} * n) AS BIGINT) THEN dl END)"
        f" AS p{int(p * 100)}_dl"
        for p in PCT_PS
    )
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
tagged AS (
  SELECT s.query_id, d.{facet_col} AS facet, s.dl,
         row_number() OVER (
           PARTITION BY s.query_id, d.{facet_col}
           ORDER BY s.dl, s.doc_id
         ) AS rn,
         count(*) OVER (
           PARTITION BY s.query_id, d.{facet_col}
         ) AS n
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
)
SELECT query_id, facet,
       CAST(count(*) AS BIGINT) AS n_docs,
       {pct_cols}
FROM tagged
GROUP BY query_id, facet
"""


# ------------------------------------------------------------ sig terms
#
# Elasticsearch significant_terms aggregation with the default JLH
# heuristic: for the FOREGROUND set (docs matching the query, OR
# semantics) score every term by how over-represented it is vs the
# BACKGROUND (the whole corpus):
#
#   fgr = fg_df / fg_n          (share of matching docs containing term)
#   bgr = bg_df / n_docs        (share of all docs containing term)
#   jlh = (fgr - bgr) * (fgr / bgr)   iff fgr > bgr, else dropped
#
# (SignificantTermsAggregatorFactory's JLHScoreBackend; the reference
# repo has no aggregation layer — this is the standard engine companion
# feature, like the facets above.)  All inputs are exact BIGINT counts,
# and both engines evaluate the same IEEE op sequence (two long/long →
# double divisions, subtract, divide, multiply), so the round-6 score
# and the (score DESC, term ASC) top-``size`` cut are reproduced
# bit-identically by the DuckDB twin.


def _sig_from_matchset(
    matches: DataFrame,
    doc_terms: DataFrame,
    term_df: DataFrame,
    n_docs: int,
    size: int,
    min_doc_count: int,
) -> DataFrame:
    """Shared kernel: ``matches`` = (query_id, doc_id) foreground set,
    ``doc_terms`` = distinct (doc_id, term) pairs, ``term_df`` = (term,
    df) background dictionary.

    Scale shape: fg_n is a per-query scalar (broadcast); the foreground
    term count shuffles |matches| × terms-per-doc rows hashed on (query,
    term) with map-side partial aggregation; ``min_doc_count`` prunes
    the long tail BEFORE the dictionary join; the final top-``size``
    window is per-query over the surviving candidates only
    (WindowGroupLimit)."""
    fg_n = matches.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("fg_n")
    )
    fg = (
        matches.join(doc_terms, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(F.col("fg_df") >= min_doc_count)
    )
    j = (
        fg.join(F.broadcast(fg_n), "query_id")
        .join(term_df.select("term", "df"), "term")
        .withColumn("fgr", F.col("fg_df") / F.col("fg_n"))
        .withColumn("bgr", F.col("df") / F.lit(float(n_docs)))
        .filter(F.col("fgr") > F.col("bgr"))
        .withColumn(
            "sig_score",
            F.round(
                (F.col("fgr") - F.col("bgr"))
                * (F.col("fgr") / F.col("bgr")),
                SCORE_DECIMALS,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sig_score"), F.asc("term")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= size)
        .select(
            "query_id",
            "term",
            "fg_df",
            F.col("df").alias("bg_df"),
            "sig_score",
        )
    )


def significant_terms(
    docs: DataFrame,
    queries: DataFrame,
    size: int = 5,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, term, fg_df, bg_df, sig_score) — the top-``size`` JLH
    significant terms of each query's match set (brute-force base: one
    corpus tokenize feeds foreground, background, and the match set)."""
    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)
    qt = query_terms(queries)
    matches = (
        tf.join(F.broadcast(qt), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    # tf already holds one row per distinct (doc_id, term)
    return _sig_from_matchset(
        matches, tf.select("doc_id", "term"), ts, stats.n_docs,
        size, min_doc_count,
    )


def significant_terms_from_index(
    spark,
    handle,
    queries: DataFrame,
    docs: DataFrame,
    size: int = 5,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scored: DataFrame | None = None,
) -> DataFrame:
    """Index-served variant: the match set decodes from the compressed
    segments (term In() pushdown), the background df comes straight off
    the index's term dictionary, and ONLY the matched documents are
    re-tokenized for the foreground counts — the doc-store access is a
    semi-join-pruned scan, the engine's term-vectors analog.  Parity
    with :func:`significant_terms` is pytest-asserted."""
    matches = _decoded(spark, handle, queries, scored).select(
        "query_id", "doc_id"
    )
    doc_terms = _matched_doc_terms(docs, matches, text_col, id_col)
    return _sig_from_matchset(
        matches, doc_terms, handle.term_stats(spark), handle.n_docs,
        size, min_doc_count,
    )


def significant_terms_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    size: int = 5,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`significant_terms`: same
    exact-count inputs, same IEEE op order (BIGINT ``/`` is double
    division in DuckDB too), same round-6 + (score DESC, term) cut."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
m AS (SELECT DISTINCT query_id, doc_id FROM scored),
fgn AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS fg_n FROM m GROUP BY query_id
),
fg AS (
  SELECT m.query_id, tf.term, CAST(count(*) AS BIGINT) AS fg_df
  FROM m JOIN tf USING (doc_id)
  GROUP BY m.query_id, tf.term
  HAVING count(*) >= {int(min_doc_count)}
),
sig AS (
  SELECT fg.query_id, fg.term, fg.fg_df, df.df AS bg_df,
         fg.fg_df / fgn.fg_n AS fgr,
         df.df / stats.n AS bgr
  FROM fg JOIN fgn USING (query_id) JOIN df USING (term) CROSS JOIN stats
),
sigscore AS (
  SELECT query_id, term, fg_df, bg_df,
         round((fgr - bgr) * (fgr / bgr), {SCORE_DECIMALS}) AS sig_score
  FROM sig WHERE fgr > bgr
)
SELECT query_id, term, fg_df, bg_df, sig_score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY sig_score DESC, term
  ) AS rn
  FROM sigscore
)
WHERE rn <= {int(size)}
"""


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


# ---------------------------------------------------------------------------
# composite aggregation (Elasticsearch `composite` agg): deterministic
# keyset paging over MULTI-SOURCE buckets — the agg-side analog of
# search_after.  A terms source (doc facet) composes with a histogram
# source (dl buckets); pages are defined purely by the composite key
# order plus an `after` key, so any page is reproducible from its
# predecessor's last key with no server-side cursor state.  At 100 TB
# the bucket aggregate is one map-side-combinable hash agg and the page
# cut is a per-query WindowGroupLimit over O(buckets) rows — bucket
# enumeration never pins the full set in one task.


def composite_page_from_index(
    spark,
    handle,
    queries: DataFrame,
    facets_df: DataFrame,
    interval: int,
    after: tuple[str, int] | None = None,
    size: int = 10,
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, top_score, min_dl, max_dl, avg_dl) —
    one page of (facet, dl-bucket) composite buckets per query, strictly
    after the ``after`` key in (facet ASC, bucket ASC) order.  The facet
    column renders the composite key as ``facet:bucket`` so composite
    rows union into the shared facets result shape."""
    m = _decoded(spark, handle, queries, scored)
    b = m.join(facets_df, "doc_id").withColumn(
        "bucket", (F.floor(F.col("dl") / interval) * interval).cast("long")
    )
    # the shared stats aggregate, keyed by the composite (facet, bucket)
    # source pair (review finding: one definition of the stats shape)
    agg = _bucket_agg(b, extra_keys=("bucket",))
    if after is not None:
        af, ab = after
        agg = agg.filter(
            (F.col("facet") > af)
            | ((F.col("facet") == af) & (F.col("bucket") > ab))
        )
    w = Window.partitionBy("query_id").orderBy("facet", "bucket")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= size)
        .select(
            "query_id",
            F.concat_ws(
                ":", "facet", F.col("bucket").cast("string")
            ).alias("facet"),
            "n_docs", "top_score", "min_dl", "max_dl", "avg_dl",
        )
    )


def composite_page_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    interval: int,
    after: tuple[str, int] | None = None,
    size: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`composite_page_from_index`
    (from first principles — brute-force scoring, no index)."""
    where = ""
    if after is not None:
        af, ab = after
        af = af.replace("'", "''")
        where = (
            f"WHERE facet > '{af}' "
            f"OR (facet = '{af}' AND bucket > {int(ab)})"
        )
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
buckets AS (
  SELECT s.query_id, d.{facet_col} AS facet,
         CAST(floor(s.dl / {int(interval)}) AS BIGINT)
           * {int(interval)} AS bucket,
         {_STATS_SELECT}
  FROM scored s
  JOIN {table} d ON s.doc_id = d.{id_col}
  GROUP BY s.query_id, d.{facet_col}, bucket
)
SELECT query_id, facet || ':' || CAST(bucket AS VARCHAR) AS facet,
       n_docs, top_score, min_dl, max_dl, avg_dl
FROM buckets
{where}
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY facet, bucket) <= {int(size)}
"""


# ---------------------------------------------------------------------------
# adjacency_matrix aggregation (ES AdjacencyMatrixAggregator): named term
# filters over the corpus; one bucket per filter (docs matching it) and
# one per filter PAIR "a&b" (docs matching both, names in sorted order,
# ES's own separator and the same empty-buckets-omitted rule).  The
# co-occurrence shape behind graph/relationship UIs.  Distinct
# (doc_id, name) rows come straight off the tf table (one row per doc
# per matched filter — no positions, no scores); the pair join is a
# self-join on doc_id bounded by (docs × matched filters), grouped
# map-side-combinably.


def adjacency_matrix(
    docs: DataFrame,
    filters: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(facet, n_docs) — ``filters`` is a list of (name, term): a doc
    matches a filter iff the analyzed text contains the term."""
    from instructor_embedding_spark.query.bm25 import tf_table, tokenized

    spark = docs.sparkSession
    fdf = spark.createDataFrame(filters, "name string, term string")
    hits = (
        tf_table(tokenized(docs, text_col, id_col))
        .join(F.broadcast(fdf), "term")
        .select("doc_id", "name")
        .distinct()
    )
    singles = hits.groupBy(F.col("name").alias("facet")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    a, b = hits.alias("a"), hits.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.name") < F.col("b.name")))
        .groupBy(
            F.concat_ws("&", F.col("a.name"), F.col("b.name")).alias("facet")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return singles.unionByName(pairs)


def adjacency_matrix_sql(
    table: str,
    filters: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`adjacency_matrix`."""
    vals = ", ".join(
        "('{}', '{}')".format(n.replace("'", "''"), t.replace("'", "''"))
        for n, t in filters
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest({sql_tokens_expr(text_col)}) AS term
  FROM {table}
),
flt(name, term) AS (VALUES {vals}),
hits AS (
  SELECT DISTINCT toks.doc_id, flt.name
  FROM toks JOIN flt USING (term)
)
SELECT name AS facet, CAST(count(*) AS BIGINT) AS n_docs
FROM hits GROUP BY name
UNION ALL
SELECT a.name || '&' || b.name AS facet, CAST(count(*) AS BIGINT) AS n_docs
FROM hits a JOIN hits b
  ON a.doc_id = b.doc_id AND a.name < b.name
GROUP BY a.name, b.name
"""


# ---------------------------------------------------------------------------
# rare_terms aggregation (Elasticsearch RareTermsAggregation): the
# LONG-TAIL buckets — terms of the match set whose foreground doc count
# is <= max_doc_count, the inverse of the terms agg's most-common
# ordering.  ES implements it with a CuckooFilter over doc counts; with
# exact distributed counts the filter is unnecessary — the semantics is
# just the <= threshold on the same (query, term) aggregate the
# significant_terms kernel already builds, so the scale shape is
# identical (map-side combinable count, threshold prune BEFORE any
# downstream join).


def rare_terms_from_index(
    spark,
    handle,
    queries: DataFrame,
    docs: DataFrame,
    max_doc_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, term, fg_df) — match-set terms with foreground doc
    count <= ``max_doc_count``.  Match set decodes from the segments;
    only matched docs are re-tokenized (the same semi-join-pruned
    doc-store scan significant_terms uses)."""
    matches = _decoded(spark, handle, queries, scored).select(
        "query_id", "doc_id"
    )
    doc_terms = _matched_doc_terms(docs, matches, text_col, id_col)
    return (
        matches.join(doc_terms, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(F.col("fg_df") <= max_doc_count)
    )


def rare_terms_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    max_doc_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`rare_terms_from_index`
    (from first principles — the brute-force twin of the index path)."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
m AS (SELECT DISTINCT query_id, doc_id FROM scored)
SELECT m.query_id, tf.term, CAST(count(*) AS BIGINT) AS fg_df
FROM m JOIN tf USING (doc_id)
GROUP BY m.query_id, tf.term
HAVING count(*) <= {int(max_doc_count)}
"""


# ---------------------------------------------------------------------------
# pipeline aggregations (Elasticsearch cumulative_sum + derivative
# pipeline aggs over a histogram): second-pass transforms over the
# bucket stream of a parent aggregation.  Buckets are O(distinct
# buckets) rows — tiny relative to the corpus — so the per-query ordered
# window is the right distributed shape (one partition per query over
# bucket rows, never doc rows); the counts are BIGINTs, so both engines
# agree exactly and the derivative's NULL first bucket is pinned.


def histogram_pipeline_from_index(
    spark,
    handle,
    queries: DataFrame,
    interval: int,
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, cum_docs, deriv_docs) — the dl
    histogram with a cumulative_sum and a derivative pipeline agg over
    the bucket stream, ordered by the numeric bucket key.  ``facet``
    keeps the histogram's string bucket key; ``deriv_docs`` is NULL for
    each query's first bucket (ES derivative semantics)."""
    h = facet_histogram_from_index(spark, handle, queries, interval,
                                   scored=scored)
    b = h.withColumn("bucket_num", F.col("facet").cast("long"))
    w = (
        Window.partitionBy("query_id")
        .orderBy("bucket_num")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lagw = Window.partitionBy("query_id").orderBy("bucket_num")
    return (
        b.withColumn("cum_docs", F.sum("n_docs").over(w))
        .withColumn(
            "deriv_docs",
            F.col("n_docs") - F.lag("n_docs").over(lagw),
        )
        .select("query_id", "facet", "n_docs", "cum_docs", "deriv_docs")
    )


def histogram_pipeline_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    interval: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`histogram_pipeline_from_index`."""
    histo = facet_histogram_sql(table, queries_values, interval,
                                text_col, id_col)
    return f"""
WITH h AS ({histo})
SELECT query_id, facet, n_docs,
       CAST(sum(n_docs) OVER (
         PARTITION BY query_id ORDER BY CAST(facet AS BIGINT)
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_docs,
       n_docs - lag(n_docs) OVER (
         PARTITION BY query_id ORDER BY CAST(facet AS BIGINT)
       ) AS deriv_docs
FROM h
"""


# ---------------------------------------------------------------------------
# top_hits aggregation (Elasticsearch TopHitsAggregator): each facet
# bucket keeps its top-k member documents by relevance — the result
# grouper behind "show 3 example hits per category".  Scale shape: the
# per-(query, facet) rank is a WindowGroupLimit over the match set
# (pushed-down top-k per group, no global sort), and the bucket stream
# it annotates is the same one the other facet kinds aggregate.


def top_hits_from_index(
    spark,
    handle,
    queries: DataFrame,
    facets_df: DataFrame,
    k: int = 3,
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, rank, doc_id, score) — the top-``k`` docs of
    each (query, facet) bucket by (round-6 score DESC, doc_id ASC),
    scored from the compressed index."""
    m = _decoded(spark, handle, queries, scored).join(facets_df, "doc_id")
    w = Window.partitionBy("query_id", "facet").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    return (
        m.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "facet", "rank", "doc_id",
            F.round(F.col("score_raw"), SCORE_DECIMALS).alias("score"),
        )
    )


def top_hits_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`top_hits_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
fac AS (SELECT {id_col} AS doc_id, {facet_col} AS facet FROM {table}),
ranked AS (
  SELECT s.query_id, fac.facet,
         CAST(row_number() OVER (
           PARTITION BY s.query_id, fac.facet
           ORDER BY round(s.score_raw, {SCORE_DECIMALS}) DESC,
                    s.doc_id ASC
         ) AS BIGINT) AS rank,
         s.doc_id,
         round(s.score_raw, {SCORE_DECIMALS}) AS score
  FROM scored s JOIN fac USING (doc_id)
)
SELECT query_id, facet, rank, doc_id, score
FROM ranked WHERE rank <= {int(k)}
"""


# ---------------------------------------------------------------------------
# sampler aggregation (Elasticsearch SamplerAggregator): downstream
# sub-aggregations run over only the top-``shard_size`` highest-scoring
# matches per query — the "analyze the best matches, not the tail"
# pattern.  With a deterministic (score, doc_id) cut the sample is
# exact, so the stats sub-agg below it stays oracle-comparable.


def sampler_stats_from_index(
    spark,
    handle,
    queries: DataFrame,
    shard_size: int = 50,
    scored: DataFrame | None = None,
) -> DataFrame:
    """The engine's stats sub-agg over each query's top-``shard_size``
    scored docs (facet pinned to '_sample'): the ES `sampler` >
    `stats` composition."""
    s = _decoded(spark, handle, queries, scored)
    sample = _sample_cut(s, shard_size).withColumn(
        "facet", F.lit("_sample")
    )
    return _bucket_agg(sample)


def sampler_stats_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    shard_size: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`sampler_stats_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
sample AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY s.query_id
      ORDER BY round(s.score_raw, {SCORE_DECIMALS}) DESC, s.doc_id ASC
    ) AS rn
    FROM scored s
  ) WHERE rn <= {int(shard_size)}
)
SELECT s.query_id, '_sample' AS facet,
       {_STATS_SELECT}
FROM sample s
GROUP BY s.query_id, facet
"""


# ---------------------------------------------------------------------------
# weighted_avg aggregation (Elasticsearch WeightedAvgAggregation):
# per-bucket avg of a value field weighted by a weight field —
# sum(v*w)/sum(w).  With integer value/weight fields both sums are
# exact BIGINTs and the single final division is the only float op, so
# the engines agree bit-for-bit.  One map-side-combinable hash agg.


def weighted_avg_from_index(
    spark,
    handle,
    queries: DataFrame,
    attrs: DataFrame,
    value_col: str = "value",
    weight_col: str = "weight",
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, w_avg) — the match set joined with the
    per-doc ``attrs`` (doc_id, facet, value, weight); weight-0 rows
    contribute nothing (ES drops docs missing the weight)."""
    m = _decoded(spark, handle, queries, scored).select(
        "query_id", "doc_id"
    )
    j = m.join(attrs, "doc_id")
    return (
        j.groupBy("query_id", "facet")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(value_col) * F.col(weight_col)).alias("vw"),
            F.sum(F.col(weight_col)).alias("w"),
        )
        .filter(F.col("w") != 0)
        .select(
            "query_id", "facet", "n_docs",
            F.round(F.col("vw").cast("double") / F.col("w"),
                    SCORE_DECIMALS).alias("w_avg"),
        )
    )


def weighted_avg_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    value_expr: str,
    weight_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`weighted_avg_from_index`
    with attrs derived from ``table``'s own columns."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
attrs AS (
  SELECT {id_col} AS doc_id, {facet_col} AS facet,
         CAST({value_expr} AS BIGINT) AS v,
         CAST({weight_expr} AS BIGINT) AS w
  FROM {table}
)
SELECT s.query_id, a.facet, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(a.v * a.w) AS DOUBLE) / sum(a.w),
             {SCORE_DECIMALS}) AS w_avg
FROM scored s JOIN attrs a USING (doc_id)
GROUP BY s.query_id, a.facet
HAVING sum(a.w) <> 0
"""


# ---------------------------------------------------------------------------
# significant_text (Elasticsearch SignificantTextAggregator): the
# free-text variant of significant_terms, which ES documents should run
# under a `sampler` agg — JLH over the foreground counts of the TOP
# SCORED docs only, so one noisy long-tail match can't pollute the
# signal and the re-tokenize cost is bounded by shard_size, not the
# match set.  Composition of the two kernels above: the sampler cut
# feeds _sig_from_matchset unchanged.


def significant_text_from_index(
    spark,
    handle,
    queries: DataFrame,
    docs: DataFrame,
    shard_size: int = 50,
    size: int = 5,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, term, fg_df, bg_df, sig_score) — significant_terms
    over each query's top-``shard_size`` sample (fg_n = the SAMPLE
    size, exactly ES's sampler>significant_text shape)."""
    s = _decoded(spark, handle, queries, scored)
    sample = _sample_cut(s, shard_size).select("query_id", "doc_id")
    doc_terms = _matched_doc_terms(docs, sample, text_col, id_col)
    return _sig_from_matchset(
        sample, doc_terms, handle.term_stats(spark), handle.n_docs,
        size, min_doc_count,
    )


def significant_text_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    shard_size: int = 50,
    size: int = 5,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`significant_text_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
m AS (
  SELECT query_id, doc_id FROM (
    SELECT s.query_id, s.doc_id, row_number() OVER (
      PARTITION BY s.query_id
      ORDER BY round(s.score_raw, {SCORE_DECIMALS}) DESC, s.doc_id ASC
    ) AS rn
    FROM scored s
  ) WHERE rn <= {int(shard_size)}
),
fgn AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS fg_n FROM m GROUP BY query_id
),
fg AS (
  SELECT m.query_id, tf.term, CAST(count(*) AS BIGINT) AS fg_df
  FROM m JOIN tf USING (doc_id)
  GROUP BY m.query_id, tf.term
  HAVING count(*) >= {int(min_doc_count)}
),
sig AS (
  SELECT fg.query_id, fg.term, fg.fg_df, df.df AS bg_df,
         fg.fg_df / fgn.fg_n AS fgr,
         df.df / stats.n AS bgr
  FROM fg JOIN fgn USING (query_id) JOIN df USING (term) CROSS JOIN stats
),
sigscore AS (
  SELECT query_id, term, fg_df, bg_df,
         round((fgr - bgr) * (fgr / bgr), {SCORE_DECIMALS}) AS sig_score
  FROM sig WHERE fgr > bgr
)
SELECT query_id, term, fg_df, bg_df, sig_score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY sig_score DESC, term
  ) AS rn
  FROM sigscore
)
WHERE rn <= {int(size)}
"""


# ---------------------------------------------------------------------------
# sharded terms aggregation (Elasticsearch's ACTUAL cross-shard terms
# agg semantics, made deterministic): each shard returns only its local
# top-``shard_size`` term buckets, the coordinator sums what it got,
# and every merged bucket carries doc_count_error_upper_bound = the sum,
# over shards that did NOT return the term, of that shard's smallest
# returned count (the most that shard could have contributed without
# making its own cut).  A shard that returned ALL its terms (fewer than
# shard_size) provably contributes 0 error.  ES's approximation is a
# consequence of distribution; here the shard function is pinned
# (doc_id % n_shards) so the approximation itself is reproducible and
# oracle-comparable — the point is gating the MERGE SEMANTICS, error
# bound included, not hiding it.


def sharded_terms_from_index(
    spark,
    handle,
    queries: DataFrame,
    docs: DataFrame,
    n_shards: int = 2,
    shard_size: int = 10,
    size: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, term, merged_df, err_bound) — the coordinator-merged
    top-``size`` term buckets of each query's match set under per-shard
    top-``shard_size`` cuts, with ES's documented error bound."""
    matches = _decoded(spark, handle, queries, scored).select(
        "query_id", "doc_id", (F.col("doc_id") % n_shards).alias("shard")
    )
    doc_terms = _matched_doc_terms(docs, matches, text_col, id_col)
    local = (
        matches.join(doc_terms, "doc_id")
        .groupBy("query_id", "shard", "term")
        .agg(F.count(F.lit(1)).alias("df_local"))
    )
    w = Window.partitionBy("query_id", "shard").orderBy(
        F.col("df_local").desc(), F.col("term").asc()
    )
    ranked = local.withColumn("rn", F.row_number().over(w))
    kept = ranked.filter(F.col("rn") <= shard_size).select(
        "query_id", "shard", "term", "df_local"
    )
    # per (query, shard): the smallest count that made the cut, and
    # whether the shard was truncated at all (n_terms >= shard_size —
    # an untruncated shard returned everything, so its floor is 0)
    floors = ranked.groupBy("query_id", "shard").agg(
        F.min(F.when(F.col("rn") <= shard_size, F.col("df_local")))
        .alias("kth"),
        F.count(F.lit(1)).alias("n_terms"),
    ).select(
        "query_id", "shard",
        F.when(F.col("n_terms") >= shard_size, F.col("kth"))
        .otherwise(F.lit(0)).alias("floor"),
    )
    merged = kept.groupBy("query_id", "term").agg(
        F.sum("df_local").alias("merged_df")
    )
    # error = total floor over ALL shards minus the floors of shards
    # that DID return the term (only absent shards can hide counts)
    tot = floors.groupBy("query_id").agg(
        F.sum("floor").alias("floor_all")
    )
    present = (
        kept.join(floors, ["query_id", "shard"])
        .groupBy("query_id", "term")
        .agg(F.sum("floor").alias("floor_present"))
    )
    out = (
        merged.join(present, ["query_id", "term"])
        .join(F.broadcast(tot), "query_id")
        .select(
            "query_id", "term", "merged_df",
            (F.col("floor_all") - F.col("floor_present"))
            .cast("long").alias("err_bound"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("merged_df").desc(), F.col("term").asc()
    )
    return (
        out.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= size)
        .drop("rn")
    )


def sharded_terms_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    n_shards: int = 2,
    shard_size: int = 10,
    size: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`sharded_terms_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
m AS (
  SELECT DISTINCT query_id, doc_id, doc_id % {int(n_shards)} AS shard
  FROM scored
),
local AS (
  SELECT m.query_id, m.shard, tf.term,
         CAST(count(*) AS BIGINT) AS df_local
  FROM m JOIN tf USING (doc_id)
  GROUP BY m.query_id, m.shard, tf.term
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id, shard
    ORDER BY df_local DESC, term ASC
  ) AS rn
  FROM local
),
kept AS (
  SELECT query_id, shard, term, df_local FROM ranked
  WHERE rn <= {int(shard_size)}
),
floors AS (
  SELECT query_id, shard,
         CASE WHEN count(*) >= {int(shard_size)}
              THEN min(CASE WHEN rn <= {int(shard_size)}
                            THEN df_local END)
              ELSE 0 END AS floor
  FROM ranked GROUP BY query_id, shard
),
merged AS (
  SELECT query_id, term, CAST(sum(df_local) AS BIGINT) AS merged_df
  FROM kept GROUP BY query_id, term
),
tot AS (SELECT query_id, sum(floor) AS floor_all FROM floors
        GROUP BY query_id),
present AS (
  SELECT k.query_id, k.term, sum(f.floor) AS floor_present
  FROM kept k JOIN floors f USING (query_id, shard)
  GROUP BY k.query_id, k.term
)
SELECT query_id, term, merged_df, err_bound FROM (
  SELECT merged.query_id, merged.term, merged.merged_df,
         CAST(tot.floor_all - present.floor_present AS BIGINT)
           AS err_bound,
         row_number() OVER (
           PARTITION BY merged.query_id
           ORDER BY merged.merged_df DESC, merged.term ASC
         ) AS rn
  FROM merged
  JOIN present USING (query_id, term)
  JOIN tot USING (query_id)
)
WHERE rn <= {int(size)}
"""

# ---------------------------------------------------------------------------
# filters aggregation (Elasticsearch FiltersAggregator with
# `other_bucket`): NAMED predicate buckets over the match set — each
# (name, term) filter buckets the matched docs whose analyzed text
# contains the term (non-exclusive: a doc can sit in several named
# buckets), plus an `_other_` bucket for matched docs in none of them.
# Scale shape: membership is one semi-join-pruned re-tokenize of ONLY
# the matched docs (the shared _matched_doc_terms kernel) joined to the
# broadcast filter list; the bucket stats are the shared map-side
# hash aggregate.  The other-bucket is a left_anti join against the
# O(matched) membership set — never corpus-sized.


def filters_agg_from_index(
    spark,
    handle,
    queries: DataFrame,
    docs: DataFrame,
    filters: list[tuple[str, str]],
    other_key: str = "_other_",
    text_col: str = "text",
    id_col: str = "doc_id",
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, top_score, min_dl, max_dl, avg_dl) —
    one row per (query, named filter bucket) plus the ``other_key``
    bucket (ES ``other_bucket: true``).  Buckets with no members for a
    query are absent (ES drops empty filters buckets from the keyed
    response only when `min_doc_count` prunes them; pinned: absent)."""
    m = _decoded(spark, handle, queries, scored)
    fdf = spark.createDataFrame(filters, "name string, term string")
    membership = (
        _matched_doc_terms(docs, m, text_col, id_col)
        .join(F.broadcast(fdf), "term")
        .select("doc_id", F.col("name").alias("facet"))
        .distinct()
    )
    named = _bucket_agg(m.join(membership, "doc_id"))
    other = _bucket_agg(
        m.join(membership.select("doc_id").distinct(), "doc_id",
               "left_anti")
        .withColumn("facet", F.lit(other_key))
    )
    return named.unionByName(other)


def filters_agg_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    filters: list[tuple[str, str]],
    other_key: str = "_other_",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`filters_agg_from_index`."""
    vals = ", ".join(
        "('{}', '{}')".format(n.replace("'", "''"), t.replace("'", "''"))
        for n, t in filters
    )
    ok = other_key.replace("'", "''")
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
flt(name, term) AS (VALUES {vals}),
hits AS (
  SELECT DISTINCT t.doc_id, flt.name
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks) t
  JOIN flt USING (term)
)
SELECT s.query_id, h.name AS facet,
       {_STATS_SELECT}
FROM scored s JOIN hits h USING (doc_id)
GROUP BY s.query_id, h.name
UNION ALL
SELECT s.query_id, '{ok}' AS facet,
       {_STATS_SELECT}
FROM scored s
WHERE s.doc_id NOT IN (SELECT doc_id FROM hits)
GROUP BY s.query_id
"""


# ---------------------------------------------------------------------------
# range aggregation (Elasticsearch RangeAggregator): EXPLICIT
# [from, to) boundary buckets over document length, ES key format
# "from-to" with `*` for an open end.  Two semantics the histogram kind
# does not pin: (a) boundaries are arbitrary, not a uniform interval;
# (b) EVERY configured bucket appears for EVERY query — empty buckets
# come back with doc_count 0 (ES returns all configured ranges
# unconditionally), so the all-stopword query yields its full
# zero-count bucket list instead of vanishing.  Scale shape: the range
# list is O(1) and broadcast; each matched row lands in at most one
# bucket (ranges here are disjoint, though ES allows overlap — the
# non-equi join handles either); the backfill join is |queries|×|ranges|.


def _range_key(lo: int | None, hi: int | None) -> str:
    return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"


def range_agg_from_index(
    spark,
    handle,
    queries: DataFrame,
    ranges: list[tuple[int | None, int | None]],
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, top_score, min_dl, max_dl, avg_dl) —
    one row per (query, configured range) with n_docs=0 and NULL stats
    for empty buckets."""
    m = _decoded(spark, handle, queries, scored)
    rdf = spark.createDataFrame(
        [(_range_key(lo, hi), lo, hi) for lo, hi in ranges],
        "facet string, lo long, hi long",
    )
    matched = m.join(
        F.broadcast(rdf),
        (F.col("lo").isNull() | (F.col("dl") >= F.col("lo")))
        & (F.col("hi").isNull() | (F.col("dl") < F.col("hi"))),
    )
    agged = _bucket_agg(matched)
    all_buckets = queries.select("query_id").crossJoin(
        F.broadcast(rdf.select("facet"))
    )
    return (
        all_buckets.join(agged, ["query_id", "facet"], "left")
        .select(
            "query_id", "facet",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long")
            .alias("n_docs"),
            "top_score", "min_dl", "max_dl", "avg_dl",
        )
    )


def range_agg_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    ranges: list[tuple[int | None, int | None]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`range_agg_from_index`."""
    vals = ", ".join(
        "('{}', {}, {})".format(
            _range_key(lo, hi),
            "CAST(NULL AS BIGINT)" if lo is None else f"CAST({lo} AS BIGINT)",
            "CAST(NULL AS BIGINT)" if hi is None else f"CAST({hi} AS BIGINT)",
        )
        for lo, hi in ranges
    )
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
rng(facet, lo, hi) AS (VALUES {vals}),
agged AS (
  SELECT s.query_id, r.facet,
         {_STATS_SELECT}
  FROM scored s JOIN rng r
    ON (r.lo IS NULL OR s.dl >= r.lo) AND (r.hi IS NULL OR s.dl < r.hi)
  GROUP BY s.query_id, r.facet
)
SELECT qr.query_id, qr.facet,
       CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
       a.top_score, a.min_dl, a.max_dl, a.avg_dl
FROM (SELECT q.query_id, r.facet FROM q CROSS JOIN rng r) qr
LEFT JOIN agged a USING (query_id, facet)
"""


# ---------------------------------------------------------------------------
# multi_terms aggregation (Elasticsearch MultiTermsAggregation): buckets
# keyed by a TUPLE of terms sources — here (doc facet, dl histogram
# bucket), rendered "facet|bucket" (ES joins key parts with `|` in
# `key_as_string`).  ES orders buckets by doc count desc and keeps the
# top `size`; pinned tiebreak: composite key asc.  Scale shape: one
# map-side-combinable hash agg over the composite key plus a per-query
# WindowGroupLimit over O(buckets) rows for the size cut.


def multi_terms_from_index(
    spark,
    handle,
    queries: DataFrame,
    facets_df: DataFrame,
    interval: int,
    size: int = 10,
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, top_score, min_dl, max_dl, avg_dl) —
    the top-``size`` composite (facet, dl-bucket) buckets per query by
    (n_docs DESC, key ASC)."""
    m = _decoded(spark, handle, queries, scored)
    keyed = (
        m.join(facets_df, "doc_id")
        .withColumn(
            "facet",
            F.concat_ws("|", F.col("facet"), _histo_bucket(interval)),
        )
    )
    agged = _bucket_agg(keyed)
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_docs").desc(), F.col("facet").asc()
    )
    return (
        agged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= size)
        .drop("rn")
    )


def multi_terms_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    interval: int,
    size: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`multi_terms_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
agged AS (
  SELECT s.query_id,
         d.{facet_col} || '|' ||
           CAST(CAST(floor(s.dl / {int(interval)}) AS BIGINT)
                * {int(interval)} AS VARCHAR) AS facet,
         {_STATS_SELECT}
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
  GROUP BY s.query_id, facet
)
SELECT query_id, facet, n_docs, top_score, min_dl, max_dl, avg_dl
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY n_docs DESC, facet ASC
  ) AS rn FROM agged
) WHERE rn <= {int(size)}
"""


# ---------------------------------------------------------------------------
# extended_stats aggregation (Elasticsearch ExtendedStatsAggregation):
# the stats sub-agg plus sum_of_squares, variance and std_deviation
# over document length per facet bucket.  Exactness strategy: Σdl and
# Σdl² accumulate as BIGINTs (order-free, map-side combinable in both
# engines), then variance_pop = (n·Σx² − (Σx)²) / n² is ONE double
# expression over exact integers, and std_dev = sqrt of that same
# double (IEEE sqrt is correctly rounded, so the engines agree
# bit-for-bit).  The integer numerator bounds the valid domain:
# n·Σdl² must stay under 2^63 — fine for gate fixtures and any
# per-bucket n·dl² ≤ ~10^18; at larger bucket mass use a
# per-partition Welford merge instead (the float path this exact
# oracle would then cross-check at fixture scale).  The domain is
# ENFORCED at runtime: a bucket with n·Σdl² past 2^62 (2× safety
# margin) raises instead of silently wrapping in non-ANSI mode.


def _ext_stats_var_raw(facet_col: str = "facet"):
    """Population-variance double expression over the exact BIGINT
    accumulators (n_docs, sum_sq, s), guarded: buckets whose n·Σdl²
    exceeds 2^62 raise loudly (non-ANSI Spark would otherwise wrap the
    BIGINT product and return a wrong variance/std_dev).  s² ≤ n·Σdl²
    by Cauchy-Schwarz, so the one check covers both products."""
    over = F.col("sum_sq") > F.expr(f"{1 << 62} div n_docs")
    var = (
        (F.col("n_docs") * F.col("sum_sq") - F.col("s") * F.col("s"))
        .cast("double")
        / (F.col("n_docs") * F.col("n_docs"))
    )
    return F.when(
        over,
        F.raise_error(F.concat(
            F.lit("extended_stats int64 domain exceeded "
                  "(n_docs*sum_sq > 2^62) for bucket "),
            F.col(facet_col).cast("string"),
        )),
    ).otherwise(var)


def extended_stats_from_index(
    spark,
    handle,
    queries: DataFrame,
    facets_df: DataFrame,
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, min_dl, max_dl, avg_dl, sum_sq,
    variance, std_dev) — ES extended_stats over dl per facet bucket
    (population variance, ES default)."""
    m = _decoded(spark, handle, queries, scored)
    g = (
        m.join(facets_df, "doc_id")
        .groupBy("query_id", "facet")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("dl").alias("min_dl"),
            F.max("dl").alias("max_dl"),
            F.sum("dl").alias("s"),
            F.sum(F.col("dl") * F.col("dl")).alias("sum_sq"),
        )
    )
    var_raw = _ext_stats_var_raw()
    return g.select(
        "query_id", "facet", "n_docs", "min_dl", "max_dl",
        F.round(F.col("s").cast("double") / F.col("n_docs"),
                SCORE_DECIMALS).alias("avg_dl"),
        "sum_sq",
        F.round(var_raw, SCORE_DECIMALS).alias("variance"),
        F.round(F.sqrt(var_raw), SCORE_DECIMALS).alias("std_dev"),
    )


def extended_stats_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`extended_stats_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
g AS (
  SELECT s.query_id, d.{facet_col} AS facet,
         CAST(count(*) AS BIGINT) AS n_docs,
         min(s.dl) AS min_dl, max(s.dl) AS max_dl,
         CAST(sum(s.dl) AS BIGINT) AS s,
         CAST(sum(s.dl * s.dl) AS BIGINT) AS sum_sq
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
  GROUP BY s.query_id, d.{facet_col}
)
SELECT query_id, facet, n_docs, min_dl, max_dl,
       round(CAST(s AS DOUBLE) / n_docs, {SCORE_DECIMALS}) AS avg_dl,
       sum_sq,
       round(CAST(n_docs * sum_sq - s * s AS DOUBLE) / (n_docs * n_docs),
             {SCORE_DECIMALS}) AS variance,
       round(sqrt(CAST(n_docs * sum_sq - s * s AS DOUBLE)
                  / (n_docs * n_docs)), {SCORE_DECIMALS}) AS std_dev
FROM g
"""


# ---------------------------------------------------------------------------
# percentile_ranks aggregation (Elasticsearch PercentileRanksAggregation):
# the INVERSE of percentiles — for each pinned value v, the percentage
# of the bucket's docs with dl ≤ v (ES reports the cumulative percent
# at v).  With exact integer counts the rank is 100·count(dl≤v)/n in
# ONE double expression, so both engines agree bit-for-bit — no TDigest
# needed at oracle scale.  One map-side-combinable hash agg; the pinned
# value list rides as conditional-sum columns, unpivoted after.


def percentile_ranks_from_index(
    spark,
    handle,
    queries: DataFrame,
    facets_df: DataFrame,
    values: tuple[int, ...],
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, pct_rank) — facet is
    "<bucket>:<=<v>" per pinned value v; pct_rank ∈ [0, 100]."""
    m = _decoded(spark, handle, queries, scored)
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum((F.col("dl") <= F.lit(int(v))).cast("long"))
        .alias(f"c_{i}")
        for i, v in enumerate(values)
    ]
    g = m.join(facets_df, "doc_id").groupBy("query_id", "facet").agg(*aggs)
    stacked = g.select(
        "query_id", "facet", "n_docs",
        F.explode(F.array(*[
            F.struct(
                F.lit(int(v)).alias("v"), F.col(f"c_{i}").alias("c")
            )
            for i, v in enumerate(values)
        ])).alias("vc"),
    )
    return stacked.select(
        "query_id",
        F.concat_ws(":<=", F.col("facet"), F.col("vc.v").cast("string"))
        .alias("facet"),
        "n_docs",
        F.round(
            (F.lit(100.0) * F.col("vc.c")) / F.col("n_docs"),
            SCORE_DECIMALS,
        ).alias("pct_rank"),
    )


def percentile_ranks_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    facet_col: str,
    values: tuple[int, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`percentile_ranks_from_index`."""
    vals = ", ".join(f"({int(v)})" for v in values)
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
vals(v) AS (VALUES {vals})
SELECT s.query_id,
       d.{facet_col} || ':<=' || CAST(v.v AS VARCHAR) AS facet,
       CAST(count(*) AS BIGINT) AS n_docs,
       round((100.0 * sum(CASE WHEN s.dl <= v.v THEN 1 ELSE 0 END))
             / count(*), {SCORE_DECIMALS}) AS pct_rank
FROM scored s
JOIN {table} d ON s.doc_id = d.{id_col}
CROSS JOIN vals v
GROUP BY s.query_id, d.{facet_col}, v.v
"""

# ---------------------------------------------------------------------------
# diversified_sampler aggregation (Elasticsearch
# DiversifiedAggregatorFactory): the sampler cut with a per-value
# diversity cap — at most ``max_per_value`` docs sharing a diversity
# field value (e.g. lang) may enter the sample, de-duplicating
# near-identical sources before sub-aggs run.  ES's greedy collector
# (walk global rank order, skip a doc whose value already holds
# max_per_value, stop at shard_size) decomposes into two window cuts:
# a doc with per-value rank > max_per_value is ALWAYS skipped (its
# better-ranked same-value peers precede it in global order and fill
# the cap first), and a doc within its value cap is never skipped by
# the cap — so greedy = (per-(query, value) rank ≤ max_per_value) then
# (global rank over survivors ≤ shard_size).  Both cuts are
# WindowGroupLimit-able; no sequential state.


def diversified_sampler_stats_from_index(
    spark,
    handle,
    queries: DataFrame,
    diversity_df: DataFrame,
    shard_size: int = 50,
    max_per_value: int = 5,
    scored: DataFrame | None = None,
) -> DataFrame:
    """The stats sub-agg over each query's diversified sample (facet
    pinned to '_diversified'): the ES `diversified_sampler` > `stats`
    composition.  ``diversity_df`` is (doc_id, dvalue)."""
    s = _decoded(spark, handle, queries, scored).join(diversity_df,
                                                      "doc_id")
    order = (
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    wv = Window.partitionBy("query_id", "dvalue").orderBy(*order)
    wg = Window.partitionBy("query_id").orderBy(*order)
    sample = (
        s.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") <= max_per_value)
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= shard_size)
        .withColumn("facet", F.lit("_diversified"))
    )
    return _bucket_agg(sample)


def diversified_sampler_stats_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    diversity_col: str,
    shard_size: int = 50,
    max_per_value: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly
    :func:`diversified_sampler_stats_from_index`."""
    return f"""{_scored_ctes_sql(table, queries_values, text_col, id_col)},
capped AS (
  SELECT * FROM (
    SELECT s.*, d.{diversity_col} AS dvalue, row_number() OVER (
      PARTITION BY s.query_id, d.{diversity_col}
      ORDER BY round(s.score_raw, {SCORE_DECIMALS}) DESC, s.doc_id ASC
    ) AS vr
    FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
  ) WHERE vr <= {int(max_per_value)}
),
sample AS (
  SELECT * FROM (
    SELECT capped.*, row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
    ) AS rn
    FROM capped
  ) WHERE rn <= {int(shard_size)}
)
SELECT s.query_id, '_diversified' AS facet,
       {_STATS_SELECT}
FROM sample s
GROUP BY s.query_id, facet
"""


# ---------------------------------------------------------------------------
# sibling pipeline aggregations (Elasticsearch max_bucket / min_bucket /
# avg_bucket): one output row per query summarizing the dl-histogram
# bucket stream — the key and count of the fullest bucket, the key and
# count of the emptiest NON-EMPTY bucket (histograms here drop empty
# buckets, matching the parent agg ES siblings read), and the mean
# bucket count.  Pinned tiebreak: smallest numeric bucket key.  Scale
# shape: one window/agg over O(buckets) rows per query — never doc rows.


def bucket_extrema_from_index(
    spark,
    handle,
    queries: DataFrame,
    interval: int,
    scored: DataFrame | None = None,
) -> DataFrame:
    """(query_id, facet, n_docs, avg_count) — three rows per matching
    query: facet 'max:<key>' (n_docs = fullest bucket count),
    'min:<key>' (emptiest), and 'avg_bucket' (n_docs NULL, avg_count =
    mean bucket count, round 6)."""
    h = facet_histogram_from_index(
        spark, handle, queries, interval, scored=scored,
    ).select("query_id", "facet", "n_docs")
    b = h.withColumn("bucket_num", F.col("facet").cast("long"))
    null_dbl = F.lit(None).cast("double")
    wmax = Window.partitionBy("query_id").orderBy(
        F.col("n_docs").desc(), F.col("bucket_num").asc()
    )
    wmin = Window.partitionBy("query_id").orderBy(
        F.col("n_docs").asc(), F.col("bucket_num").asc()
    )
    mx = (
        b.withColumn("rn", F.row_number().over(wmax))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.concat(F.lit("max:"), F.col("facet")).alias("facet"),
            "n_docs",
            null_dbl.alias("avg_count"),
        )
    )
    mn = (
        b.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.concat(F.lit("min:"), F.col("facet")).alias("facet"),
            "n_docs",
            null_dbl.alias("avg_count"),
        )
    )
    av = (
        b.groupBy("query_id")
        .agg(
            F.round(
                F.sum("n_docs").cast("double") / F.count(F.lit(1)),
                SCORE_DECIMALS,
            ).alias("avg_count")
        )
        .select(
            "query_id", F.lit("avg_bucket").alias("facet"),
            F.lit(None).cast("long").alias("n_docs"), "avg_count",
        )
    )
    return mx.unionByName(mn).unionByName(av)


def bucket_extrema_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    interval: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`bucket_extrema_from_index`."""
    histo = facet_histogram_sql(table, queries_values, interval,
                                text_col, id_col)
    return f"""
WITH h AS ({histo}),
b AS (SELECT query_id, facet, n_docs,
             CAST(facet AS BIGINT) AS bucket_num FROM h)
SELECT query_id, 'max:' || facet AS facet, n_docs,
       CAST(NULL AS DOUBLE) AS avg_count
FROM (SELECT b.*, row_number() OVER (
        PARTITION BY query_id ORDER BY n_docs DESC, bucket_num ASC
      ) AS rn FROM b) WHERE rn = 1
UNION ALL
SELECT query_id, 'min:' || facet AS facet, n_docs,
       CAST(NULL AS DOUBLE) AS avg_count
FROM (SELECT b.*, row_number() OVER (
        PARTITION BY query_id ORDER BY n_docs ASC, bucket_num ASC
      ) AS rn FROM b) WHERE rn = 1
UNION ALL
SELECT query_id, 'avg_bucket' AS facet, CAST(NULL AS BIGINT) AS n_docs,
       round(CAST(sum(n_docs) AS DOUBLE) / count(*),
             {SCORE_DECIMALS}) AS avg_count
FROM b GROUP BY query_id
"""
