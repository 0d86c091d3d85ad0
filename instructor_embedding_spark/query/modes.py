"""Result-shaping and query-expansion search modes over the BM25 match
set: field collapsing, sort-by-field, numeric range filtering, synonym-
blended scoring, and more-like-this.

These are the standard engine companions to plain top-k retrieval (the
reference evaluates retrieval only — RetrievalEvaluator.py scores
Dict[qid, Dict[docid, score]] — every production fulltext store layers
exactly these five on the same scored match set).  Each mode is a pure
DataFrame composition over the shared brute-force scoring base from
:mod:`instructor_embedding_spark.query.bm25` with a line-for-line DuckDB
twin, so the driver gate hash-checks every mode.

Scale notes (the shapes that survive 100 TB):

- Every mode starts from the same ``scored`` aggregate — one shuffle by
  (query_id, doc_id) with map-side partial aggregation; the query-term
  join broadcasts.
- ``collapse_topk`` is two stacked rank-filters; Spark rewrites both
  ``row_number() <= n`` windows into WindowGroupLimit (per-partition
  group-top-n BEFORE the shuffle), so the collapse moves O(groups)
  rows, not O(matches).
- ``sort_topk`` / ``range_topk`` reorder or pre-filter the match set
  with a doc-attribute join that broadcasts the (tiny) attribute
  projection ONLY if the attribute table is small; here it is the full
  documents projection, so the join shuffles on doc_id — the same key
  the scored aggregate already produced, which AQE coalesces.
- ``synonym_topk`` adds one extra (query, doc, group) pre-aggregate;
  the synonym table and the per-group df table are broadcast.
- ``mlt_topk`` turns seed docs into query terms with a top-m window
  over the seeds' tf rows (rows ∝ |seeds| × terms-per-doc, tiny), then
  reuses the ordinary scoring base.
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

__all__ = [
    "collapse_topk", "collapse_topk_sql",
    "sort_topk", "sort_topk_sql",
    "range_topk", "range_topk_sql",
    "synonym_topk", "synonym_topk_sql",
    "mlt_topk", "mlt_topk_sql",
    "rescore_topk", "rescore_topk_sql",
    "function_score_topk", "function_score_topk_sql",
    "boosting_topk", "boosting_topk_sql",
    "decay_score_topk", "decay_score_topk_sql",
    "terms_set_topk", "terms_set_topk_sql",
    "sorted_topk_from_index",
    "MLT_MAX_TERMS",
    "collapse_over",
    "sort_over",
    "range_over",
]

#: More-like-this: max seed terms kept (Lucene MoreLikeThis
#: maxQueryTerms analog; the reference never exposes MLT — this is the
#: engine-side companion feature).
MLT_MAX_TERMS = 5


# ---------------------------------------------------------------------------
# shared Spark scoring base


def _scored_base(docs: DataFrame, queries: DataFrame, text_col: str,
                 id_col: str):
    """((query_id, doc_id, score_raw) match set, stats) — the OR-semantics
    brute-force BM25 aggregate every mode starts from (bm25.bm25_topk's
    core, without the top-k window)."""
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
        .agg(F.sum(contrib).alias("score_raw"))
    )
    return scored, stats, tf, ts


def _r6():
    # built lazily: Column construction needs an active SparkContext
    return F.round(F.col("score_raw"), SCORE_DECIMALS)


def _final(df: DataFrame) -> DataFrame:
    return df.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        _r6().alias("score"),
    )


# ---------------------------------------------------------------------------
# shared SQL scoring base


from instructor_embedding_spark.functions.sqllit import (
    sql_values_pairs as _vals,
)


def _base_ctes(table: str, text_col: str, id_col: str) -> str:
    """toks → dl → stats → tf → df — the corpus-side CTE chain shared by
    every twin (identical to bm25.bm25_topk_sql's prefix)."""
    return f"""toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens FROM {table}
),
dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)"""


def _scored_ctes(queries_values) -> str:
    """q → qt → scored — the query-side chain for the plain-OR modes."""
    return f"""q(query_id, query_text) AS (VALUES {_vals(queries_values)}),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({sql_tokens_expr('query_text')}) AS term
        FROM q)
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS score_raw
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY qt.query_id, tf.doc_id
)"""


# ---------------------------------------------------------------------------
# field collapsing (Elasticsearch `collapse`, Lucene CollapsingCollector)


def collapse_over(matches: DataFrame, groups: DataFrame,
                  k: int = 10) -> DataFrame:
    """Collapse any (query_id, doc_id, score_raw) match set — brute-force
    or index-decoded (wand.scored_matches_from_index) — against a
    (doc_id, grp) doc-values projection."""
    within = Window.partitionBy("query_id", "grp").orderBy(
        _r6().desc(), F.col("doc_id").asc()
    )
    overall = Window.partitionBy("query_id").orderBy(
        _r6().desc(), F.col("doc_id").asc()
    )
    return _final(
        matches.join(groups, "doc_id")
        .withColumn("rn", F.row_number().over(within))
        .filter(F.col("rn") == 1)
        .withColumn("rank", F.row_number().over(overall))
        .filter(F.col("rank") <= k)
    )


def collapse_topk(docs: DataFrame, queries: DataFrame, group_col: str,
                  k: int = 10, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(query_id, rank, doc_id, score) — top-k hits with at most ONE hit
    per ``group_col`` value: each group is represented by its best doc
    in the pinned (round(score, 6) DESC, doc_id ASC) order, then the
    representatives rank normally."""
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    grp = docs.select(
        F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp")
    )
    return collapse_over(scored, grp, k)


def collapse_topk_sql(table: str, queries_values, group_col: str,
                      k: int = 10, text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
best AS (
  SELECT s.query_id, s.doc_id, s.score_raw,
         row_number() OVER (
           PARTITION BY s.query_id, d.{group_col}
           ORDER BY round(s.score_raw, {SCORE_DECIMALS}) DESC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM best WHERE rn = 1
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# sort-by-field (Elasticsearch `sort`: order hits by a doc value, not score)


def sort_over(matches: DataFrame, attrs: DataFrame, k: int = 10,
              ascending: bool = False) -> DataFrame:
    """Sort any match set by a (doc_id, sort_key) doc-values column."""
    key = F.col("sort_key").asc() if ascending else F.col("sort_key").desc()
    w = Window.partitionBy("query_id").orderBy(key, F.col("doc_id").asc())
    return _final(
        matches.join(attrs, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sort_topk(docs: DataFrame, queries: DataFrame, sort_col: str,
              k: int = 10, text_col: str = "text",
              id_col: str = "doc_id", ascending: bool = False) -> DataFrame:
    """(query_id, rank, doc_id, score) — the match set ordered by a
    stored doc attribute (``sort_col`` DESC by default, doc_id ASC
    tiebreak) instead of relevance; BM25 score still reported."""
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    attr = docs.select(
        F.col(id_col).alias("doc_id"), F.col(sort_col).alias("sort_key")
    )
    return sort_over(scored, attr, k, ascending)


def sort_topk_sql(table: str, queries_values, sort_col: str, k: int = 10,
                  text_col: str = "text", id_col: str = "doc_id",
                  ascending: bool = False) -> str:
    direction = "ASC" if ascending else "DESC"
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
ranked AS (
  SELECT s.query_id,
         CAST(row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY d.{sort_col} {direction}, s.doc_id ASC
         ) AS BIGINT) AS rank,
         s.doc_id, round(s.score_raw, {SCORE_DECIMALS}) AS score
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# numeric range filter (doc-values range query over a stored field)


def range_topk(docs: DataFrame, queries: DataFrame, attr_col: str,
               lo: int, hi: int, k: int = 10, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-k restricted to docs
    with ``lo <= attr_col < hi`` (Lucene LongPoint.newRangeQuery inside
    a BooleanQuery FILTER clause: matching narrows, scoring and corpus
    stats are unchanged — same pinned semantics as ``doc_filter``).

    Index-backed equivalent: ``wand.wand_topk(doc_filter=docs.filter(
    range_pred).select("doc_id"))`` — the allowed-set is packed into
    per-block sorted arrays and applied INSIDE the block-max kernel, so
    at index scale the range filter prunes postings work rather than
    post-filtering (tests assert this brute-force form equals
    ``bm25_topk(doc_filter=)``, which is rank-identical to the WAND
    path by the existing filtered-retrieval parity suite)."""
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    keep = docs.filter(
        (F.col(attr_col) >= lo) & (F.col(attr_col) < hi)
    ).select(F.col(id_col).alias("doc_id"))
    return range_over(scored, keep, k)


def range_over(matches: DataFrame, keep: DataFrame, k: int = 10) -> DataFrame:
    """BM25-order top-k of any match set restricted to the ``keep``
    (doc_id) whitelist — the post-hoc twin of wand_topk(doc_filter=),
    for callers who already hold a decoded match set."""
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        matches.join(keep, "doc_id", "left_semi")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def range_topk_sql(table: str, queries_values, attr_col: str, lo: int,
                   hi: int, k: int = 10, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM scored
  WHERE doc_id IN (SELECT {id_col} FROM {table}
                   WHERE {attr_col} >= {int(lo)} AND {attr_col} < {int(hi)})
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# synonym-blended scoring (Lucene SynonymQuery)


def synonym_topk(docs: DataFrame, queries: DataFrame,
                 synonyms: list[tuple[str, str]], k: int = 10,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(query_id, rank, doc_id, score) — each query term and its listed
    synonyms score as ONE pseudo-term (Lucene SynonymQuery semantics:
    term frequencies of the group SUM inside a single BM25 saturation,
    document frequency is the MAX over the group's members — not the
    union — so the blend never out-scores its rarest member's idf).

    ``synonyms`` is a list of (term, alternative) pairs: a query term
    equal to ``term`` also matches ``alternative``.  Terms without
    synonyms score exactly as in plain BM25 (a 1-member group).
    """
    spark = docs.sparkSession
    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)
    qt = query_terms(queries)

    syn = spark.createDataFrame(synonyms, "term string, alt string")
    members = (
        qt.select("query_id", F.col("term").alias("canon"),
                  F.col("term").alias("mterm"))
        .unionByName(
            qt.join(F.broadcast(syn), "term")
            .select("query_id", F.col("term").alias("canon"),
                    F.col("alt").alias("mterm"))
        )
        .distinct()
    )
    # per-(query, group) blended df: max over members present in the
    # corpus (members with no postings have no df row and drop out,
    # matching Lucene's docFreq=0 terms contributing nothing to max)
    gdf = (
        members.join(ts.select(F.col("term").alias("mterm"), "df"), "mterm")
        .groupBy("query_id", "canon")
        .agg(F.max("df").alias("dfb"))
        .withColumn(
            "idfb",
            F.log(
                F.lit(1.0)
                + (F.lit(float(stats.n_docs)) - F.col("dfb") + F.lit(0.5))
                / (F.col("dfb") + F.lit(0.5))
            ),
        )
    )
    blended = (
        tf.join(F.broadcast(members),
                tf["term"] == members["mterm"])
        .groupBy("query_id", "doc_id", "dl", "canon")
        .agg(F.sum("tf").alias("tfb"))
    )
    contrib = bm25_score_col(
        F.col("tfb"), F.col("dl"), F.col("idfb"), stats.avgdl
    )
    scored = (
        blended.join(F.broadcast(gdf), ["query_id", "canon"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def synonym_topk_sql(table: str, queries_values,
                     synonyms: list[tuple[str, str]], k: int = 10,
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    svals = ", ".join(
        "('{}', '{}')".format(t.replace("'", "''"), a.replace("'", "''"))
        for t, a in synonyms
    )
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
q(query_id, query_text) AS (VALUES {_vals(queries_values)}),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({sql_tokens_expr('query_text')}) AS term
        FROM q)
),
syn(term, alt) AS (VALUES {svals}),
members AS (
  SELECT query_id, term AS canon, term AS mterm FROM qt
  UNION
  SELECT qt.query_id, qt.term AS canon, syn.alt AS mterm
  FROM qt JOIN syn USING (term)
),
gdf AS (
  SELECT m.query_id, m.canon, max(df.df) AS dfb
  FROM members m JOIN df ON df.term = m.mterm
  GROUP BY m.query_id, m.canon
),
blended AS (
  SELECT m.query_id, tf.doc_id, dl.dl, m.canon, sum(tf.tf) AS tfb
  FROM members m
  JOIN tf ON tf.term = m.mterm
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY m.query_id, tf.doc_id, dl.dl, m.canon
),
scored AS (
  SELECT b.query_id, b.doc_id,
         sum(
           ln(1 + (stats.n - g.dfb + 0.5) / (g.dfb + 0.5))
           * b.tfb * ({K1} + 1.0)
           / (b.tfb + {K1} * (1.0 - {B} + {B} * b.dl / stats.avgdl))
         ) AS score_raw
  FROM blended b
  JOIN gdf g ON g.query_id = b.query_id AND g.canon = b.canon
  CROSS JOIN stats
  GROUP BY b.query_id, b.doc_id
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# more-like-this (Lucene MoreLikeThis: seed doc → top tf·idf terms → BM25)


def mlt_topk(docs: DataFrame, seeds: DataFrame, k: int = 10,
             max_terms: int = MLT_MAX_TERMS, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(query_id, rank, doc_id, score) — for each seed doc (``seeds`` is
    a 1-column (doc_id) table), select its ``max_terms`` most
    characteristic terms by round(tf·idf, 6) (term ASC tiebreak — the
    deterministic Lucene MoreLikeThis interestingness order), then run
    ordinary OR-semantics BM25 with those terms, excluding the seed
    itself.  query_id = the seed's doc_id.

    This is the minimal brute-force form; ``query/mlt.py`` is the
    index-backed twin with the full ES parameter surface (multi-source
    queries with summed tf, min_term_freq / min_doc_freq floors,
    dictionary-driven selection, WAND retrieval) — the same pairing as
    bm25_topk vs wand_topk."""
    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)

    seed_ids = seeds.select(F.col(seeds.columns[0]).alias("seed_id"))
    wt = F.round(F.col("tf") * F.col("idf"), SCORE_DECIMALS)
    sel = Window.partitionBy("query_id").orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    qt = (
        tf.join(F.broadcast(seed_ids),
                tf["doc_id"] == seed_ids["seed_id"], "left_semi")
        .join(ts.select("term", "idf"), "term")
        .select(F.col("doc_id").alias("query_id"), "term",
                wt.alias("weight"))
        .withColumn("rn", F.row_number().over(sel))
        .filter(F.col("rn") <= max_terms)
        .select("query_id", "term")
    )
    contrib = bm25_score_col(
        F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl
    )
    scored = (
        tf.join(ts.select("term", "idf"), "term")
        .join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("query_id"))  # exclude the seed
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mlt_topk_sql(table: str, seeds_sql: str, k: int = 10,
                 max_terms: int = MLT_MAX_TERMS, text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    """``seeds_sql`` is a subquery yielding one doc_id column."""
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
seed_terms AS (
  SELECT tf.doc_id AS query_id, tf.term,
         round(tf.tf * ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)),
               {SCORE_DECIMALS}) AS weight
  FROM tf
  JOIN df USING (term)
  CROSS JOIN stats
  WHERE tf.doc_id IN ({seeds_sql})
),
qt AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY weight DESC, term ASC
           ) AS rn
    FROM seed_terms
  ) WHERE rn <= {int(max_terms)}
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS score_raw
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.doc_id <> qt.query_id
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# rescore (Elasticsearch QueryRescorer: second-pass rerank of the top
# primary window with a phrase query, query_weight / rescore_query_weight
# blend — the standard precision pass over a cheap recall pass)


def rescore_topk(
    spark,
    docs: DataFrame,
    queries_values: list[tuple[int, str]],
    positions: DataFrame,
    k: int = 10,
    window_size: int = 30,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 OR-semantics primary pass,
    then the top ``window_size`` docs per query are re-scored as

        final = query_weight · bm25
              + rescore_weight · phrase_score(pf, dl, Σ idf)

    where pf is the exact-adjacency phrase frequency of the WHOLE query
    text (the positions-index kernel) and phrase_score is the standard
    BM25 saturation with tf→pf and idf→the sum of the phrase terms' idfs
    (duplicates counted, df=0 terms falling back to the Lucene
    ln(1+(N+0.5)/0.5)) — Lucene's PhraseQuery scoring shape.  Docs
    outside the primary window can never enter the result (ES rescore
    semantics); a phrase with zero corpus occurrences degrades to pure
    primary order.

    Scale shape: the window is ``|queries| × window_size`` rows (tiny) —
    every rescore join after the primary pass broadcasts or hashes on
    that bounded set; the phrase-frequency decode prunes the positions
    scan to the phrase's terms via the same In() pushdown as
    phrase_topk.  A serving deployment would additionally semi-join the
    window's doc set into the positions decode; at gate scale the
    kernel's matched-docs output is already small."""
    import math

    from instructor_embedding_spark.functions.tokenize import tokens_col
    from instructor_embedding_spark.query.phrase import phrase_topk

    qdf = spark.createDataFrame(
        queries_values, "query_id long, query_text string"
    )
    # the shared scoring base (one definition of the pinned BM25 sum);
    # ts comes back for the idf-sum lookup below
    scored, stats, _, ts = _scored_base(docs, qdf, text_col, id_col)
    # per-doc dl is a plain projection of the tokenizer (no shuffle)
    dls = tokenized(docs, text_col, id_col).select("doc_id", "dl")
    wsel = Window.partitionBy("query_id").orderBy(
        _r6().desc(), F.col("doc_id")
    )
    win = (
        scored.withColumn("rn", F.row_number().over(wsel))
        .filter(F.col("rn") <= window_size)
        .drop("rn")
    )
    pf = (
        phrase_topk(spark, positions, queries_values, k=2 ** 62)
        .filter(F.col("matches") > 0)
        .select(
            F.col("phrase_id").alias("query_id"), "doc_id",
            F.col("matches").alias("pf"),
        )
    )
    idf0 = math.log(1.0 + (float(stats.n_docs) + 0.5) / 0.5)
    qidf = (
        qdf.select(
            "query_id", F.explode(tokens_col("query_text")).alias("term")
        )
        .join(ts.select("term", "idf"), "term", "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("idf"), F.lit(idf0))).alias("idf_sum"))
    )
    phrase_contrib = bm25_score_col(
        F.col("pf"), F.col("dl"), F.col("idf_sum"), stats.avgdl
    )
    final = (
        win.join(pf, ["query_id", "doc_id"], "left")
        .withColumn("pf", F.coalesce(F.col("pf"), F.lit(0).cast("long")))
        .join(dls, "doc_id")
        .join(F.broadcast(qidf), "query_id")
        .withColumn(
            "final_raw",
            F.lit(float(query_weight)) * F.col("score_raw")
            + F.lit(float(rescore_weight)) * phrase_contrib,
        )
    )
    wfin = Window.partitionBy("query_id").orderBy(
        F.round(F.col("final_raw"), SCORE_DECIMALS).desc(), F.col("doc_id")
    )
    return (
        final.withColumn("rank", F.row_number().over(wfin).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round(F.col("final_raw"), SCORE_DECIMALS).alias("score"),
        )
    )


def rescore_topk_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    window_size: int = 30,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`rescore_topk`: phrase
    frequencies from a first-principles list_filter adjacency scan (the
    phrase gate's cross-check), identical blend-op association."""
    from instructor_embedding_spark.functions.tokenize import tokenize_py

    branches = []
    for qid, text in queries_values:
        terms = tokenize_py(text)
        if not terms:
            continue
        m = len(terms)
        cond = " AND ".join(
            f"tokens[i + {j}] = '{terms[j]}'" for j in range(m)
        )
        branches.append(
            f"SELECT {qid} AS query_id, doc_id, "
            f"CAST(len(list_filter(range(1, len(tokens) - {m} + 2), "
            f"i -> {cond})) AS BIGINT) AS pf FROM toks"
        )
    pf_union = " UNION ALL ".join(branches) or (
        "SELECT CAST(NULL AS BIGINT) AS query_id, "
        "CAST(NULL AS BIGINT) AS doc_id, "
        "CAST(NULL AS BIGINT) AS pf WHERE false"
    )
    qw = float(query_weight)
    rw = float(rescore_weight)
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
win AS (
  SELECT query_id, doc_id, score_raw FROM (
    SELECT query_id, doc_id, score_raw,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
           ) AS rn
    FROM scored
  ) WHERE rn <= {int(window_size)}
),
pf AS (SELECT * FROM ({pf_union}) WHERE pf > 0),
qk AS (
  SELECT query_id, unnest({sql_tokens_expr('query_text')}) AS term FROM q
),
qidf AS (
  SELECT qk.query_id,
         sum(CASE WHEN df.df IS NULL
                  THEN ln(1 + (stats.n + 0.5) / 0.5)
                  ELSE ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             END) AS idf_sum
  FROM qk LEFT JOIN df USING (term) CROSS JOIN stats
  GROUP BY qk.query_id
),
final AS (
  SELECT w.query_id, w.doc_id,
         {qw} * w.score_raw
         + {rw} * (qidf.idf_sum
             * (coalesce(pf.pf, 0) * ({K1} + 1.0)
                / (coalesce(pf.pf, 0)
                   + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))))
           AS final_raw
  FROM win w
  LEFT JOIN pf ON pf.query_id = w.query_id AND pf.doc_id = w.doc_id
  JOIN dl ON w.doc_id = dl.doc_id
  JOIN qidf ON qidf.query_id = w.query_id
  CROSS JOIN stats
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(final_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(final_raw, {SCORE_DECIMALS}) AS score
  FROM final
) WHERE rank <= {int(k)}
"""


# ---------------------------------------------------------------------------
# function_score (ES FunctionScoreQuery, field_value_factor: blend a
# stored numeric doc value into the relevance score — the standard
# popularity/recency boost)


FVF_MODIFIERS = ("none", "ln1p", "sqrt")


def function_score_topk(
    docs: DataFrame,
    queries: DataFrame,
    field_col: str,
    factor: float = 1.0,
    modifier: str = "ln1p",
    boost_mode: str = "multiply",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 match set re-scored by a
    field_value_factor function of ``field_col``:

        fv    = modifier(factor · field)     (ln1p → ln(1+x), sqrt, none)
        score = bm25 · fv   (boost_mode=multiply)  or  bm25 + fv  (sum)

    (FunctionScoreQuery + FieldValueFactorFunction; negative inputs to
    ln1p/sqrt raise in ES — here the factor/field fixture is
    non-negative by contract and the twin computes the identical IEEE op
    sequence.)  The attribute join shuffles on doc_id — the key the
    scored aggregate already produced, which AQE coalesces."""
    if modifier not in FVF_MODIFIERS:
        raise ValueError(f"modifier must be one of {FVF_MODIFIERS}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError("boost_mode must be 'multiply' or 'sum'")
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    attrs = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.lit(float(factor)) * F.col(field_col).cast("double"))
        .alias("fx"),
    )
    fv = {
        "none": F.col("fx"),
        "ln1p": F.log(F.lit(1.0) + F.col("fx")),
        "sqrt": F.sqrt(F.col("fx")),
    }[modifier]
    j = scored.join(attrs, "doc_id").withColumn(
        "score_raw",
        F.col("score_raw") * fv if boost_mode == "multiply"
        else F.col("score_raw") + fv,
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def function_score_topk_sql(
    table: str,
    queries_values,
    field_col: str,
    factor: float = 1.0,
    modifier: str = "ln1p",
    boost_mode: str = "multiply",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`function_score_topk`."""
    fx = f"({float(factor)!r} * CAST(d.{field_col} AS DOUBLE))"
    fv = {
        "none": fx,
        "ln1p": f"ln(1.0 + {fx})",
        "sqrt": f"sqrt({fx})",
    }[modifier]
    op = "*" if boost_mode == "multiply" else "+"
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
blended AS (
  SELECT s.query_id, s.doc_id,
         s.score_raw {op} {fv} AS score_raw
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM blended
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# boosting query (ES BoostingQuery: demote — not exclude — docs matching
# a negative query; the soft complement of MUST_NOT)


def boosting_topk(
    docs: DataFrame,
    queries_values: list[tuple[int, str]],
    neg_values: list[tuple[int, str]],
    negative_boost: float = 0.2,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 over the positive query;
    any hit ALSO matching the per-query negative query (OR semantics
    over its terms) keeps ranking but with score · negative_boost
    (Lucene/ES BoostingQuery; 0 < negative_boost < 1 demotes, and a
    negative query matching nothing leaves the ranking untouched).

    The negative probe is one broadcast term join over the tf table —
    the same shape as MUST_NOT's deny probe, but feeding a CASE instead
    of an anti-join."""
    qdf = docs.sparkSession.createDataFrame(
        queries_values, "query_id long, query_text string"
    )
    scored, _, tf, _ = _scored_base(docs, qdf, text_col, id_col)
    neg_qt = query_terms(
        docs.sparkSession.createDataFrame(
            neg_values, "query_id long, query_text string"
        )
    )
    neg_docs = (
        tf.join(F.broadcast(neg_qt), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("neg", F.lit(True))
    )
    j = scored.join(neg_docs, ["query_id", "doc_id"], "left").withColumn(
        "score_raw",
        F.when(
            F.col("neg"),
            F.col("score_raw") * F.lit(float(negative_boost)),
        ).otherwise(F.col("score_raw")),
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def boosting_topk_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    neg_values: list[tuple[int, str]],
    negative_boost: float = 0.2,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`boosting_topk`."""
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
nq(query_id, neg_text) AS (VALUES {_vals(neg_values)}),
nqt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({sql_tokens_expr('neg_text')}) AS term
        FROM nq)
),
negdocs AS (
  SELECT DISTINCT nqt.query_id, tf.doc_id
  FROM nqt JOIN tf USING (term)
),
blended AS (
  SELECT s.query_id, s.doc_id,
         CASE WHEN n.doc_id IS NOT NULL
              THEN s.score_raw * {float(negative_boost)!r}
              ELSE s.score_raw END AS score_raw
  FROM scored s
  LEFT JOIN negdocs n
    ON n.query_id = s.query_id AND n.doc_id = s.doc_id
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM blended
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# decay scoring (ES function_score decay functions: gauss / exp / linear
# over a numeric doc value — the recency/distance relevance shape)


DECAY_KINDS = ("gauss", "exp", "linear")


def decay_score_topk(
    docs: DataFrame,
    queries: DataFrame,
    field_col: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "gauss",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 multiplied by the ES decay
    function of ``field_col`` (DecayFunctionBuilder semantics):

        d      = max(0, |x - origin| - offset)
        gauss  : exp(d² · ln(decay) / scale²)
        exp    : exp(d · ln(decay) / scale)
        linear : max(0, (s - d) / s)  with  s = scale / (1 - decay)

    so a doc AT origin (within offset) keeps its full BM25 score and a
    doc ``scale`` away keeps exactly ``decay`` of it.  Twin computes the
    identical IEEE op sequence; exp/ln differences are sub-ulp, far
    inside the round-6 gate quantum."""
    if kind not in DECAY_KINDS:
        raise ValueError(f"kind must be one of {DECAY_KINDS}")
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    x = F.col(field_col).cast("double")
    d = F.greatest(
        F.lit(0.0), F.abs(x - F.lit(float(origin))) - F.lit(float(offset))
    )
    import math

    ln_decay = math.log(float(decay))
    if kind == "gauss":
        fv = F.exp(d * d * F.lit(ln_decay)
                   / F.lit(float(scale) * float(scale)))
    elif kind == "exp":
        fv = F.exp(d * F.lit(ln_decay) / F.lit(float(scale)))
    else:
        s = float(scale) / (1.0 - float(decay))
        fv = F.greatest(F.lit(0.0), (F.lit(s) - d) / F.lit(s))
    attrs = docs.select(F.col(id_col).alias("doc_id"), fv.alias("fv"))
    j = scored.join(attrs, "doc_id").withColumn(
        "score_raw", F.col("score_raw") * F.col("fv")
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def decay_score_topk_sql(
    table: str,
    queries_values,
    field_col: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "gauss",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`decay_score_topk`."""
    import math

    ln_decay = math.log(float(decay))
    dd = (f"greatest(0.0, abs(CAST(d.{field_col} AS DOUBLE)"
          f" - {float(origin)!r}) - {float(offset)!r})")
    if kind == "gauss":
        fv = (f"exp({dd} * {dd} * {ln_decay!r}"
              f" / {float(scale) * float(scale)!r})")
    elif kind == "exp":
        fv = f"exp({dd} * {ln_decay!r} / {float(scale)!r})"
    else:
        s = float(scale) / (1.0 - float(decay))
        fv = f"greatest(0.0, ({s!r} - {dd}) / {s!r})"
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
blended AS (
  SELECT s.query_id, s.doc_id, s.score_raw * {fv} AS score_raw
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM blended
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# terms_set query (Elasticsearch TermsSetQuery): bool-OR retrieval whose
# minimum_should_match is a PER-DOCUMENT field (ES
# `minimum_should_match_field`), not a query constant — e.g. "match a
# skill list against each candidate's own required-skill count".  The
# distinct-matched-terms count rides the same (query, doc) aggregate the
# score does, so the per-doc floor costs no extra shuffle; the msm
# attribute joins on doc_id, the key the aggregate already produced.
# Strict ES semantics: a doc whose required count exceeds the query's
# term count simply never matches (no clamping).


def terms_set_topk(docs: DataFrame, queries: DataFrame, msm_df: DataFrame,
                   k: int = 10, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25-scored OR retrieval keeping
    only docs whose distinct matched-term count reaches that doc's own
    ``required`` value from ``msm_df`` (doc_id, required)."""
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
        # tf rows are per (doc, term) and qt terms are DISTINCT per
        # query, so count(*) IS the distinct matched-term count
        .agg(F.sum(contrib).alias("score_raw"),
             F.count(F.lit(1)).alias("matched"))
        .join(msm_df.select(F.col(id_col).alias("doc_id"), "required"),
              "doc_id")
        .filter(F.col("matched") >= F.col("required"))
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def terms_set_topk_sql(table: str, queries_values, msm_expr: str,
                       k: int = 10, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin; ``msm_expr`` is a SQL expression over ``{table}``'s
    columns yielding the per-doc required count (the fixture derives it
    from doc_id; a real mapping would read a stored field)."""
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
q(query_id, query_text) AS (VALUES {_vals(queries_values)}),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({sql_tokens_expr('query_text')}) AS term
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
),
kept AS (
  SELECT s.query_id, s.doc_id, s.score_raw
  FROM scored s
  JOIN (SELECT {id_col} AS doc_id, {msm_expr} AS required
        FROM {table}) m ON s.doc_id = m.doc_id
  WHERE s.matched >= m.required
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id
         ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
       ) AS BIGINT) AS rank,
       doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
FROM kept
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# index-sorted early termination (Lucene index sorting + early-terminating
# TopFieldCollector): sort-by-field top-k that SKIPS whole doc blocks whose
# best possible sort value provably cannot reach the top k — the
# field-sort twin of block-max WAND.  Lucene gets this by physically
# sorting segments on the field; the Spark-native equivalent keeps docs
# block-partitioned and stores per-block (min, max) doc-values stats plus
# the per-(term, block) match count the segments already carry
# (`df_block`), then prunes with a guarantee argument instead of a
# physical order:
#
#   block b is prunable for query q  iff  at least k docs matching q are
#   GUARANTEED to sort strictly above everything in b, i.e.
#     S(b) = Σ_{c : fmin(c) > fmax(b)} lb(c)  >=  k
#   where lb(c) = max over q's terms of df_block(c, term) — a true lower
#   bound on distinct matching docs in block c (one term's postings within
#   a block are distinct docs), and fmin/fmax are the block's doc-values
#   range.  Strict inequality keeps ties safe: a tied doc could still beat
#   an incumbent on the doc_id tiebreak, so ties never justify pruning.
#
# S(b) for every candidate block is ONE window sweep per query (events =
# blocks contributing lb at their fmin, probes = blocks tested at their
# fmax; descending value order with probes BEFORE events at equal value
# enforces the strict >), not a range self-join — O(B log B) per query
# over block METADATA only.  Posting bytes are decoded solely for
# surviving blocks, then ranked by the ordinary sort collector; output is
# rank-identical to the unpruned path by construction (property-tested,
# and the driver gate's brute-force SQL oracle is itself the identity
# check when an entry wires this path).


#: sorted_topk_from_index survivor-collect bound: below this many
#: (query, block) survivor rows the set is inlined driver-side and the
#: distinct blocks push into the segment scan; above it the semi-join
#: stays distributed (same results, no driver funnel).
SORTED_ET_COLLECT_CAP = 20_000


def _sorted_block_survivors(
    spark,
    handle,
    queries: DataFrame,
    attrs: DataFrame,
    k: int,
    ascending: bool,
) -> DataFrame:
    """(query_id, doc_block, pruned) — every candidate block for each
    query with its early-termination verdict (pruned = provably outside
    the top k).  Reads only segment metadata columns (term, doc_block,
    df_block) and the per-block doc-values stats derived from ``attrs``
    (at build scale these stats are a stored artifact like block-max
    impacts; deriving them here is one narrow agg over the doc-values
    projection)."""
    from instructor_embedding_spark.query.bm25 import query_terms

    span = handle.params.doc_block_span
    qt = query_terms(queries)
    seg_meta = handle.segments(spark).select("term", "doc_block", "df_block")
    cand = (
        seg_meta.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_block")
        .agg(F.max("df_block").alias("lb"))
    )
    sign = F.lit(-1) if ascending else F.lit(1)
    fb = (
        attrs.select(
            F.floor(F.col("doc_id") / span).cast("long").alias("doc_block"),
            (sign * F.col("sort_key")).cast("double").alias("v"),
        )
        .groupBy("doc_block")
        .agg(
            F.min("v").alias("fmin"), F.max("v").alias("fmax"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .alias("n_null"),
        )
    )
    # Soundness precondition (review finding): lb(c) counts MATCHING
    # docs, so every matching doc must be visible to the block stats —
    # a partial attrs projection or a NULL sort key would let the sweep
    # prune a block whose invisible doc the unpruned sort_over path
    # ranks (NULLS FIRST under asc).  Fail fast instead of silently
    # breaking the rank-identity contract; the totals ride the fb
    # aggregate, so the guard costs one tiny collect over block rows.
    tot = fb.agg(
        F.sum("n_rows").alias("n"), F.sum("n_null").alias("nn")
    ).collect()[0]
    if (tot["n"] or 0) != handle.n_docs or (tot["nn"] or 0) != 0:
        raise ValueError(
            "sorted_topk_from_index requires attrs to cover every doc "
            f"exactly once with a non-NULL sort_key (got {tot['n']} rows"
            f", {tot['nn']} NULLs, index has {handle.n_docs} docs)"
        )
    fb = fb.select("doc_block", "fmin", "fmax")
    # join on doc_block, the key cand already carries; fb is one row per
    # block (10^8 rows at 10^12 docs — AQE picks broadcast only when it
    # actually fits)
    cand = cand.join(fb, "doc_block")
    events = cand.select(
        "query_id", F.col("fmin").alias("val"),
        F.lit(1).alias("kind"), F.col("lb").alias("delta"),
        F.lit(None).cast("long").alias("doc_block"),
    )
    probes = cand.select(
        "query_id", F.col("fmax").alias("val"),
        F.lit(0).alias("kind"), F.lit(0).cast("long").alias("delta"),
        "doc_block",
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("val").desc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.unionByName(probes)
        .withColumn("guaranteed_above", F.sum("delta").over(w))
        .filter(F.col("kind") == 0)
        .select(
            "query_id", "doc_block",
            (F.col("guaranteed_above") >= k).alias("pruned"),
        )
    )


def sorted_topk_from_index(
    spark,
    handle,
    queries: DataFrame,
    attrs: DataFrame,
    k: int = 10,
    ascending: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — sort-by-field top-k served from
    the compressed index with block-level early termination.  ``attrs``
    is the (doc_id, sort_key) doc-values projection.  Rank-identical to
    ``sort_over(scored_matches_from_index(...), attrs, k)``; only the
    set of decoded blocks differs."""
    from instructor_embedding_spark.query.wand import (
        scored_matches_from_index,
    )

    survivors = _sorted_block_survivors(
        spark, handle, queries, attrs, k, ascending
    ).filter(~F.col("pruned")).select("query_id", "doc_block")
    # The survivor set is small by construction (≈ k-reaching blocks per
    # query); collect it once so (a) the decode job doesn't recompute
    # the whole metadata sweep for the semi-join, and (b) the DISTINCT
    # surviving blocks push into the segment scan as an In() predicate —
    # row groups holding only pruned blocks are never read (the
    # doc_block analog of the query-term pushdown).  Past the cap, fall
    # back to the distributed semi-join (still correct, no driver
    # funnel).
    rows = survivors.limit(SORTED_ET_COLLECT_CAP + 1).collect()
    segments = None
    block_filter = survivors
    if len(rows) <= SORTED_ET_COLLECT_CAP:
        block_filter = spark.createDataFrame(
            [(r["query_id"], r["doc_block"]) for r in rows] or
            [(None, None)],
            "query_id long, doc_block long",
        ).filter(F.col("doc_block").isNotNull())
        blocks = sorted({r["doc_block"] for r in rows})
        segments = handle.segments(spark).filter(
            F.col("doc_block").isin(blocks) if blocks else F.lit(False)
        )
    matches = scored_matches_from_index(
        spark, handle, queries, segments=segments,
        block_filter=block_filter,
    )
    return sort_over(matches, attrs, k=k, ascending=ascending)


# ---------------------------------------------------------------------------
# rank_feature query (ES RankFeatureQuery over a rank_feature-mapped
# numeric field): boosts relevance by a BOUNDED monotone function of a
# per-doc feature, ADDED to the BM25 score (the documented bool
# { must: [match], should: [rank_feature] } shape — feature-only docs
# never enter the match set; contrast function_score, whose
# field_value_factor multiplies/adds an UNBOUNDED fv).  Functions:
#
#   saturation: boost · x / (x + pivot)          (default, ≤ boost)
#   log:        boost · ln(scale · x + 1)
#   sigmoid:    boost · x^e / (x^e + pivot^e)    (e pinned to an INTEGER)
#
# Determinism: saturation/sigmoid are one division over doubles both
# engines build identically; sigmoid's x^e expands to repeated
# multiplication (never libm pow, whose last-ulp may differ across
# engines); log reuses the ln both engines already gate in
# function_score.  The attribute join shuffles on doc_id — the key the
# scored aggregate already produced.

RANK_FEATURE_FUNCTIONS = ("saturation", "log", "sigmoid")


def _int_pow(col, e: int):
    out = F.lit(1.0)
    for _ in range(e):
        out = out * col
    return out


def rank_feature_topk(
    docs: DataFrame,
    queries: DataFrame,
    field_col: str,
    function: str = "saturation",
    pivot: float = 100.0,
    boost: float = 1.0,
    scale: float = 1.0,
    exponent: int = 2,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 + the rank_feature
    contribution over the match set."""
    if function not in RANK_FEATURE_FUNCTIONS:
        raise ValueError(
            f"function must be one of {RANK_FEATURE_FUNCTIONS}"
        )
    if function == "sigmoid" and (exponent < 1 or exponent != int(exponent)):
        raise ValueError("sigmoid exponent must be a positive integer")
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    x = F.col(field_col).cast("double")
    if function == "saturation":
        fv = F.lit(float(boost)) * (x / (x + F.lit(float(pivot))))
    elif function == "log":
        fv = F.lit(float(boost)) * F.log(
            F.lit(float(scale)) * x + F.lit(1.0)
        )
    else:
        xe = _int_pow(x, int(exponent))
        pe = float(pivot) ** int(exponent)
        fv = F.lit(float(boost)) * (xe / (xe + F.lit(pe)))
    attrs = docs.select(F.col(id_col).alias("doc_id"), fv.alias("fv"))
    j = scored.join(attrs, "doc_id").withColumn(
        "score_raw", F.col("score_raw") + F.col("fv")
    )
    w = Window.partitionBy("query_id").orderBy(_r6().desc(), F.col("doc_id"))
    return _final(
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rank_feature_topk_sql(
    table: str,
    queries_values,
    field_col: str,
    function: str = "saturation",
    pivot: float = 100.0,
    boost: float = 1.0,
    scale: float = 1.0,
    exponent: int = 2,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`rank_feature_topk`."""
    if function not in RANK_FEATURE_FUNCTIONS:
        raise ValueError(
            f"function must be one of {RANK_FEATURE_FUNCTIONS}"
        )
    x = f"CAST(d.{field_col} AS DOUBLE)"
    if function == "saturation":
        fv = f"{float(boost)!r} * ({x} / ({x} + {float(pivot)!r}))"
    elif function == "log":
        fv = f"{float(boost)!r} * ln({float(scale)!r} * {x} + 1.0)"
    else:
        xe = " * ".join(["1.0"] + [x] * int(exponent))
        pe = float(pivot) ** int(exponent)
        fv = f"{float(boost)!r} * (({xe}) / (({xe}) + {pe!r}))"
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
blended AS (
  SELECT s.query_id, s.doc_id, s.score_raw + {fv} AS score_raw
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, round(score_raw, {SCORE_DECIMALS}) AS score
  FROM blended
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""
