"""More-like-this: retrieve documents similar to given SOURCE documents.

The Elasticsearch ``more_like_this`` query (Lucene MoreLikeThis), built on
this engine's dictionary-expansion machinery (query/prefix.py): per query,
the source documents' text is re-analyzed (the same tokenizer the index
used), candidate terms are filtered by ``min_term_freq`` (tf within the
source text) and ``min_doc_freq`` (corpus df from the term dictionary),
scored by tf·idf, and the top ``max_query_terms`` become a disjunctive
BM25 query through the UNCHANGED block-max WAND pipeline (``qt_override``)
— with each query's own source documents excluded from its results (the
ES behavior when liking by document id).

Determinism / divergence discipline: term selection orders by
round(tf·idf, 6) DESC, term ASC on BOTH engines — the same 6-decimal
rounding every retrieval twin applies to scores (bm25.SCORE_DECIMALS), so
a last-ulp ln() difference between the JVM and DuckDB can't reorder the
cut.  tf is summed across a query's source docs (ES analyzes the liked
texts as one bag of words).

Scale shape: the source docs are a handful of rows (an interactive query,
not a corpus sweep) — re-analyzing them is one broadcast semi-join +
tokenize over |likes| rows; candidate filtering runs against term_stats
(the dictionary — one row per distinct term, orders of magnitude smaller
than postings); retrieval is the same pruned WAND path as every other
query.  Exclusion is a per-(query, doc) left-anti join AFTER the top-k
kernel: the kernel fetches k + (max source docs per query) so the final
cut is exact without per-query state inside the kernel.

Relation to ``query/modes.mlt_topk``: the same brute-force/index pairing
as bm25.bm25_topk vs wand.wand_topk — modes.py carries the minimal
brute-force form (single seed doc, query_id = seed id, no floors, gated
in ``search_modes``), this module is the INDEX-BACKED path with the full
ES parameter surface: multiple source docs per query (tf summed across
them, ALL excluded), min_term_freq / min_doc_freq floors, dictionary-
driven selection (term_stats, never a corpus re-scan), and block-max
WAND retrieval.

Reference parity: the reference's nearest analog is embedding-space
nearest-neighbor retrieval (RetrievalEvaluator.py); more-like-this is its
lexical counterpart, part of the fulltext surface (SURVEY.md §2.5 graft
core) alongside prefix/fuzzy/phrase retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import tokens_col
from instructor_embedding_spark.index.build import IndexHandle
from instructor_embedding_spark.query.bm25 import SCORE_DECIMALS
from instructor_embedding_spark.query.prefix import _expansion_bm25_sql

DEFAULT_MAX_QUERY_TERMS = 25   # ES default
DEFAULT_MIN_TERM_FREQ = 1      # ES default is 2; 1 suits short documents
DEFAULT_MIN_DOC_FREQ = 2       # ES default is 5; 2 suits small corpora


def _likes_df(spark: SparkSession,
              likes: list[tuple[int, int]]) -> DataFrame:
    return spark.createDataFrame(likes, "query_id long, like_doc long")


def select_like_terms(
    spark: SparkSession,
    handle: IndexHandle,
    docs: DataFrame,
    likes: list[tuple[int, int]],
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, term): the ES "interesting terms" — top
    ``max_query_terms`` of the source docs' terms by round(tf·idf, 6)
    DESC, term ASC, after the tf/df floors."""
    lk = _likes_df(spark, likes)
    src = docs.select(
        F.col(id_col).alias("like_doc"), F.col(text_col).alias("_text")
    ).join(F.broadcast(lk), "like_doc")
    tf = (
        src.select(
            "query_id", F.explode(tokens_col(F.col("_text"))).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ts = handle.term_stats(spark).select("term", "df", "idf")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sel_score"), F.asc("term")
    )
    return (
        tf.join(ts, "term")
        .filter(
            (F.col("tf") >= min_term_freq) & (F.col("df") >= min_doc_freq)
        )
        .withColumn(
            "sel_score",
            F.round(F.col("tf") * F.col("idf"), SCORE_DECIMALS),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_query_terms)
        .select("query_id", "term")
    )


def mlt_topk(
    spark: SparkSession,
    handle: IndexHandle,
    docs: DataFrame,
    likes: list[tuple[int, int]],
    k: int = 10,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — rank-identical to
    :func:`mlt_topk_sql`; each query's source docs never rank."""
    from instructor_embedding_spark.query.wand import wand_topk

    qt = select_like_terms(
        spark, handle, docs, likes, max_query_terms, min_term_freq,
        min_doc_freq, text_col, id_col,
    )
    # over-fetch by the worst-case number of excludable rows per query,
    # then cut exactly after the anti-join
    per_q: dict[int, int] = {}
    for qid, _d in likes:
        per_q[qid] = per_q.get(qid, 0) + 1
    extra = max(per_q.values()) if per_q else 0
    res = wand_topk(spark, handle, None, k=k + extra, qt_override=qt)
    lk = _likes_df(spark, likes).withColumnRenamed("like_doc", "doc_id")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        res.join(F.broadcast(lk), ["query_id", "doc_id"], "left_anti")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def mlt_topk_sql(
    table: str,
    likes: list[tuple[int, int]],
    k: int = 10,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: same selection rule (tf summed across a query's
    source docs, tf/df floors, round-6 tf·idf cut) over a first-principles
    dictionary, same BM25 body, source docs excluded before ranking."""
    vals = ", ".join(f"({q}, {d})" for q, d in likes)
    ctes = f"""likes(query_id, like_doc) AS (VALUES {vals}),
ltf AS (
  SELECT l.query_id, tf.term, CAST(sum(tf.tf) AS BIGINT) AS tf
  FROM likes l JOIN tf ON tf.doc_id = l.like_doc
  GROUP BY l.query_id, tf.term
),
sel AS (
  SELECT ltf.query_id, ltf.term,
         row_number() OVER (
           PARTITION BY ltf.query_id
           ORDER BY round(
             ltf.tf * ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)),
             {SCORE_DECIMALS}
           ) DESC, ltf.term ASC
         ) AS rn
  FROM ltf JOIN df USING (term) CROSS JOIN stats
  WHERE ltf.tf >= {min_term_freq} AND df.df >= {min_doc_freq}
),
qt AS (SELECT query_id, term FROM sel WHERE rn <= {max_query_terms})"""
    where = (
        "WHERE NOT EXISTS (SELECT 1 FROM likes WHERE"
        " likes.query_id = qt.query_id AND likes.like_doc = tf.doc_id)"
    )
    return _expansion_bm25_sql(table, ctes, k, text_col, id_col,
                               scored_where=where)
