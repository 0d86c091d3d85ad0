"""Score explanation + per-document term vectors — the debug surface.

Two Elasticsearch diagnostic APIs re-expressed for this engine:

- :func:`explain_score` (ES ``_explain`` / Lucene Explanation): for each
  (query, doc) in the top-k, the per-term BM25 breakdown — tf, dl, idf,
  and the term's contribution — whose sum IS the ranked score.  The
  invariant ``round(sum(contribution), 6) == bm25_topk's score`` ties
  this layer to the oracle-gated ranking path (tested), so its
  correctness is inherited from the gate rather than needing a separate
  registry slot.
- :func:`term_vectors` (ES ``_termvectors``): for requested doc_ids, the
  (term, tf, positions) vector under the SAME tokenizer the index uses —
  positions are 0-based token offsets, ascending, so ``size(positions) ==
  tf`` by construction (tested).

Both are interactive APIs over a handful of rows (an explain call is one
query × k docs; a termvectors call is a bounded id list) — the doc-side
joins broadcast the tiny request table, nothing rescans the corpus
beyond the standard tokenize projection.

Reference analog: the reference explains nothing (scores are opaque
model dot-products); these APIs exist because a LEXICAL engine's scores
are decomposable, which is half the operational value of BM25
(SURVEY.md §2.5 graft core, debugging surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokens_col,
)
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


def explain_score(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, term, tf, dl, idf, contribution) for every
    matched query term of every top-k (query, doc) — one row per term,
    ``round(sum(contribution) over (query, doc), 6)`` equals the
    bm25_topk score for that pair (the tested identity)."""
    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)
    qt = query_terms(queries)

    contrib = bm25_score_col(
        F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl
    )
    rows = (
        tf.join(ts.select("term", "idf"), "term")
        .join(F.broadcast(qt), "term")
        .select("query_id", "doc_id", "term", "tf", "dl", "idf",
                contrib.alias("contribution"))
    )
    # rank (query, doc) pairs exactly like bm25_topk, keep top-k pairs
    total = Window.partitionBy("query_id", "doc_id")
    rnk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        rows.withColumn(
            "score",
            F.round(F.sum("contribution").over(total), SCORE_DECIMALS),
        )
        .withColumn("pair_rank", F.dense_rank().over(rnk))
        .filter(F.col("pair_rank") <= k)
        .drop("pair_rank", "score")
    )


def explain_score_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`explain_score` (same breakdown rows)."""
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens
  FROM {table}
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
  SELECT DISTINCT query_id, unnest({sql_tokens_expr('query_text')}) AS term
  FROM q
),
rows_ AS (
  SELECT qt.query_id, tf.doc_id, tf.term, tf.tf, dl.dl,
         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) AS idf,
         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
           AS contribution
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
pairs AS (
  SELECT query_id, doc_id,
         round(sum(contribution), {SCORE_DECIMALS}) AS score
  FROM rows_ GROUP BY query_id, doc_id
),
topk AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id ASC
           ) AS rn
    FROM pairs
  ) WHERE rn <= {k}
)
SELECT r.query_id, r.doc_id, r.term, r.tf, r.dl, r.idf, r.contribution
FROM rows_ r JOIN topk USING (query_id, doc_id)
"""


def term_vectors(
    docs: DataFrame,
    doc_ids: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, tf, positions) for the requested ids — positions
    are ascending 0-based token offsets under the index tokenizer."""
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="int64")})
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("tokens"),
        )
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .select("doc_id", F.posexplode("tokens").alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def term_vectors_sql(
    table: str,
    doc_ids: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`term_vectors`."""
    ids = ", ".join(str(int(d)) for d in doc_ids)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens
  FROM {table} WHERE {id_col} IN ({ids})
),
pos AS (
  -- parallel unnest zips the token list with its offset list
  SELECT doc_id, unnest(tokens) AS term,
         CAST(unnest(range(0, len(tokens))) AS INTEGER) AS pos
  FROM toks
)
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
       list_sort(list(pos)) AS positions
FROM pos GROUP BY doc_id, term
"""
