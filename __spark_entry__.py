"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (brute-force BM25 top-k over
the documents table at sf0.001); ``queries()``/``oracle_sql()`` expose every
implemented operator with a DuckDB-checkable twin (CORRECTNESS gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import hashlib
import os

from instructor_embedding_spark.fixtures import DRIVER_QUERY_SET, TOP_K
from instructor_embedding_spark.functions.tokenize import sql_tokens_expr
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query import bm25, wand
from instructor_embedding_spark.shipping import ensure_shipped

SF_SMALL = "/root/testdata/sf0.001"
RUNTIME_DIR = "/root/repo/.runtime"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark, RUNTIME_DIR)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DRIVER_QUERY_SET, "query_id long, query_text string"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 retrieval over sf0.001 documents."""
    return bm25.bm25_topk(
        _docs(spark, SF_SMALL), _queries_df(spark), k=TOP_K, text_col="text"
    )


# ---------------------------------------------------------------- queries

def _q_bm25_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.bm25_topk(
        _docs(spark, sf_dir), _queries_df(spark), k=TOP_K, text_col="text"
    )


def _index_for(spark: SparkSession, sf_dir: str):
    """Build (or reuse via checkpoint manifests) the index for a sf_dir."""
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    idx_dir = os.path.join(RUNTIME_DIR, f"index_{tag}")
    params = IndexParams(
        doc_block_span=1024, n_sub_blocks=8, corpus_fingerprint=sf_dir
    )
    return build_index(
        spark, _docs(spark, sf_dir), idx_dir, params, text_col="text"
    )


def _q_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND over the compressed segmented index; oracle is the
    same brute-force BM25 SQL — the driver check IS the rank-identity
    gate."""
    handle = _index_for(spark, sf_dir)
    return wand.wand_topk(spark, handle, _queries_df(spark), k=TOP_K)


def _q_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = bm25.tokenized(_docs(spark, sf_dir), "text")
    return bm25.tf_table(toks).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = bm25.tokenized(_docs(spark, sf_dir), "text")
    return bm25.doc_stats(toks).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = bm25.tokenized(_docs(spark, sf_dir), "text")
    stats = bm25.corpus_stats(toks)
    tf = bm25.tf_table(toks)
    return bm25.term_stats(tf, stats).select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.round("idf", 6).alias("idf"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_bruteforce": _q_bm25_bruteforce,
        "bm25_topk_wand": _q_bm25_wand,
        "tokenize_tf": _q_tokenize_tf,
        "doc_stats": _q_doc_stats,
        "term_stats": _q_term_stats,
    }


# ------------------------------------------------------------- oracle SQL

_TOKS_CTE = (
    "WITH toks AS (SELECT doc_id, "
    + sql_tokens_expr("text")
    + " AS tokens FROM documents)"
)


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_bruteforce": bm25.bm25_topk_sql(
            "documents", DRIVER_QUERY_SET, k=TOP_K, text_col="text"
        ),
        "bm25_topk_wand": bm25.bm25_topk_sql(
            "documents", DRIVER_QUERY_SET, k=TOP_K, text_col="text"
        ),
        "tokenize_tf": _TOKS_CTE
        + """
, dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks)
SELECT tf.doc_id, tf.term, tf.tf, dl.dl
FROM (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
) tf JOIN dl ON tf.doc_id = dl.doc_id
""",
        "doc_stats": _TOKS_CTE
        + " SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks",
        "term_stats": _TOKS_CTE
        + """
, dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks)
, stats AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dl)
, tf AS (
  SELECT doc_id, term FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       round(ln(1 + ((SELECT n FROM stats) - count(*) + 0.5)
                    / (count(*) + 0.5)), 6) AS idf
FROM tf GROUP BY term
""",
    }
