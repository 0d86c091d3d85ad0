"""BeIR-shaped dataset source/sink (reference S2/S4/S7).

The reference loads retrieval datasets as ``corpus.jsonl`` /
``queries.jsonl`` / ``qrels/<split>.tsv`` (BeIRTask.py:11-43 — download,
unzip, jsonl+tsv load).  Here the same layout reads/writes through Spark's
native json/csv sources — schema-explicit, splittable, pushdown-capable —
so a user can point the engine at an existing BeIR dataset directory.

Layout written/read:
  <dir>/corpus.jsonl   {"_id": "...", "title": "...", "text": "..."}
  <dir>/queries.jsonl  {"_id": "...", "text": "..."}
  <dir>/qrels.tsv      query-id \t corpus-id \t score   (with header)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)
QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)
QRELS_SCHEMA = T.StructType(
    [
        T.StructField("query-id", T.StringType(), False),
        T.StructField("corpus-id", T.StringType(), False),
        T.StructField("score", T.IntegerType(), True),
    ]
)


def write_beir(docs: DataFrame, queries: DataFrame, qrels: DataFrame,
               out_dir: str) -> None:
    """Engine tables → BeIR layout (ids stringified, title empty)."""
    (
        docs.select(
            F.col("doc_id").cast("string").alias("_id"),
            F.lit("").alias("title"),
            F.col("content").alias("text"),
        ).coalesce(1).write.mode("overwrite").json(f"{out_dir}/corpus.jsonl")
    )
    (
        queries.select(
            F.col("query_id").cast("string").alias("_id"),
            F.col("query_text").alias("text"),
        ).coalesce(1).write.mode("overwrite").json(f"{out_dir}/queries.jsonl")
    )
    (
        qrels.select(
            F.col("query_id").cast("string").alias("query-id"),
            F.col("doc_id").cast("string").alias("corpus-id"),
            F.col("relevance").cast("int").alias("score"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("sep", "\t")
        .csv(f"{out_dir}/qrels.tsv")
    )


def append_qrels(qrels: DataFrame, out_dir: str) -> None:
    """Append-mode qrels sink (S8, reference MTEB.py:287-290 append-opens
    its results file): a later judgment batch lands as ADDITIONAL part
    files in the same ``qrels.tsv`` directory — no rewrite of existing
    parts, so incremental labeling runs are O(new batch).  Each part
    carries its own header; :func:`read_beir` (header=True) skips one
    header line per file, so overwrite-then-append reads back as the
    union of all batches."""
    (
        qrels.select(
            F.col("query_id").cast("string").alias("query-id"),
            F.col("doc_id").cast("string").alias("corpus-id"),
            F.col("relevance").cast("int").alias("score"),
        )
        .coalesce(1)
        .write.mode("append")
        .option("header", True)
        .option("sep", "\t")
        .csv(f"{out_dir}/qrels.tsv")
    )


def read_beir(spark: SparkSession, data_dir: str,
              concat_title: bool = True) -> tuple[
    DataFrame, DataFrame, DataFrame
]:
    """BeIR layout → engine tables (documents, queries, qrels).

    With ``concat_title`` (default) title+text concatenate per the
    reference's corpus encoding (AbsTaskRetrieval.py:718-736:
    ``(title + ' ' + text).strip()``); with ``concat_title=False`` the
    fields stay separate — (doc_id, title, text) — for field-boosted
    retrieval (``bm25_topk_fielded``, D4 v2)."""
    corpus = spark.read.schema(CORPUS_SCHEMA).json(f"{data_dir}/corpus.jsonl")
    queries = spark.read.schema(QUERIES_SCHEMA).json(
        f"{data_dir}/queries.jsonl"
    )
    qrels = (
        spark.read.schema(QRELS_SCHEMA)
        .option("header", True)
        .option("sep", "\t")
        .csv(f"{data_dir}/qrels.tsv")
    )
    if concat_title:
        docs = corpus.select(
            F.col("_id").cast("long").alias("doc_id"),
            F.trim(
                F.concat_ws(" ", F.coalesce(F.col("title"), F.lit("")),
                            F.coalesce(F.col("text"), F.lit("")))
            ).alias("content"),
        )
    else:
        docs = corpus.select(
            F.col("_id").cast("long").alias("doc_id"),
            F.coalesce(F.col("title"), F.lit("")).alias("title"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )
    q = queries.select(
        F.col("_id").cast("long").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    qr = qrels.select(
        F.col("query-id").cast("long").alias("query_id"),
        F.col("corpus-id").cast("long").alias("doc_id"),
        F.col("score").alias("relevance"),
    )
    return docs, q, qr
