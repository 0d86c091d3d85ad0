"""Multi-index (alias) search: one query set over SEVERAL indexes, the
ES index-alias / cross-index search analog (an alias spanning
`logs-2025-*`, searched as one).  Reference scope note: the reference
evaluates one corpus at a time (AbsTaskRetrieval.py corpus dict); the
multi-index layer is fulltext-graft surface like collapse/facets.

Semantics are ES's default ``query_then_fetch``: each index scores its
own match set with its OWN statistics (local idf / avgdl — per-index
scoring, not global), returns a top-``k`` page, and the coordinator
merges pages by (round-6 score DESC, index name ASC, doc_id ASC) into
the global top-``k``.  The merge is lossless by construction: scores
are unchanged by the union, so the global top-k is a subset of the
union of per-index top-k pages — exactly the shard-merge argument
distributed search engines rely on.  (``dfs_query_then_fetch``'s
global-stats answer over the same docs is, by the same scores-first
construction, the single merged index's result — the engine's ordinary
single-index path already IS that variant.)

Scale shape: per-index retrieval is the existing block-max WAND path
(term In() pushdown per index, O(queries x k) page out); the
coordinator merge is a per-query window over n_indexes x k rows —
never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.query.bm25 import (
    SCORE_DECIMALS,
    bm25_topk_sql,
)
from instructor_embedding_spark.query.wand import wand_topk


def merge_pages(pages: list[tuple[str, DataFrame]], k: int = 10) -> DataFrame:
    """Coordinator merge: ``pages`` is [(index_name, (query_id, rank,
    doc_id, score) page)]; output (query_id, rank, _index, doc_id,
    score) — the global top-``k`` re-ranked across indexes."""
    if not pages:
        raise ValueError("merge_pages needs at least one page")
    parts = [
        p.select("query_id", "doc_id", "score",
                 F.lit(name).alias("_index"))
        for name, p in pages
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("_index").asc(),
        F.col("doc_id").asc(),
    )
    return (
        u.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "_index", "doc_id", "score")
    )


def multi_index_topk(
    spark: SparkSession,
    handles: list[tuple[str, object]],
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Search every named index with the WAND path and coordinator-merge
    the pages.  ``handles`` is [(index_name, IndexHandle)]."""
    pages = [
        (name, wand_topk(spark, h, queries, k=k))
        for name, h in handles
    ]
    return merge_pages(pages, k=k)


def multi_index_topk_sql(
    partitions: list[tuple[str, str]],
    queries_values: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`multi_index_topk`:
    ``partitions`` is [(index_name, table_sql)] — each partition scored
    from first principles with its OWN stats (the local-idf semantics),
    then the same coordinator merge."""
    pages = " UNION ALL ".join(
        "SELECT query_id, doc_id, score, '{}' AS _index FROM ({})".format(
            name.replace("'", "''"),
            bm25_topk_sql(table_sql, queries_values, k=k,
                          text_col=text_col, id_col=id_col),
        )
        for name, table_sql in partitions
    )
    return f"""
WITH u AS ({pages}),
merged AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY score DESC, _index ASC, doc_id ASC
         ) AS BIGINT) AS rank,
         _index, doc_id, score
  FROM u
)
SELECT query_id, rank, _index, doc_id, score FROM merged
WHERE rank <= {int(k)}
"""
