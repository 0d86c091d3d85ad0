"""Parent/child relational queries: the ES join-field ``has_child`` /
``has_parent`` analogs over a grouped corpus.

The corpus groups by a parent key column (here ``source`` — the repo a
file belongs to, the ES join-field relation).  Two query shapes:

- ``has_child_topk`` — rank PARENTS by their children's BM25 matches
  (ES ``has_child`` with ``score_mode`` max/sum/avg/min and
  ``min_children``).  A parent is returned as its surrogate id: the
  MINIMUM child doc_id in its group (deterministic, join-free to
  recover, and keeps the engine-wide ``(query_id, rank, doc_id,
  score)`` row shape — ES likewise addresses parents by id, not by the
  grouping value).
- ``has_parent_topk`` — rank CHILDREN by their parent's match: the
  parent document of each group is pinned to the min-doc_id child (the
  repo's "README" row), scored against the full corpus like any other
  doc (ES join-field keeps one shared index, so corpus stats are
  global), and every child of a matching parent inherits the parent's
  score (ES ``has_parent`` default ``score=true`` propagation).

Cross-engine float discipline: ``sum``/``avg`` score modes aggregate
the PER-CHILD round-6 scores as exact integers (round(score·10⁶) →
BIGINT sum — the CENTROID_QUANT trick from clustering.py), so the
reduction is order-free in both engines; ``max``/``min`` are order-free
already.  The reported score is derived from the integer afterwards.

Scale shape: the child match set is the shared scored aggregate (one
shuffle on (query_id, doc_id), broadcast query terms); the parent
rollup is ONE further groupBy on (query_id, parent) — map-side
combinable, cardinality ≤ #parents; the surrogate-id table is a tiny
per-parent aggregate that broadcasts.  No new machinery shuffles the
corpus a second time.

Reference parity: the reference has no relational layer (it embeds
flat (query, corpus) pairs — AbsTaskRetrieval.py); parent/child search
is part of this engine's fulltext graft surface like collapse/facets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.query.bm25 import SCORE_DECIMALS
from instructor_embedding_spark.query.modes import (
    _base_ctes,
    _scored_base,
    _scored_ctes,
)

__all__ = [
    "has_child_topk",
    "has_child_topk_sql",
    "has_parent_topk",
    "has_parent_topk_sql",
    "SCORE_MODES",
]

SCORE_MODES = ("max", "sum", "avg", "min")

#: integer quantum for the order-free sum/avg reduction
_Q = 10 ** SCORE_DECIMALS


def _parent_reps(docs: DataFrame, parent_col: str,
                 id_col: str) -> DataFrame:
    """(parent, pid) — the pinned per-group surrogate/representative id."""
    return docs.groupBy(F.col(parent_col).alias("parent")).agg(
        F.min(F.col(id_col)).alias("pid")
    )


def has_child_topk(
    docs: DataFrame,
    queries: DataFrame,
    parent_col: str,
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — top-k PARENTS (doc_id = the
    group's min child id) by their children's matches; rank-identical to
    :func:`has_child_topk_sql`."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    par = docs.select(
        F.col(id_col).alias("doc_id"), F.col(parent_col).alias("parent")
    )
    child_r6 = F.round(F.col("score_raw"), SCORE_DECIMALS)
    iscore = F.round(child_r6 * _Q, 0).cast("long")
    grouped = (
        scored.join(par, "doc_id")
        .groupBy("query_id", "parent")
        .agg(
            F.max(child_r6).alias("mx"),
            F.min(child_r6).alias("mn"),
            F.sum(iscore).alias("isum"),
            F.count(F.lit(1)).alias("n_children"),
        )
        .filter(F.col("n_children") >= min_children)
    )
    score = {
        "max": F.col("mx"),
        "min": F.col("mn"),
        "sum": F.col("isum") / F.lit(float(_Q)),
        "avg": F.col("isum") / (F.col("n_children") * F.lit(float(_Q))),
    }[score_mode]
    ranked = grouped.withColumn(
        "score", F.round(score, SCORE_DECIMALS)
    ).join(F.broadcast(_parent_reps(docs, parent_col, id_col)), "parent")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("pid").asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("pid").alias("doc_id"), "score")
    )


def has_child_topk_sql(
    table: str,
    queries_values,
    parent_col: str,
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    score = {
        "max": "mx",
        "min": "mn",
        "sum": f"isum / {float(_Q)}",
        "avg": f"isum / (n_children * {float(_Q)})",
    }[score_mode]
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
par AS (SELECT {id_col} AS doc_id, {parent_col} AS parent FROM {table}),
reps AS (SELECT parent, min(doc_id) AS pid FROM par GROUP BY parent),
grouped AS (
  SELECT s.query_id, par.parent,
         max(round(s.score_raw, {SCORE_DECIMALS})) AS mx,
         min(round(s.score_raw, {SCORE_DECIMALS})) AS mn,
         sum(CAST(round(round(s.score_raw, {SCORE_DECIMALS}) * {_Q}, 0)
                  AS BIGINT)) AS isum,
         CAST(count(*) AS BIGINT) AS n_children
  FROM scored s JOIN par ON s.doc_id = par.doc_id
  GROUP BY s.query_id, par.parent
  HAVING count(*) >= {min_children}
),
ranked AS (
  SELECT g.query_id,
         CAST(row_number() OVER (
           PARTITION BY g.query_id
           ORDER BY round({score}, {SCORE_DECIMALS}) DESC, reps.pid ASC
         ) AS BIGINT) AS rank,
         reps.pid AS doc_id,
         round({score}, {SCORE_DECIMALS}) AS score
  FROM grouped g JOIN reps ON g.parent = reps.parent
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


def has_parent_topk(
    docs: DataFrame,
    queries: DataFrame,
    parent_col: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — top-k CHILDREN whose parent
    (the group's min-doc_id representative, scored against the full
    corpus) matches the query; every child inherits the parent's score;
    rank-identical to :func:`has_parent_topk_sql`."""
    scored, _, _, _ = _scored_base(docs, queries, text_col, id_col)
    reps = _parent_reps(docs, parent_col, id_col)
    # parent match set: scored rows restricted to representative docs
    pmatch = scored.join(
        F.broadcast(reps.select(F.col("pid").alias("doc_id"), "parent")),
        "doc_id",
    ).select(
        "query_id", "parent",
        F.round(F.col("score_raw"), SCORE_DECIMALS).alias("score"),
    )
    children = docs.select(
        F.col(id_col).alias("doc_id"), F.col(parent_col).alias("parent")
    )
    hits = children.join(F.broadcast(pmatch), "parent")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def has_parent_topk_sql(
    table: str,
    queries_values,
    parent_col: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    return f"""
WITH {_base_ctes(table, text_col, id_col)},
{_scored_ctes(queries_values)},
par AS (SELECT {id_col} AS doc_id, {parent_col} AS parent FROM {table}),
reps AS (SELECT parent, min(doc_id) AS pid FROM par GROUP BY parent),
pmatch AS (
  SELECT s.query_id, reps.parent,
         round(s.score_raw, {SCORE_DECIMALS}) AS score
  FROM scored s JOIN reps ON s.doc_id = reps.pid
),
ranked AS (
  SELECT p.query_id,
         CAST(row_number() OVER (
           PARTITION BY p.query_id
           ORDER BY p.score DESC, c.doc_id ASC
         ) AS BIGINT) AS rank,
         c.doc_id, p.score
  FROM par c JOIN pmatch p ON c.parent = p.parent
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""
