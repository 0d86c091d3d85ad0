"""Phrase (exact-adjacency) search over a positional side index.

Additive to the BM25 engine: an optional ``positions`` stage stores, per
(doc, term), the varint-delta token positions (doc_block-keyed like the
segments, so term pushdown + document-partitioned grouping both apply).
Phrase top-k then:

1. tokenizes each phrase (driver-side — phrases are tiny)
2. scans ONLY the phrase terms' position rows (``In(term, …)`` pushdown)
3. groups by (phrase_id, doc_block); the kernel intersects position lists
   per doc — a match at position x requires term_i at x+i for all i —
   and emits (phrase_id, doc_id, matches)
4. global window ranks by (matches DESC, doc_id ASC), top-k

Scoring is pinned to occurrence count (exact phrase tf), the natural
rank for adjacency search; the DuckDB oracle recomputes it by scanning
token arrays directly, so the positional path is verified against a
first-principles formulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import varint_decode, varint_encode
from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokenize_py,
)

POSITIONS_SCHEMA = "doc_id long, term string, doc_block long, pos_bytes binary"
PHRASE_OUT_SCHEMA = "phrase_id long, doc_id long, matches long"


def build_positions(docs: DataFrame, span: int,
                    text_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, doc_block, pos_bytes) — one narrow pass."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )

    def gen(batches):
        for pdf in batches:
            ids, terms, blocks, blobs = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                toks = tokenize_py(txt)
                pos: dict[str, list[int]] = {}
                for i, t in enumerate(toks):
                    pos.setdefault(t, []).append(i)
                blk = int(did) // span
                for t, ps in pos.items():
                    arr = np.asarray(ps, dtype=np.uint64)
                    gaps = np.empty_like(arr)
                    gaps[0] = arr[0]
                    np.subtract(arr[1:], arr[:-1], out=gaps[1:])
                    ids.append(did)
                    terms.append(t)
                    blocks.append(blk)
                    blobs.append(varint_encode(gaps))
            yield pd.DataFrame(
                {"doc_id": ids, "term": terms, "doc_block": blocks,
                 "pos_bytes": blobs}
            )

    return src.mapInPandas(gen, schema=POSITIONS_SCHEMA)


def _phrase_kernel(term_orders: dict[int, list[str]]):
    """One (phrase_id, doc_block) group: adjacency-check each doc that has
    every phrase term."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_orders[phrase_id]
        m = len(terms)
        n_distinct = len(set(terms))  # duplicate-term phrases need fewer rows
        out_docs: list[int] = []
        out_matches: list[int] = []
        for doc_id, grp in pdf.groupby("doc_id"):
            if grp["term"].nunique() != n_distinct:
                continue
            pos_by_term = {
                t: np.cumsum(varint_decode(b), dtype=np.uint64)
                for t, b in zip(grp["term"], grp["pos_bytes"])
            }
            starts = pos_by_term[terms[0]]
            for i in range(1, m):
                nxt = pos_by_term[terms[i]]
                starts = starts[
                    np.isin(starts + np.uint64(i), nxt, assume_unique=True)
                ]
                if starts.size == 0:
                    break
            if starts.size:
                out_docs.append(int(doc_id))
                out_matches.append(int(starts.size))
        return pd.DataFrame(
            {
                "phrase_id": np.full(len(out_docs), phrase_id, dtype=np.int64),
                "doc_id": np.asarray(out_docs, dtype=np.int64),
                "matches": np.asarray(out_matches, dtype=np.int64),
            }
        )

    return kernel


def phrase_topk(
    spark: SparkSession,
    positions: DataFrame,
    phrases: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """(phrase_id, rank, doc_id, matches) over a positions table.

    Duplicate-term phrases (e.g. "batch batch") are handled: the kernel
    keys positions by term once and offsets by ordinal."""
    term_orders = {
        pid: tokenize_py(text) for pid, text in phrases
    }
    term_orders = {p: t for p, t in term_orders.items() if t}
    if not term_orders:
        return spark.createDataFrame(
            [], "phrase_id long, rank long, doc_id long, matches long"
        )
    pairs = [
        (pid, t) for pid, terms in term_orders.items() for t in set(terms)
    ]
    pt = spark.createDataFrame(pairs, "phrase_id long, term string")
    all_terms = sorted({t for _, t in pairs})

    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(pt), "term"
    )
    cand = hits.groupBy("phrase_id", "doc_block").applyInPandas(
        _phrase_kernel(term_orders), schema=PHRASE_OUT_SCHEMA
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase_id", "rank", "doc_id", "matches")
    )


def phrase_topk_sql(table: str, phrases: list[tuple[int, str]],
                    k: int = 10, text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """First-principles oracle: count adjacency matches by scanning the
    token array with a list_filter over start positions."""
    branches = []
    for pid, text in phrases:
        terms = tokenize_py(text)
        if not terms:
            continue
        m = len(terms)
        cond = " AND ".join(
            f"t[i + {j}] = '{terms[j]}'" for j in range(m)
        )
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, "
            f"CAST(len(list_filter(range(1, len(t) - {m} + 2), "
            f"i -> {cond})) AS BIGINT) AS matches FROM toks"
        )
    union = " UNION ALL ".join(branches)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS t FROM {table}
),
counts AS ({union}),
ranked AS (
  SELECT phrase_id,
         CAST(row_number() OVER (
           PARTITION BY phrase_id ORDER BY matches DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, matches
  FROM counts WHERE matches > 0
)
SELECT phrase_id, rank, doc_id, matches FROM ranked WHERE rank <= {k}
"""
