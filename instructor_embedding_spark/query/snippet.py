"""Snippet extraction (best-window highlighting) over the positions index.

The display layer of a fulltext engine: given a query, return for each
matching doc the offset of the w-token window that covers the MOST
distinct query terms (ties → leftmost), so callers can render a
highlighted excerpt without re-tokenizing the document.

Pinned semantics (engine-independent, DuckDB-reproducible):

  covered(doc)       = max over 1-based starts s of
                       |{τ ∈ terms : ∃p ∈ P_τ, p ∈ [s, s+w-1]}|
  snippet_start(doc) = the smallest s attaining that max

ranked per query by covered DESC, doc_id ASC, top-k; docs with no query
term at all never rank.

Kernel: the same interval formulation as unordered proximity
(query/phrase.py _window_cover_count — offset s covers term τ iff
s ∈ ∪_{p∈P_τ}[max(p-w+1, 1), p]) but instead of measuring where coverage
equals n_terms it takes the argmax of the coverage step function: merged
per-term interval runs become ±1 events, one sort + cumsum yields the
coverage after each boundary, and the first boundary attaining the max IS
the leftmost optimal start (coverage only steps up at interval starts, so
the argmax is always an event coordinate — the twin's min-over-all-starts
agrees, property-tested).

Scale shape: identical to phrase/proximity — ``In(term, …)`` pushdown
into the positions scan, broadcast query-term table, per-(query,
doc_block) Arrow groups, one global top-k window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import varint_decode
from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokenize_py,
)

SNIPPET_OUT_SCHEMA = (
    "query_id long, doc_id long, covered long, snippet_start long"
)


def _best_window(pos_lists: list[np.ndarray], w: int) -> tuple[int, int]:
    """(max distinct terms covered by a w-window, leftmost optimal
    1-based start).  Positions arrive sorted per term."""
    starts_parts: list[np.ndarray] = []
    ends_parts: list[np.ndarray] = []
    for pos in pos_lists:
        lo = np.maximum(pos.astype(np.int64) - (w - 1), 1)
        hi = pos.astype(np.int64)
        new_run = np.empty(lo.size, dtype=bool)
        new_run[0] = True
        np.greater(lo[1:], hi[:-1] + 1, out=new_run[1:])
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], lo.size) - 1
        starts_parts.append(lo[run_starts])
        ends_parts.append(hi[run_ends])
    starts = np.concatenate(starts_parts)
    ends = np.concatenate(ends_parts) + 1
    coords = np.concatenate([starts, ends])
    deltas = np.concatenate([
        np.ones(starts.size, dtype=np.int64),
        np.full(ends.size, -1, dtype=np.int64),
    ])
    order = np.argsort(coords, kind="stable")
    coords, deltas = coords[order], deltas[order]
    cover = np.cumsum(deltas)
    # coverage is only well-defined AFTER all events at a coordinate —
    # evaluate at each unique coordinate's last event
    last = np.flatnonzero(np.append(coords[1:] != coords[:-1], True))
    ucoords, ucover = coords[last], cover[last]
    best = int(ucover.max())
    start = int(ucoords[int(np.argmax(ucover == best))])
    return best, start


def _snippet_kernel(term_sets: dict[int, list[str]], w: int):
    """One (query_id, doc_block) group, fully vectorized: the same keyed
    coverage sweep as proximity (query/phrase.py ``_sweep_events``), but
    per doc it takes the max coverage over the unique event coordinates
    and the smallest coordinate attaining it (coordinates ascend within
    a doc, so leftmost == minimum; fuzz-tested against the per-doc
    twin).  Every doc in the group emits (any term present ⇒ coverage
    ≥ 1), matching the per-doc loop."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from instructor_embedding_spark.query.phrase import _sweep_events

        query_id = int(pdf["query_id"].iloc[0])
        sw = _sweep_events(
            pdf.rename(columns={"query_id": "phrase_id"}), w
        )
        if sw is None:  # defensive: groups always carry ≥1 position
            return pd.DataFrame(
                {
                    "query_id": np.empty(0, dtype=np.int64),
                    "doc_id": np.empty(0, dtype=np.int64),
                    "covered": np.empty(0, dtype=np.int64),
                    "snippet_start": np.empty(0, dtype=np.int64),
                }
            )
        keys, deltas, udocs, big = sw
        cover = np.cumsum(deltas)
        # coverage is only well-defined AFTER all events at a coordinate
        last = np.append(keys[1:] != keys[:-1], True)
        ukeys, ucover = keys[last], cover[last]
        udoc = (ukeys // big).astype(np.int64)
        ucoord = ukeys % big
        seg = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
        best = np.maximum.reduceat(ucover, seg)
        best_of = np.repeat(best, np.diff(np.append(seg, udoc.size)))
        cand_coord = np.where(
            ucover == best_of, ucoord, np.iinfo(np.int64).max
        )
        start = np.minimum.reduceat(cand_coord, seg)
        docs_present = udoc[seg]
        return pd.DataFrame(
            {
                "query_id": np.full(
                    docs_present.size, query_id, dtype=np.int64
                ),
                "doc_id": udocs[docs_present],
                "covered": best.astype(np.int64),
                "snippet_start": start.astype(np.int64),
            }
        )

    return kernel


def _snippet_kernel_perdoc(term_sets: dict[int, list[str]], w: int):
    """Reference per-doc implementation (pre-r6 vectorization) — kept as
    the parity twin the vectorized kernel is fuzz-tested against."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = int(pdf["query_id"].iloc[0])
        out_docs: list[int] = []
        out_cov: list[int] = []
        out_start: list[int] = []
        for doc_id, grp in pdf.groupby("doc_id"):
            pos_lists = [
                # stored positions are 0-based deltas; starts are 1-based
                np.cumsum(varint_decode(b), dtype=np.uint64) + np.uint64(1)
                for b in grp["pos_bytes"]
            ]
            cov, start = _best_window(pos_lists, w)
            out_docs.append(int(doc_id))
            out_cov.append(cov)
            out_start.append(start)
        return pd.DataFrame(
            {
                "query_id": np.full(len(out_docs), query_id, dtype=np.int64),
                "doc_id": np.asarray(out_docs, dtype=np.int64),
                "covered": np.asarray(out_cov, dtype=np.int64),
                "snippet_start": np.asarray(out_start, dtype=np.int64),
            }
        )

    return kernel


def snippet_topk(
    spark: SparkSession,
    positions: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 16,
    k: int = 10,
) -> DataFrame:
    """(query_id, rank, doc_id, covered, snippet_start) — for each of the
    top-k docs (most distinct query terms coverable by one ``window``-token
    span, ties → doc_id), the leftmost 1-based token offset of that span."""
    term_sets: dict[int, list[str]] = {}
    for qid, text in queries:
        toks = sorted(set(tokenize_py(text)))
        if toks:
            term_sets[qid] = toks
    if not term_sets:
        return spark.createDataFrame(
            [],
            "query_id long, rank long, doc_id long, covered long, "
            "snippet_start long",
        )
    pairs = [(qid, t) for qid, ts in term_sets.items() for t in ts]
    qt = spark.createDataFrame(pairs, "query_id long, term string")
    all_terms = sorted({t for _, t in pairs})

    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(qt), "term"
    )
    cand = hits.groupBy("query_id", "doc_block").applyInPandas(
        _snippet_kernel(term_sets, window), schema=SNIPPET_OUT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("covered").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "covered", "snippet_start")
    )


def snippet_topk_sql(table: str, queries: list[tuple[int, str]],
                     window: int = 16, k: int = 10, text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """First-principles DuckDB twin: evaluate EVERY candidate start
    (1..len) against the token-array slice, take max coverage and the
    min start attaining it — no interval machinery shared with the
    kernel, so parity cross-checks both."""
    branches = []
    for qid, text in queries:
        terms = sorted(set(tokenize_py(text)))
        if not terms:
            continue
        cov = " + ".join(
            f"(CASE WHEN list_contains(t[i:i + {window - 1}], '{t}') "
            "THEN 1 ELSE 0 END)"
            for t in terms
        )
        branches.append(
            f"SELECT {qid} AS query_id, doc_id, i, "
            f"CAST({cov} AS BIGINT) AS cov FROM starts"
        )
    union = " UNION ALL ".join(branches)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS t FROM {table}
),
starts AS (
  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks
),
covs AS ({union}),
agg AS (
  SELECT query_id, doc_id, max(cov) AS covered
  FROM covs GROUP BY query_id, doc_id
),
st AS (
  SELECT c.query_id, c.doc_id, agg.covered,
         CAST(min(c.i) AS BIGINT) AS snippet_start
  FROM covs c
  JOIN agg ON c.query_id = agg.query_id AND c.doc_id = agg.doc_id
  WHERE c.cov = agg.covered AND agg.covered >= 1
  GROUP BY c.query_id, c.doc_id, agg.covered
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY covered DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, covered, snippet_start
  FROM st
)
SELECT query_id, rank, doc_id, covered, snippet_start
FROM ranked WHERE rank <= {k}
"""
