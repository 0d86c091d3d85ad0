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

from instructor_embedding_spark.functions.codec import (
    varint_decode,
    varint_decode_segmented,
    varint_encode_segmented,
)
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

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "term": pd.Series([], dtype="object"),
            "doc_block": pd.Series([], dtype="int64"),
            "pos_bytes": pd.Series([], dtype="object"),
        }
    )

    def gen(batches):
        # Batch-vectorized grouping (same amortization pattern as the tf
        # kernel, tfcount.py): tokenize the whole batch via the Arrow
        # C++ regex pipeline when it is ASCII (raw_piece_codes; per-doc
        # Python regex otherwise), then one lexsort over the WHOLE Arrow
        # batch groups (doc, term) occurrences with positions ascending
        # — no per-token Python dict ops, no per-doc pandas dispatch.
        # Only the per-group varint encode remains a Python-level loop
        # (one blob per output row).
        from instructor_embedding_spark.functions.tokenize import (
            MIN_TOKEN_LEN,
            _STOPSET,
            raw_piece_codes,
        )

        for pdf in batches:
            n_rows = len(pdf)
            doc_ids_np = pdf["doc_id"].to_numpy(dtype=np.int64)
            enc = raw_piece_codes(pdf["text"])
            if enc is not None:
                rcodes, uniques, rcounts = enc
                keep_u = np.fromiter(
                    (len(u) >= MIN_TOKEN_LEN and u not in _STOPSET
                     for u in uniques),
                    dtype=bool, count=len(uniques),
                )
                keep = keep_u[rcodes] if rcodes.size else np.zeros(
                    0, dtype=bool
                )
                ridx_all = np.repeat(
                    np.arange(n_rows, dtype=np.int64), rcounts
                )
                kept_row = ridx_all[keep]
                codes = rcodes[keep]
                counts = np.bincount(
                    kept_row, minlength=n_rows
                ).astype(np.int64)
                total = int(kept_row.size)
                if total == 0:
                    yield empty
                    continue
                dids = doc_ids_np[kept_row]
                doc_starts = np.zeros(counts.size, dtype=np.int64)
                np.cumsum(counts[:-1], out=doc_starts[1:])
                # kept pieces stay in row-major order, so the position
                # among a doc's RETAINED tokens is the running index
                # minus the doc's start — identical to the tokenize_py
                # path's within-filtered-list index
                pos = (
                    np.arange(total, dtype=np.int64)
                    - doc_starts[kept_row]
                ).astype(np.uint64)
            else:
                toks_per_doc = [tokenize_py(t) for t in pdf["text"]]
                counts = np.fromiter(
                    (len(t) for t in toks_per_doc),
                    dtype=np.int64, count=len(toks_per_doc),
                )
                total = int(counts.sum())
                if total == 0:
                    yield empty
                    continue
                dids = np.repeat(doc_ids_np, counts)
                flat_terms = np.empty(total, dtype=object)
                i = 0
                for toks in toks_per_doc:
                    flat_terms[i:i + len(toks)] = toks
                    i += len(toks)
                doc_starts = np.zeros(counts.size, dtype=np.int64)
                np.cumsum(counts[:-1], out=doc_starts[1:])
                pos = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(doc_starts, counts)
                ).astype(np.uint64)
                codes, uniques = pd.factorize(flat_terms)
            order = np.lexsort((codes, dids))  # stable → pos asc in group
            sd, sc, sp = dids[order], codes[order], pos[order]
            new_grp = np.empty(total, dtype=bool)
            new_grp[0] = True
            new_grp[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
            gstarts = np.flatnonzero(new_grp)
            # batch-wide delta gaps (first of each group stays absolute),
            # then ONE segmented varint pass — no per-group encode calls
            gaps = sp.copy()
            gaps[1:] -= sp[:-1]
            gaps[gstarts] = sp[gstarts]
            blobs = varint_encode_segmented(gaps, gstarts)
            yield pd.DataFrame(
                {
                    "doc_id": sd[gstarts],
                    "term": uniques[sc[gstarts]],
                    "doc_block": sd[gstarts] // span,
                    "pos_bytes": blobs,
                }
            )

    return src.mapInPandas(gen, schema=POSITIONS_SCHEMA)


_EMPTY_PHRASE = pd.DataFrame(
    {
        "phrase_id": pd.Series([], dtype="int64"),
        "doc_id": pd.Series([], dtype="int64"),
        "matches": pd.Series([], dtype="int64"),
    }
)


def _conjunctive_block_prune(hits: DataFrame, need: dict[int, int],
                             enabled: bool = False) -> DataFrame:
    """Drop (phrase_id, doc_block) groups that do not contain EVERY
    distinct query term of the phrase BEFORE the kernel shuffle — the
    pre-exchange escalation of the in-kernel block skip (which mirrors
    WAND's ``require_all`` check and always runs): a doc's position rows
    all share its doc_block, so a block missing a term cannot hold a
    conjunctive match, and with the prune its pos_bytes never even
    shuffle into the Arrow kernel.

    The survivor set is computed from a second, narrow scan of the same
    term-pruned positions (term + doc_block only — column pruning keeps
    pos_bytes out of it) and broadcast back as a semi-join, so the heavy
    rows still shuffle exactly once.  Pure prune: result-identical by
    construction (the kernels also require all terms per doc).  Queries
    whose distinct-term count is 1 are left alone (every block with the
    term survives — the aggregation would be pure overhead).

    OFF by default: the two extra narrow jobs per query batch cost more
    than they save until the corpus is large enough that shuffling
    non-conjunctive blocks' pos_bytes dominates (measured +1.4 s on the
    5-block sf0.1 fixture where nothing is prunable, see
    OPTIMIZATION_r06.md; ``conjunctive_skip_stats`` reports what a
    corpus would prune — enable ``block_prune`` when
    blocks_conjunctive << blocks_with_any_term)."""
    if not enabled or not any(n >= 2 for n in need.values()):
        return hits
    spark = hits.sparkSession
    need_df = spark.createDataFrame(
        [(int(p), int(n)) for p, n in need.items()],
        "phrase_id long, n_need long",
    )
    ok = (
        hits.groupBy("phrase_id", "doc_block")
        .agg(F.count_distinct("term").alias("n_present"))
        .join(F.broadcast(need_df), "phrase_id")
        .filter(F.col("n_present") >= F.col("n_need"))
        .select("phrase_id", "doc_block")
    )
    return hits.join(F.broadcast(ok), ["phrase_id", "doc_block"],
                     "left_semi")


def conjunctive_skip_stats(
    positions: DataFrame,
    phrases: list[tuple[int, str]],
) -> DataFrame:
    """(phrase_id, blocks_with_any_term, blocks_conjunctive) — the
    observability surface for the block prune (the positions-family
    twin of ``wand_scan_stats``): ``blocks_with_any_term`` is what the
    r5 pipeline shipped to the kernel, ``blocks_conjunctive`` is what
    ships after the prune."""
    term_orders = {pid: tokenize_py(text) for pid, text in phrases}
    term_orders = {p: t for p, t in term_orders.items() if t}
    pairs = [
        (pid, t) for pid, terms in term_orders.items() for t in set(terms)
    ]
    spark = positions.sparkSession
    pt = spark.createDataFrame(pairs, "phrase_id long, term string")
    need = {p: len(set(t)) for p, t in term_orders.items()}
    need_df = spark.createDataFrame(
        [(int(p), int(n)) for p, n in need.items()],
        "phrase_id long, n_need long",
    )
    all_terms = sorted({t for _, t in pairs})
    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(pt), "term"
    )
    per_block = hits.groupBy("phrase_id", "doc_block").agg(
        F.count_distinct("term").alias("n_present")
    )
    return (
        per_block.join(F.broadcast(need_df), "phrase_id")
        .groupBy("phrase_id")
        .agg(
            F.count(F.lit(1)).alias("blocks_with_any_term"),
            F.sum(
                (F.col("n_present") >= F.col("n_need")).cast("long")
            ).alias("blocks_conjunctive"),
        )
    )


def _decode_group_positions(pdf: pd.DataFrame):
    """Decode EVERY row's pos_bytes of one kernel group in one segmented
    pass (guide §4.2 — the per-(doc, term) ``varint_decode`` calls and
    the per-doc ``pandas.groupby`` dispatch were the positions family's
    dominant cost; all six kernels are batch-vectorized over the whole
    group with numpy set/sweep operations instead).

    Returns ``(pos, starts, counts, udocs, dcode)``: ``pos`` uint64
    positions (0-based, cumsummed within each row's delta-gapped blob),
    row ``i``'s slice is ``pos[starts[i]:starts[i+1]]``; ``udocs`` the
    sorted distinct doc_ids, ``dcode`` each row's index into it."""
    vals, starts = varint_decode_segmented(list(pdf["pos_bytes"]))
    counts = np.diff(starts)
    if vals.size:
        g = np.cumsum(vals, dtype=np.uint64)
        nz = counts > 0
        base = np.zeros(counts.size, dtype=np.uint64)
        first_idx = starts[:-1][nz]
        base[nz] = g[first_idx] - vals[first_idx]
        pos = g - np.repeat(base, counts)
    else:
        pos = vals
    dids = pdf["doc_id"].to_numpy(dtype=np.int64)
    udocs, dcode = np.unique(dids, return_inverse=True)
    return pos, starts, counts, udocs, dcode


def _phrase_kernel(term_orders: dict[int, list[str]]):
    """One (phrase_id, doc_block) group, fully vectorized: phrase-start
    candidates live in a combined (doc, position) keyspace — ordinal i of
    the phrase contributes the key set {doc·L + p − i : p ∈ P(doc, tᵢ),
    p ≥ i} — and the adjacency matches per doc are exactly the m-way
    sorted-set intersection of those key sets (per-doc result identical
    to the per-doc isin loop, fuzz-tested against it).  A doc missing
    any term contributes nothing to that term's key set, so the old
    per-doc require-all check falls out of the intersection."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_orders[phrase_id]
        m = len(terms)
        n_distinct = len(set(terms))
        if pdf["term"].nunique() < n_distinct:
            return _EMPTY_PHRASE  # block-level require-all (free skip)
        pos, starts, counts, udocs, dcode = _decode_group_positions(pdf)
        tvals = pdf["term"].to_numpy()
        val_doc = np.repeat(dcode.astype(np.uint64), counts)
        val_term = np.repeat(tvals, counts)
        big = np.uint64(int(pos.max()) + m + 2) if pos.size else np.uint64(
            m + 2
        )
        inter = None
        for i, t in enumerate(terms):
            sel = val_term == t
            p = pos[sel]
            d = val_doc[sel]
            ok = p >= np.uint64(i)  # a phrase cannot start before token 0
            keys = np.sort(d[ok] * big + (p[ok] - np.uint64(i)))
            inter = keys if inter is None else np.intersect1d(
                inter, keys, assume_unique=True
            )
            if inter.size == 0:
                return _EMPTY_PHRASE
        mdoc = (inter // big).astype(np.int64)
        cnt = np.bincount(mdoc, minlength=udocs.size)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame(
            {
                "phrase_id": np.full(nz.size, phrase_id, dtype=np.int64),
                "doc_id": udocs[nz],
                "matches": cnt[nz].astype(np.int64),
            }
        )

    return kernel


def _phrase_kernel_perdoc(term_orders: dict[int, list[str]]):
    """Reference per-doc implementation (pre-r6 vectorization) — kept as
    the parity twin the vectorized kernel is fuzz-tested against."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_orders[phrase_id]
        m = len(terms)
        n_distinct = len(set(terms))  # duplicate-term phrases need fewer rows
        if pdf["term"].nunique() < n_distinct:
            # block-level require-all: a term missing from the whole
            # block (possible when the pre-shuffle prune is bypassed by
            # a direct kernel caller) rules out every doc without the
            # per-doc groupby dispatch
            return _EMPTY_PHRASE
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
    block_prune: bool = False,
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
    hits = _conjunctive_block_prune(
        hits, {p: len(set(t)) for p, t in term_orders.items()},
        enabled=block_prune,
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


# ------------------------------------------------------------- proximity

def _window_cover_count(pos_lists: list[np.ndarray], w: int) -> int:
    """Number of 1-based window offsets i whose w-token window [i, i+w-1]
    contains at least one position of EVERY term.

    Interval formulation (doc-length-free): offset i qualifies for term τ
    iff some position p ∈ P_τ lies in [i, i+w-1], i.e. i ∈ [p-w+1, p];
    the answer is |∩_τ ∪_{p∈P_τ} [max(p-w+1, 1), p]|.  Fully vectorized
    (stopword-dense terms carry thousands of positions per doc): per
    term the intervals share length w and positions arrive sorted, so
    both lo and hi are ascending and the union-merge is a single mask
    (``lo[1:] > hi[:-1] + 1`` marks merged-run starts, the run's end is
    its LAST hi because hi ascends); the cross-term intersection is a
    sweep over the np.sort-ed merged boundaries counting coverage ==
    n_terms.  O(Σ|P_τ| log) per doc, no materialized window range."""
    n_terms = len(pos_lists)
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
    # span covered by all terms = gap to the NEXT boundary wherever the
    # running coverage (after this event) equals n_terms
    full = cover[:-1] == n_terms
    return int(np.sum((coords[1:] - coords[:-1])[full]))


def _sweep_events(pdf: pd.DataFrame, w: int):
    """Shared proximity/snippet machinery, vectorized over the whole
    group: per-(doc, term) positions become length-w candidate-start
    intervals [max(p−w+1, 1), p] (1-based), adjacent/overlapping runs
    merge within each row (positions ascend, so a single shifted
    comparison finds run starts), and the merged runs become ±1 coverage
    events in a combined doc·L + coordinate keyspace.  One stable sort
    of the events replaces the per-doc sort loop; a doc's events net to
    zero before the next doc's base key, so the global cumsum needs no
    per-doc reset.  Returns ``(keys, deltas, udocs, big)`` sorted by
    key, or None for an all-empty group."""
    pos, starts, counts, udocs, dcode = _decode_group_positions(pdf)
    p1 = pos.astype(np.int64) + 1
    n = p1.size
    if n == 0:
        return None
    lo = np.maximum(p1 - (w - 1), 1)
    hi = p1
    new_run = np.zeros(n, dtype=bool)
    nzrows = counts > 0
    new_run[starts[:-1][nzrows]] = True
    new_run[1:] |= lo[1:] > hi[:-1] + 1
    new_run[0] = True
    rs = np.flatnonzero(new_run)
    re = np.append(rs[1:], n) - 1
    run_doc = np.repeat(dcode, counts)[rs].astype(np.int64)
    big = np.int64(int(hi.max()) + w + 4)
    keys = np.concatenate(
        [run_doc * big + lo[rs], run_doc * big + hi[re] + 1]
    )
    deltas = np.concatenate(
        [
            np.ones(rs.size, dtype=np.int64),
            np.full(rs.size, -1, dtype=np.int64),
        ]
    )
    order = np.argsort(keys, kind="stable")
    return keys[order], deltas[order], udocs, big


def _proximity_kernel(term_sets: dict[int, list[str]], slops: dict[int, int]):
    """One (phrase_id, doc_block) group, fully vectorized: the matches
    per doc are the total length of coordinate stretches whose event
    coverage equals the distinct-term count (identical semantics to the
    per-doc interval sweep, fuzz-tested against it).  Docs missing a
    term can never reach full coverage, so the per-doc require-all check
    is implicit."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_sets[phrase_id]
        w = len(terms) + slops[phrase_id]
        if pdf["term"].nunique() < len(terms):
            return _EMPTY_PHRASE  # block-level require-all (free skip)
        sw = _sweep_events(pdf, w)
        if sw is None:
            return _EMPTY_PHRASE
        keys, deltas, udocs, big = sw
        cover = np.cumsum(deltas)
        full = cover[:-1] == len(terms)
        if not full.any():
            return _EMPTY_PHRASE
        gaps = (keys[1:] - keys[:-1])[full]
        docs = (keys[:-1][full] // big).astype(np.int64)
        per_doc = np.bincount(
            docs, weights=gaps, minlength=udocs.size
        ).astype(np.int64)
        nz = np.flatnonzero(per_doc)
        return pd.DataFrame(
            {
                "phrase_id": np.full(nz.size, phrase_id, dtype=np.int64),
                "doc_id": udocs[nz],
                "matches": per_doc[nz],
            }
        )

    return kernel


def _proximity_kernel_perdoc(
    term_sets: dict[int, list[str]], slops: dict[int, int]
):
    """Reference per-doc implementation (pre-r6 vectorization) — kept as
    the parity twin the vectorized kernel is fuzz-tested against."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_sets[phrase_id]
        w = len(terms) + slops[phrase_id]
        if pdf["term"].nunique() < len(terms):
            return _EMPTY_PHRASE  # block-level require-all (see phrase)
        out_docs: list[int] = []
        out_matches: list[int] = []
        for doc_id, grp in pdf.groupby("doc_id"):
            if grp["term"].nunique() != len(terms):
                continue
            pos_lists = [
                # +1: stored positions are 0-based deltas; the window
                # offset space (and the SQL twin) is 1-based
                np.cumsum(varint_decode(b), dtype=np.uint64) + np.uint64(1)
                for b in grp["pos_bytes"]
            ]
            m = _window_cover_count(pos_lists, w)
            if m:
                out_docs.append(int(doc_id))
                out_matches.append(m)
        return pd.DataFrame(
            {
                "phrase_id": np.full(len(out_docs), phrase_id, dtype=np.int64),
                "doc_id": np.asarray(out_docs, dtype=np.int64),
                "matches": np.asarray(out_matches, dtype=np.int64),
            }
        )

    return kernel


def proximity_topk(
    spark: SparkSession,
    positions: DataFrame,
    queries: list[tuple[int, str]],
    slop: int = 2,
    k: int = 10,
    block_prune: bool = False,
) -> DataFrame:
    """(phrase_id, rank, doc_id, matches) — unordered NEAR-with-slop over
    the same positions table phrase search uses.

    A doc matches when all of the query's DISTINCT terms co-occur inside
    a sliding window of ``len(distinct terms) + slop`` tokens, in any
    order; ``matches`` counts the qualifying 1-based window offsets (the
    proximity analog of phrase tf — more/denser co-occurrences rank
    higher).  slop=0 degenerates to any-order adjacency, so every exact
    phrase occurrence is also a proximity match (property-tested).
    Duplicate query tokens collapse: containment cannot require two
    distinct positions of the same term (and neither can the
    ``list_has_all`` oracle), so "new new york" ≡ "new york".

    Scale shape is identical to :func:`phrase_topk` — ``In(term, …)``
    pushdown to the positions scan, broadcast of the tiny query-term
    table, per-(query, doc_block) Arrow groups, one global top-k window.

    Reference parity: the reference has no positional index at all (its
    retrieval is dense-vector only); proximity search is part of this
    engine's fulltext surface alongside phrase adjacency."""
    term_sets: dict[int, list[str]] = {}
    slops: dict[int, int] = {}
    for pid, text in queries:
        toks = sorted(set(tokenize_py(text)))
        if toks:
            term_sets[pid] = toks
            slops[pid] = slop
    if not term_sets:
        return spark.createDataFrame(
            [], "phrase_id long, rank long, doc_id long, matches long"
        )
    pairs = [(pid, t) for pid, ts in term_sets.items() for t in ts]
    pt = spark.createDataFrame(pairs, "phrase_id long, term string")
    all_terms = sorted({t for _, t in pairs})

    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(pt), "term"
    )
    hits = _conjunctive_block_prune(
        hits, {p: len(t) for p, t in term_sets.items()},
        enabled=block_prune,
    )
    cand = hits.groupBy("phrase_id", "doc_block").applyInPandas(
        _proximity_kernel(term_sets, slops), schema=PHRASE_OUT_SCHEMA
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase_id", "rank", "doc_id", "matches")
    )


def proximity_topk_sql(table: str, queries: list[tuple[int, str]],
                       slop: int = 2, k: int = 10, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """First-principles oracle: count 1-based window offsets whose
    ``len(distinct terms) + slop`` token slice contains every term
    (``list_has_all`` over an end-clipped list slice — the same
    clamp-at-the-edges semantics as the interval kernel)."""
    branches = []
    for pid, text in queries:
        terms = sorted(set(tokenize_py(text)))
        if not terms:
            continue
        w = len(terms) + slop
        lits = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, "
            f"CAST(len(list_filter(range(1, len(t) + 1), "
            f"i -> list_has_all(t[i:i + {w - 1}], {lits}))) AS BIGINT) "
            f"AS matches FROM toks"
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


# ----------------------------------------------------- ordered proximity

def _ordered_chain_count(pos_lists: list[np.ndarray], w: int) -> int:
    """Number of positions i of term 0 from which an in-order chain
    i < j_2 < … < j_m ≤ i + w - 1 exists (j_r a position of term r).

    Greedy minimal chain: at each step take the FIRST position of the
    next term strictly greater than the current one (np.searchsorted
    side='right').  Greedy minimizes the chain's endpoint, so it
    succeeds iff any chain exists.  Duplicate terms need no special
    case — the strict > walks to the next occurrence of the same term.
    Vectorized over all starts at once."""
    starts = pos_lists[0].astype(np.int64)
    cur = starts
    alive = np.ones(starts.size, dtype=bool)
    for nxt in pos_lists[1:]:
        nxt = nxt.astype(np.int64)
        idx = np.searchsorted(nxt, cur, side="right")
        ok = idx < nxt.size
        alive &= ok
        cur = np.where(ok, nxt[np.minimum(idx, nxt.size - 1)], cur)
    return int(np.sum(alive & (cur <= starts + (w - 1))))


def _ordered_proximity_kernel(term_orders: dict[int, list[str]],
                              slops: dict[int, int]):
    """One (phrase_id, doc_block) group, fully vectorized: every chain
    start across every doc advances through the greedy
    first-strictly-greater walk SIMULTANEOUSLY — one keyed
    (doc·L + position) searchsorted per remaining term replaces the
    per-doc loop (the walk stays inside its doc because a hit in a
    different doc fails the same-doc check, exactly like running out of
    positions; fuzz-tested against the per-doc twin)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_orders[phrase_id]
        w = len(terms) + slops[phrase_id]
        n_distinct = len(set(terms))
        if pdf["term"].nunique() < n_distinct:
            return _EMPTY_PHRASE  # block-level require-all (free skip)
        pos, starts, counts, udocs, dcode = _decode_group_positions(pdf)
        p1 = pos.astype(np.int64) + 1
        tvals = pdf["term"].to_numpy()
        val_doc = np.repeat(dcode, counts).astype(np.int64)
        val_term = np.repeat(tvals, counts)
        maxp = int(p1.max()) if p1.size else 1
        big = np.int64(maxp + w + 2)
        keyed = {}
        for t in set(terms):
            sel = val_term == t
            keyed[t] = np.sort(val_doc[sel] * big + p1[sel])
        skeys = keyed[terms[0]]
        sdoc = skeys // big
        cur = skeys.copy()
        alive = np.ones(skeys.size, dtype=bool)
        for t in terms[1:]:
            arr = keyed[t]
            if arr.size == 0:
                return _EMPTY_PHRASE
            idx = np.searchsorted(arr, cur, side="right")
            ok = idx < arr.size
            nxt = arr[np.minimum(idx, arr.size - 1)]
            ok &= (nxt // big) == sdoc
            alive &= ok
            cur = np.where(ok, nxt, cur)
            if not alive.any():
                return _EMPTY_PHRASE
        alive &= (cur % big) <= (skeys % big) + (w - 1)
        per_doc = np.bincount(
            sdoc[alive].astype(np.int64), minlength=udocs.size
        )
        nz = np.flatnonzero(per_doc)
        return pd.DataFrame(
            {
                "phrase_id": np.full(nz.size, phrase_id, dtype=np.int64),
                "doc_id": udocs[nz],
                "matches": per_doc[nz].astype(np.int64),
            }
        )

    return kernel


def _ordered_proximity_kernel_perdoc(term_orders: dict[int, list[str]],
                                     slops: dict[int, int]):
    """Reference per-doc implementation (pre-r6 vectorization) — kept as
    the parity twin the vectorized kernel is fuzz-tested against."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        terms = term_orders[phrase_id]
        w = len(terms) + slops[phrase_id]
        n_distinct = len(set(terms))
        if pdf["term"].nunique() < n_distinct:
            return _EMPTY_PHRASE  # block-level require-all (see phrase)
        out_docs: list[int] = []
        out_matches: list[int] = []
        for doc_id, grp in pdf.groupby("doc_id"):
            if grp["term"].nunique() != n_distinct:
                continue
            pos_by_term = {
                t: (np.cumsum(varint_decode(b), dtype=np.uint64)
                    + np.uint64(1))
                for t, b in zip(grp["term"], grp["pos_bytes"])
            }
            m = _ordered_chain_count(
                [pos_by_term[t] for t in terms], w
            )
            if m:
                out_docs.append(int(doc_id))
                out_matches.append(m)
        return pd.DataFrame(
            {
                "phrase_id": np.full(len(out_docs), phrase_id, dtype=np.int64),
                "doc_id": np.asarray(out_docs, dtype=np.int64),
                "matches": np.asarray(out_matches, dtype=np.int64),
            }
        )

    return kernel


def ordered_proximity_topk(
    spark: SparkSession,
    positions: DataFrame,
    queries: list[tuple[int, str]],
    slop: int = 2,
    k: int = 10,
    block_prune: bool = False,
) -> DataFrame:
    """(phrase_id, rank, doc_id, matches) — in-order NEAR with slop.

    ``matches`` counts positions of the FIRST query term from which all
    remaining terms occur IN ORDER inside the ``len(terms) + slop``
    token window (term list keeps duplicates — "batch batch" needs two
    distinct positions, unlike the unordered operator).  slop=0 pins
    every chain step to adjacency, so it coincides exactly with
    :func:`phrase_topk`'s occurrence count — the two independent
    kernels cross-check each other (invariant-tested).

    Same scale shape as phrase/proximity: term ``In()`` pushdown,
    broadcast term table, per-(query, doc_block) Arrow groups, one
    WindowGroupLimit top-k."""
    term_orders = {pid: tokenize_py(text) for pid, text in queries}
    term_orders = {p: t for p, t in term_orders.items() if t}
    slops = {p: slop for p in term_orders}
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
    hits = _conjunctive_block_prune(
        hits, {p: len(set(t)) for p, t in term_orders.items()},
        enabled=block_prune,
    )
    cand = hits.groupBy("phrase_id", "doc_block").applyInPandas(
        _ordered_proximity_kernel(term_orders, slops),
        schema=PHRASE_OUT_SCHEMA,
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase_id", "rank", "doc_id", "matches")
    )


def ordered_proximity_topk_sql(table: str, queries: list[tuple[int, str]],
                               slop: int = 2, k: int = 10,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    """First-principles oracle: a nested list_filter chain — v1 runs over
    all token positions, each deeper level seeks its term strictly after
    the previous one and at most ``v1 + w - 1`` (existence, matching the
    greedy kernel exactly)."""
    branches = []
    for pid, text in queries:
        terms = tokenize_py(text)
        if not terms:
            continue
        m = len(terms)
        w = m + slop
        # innermost-out: exists v_m … exists v_2, anchored at v1
        expr = None
        for r in range(m - 1, 0, -1):
            prev = f"v{r}"
            var = f"v{r + 1}"
            cond = f"{var} <= len(t) AND t[{var}] = '{terms[r]}'"
            if expr is not None:
                cond += f" AND {expr}"
            expr = (f"len(list_filter(range({prev} + 1, v1 + {w}), "
                    f"{var} -> {cond})) > 0")
        head = f"t[v1] = '{terms[0]}'"
        if expr is not None:
            head += f" AND {expr}"
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, "
            f"CAST(len(list_filter(range(1, len(t) + 1), "
            f"v1 -> {head})) AS BIGINT) AS matches FROM toks"
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


# ------------------------------------------------------------ span_first


def _span_first_kernel(ends: dict[int, int]):
    """One (phrase_id, doc_block) group, fully vectorized: one segmented
    decode + one per-row prefix-count via ``add.reduceat`` (identical to
    the per-doc loop, fuzz-tested against it)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        end = np.uint64(ends[phrase_id])
        pos, starts, counts, udocs, dcode = _decode_group_positions(pdf)
        hit = ((pos + np.uint64(1)) <= end).astype(np.int64)
        m = np.zeros(len(pdf), dtype=np.int64)
        nz = counts > 0
        if hit.size:
            m[nz] = np.add.reduceat(hit, starts[:-1][nz])
        per_doc = np.zeros(udocs.size, dtype=np.int64)
        np.add.at(per_doc, dcode, m)
        k = np.flatnonzero(per_doc)
        return pd.DataFrame(
            {
                "phrase_id": np.full(k.size, phrase_id, dtype=np.int64),
                "doc_id": udocs[k],
                "matches": per_doc[k],
            }
        )

    return kernel


def _span_first_kernel_perdoc(ends: dict[int, int]):
    """Reference per-doc implementation (pre-r6 vectorization) — kept as
    the parity twin the vectorized kernel is fuzz-tested against."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        end = np.uint64(ends[phrase_id])
        out_docs: list[int] = []
        out_matches: list[int] = []
        for doc_id, grp in pdf.groupby("doc_id"):
            pos = (
                np.cumsum(varint_decode(grp["pos_bytes"].iloc[0]),
                          dtype=np.uint64)
                + np.uint64(1)
            )
            m = int((pos <= end).sum())
            if m:
                out_docs.append(int(doc_id))
                out_matches.append(m)
        return pd.DataFrame(
            {
                "phrase_id": np.full(len(out_docs), phrase_id,
                                     dtype=np.int64),
                "doc_id": np.asarray(out_docs, dtype=np.int64),
                "matches": np.asarray(out_matches, dtype=np.int64),
            }
        )

    return kernel


def span_first_topk(
    spark: SparkSession,
    positions: DataFrame,
    queries: list[tuple[int, str, int]],
    k: int = 10,
) -> DataFrame:
    """(phrase_id, rank, doc_id, matches) — Lucene SpanFirstQuery: docs
    where ``term`` occurs within the FIRST ``end`` tokens; ``matches``
    counts the qualifying occurrences (position <= end, 1-based).  The
    query text tokenizes to its first term (multi-token inputs reject —
    SpanFirstQuery wraps a single span here).

    Same scale shape as :func:`phrase_topk`: ``In(term, …)`` pushdown
    into the positions scan, broadcast query-term join, per-(query,
    doc_block) Arrow groups, one global top-k window."""
    terms: dict[int, str] = {}
    ends: dict[int, int] = {}
    for pid, text, end in queries:
        if int(end) < 1:
            # the kernel casts end through uint64 — a negative value
            # would wrap to 2^64-1 and match everything while the SQL
            # twin matches nothing
            raise ValueError(
                f"span_first end must be >= 1 (got {end} for query {pid})"
            )
        toks = tokenize_py(text)
        if len(toks) > 1:
            raise ValueError(
                f"span_first wraps a single term (got {toks!r} for "
                f"query {pid})"
            )
        if toks:
            terms[pid] = toks[0]
            ends[pid] = int(end)
    if not terms:
        return spark.createDataFrame(
            [], "phrase_id long, rank long, doc_id long, matches long"
        )
    pt = spark.createDataFrame(
        [(pid, t) for pid, t in terms.items()],
        "phrase_id long, term string",
    )
    all_terms = sorted(set(terms.values()))
    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(pt), "term"
    )
    cand = hits.groupBy("phrase_id", "doc_block").applyInPandas(
        _span_first_kernel(ends), schema=PHRASE_OUT_SCHEMA
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase_id", "rank", "doc_id", "matches")
    )


def span_first_topk_sql(table: str, queries: list[tuple[int, str, int]],
                        k: int = 10, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """First-principles oracle: count token positions i <= end holding
    the term."""
    branches = []
    for pid, text, end in queries:
        if int(end) < 1:
            raise ValueError(
                f"span_first end must be >= 1 (got {end} for query {pid})"
            )
        toks = tokenize_py(text)
        if not toks:
            continue
        t = toks[0]
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, "
            f"CAST(len(list_filter(range(1, len(t) + 1), "
            f"i -> i <= {int(end)} AND t[i] = '{t}')) AS BIGINT) "
            "AS matches FROM toks"
        )
    return _span_counts_sql(table, " UNION ALL ".join(branches), k,
                            text_col, id_col)


def _span_counts_sql(table: str, union: str, k: int, text_col: str,
                     id_col: str) -> str:
    """Shared tail of the single-span oracles: tokenize, rank the
    per-branch counts (matches desc, doc_id), cut at k."""
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


# ------------------------------------------------------------- span_not


def _validate_span_not(
    queries: list[tuple[int, str, str]], pre: int, post: int,
) -> tuple[dict[int, str], dict[int, str]]:
    """(include-term, exclude-term maps) — single-token both sides,
    include != exclude (a self-excluding span kills every match), pre and
    post non-negative.  Shared by the kernel and the SQL twin so both
    reject identical inputs."""
    if pre < 0 or post < 0:
        raise ValueError(
            f"span_not pre/post must be >= 0 (got {pre}, {post})"
        )
    inc: dict[int, str] = {}
    exc: dict[int, str] = {}
    for pid, inc_text, exc_text in queries:
        it = tokenize_py(inc_text)
        et = tokenize_py(exc_text)
        if len(it) != 1 or len(et) != 1:
            raise ValueError(
                f"span_not wraps single terms (query {pid}: include "
                f"{it!r}, exclude {et!r})"
            )
        if it[0] == et[0]:
            raise ValueError(
                f"span_not include == exclude ({it[0]!r}) for query "
                f"{pid} — every match would self-exclude"
            )
        inc[pid] = it[0]
        exc[pid] = et[0]
    return inc, exc


def _span_not_kernel(exc_terms: dict[int, str], pre: int, post: int):
    """One (phrase_id, doc_block) group, fully vectorized: every doc's
    include positions probe the keyed (doc·L + position) exclude array
    with TWO searchsorted calls total — an occurrence survives when its
    [p−pre, p+post] key window is empty (the key base spacing exceeds
    max position + pre + post, so windows never cross docs; fuzz-tested
    against the per-doc twin).  Docs without the exclude term have no
    keys in range and keep every occurrence."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        exc_term = exc_terms[phrase_id]
        pos, starts, counts, udocs, dcode = _decode_group_positions(pdf)
        tvals = pdf["term"].to_numpy()
        is_exc_row = tvals == exc_term
        val_doc = np.repeat(dcode, counts).astype(np.int64)
        val_exc = np.repeat(is_exc_row, counts)
        p1 = pos.astype(np.int64) + 1
        maxp = int(p1.max()) if p1.size else 1
        big = np.int64(maxp + pre + post + 2)
        ip_d = val_doc[~val_exc]
        ikey = ip_d * big + p1[~val_exc]
        ekeys = np.sort(val_doc[val_exc] * big + p1[val_exc])
        lo = np.searchsorted(ekeys, ikey - pre, side="left")
        hi = np.searchsorted(ekeys, ikey + post, side="right")
        keep = hi == lo
        per_doc = np.bincount(ip_d[keep], minlength=udocs.size)
        k = np.flatnonzero(per_doc)
        return pd.DataFrame(
            {
                "phrase_id": np.full(k.size, phrase_id, dtype=np.int64),
                "doc_id": udocs[k],
                "matches": per_doc[k].astype(np.int64),
            }
        )

    return kernel


def _span_not_kernel_perdoc(exc_terms: dict[int, str], pre: int, post: int):
    """Reference per-doc implementation (pre-r6 vectorization) — kept as
    the parity twin the vectorized kernel is fuzz-tested against."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        phrase_id = int(pdf["phrase_id"].iloc[0])
        exc_term = exc_terms[phrase_id]
        out_docs: list[int] = []
        out_matches: list[int] = []
        for doc_id, grp in pdf.groupby("doc_id"):
            by_role = {
                ("exc" if t == exc_term else "inc"): b
                for t, b in zip(grp["term"], grp["pos_bytes"])
            }
            if "inc" not in by_role:
                continue
            # int64: the window arithmetic must not wrap below zero
            ip = (
                np.cumsum(varint_decode(by_role["inc"]), dtype=np.uint64)
                .astype(np.int64) + 1
            )
            if "exc" in by_role:
                ep = (
                    np.cumsum(varint_decode(by_role["exc"]),
                              dtype=np.uint64).astype(np.int64) + 1
                )
                lo = np.searchsorted(ep, ip - pre, side="left")
                hi = np.searchsorted(ep, ip + post, side="right")
                m = int((hi == lo).sum())
            else:
                m = len(ip)
            if m:
                out_docs.append(int(doc_id))
                out_matches.append(m)
        return pd.DataFrame(
            {
                "phrase_id": np.full(len(out_docs), phrase_id,
                                     dtype=np.int64),
                "doc_id": np.asarray(out_docs, dtype=np.int64),
                "matches": np.asarray(out_matches, dtype=np.int64),
            }
        )

    return kernel


def span_not_topk(
    spark: SparkSession,
    positions: DataFrame,
    queries: list[tuple[int, str, str]],
    pre: int = 0,
    post: int = 0,
    k: int = 10,
) -> DataFrame:
    """(phrase_id, rank, doc_id, matches) — Lucene SpanNotQuery over
    single-token spans: ``matches`` counts occurrences of the include
    term with NO exclude-term occurrence within ``pre`` tokens before or
    ``post`` tokens after (positions 1-based, window inclusive).  Docs
    whose every include occurrence is killed drop out (matches > 0, the
    family rule); docs without the exclude term keep every occurrence.
    ``pre = post = 0`` is Lucene's overlap-only default — a no-op for
    single-token spans (two distinct terms never share a position), so
    callers wanting exclusion pass a positive window.

    Same scale shape as the rest of the span family: ``In(term, …)``
    pushdown into the positions scan (BOTH roles' terms), broadcast
    role-tagged query-term join, per-(query, doc_block) Arrow groups,
    one global top-k window."""
    inc, exc = _validate_span_not(queries, pre, post)
    if not inc:
        return spark.createDataFrame(
            [], "phrase_id long, rank long, doc_id long, matches long"
        )
    pairs = sorted(
        {(pid, t) for pid, t in inc.items()}
        | {(pid, t) for pid, t in exc.items()}
    )
    pt = spark.createDataFrame(pairs, "phrase_id long, term string")
    all_terms = sorted({t for _, t in pairs})
    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(pt), "term"
    )
    cand = hits.groupBy("phrase_id", "doc_block").applyInPandas(
        _span_not_kernel(exc, pre, post), schema=PHRASE_OUT_SCHEMA
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase_id", "rank", "doc_id", "matches")
    )


# ------------------------------------------------- fused family pipeline


FAMILY_OUT_SCHEMA = (
    "phrase_id long, doc_id long, matches long, snippet_start long"
)


def positions_family_candidates(
    spark: SparkSession,
    positions: DataFrame,
    specs: list[dict],
    block_prune: bool = False,
) -> DataFrame | None:
    """Run several positions-family query sets through ONE fused pipeline
    (guide §2.4 — the per-family operators each plan an identical
    scan → broadcast term join → (phrase_id, doc_block) shuffle → Arrow
    kernel → top-k window; a union of N of them pays N scans, N
    exchanges, N Python worker rounds and N window sorts for groups that
    are disjoint by construction).  Here the per-family *kernels* are
    unchanged — one dispatching applyInPandas routes each
    (phrase_id, doc_block) group to its family's kernel — so results are
    row-identical to the union of the individual operators
    (rank-identity is frozen in tests/test_phrase.py).

    ``specs`` entries (query ids must be globally unique across specs):

    - ``{"kind": "phrase", "queries": [(pid, text), …]}``
    - ``{"kind": "proximity", "queries": […], "slop": int}``
    - ``{"kind": "ordered", "queries": […], "slop": int}``
    - ``{"kind": "snippet", "queries": […], "window": int}``
    - ``{"kind": "span_first", "queries": [(pid, text, end), …]}``
    - ``{"kind": "span_not", "queries": [(pid, inc, exc), …],
         "pre": int, "post": int}``

    Output is the widened family schema (phrase_id, rank, doc_id,
    matches, snippet_start): span rows carry snippet_start NULL, snippet
    rows reuse ``matches`` for coverage — exactly the shape the
    phrase_topk entry's union produced."""
    from instructor_embedding_spark.query.snippet import _snippet_kernel

    all_pairs: list[tuple[int, str]] = []
    kernel_by_pid: dict[int, object] = {}
    snippet_pids: set[int] = set()
    need: dict[int, int] = {}

    def _register(pid: int, kern) -> None:
        if pid in kernel_by_pid:
            raise ValueError(
                f"duplicate query id {pid} across positions-family specs"
            )
        kernel_by_pid[pid] = kern

    for spec in specs:
        kind = spec["kind"]
        queries = spec["queries"]
        if kind == "phrase":
            term_orders = {pid: tokenize_py(t) for pid, t in queries}
            term_orders = {p: t for p, t in term_orders.items() if t}
            kern = _phrase_kernel(term_orders)
            for pid, terms in term_orders.items():
                all_pairs += [(pid, t) for t in set(terms)]
                _register(pid, kern)
                need[pid] = len(set(terms))
        elif kind == "proximity":
            slop = spec["slop"]
            term_sets = {}
            for pid, text in queries:
                toks = sorted(set(tokenize_py(text)))
                if toks:
                    term_sets[pid] = toks
            kern = _proximity_kernel(
                term_sets, {p: slop for p in term_sets}
            )
            for pid, toks in term_sets.items():
                all_pairs += [(pid, t) for t in toks]
                _register(pid, kern)
                need[pid] = len(toks)
        elif kind == "ordered":
            slop = spec["slop"]
            term_orders = {pid: tokenize_py(t) for pid, t in queries}
            term_orders = {p: t for p, t in term_orders.items() if t}
            kern = _ordered_proximity_kernel(
                term_orders, {p: slop for p in term_orders}
            )
            for pid, terms in term_orders.items():
                all_pairs += [(pid, t) for t in set(terms)]
                _register(pid, kern)
                need[pid] = len(set(terms))
        elif kind == "snippet":
            term_sets = {}
            for pid, text in queries:
                toks = sorted(set(tokenize_py(text)))
                if toks:
                    term_sets[pid] = toks
            kern = _snippet_kernel(term_sets, spec["window"])
            for pid, toks in term_sets.items():
                all_pairs += [(pid, t) for t in toks]
                _register(pid, kern)
                snippet_pids.add(pid)
                need[pid] = 1  # not conjunctive: any term qualifies
        elif kind == "span_first":
            terms: dict[int, str] = {}
            ends: dict[int, int] = {}
            for pid, text, end in queries:
                if int(end) < 1:
                    raise ValueError(
                        f"span_first end must be >= 1 (got {end} for "
                        f"query {pid})"
                    )
                toks = tokenize_py(text)
                if len(toks) > 1:
                    raise ValueError(
                        f"span_first wraps a single term (got {toks!r} "
                        f"for query {pid})"
                    )
                if toks:
                    terms[pid] = toks[0]
                    ends[pid] = int(end)
            kern = _span_first_kernel(ends)
            for pid, t in terms.items():
                all_pairs.append((pid, t))
                _register(pid, kern)
                need[pid] = 1
        elif kind == "span_not":
            pre, post = spec["pre"], spec["post"]
            inc, exc = _validate_span_not(queries, pre, post)
            kern = _span_not_kernel(exc, pre, post)
            for pid in inc:
                all_pairs.append((pid, inc[pid]))
                all_pairs.append((pid, exc[pid]))
                _register(pid, kern)
                need[pid] = 1  # exclude term must NOT gate the block
        else:
            raise ValueError(f"unknown positions family kind: {kind!r}")

    if not kernel_by_pid:
        return None
    all_pairs = sorted(set(all_pairs))

    pt = spark.createDataFrame(all_pairs, "phrase_id long, term string")
    all_terms = sorted({t for _, t in all_pairs})
    hits = positions.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(pt), "term"
    )
    hits = _conjunctive_block_prune(hits, need, enabled=block_prune)

    def dispatch(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["phrase_id"].iloc[0])
        kern = kernel_by_pid[pid]
        if pid in snippet_pids:
            out = kern(pdf.rename(columns={"phrase_id": "query_id"}))
            return pd.DataFrame(
                {
                    "phrase_id": out["query_id"],
                    "doc_id": out["doc_id"],
                    "matches": out["covered"],
                    "snippet_start": out["snippet_start"].astype("Int64"),
                }
            )
        out = kern(pdf)
        # never mutate: kernels return the shared _EMPTY_PHRASE by
        # reference on the block-skip path
        return out.assign(
            snippet_start=pd.array([None] * len(out), dtype="Int64")
        )

    return hits.groupBy("phrase_id", "doc_block").applyInPandas(
        dispatch, schema=FAMILY_OUT_SCHEMA
    )


def positions_family_topk(
    spark: SparkSession,
    positions: DataFrame,
    specs: list[dict],
    k: int = 10,
    block_prune: bool = False,
) -> DataFrame:
    """Ranked form of :func:`positions_family_candidates`: one top-k
    window over the fused candidate table (rank per query id by
    matches DESC, doc_id ASC — every family's pinned order)."""
    cand = positions_family_candidates(
        spark, positions, specs, block_prune=block_prune
    )
    if cand is None:
        return spark.createDataFrame(
            [],
            "phrase_id long, rank long, doc_id long, matches long, "
            "snippet_start long",
        )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase_id", "rank", "doc_id", "matches", "snippet_start")
    )


def span_not_topk_sql(table: str, queries: list[tuple[int, str, str]],
                      pre: int = 0, post: int = 0, k: int = 10,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """First-principles oracle: for every token position i holding the
    include term, the clamped slice ``t[max(1, i - pre) : i + post]``
    must not contain the exclude term (DuckDB slices are 1-based
    inclusive and clamp at the list end, matching the kernel's
    searchsorted window)."""
    inc, exc = _validate_span_not(queries, pre, post)
    branches = []
    for pid, it in inc.items():
        et = exc[pid]
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, "
            f"CAST(len(list_filter(range(1, len(t) + 1), "
            f"i -> t[i] = '{it}' AND NOT list_contains("
            f"t[greatest(1, i - {int(pre)}):i + {int(post)}], '{et}')"
            f")) AS BIGINT) AS matches FROM toks"
        )
    return _span_counts_sql(table, " UNION ALL ".join(branches), k,
                            text_col, id_col)
