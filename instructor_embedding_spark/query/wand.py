"""Block-max WAND top-k retrieval over the compressed segmented index.

Distributed shape (the scatter/gather of the reference's chunked retrieval,
RetrievalEvaluator.py:121-197, re-expressed for a pre-built index):

1. tokenize queries → de-duplicated (query_id, term) — tiny, broadcast
2. segment scan: ``segments.join(broadcast(query_terms), on='term')`` —
   Catalyst turns the tiny build side into a broadcast hash join and the
   term filter prunes parquet row groups (segments are term-sorted within
   files), so only the query terms' posting lists are read
3. join packed doc-lengths on doc_block (co-partitioned by the same key)
4. ``groupBy(query_id, doc_block).applyInPandas(wand_kernel)`` — every
   group holds ALL of a query's terms for one doc range (document-
   partitioned locality), so scoring is local; the kernel prunes sub-blocks
   whose block-max upper bound can't beat the running top-k threshold and
   emits ≤k candidates per group (scatter)
5. global window ``(round(score,6) DESC, doc_id ASC)`` row_number ≤ k
   (gather; pinned tie-break D1)

Exactness: sub_max values are true per-term upper bounds computed from the
same double-precision impact formula the kernel re-evaluates, and a
sub-block is skipped only when its summed upper bound is STRICTLY below the
k-th best score seen so far — so the result is rank-identical to the
brute-force oracle (property-tested in tests/test_wand.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import decode_postings, varint_decode
from instructor_embedding_spark.index.build import IndexHandle
from instructor_embedding_spark.query.bm25 import SCORE_DECIMALS, query_terms

WAND_SCHEMA = "query_id long, doc_id long, score_raw double"

_EMPTY = pd.DataFrame(
    {
        "query_id": pd.Series([], dtype="int64"),
        "doc_id": pd.Series([], dtype="int64"),
        "score_raw": pd.Series([], dtype="float64"),
    }
)

STATS_SCHEMA = (
    "query_id long, doc_block long, sub_total long, sub_scored long, "
    "sub_zero long"
)

_EMPTY_STATS = pd.DataFrame(
    {
        "query_id": pd.Series([], dtype="int64"),
        "doc_block": pd.Series([], dtype="int64"),
        "sub_total": pd.Series([], dtype="int64"),
        "sub_scored": pd.Series([], dtype="int64"),
        "sub_zero": pd.Series([], dtype="int64"),
    }
)


def _wand_kernel(k: int, k1: float, b: float, avgdl: float, span: int,
                 filtered: bool = False, stats: bool = False,
                 deny: bool = False, require_all: bool = False,
                 boolean_not: bool = False,
                 min_match: int | None = None,
                 boosted: bool = False,
                 paged: bool = False):
    """applyInPandas kernel for one (query_id, doc_block) group.

    With ``filtered`` the group carries an ``allowed_bin`` varint-delta
    column (the metadata-predicate whitelist for this block); candidates
    outside it are dropped AFTER scoring — block-max upper bounds over the
    unfiltered postings remain true bounds for the filtered subset, so
    pruning stays exact.

    With ``deny`` the group MAY carry a ``denied_bin`` varint-delta column
    (the tombstoned doc_ids for this block — NULL when the block has no
    deletions, the common case); denied candidates are dropped by the same
    post-scoring mask, BEFORE the θ update and the per-group top-k cut, so
    the group's survivors are exact over live docs.  Same exactness
    argument as the whitelist: the block-max bounds are maxima over a
    superset of the live postings, so they remain true bounds.

    With ``require_all`` (boolean AND, conjunctive retrieval) the group
    carries an ``n_terms`` column (the query's distinct-term count);
    only docs matched by EVERY query term survive, scored by the same
    BM25 sum.  Two extra prunes, both exact: a group with fewer term
    rows than n_terms can't contain a conjunctive match at all (terms
    missing from the whole block), and the disjunctive sub-block upper
    bound remains a true bound for the conjunctive subset.

    With ``boolean_not`` (MUST_NOT, Lucene BooleanQuery prohibited
    clauses) the group MAY carry rows flagged ``neg`` — postings of the
    query's prohibited terms, shipped into the same group by the
    ordinary term join.  Every doc in a flagged row's postings is
    excluded by the same pre-θ mask as the deny-list, and flagged rows
    are dropped BEFORE the upper-bound sums, so block-max pruning never
    counts prohibited impact.  A term that is both required and
    prohibited for one query excludes all its docs (the prohibited
    clause wins, standard boolean semantics); its leftover sub_max
    contribution only loosens bounds, never breaks them.

    With ``paged`` (search_after deep paging) the group carries
    ``after_score``/``after_doc`` columns — the (round(score, 6),
    doc_id) cursor of the previous page's last hit (NULL = first page).
    Docs PROVABLY ranked at-or-before the cursor (np-rounded score ≥
    cursor + 2 quanta — np.round and the gather's F.round differ by at
    most one quantum) are dropped before the θ update; only docs
    PROVABLY after it (≤ cursor − 2 quanta) count toward k and θ, so
    pruning is admissible for the page; the ambiguous band (score ties
    with the cursor, where the doc_id tie-break decides) is carried to
    the gather as a safety superset and resolved there by the exact
    F.round cursor predicate.

    With ``stats`` the kernel does the SAME scoring/pruning work but
    emits one (query_id, doc_block, sub_total, sub_scored) row instead of
    candidates — the observability surface for how much the block-max
    skip data actually prunes (sub_total - sub_scored sub-blocks were
    never decoded/scored)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = int(pdf["query_id"].iloc[0])
        block = int(pdf["doc_block"].iloc[0])
        base = block * span
        allowed = None
        if filtered:
            allowed = np.cumsum(
                varint_decode(pdf["allowed_bin"].iloc[0]), dtype=np.uint64
            ).astype(np.int64)
        denied = None
        if deny:
            dbin = pdf["denied_bin"].iloc[0]
            if dbin is not None:
                denied = np.cumsum(
                    varint_decode(dbin), dtype=np.uint64
                ).astype(np.int64)
        if boolean_not:
            neg_rows = pdf[pdf["neg"]]
            pdf = pdf[~pdf["neg"]]
            if len(neg_rows):
                ex_parts = [denied] if denied is not None else []
                for _, row in neg_rows.iterrows():
                    nd, _ = decode_postings(row["doc_bytes"],
                                            row["tf_bytes"])
                    ex_parts.append(nd.astype(np.int64))
                denied = np.unique(np.concatenate(ex_parts))
            if not len(pdf):
                return _EMPTY_STATS if stats else _EMPTY

        # ``need``: the per-doc distinct-matched-term floor.  require_all
        # reads the query's term count from the shipped n_terms column;
        # minimum_should_match is a batch-wide literal (Lucene's
        # BooleanQuery msm generalizes both: msm=1 is plain OR, msm=n is
        # AND).  Either way, a block holding fewer distinct query-term
        # rows than the floor can't contain a match — skip before decode.
        need = 0
        if require_all:
            need = int(pdf["n_terms"].iloc[0])
        elif min_match is not None:
            need = min_match
        if need and len(pdf) < need:
            return _EMPTY_STATS if stats else _EMPTY

        # search_after cursor (NULL/NaN = first page, no cursor filter).
        # Only the score reaches the kernel: the doc_id tie-break on
        # cursor-score ties is resolved by the exact F.round predicate in
        # the gather, which sees the full ambiguous band (kept below).
        after_score = None
        if paged:
            a = pdf["after_score"].iloc[0]
            if a is not None and not pd.isna(a):
                after_score = float(a)

        # Decode the block's packed doc lengths once.
        dl_doc_ids = np.cumsum(
            varint_decode(pdf["doc_ids_bin"].iloc[0]), dtype=np.uint64
        )
        dl_vals = varint_decode(pdf["dls_bin"].iloc[0]).astype(np.float64)

        # Decode each term's postings; sort terms for deterministic sums.
        pdf = pdf.sort_values("term")
        terms = []
        n_sub = None
        for _, row in pdf.iterrows():
            doc_ids, tfs = decode_postings(row["doc_bytes"], row["tf_bytes"])
            offsets = np.asarray(row["sub_offsets"], dtype=np.int64)
            sub_max = np.asarray(row["sub_max"], dtype=np.float64)
            n_sub = sub_max.size
            bst = 1.0
            if boosted:
                # boost scales the term's contribution AND its block-max
                # upper bound exactly (both are linear in the boost), so
                # θ pruning stays admissible for any boost > 0
                bst = float(row["boost"])
                if not bst > 0.0:
                    raise ValueError(
                        f"term boost must be > 0, got {bst!r} for "
                        f"term {row['term']!r}"
                    )
                sub_max = sub_max * bst
            terms.append(
                (float(row["idf"]), doc_ids, tfs, offsets, sub_max, bst)
            )
        if not terms:
            return _EMPTY_STATS if stats else _EMPTY

        # Upper bound per sub-block = Σ_t sub_max[t][j]; process in
        # descending-UB order, stop once UB < kth-best (strict).
        ub = np.zeros(n_sub, dtype=np.float64)
        for _, _, _, _, sm, _ in terms:
            ub += sm
        order = np.argsort(-ub, kind="stable")

        sub_span = span // n_sub
        cand_docs: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        maybe_docs: list[np.ndarray] = []
        maybe_scores: list[np.ndarray] = []
        theta = -np.inf
        kth_count = 0
        # Prune slack: final ranking compares round(score, 6), so a doc with
        # raw score within one rounding quantum below θ can still tie the
        # kth candidate and win on doc_id ASC. Skipping only when
        # ub < θ - quantum keeps pruning safe under the pinned tie-break.
        quantum = 10.0 ** (-SCORE_DECIMALS)
        n_scored = 0
        for j in order:
            if ub[j] <= 0.0 or (kth_count >= k and ub[j] < theta - quantum):
                break
            n_scored += 1
            scores = np.zeros(sub_span, dtype=np.float64)
            # need <= 1 is plain OR: every scored doc matched >= 1 term
            # (idf > 0 always), so the count pass would filter nothing
            counts = np.zeros(sub_span, dtype=np.int64) if need > 1 \
                else None
            sub_base = base + j * sub_span
            touched = False
            for idf, doc_ids, tfs, offsets, _, bst in terms:
                lo, hi = int(offsets[j]), int(offsets[j + 1])
                if hi <= lo:
                    continue
                touched = True
                d = doc_ids[lo:hi]
                tf = tfs[lo:hi].astype(np.float64)
                pos = np.searchsorted(dl_doc_ids, d)
                dl = dl_vals[pos]
                imp = idf * (
                    tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / avgdl))
                )
                if bst != 1.0:
                    imp = imp * bst
                idx = (d - np.uint64(sub_base)).astype(np.int64)
                scores[idx] += imp
                if counts is not None:
                    counts[idx] += 1
            if not touched:
                continue
            nz = np.flatnonzero(scores)
            if counts is not None:
                # a doc lives in exactly one sub-block, so its
                # in-sub-block matched-term count is its global one
                nz = nz[counts[nz] >= need]
            if nz.size == 0:
                continue
            docs_here = nz.astype(np.int64) + sub_base
            svals = scores[nz]
            if allowed is not None:
                pos = np.searchsorted(allowed, docs_here)
                keep = (pos < allowed.size) & (
                    allowed[np.minimum(pos, allowed.size - 1)] == docs_here
                )
                if not keep.any():
                    continue
                docs_here, svals = docs_here[keep], svals[keep]
            if denied is not None:
                pos = np.searchsorted(denied, docs_here)
                dead = (pos < denied.size) & (
                    denied[np.minimum(pos, denied.size - 1)] == docs_here
                )
                if dead.all():
                    continue
                docs_here, svals = docs_here[~dead], svals[~dead]
            if after_score is not None:
                # cursor split: docs ≥ cursor + 2 quanta are provably
                # at-or-before it under EITHER rounding rule — drop; the
                # ±2-quantum band (cursor-score ties) goes to the gather
                # uncut and uncounted; only provably-after docs feed k/θ
                r_here = np.round(svals, SCORE_DECIMALS)
                drop = r_here >= after_score + 2.0 * quantum
                band = ~drop & (r_here > after_score - 2.0 * quantum)
                if band.any():
                    maybe_docs.append(docs_here[band])
                    maybe_scores.append(svals[band])
                keep = ~(drop | band)
                if not keep.any():
                    continue
                docs_here, svals = docs_here[keep], svals[keep]
            cand_docs.append(docs_here)
            cand_scores.append(svals)
            # update running kth-best threshold
            all_scores = np.concatenate(cand_scores)
            kth_count = all_scores.size
            if kth_count >= k:
                theta = np.partition(all_scores, kth_count - k)[kth_count - k]

        if stats:
            # decompose honestly: sub_zero blocks (no postings for any
            # query term — a naive scorer skips them too) vs blocks the
            # θ bound actually pruned (total - zero - scored)
            return pd.DataFrame(
                {
                    "query_id": [query_id],
                    "doc_block": [block],
                    "sub_total": [int(n_sub)],
                    "sub_scored": [n_scored],
                    "sub_zero": [int((ub <= 0.0).sum())],
                }
            )
        if not cand_docs:
            if maybe_docs:
                # only cursor-band docs survived: ship them all — the
                # gather's exact predicate decides which are truly after
                return pd.DataFrame(
                    {
                        "query_id": query_id,
                        "doc_id": np.concatenate(maybe_docs),
                        "score_raw": np.concatenate(maybe_scores),
                    }
                )
            return _EMPTY
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        # Per-group top-k cut with a two-quantum slack band: np.round is
        # half-to-even while the global gather's F.round is HALF_UP, so a
        # score on a half-quantum could rank differently here vs there.
        # Keeping every candidate whose np-rounded score is within 2
        # quanta of the kth guarantees any doc that could tie-or-beat the
        # kth under Spark's rounding survives to the gather (|np.round -
        # F.round| <= 1 quantum, so a dropped doc is >= 1 quantum below
        # the kept top-k under F.round — strictly out of the global top-k).
        r = np.round(scores, SCORE_DECIMALS)
        order = np.lexsort((docs, -r))
        if order.size > k:
            kth = r[order[k - 1]]
            sel = order[r[order] >= kth - 2.5 * quantum]
        else:
            sel = order
        out_docs, out_scores = docs[sel], scores[sel]
        if maybe_docs:
            # cursor-band docs ride along uncut (they never displace a
            # provably-after candidate from the top-k band above)
            out_docs = np.concatenate([out_docs, *maybe_docs])
            out_scores = np.concatenate([out_scores, *maybe_scores])
        return pd.DataFrame(
            {
                "query_id": query_id,
                "doc_id": out_docs,
                "score_raw": out_scores,
            }
        )

    return kernel


def _pack_filter(doc_filter: DataFrame, span: int,
                 out_col: str = "allowed_bin") -> DataFrame:
    """(doc_id) set → one varint-delta row per doc_block.

    Shared by the whitelist (``allowed_bin``) and the tombstone deny-list
    (``denied_bin``): both ship a sorted per-block id set into the kernel
    as one compressed binary column."""
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(pdf["doc_id"].to_numpy().astype(np.uint64))
        gaps = np.empty_like(ids)
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        from instructor_embedding_spark.functions.codec import varint_encode

        return pd.DataFrame(
            {
                "doc_block": [int(pdf["doc_block"].iloc[0])],
                out_col: [varint_encode(gaps)],
            }
        )

    return (
        doc_filter.select(
            "doc_id", (F.col("doc_id") / span).cast("long").alias("doc_block")
        )
        .groupBy("doc_block")
        .applyInPandas(pack, schema=f"doc_block long, {out_col} binary")
    )


#: Above this many DISTINCT query terms, skip the driver-side collect +
#: In() scan pushdown and join the tokenized term table instead: the
#: pushdown is an interactive-batch optimization (tiny term set → row-group
#: skipping), but a 10^5-query offline join would funnel every term through
#: the driver and inline a megabyte-scale In() predicate into the plan.
#: Both paths are rank-identical (property-tested).
PUSHDOWN_MAX_TERMS = int(
    os.environ.get("SPARK_GRAFT_WAND_PUSHDOWN_MAX_TERMS", "4096")
)

#: The distinct-term probe above bounds the In() predicate but NOT the
#: (query_id, term) table: a 10^6-query offline batch over a small
#: vocabulary passes the distinct gate with millions of rows, and
#: collecting those for a LocalRelation broadcast is its own driver
#: funnel.  Above this many qt ROWS the pushdown path keeps the In()
#: scan predicate (built from the already-bounded distinct list) but
#: joins the term table engine-side instead of collecting it.
PUSHDOWN_MAX_QT_ROWS = int(
    os.environ.get("SPARK_GRAFT_WAND_PUSHDOWN_MAX_QT_ROWS", "65536")
)


def _grouped_hits(
    spark: SparkSession,
    handle: IndexHandle,
    queries: DataFrame,
    doc_filter: DataFrame | None,
    segments: DataFrame | None,
    doc_lens: DataFrame | None,
    pushdown_max_terms: int | None = None,
    pushdown_max_qt_rows: int | None = None,
    deny_filter: DataFrame | None = None,
    require_all: bool = False,
    qt_override: DataFrame | None = None,
    neg_queries: DataFrame | None = None,
    term_boosts: DataFrame | None = None,
    search_after: DataFrame | None = None,
) -> DataFrame | None:
    """Shared scatter construction for the scoring and stats kernels:
    tokenized query terms joined against the segment scan and packed doc
    lengths, one group per (query_id, doc_block).  None when the queries
    tokenize to nothing.

    Small term sets inline the (driver-known) query-term set as a scan
    predicate: a broadcast join alone does NOT push its keys into the
    parquet scan, so without this the whole index would be read per query
    batch.  With it, `.explain` shows PushedFilters: [In(term, [...])] and
    row groups that contain none of the query terms are skipped via column
    stats (segments are written term-sorted within files for exactly
    this).  One bounded collect of the term table serves both the
    emptiness test and (for batches under the row bound) the inlined
    LocalRelation — one tokenize job per query batch, no cache pin.

    Past ``pushdown_max_terms`` distinct terms (default
    :data:`PUSHDOWN_MAX_TERMS`; values < 0 are clamped to 0, which
    disables pushdown) the collect is skipped and the term table joins
    the segment scan engine-side — no driver funnel, no megabyte-In()
    predicate; the probe that decides is a bounded
    ``distinct().limit(max+1)`` collect, never the full term set.

    The distinct-term probe bounds the PREDICATE, not the table: past
    ``pushdown_max_qt_rows`` (query_id, term) ROWS (default
    :data:`PUSHDOWN_MAX_QT_ROWS`) the In() pushdown is kept — it only
    needs the already-bounded distinct list — but qt joins the pruned
    scan engine-side instead of being collected, so neither probe ever
    pulls an unbounded row set to the driver.  All three shapes
    (collect, pushdown+distributed-qt, join-only) are rank-identical
    (property-tested)."""
    p = handle.params
    segments = segments if segments is not None else handle.segments(spark)
    doc_lens = doc_lens if doc_lens is not None else handle.doc_lens(spark)
    max_terms = max(0, PUSHDOWN_MAX_TERMS if pushdown_max_terms is None
                    else pushdown_max_terms)
    max_qt_rows = max(0, PUSHDOWN_MAX_QT_ROWS if pushdown_max_qt_rows is None
                      else pushdown_max_qt_rows)

    # A limit(0) probe would collect [] even for non-empty
    # queries and silently drop all results — the clamp above plus
    # limit(max+1) >= 1 guarantee the emptiness test is meaningful.
    # ``qt_override`` bypasses query tokenization entirely — the caller
    # supplies the (query_id, term) table directly (prefix/wildcard
    # expansion, query/prefix.py); everything downstream is identical.
    # ``neg_queries`` (MUST_NOT) tokenizes through the same path and
    # unions in flagged rows: the prohibited terms' postings must reach
    # the kernel group to build its exclusion set, so they ride the
    # ordinary term join (and the same In() pushdown) with neg=true.
    qt = (
        qt_override if qt_override is not None
        else query_terms(queries, p.use_pandas_udf_tokenizer)
    )
    boolean_not = neg_queries is not None
    if boolean_not:
        qt = qt.withColumn("neg", F.lit(False)).unionByName(
            query_terms(neg_queries, p.use_pandas_udf_tokenizer)
            .withColumn("neg", F.lit(True))
        )
    if term_boosts is not None:
        # per-(query, term) boost rides the qt table into the kernel
        # groups; unlisted pairs (and MUST_NOT rows) default to 1.0
        qt = qt.join(
            term_boosts.select(
                "query_id", "term",
                F.col("boost").cast("double").alias("boost"),
            ),
            ["query_id", "term"],
            "left",
        ).withColumn("boost", F.coalesce(F.col("boost"), F.lit(1.0)))
    # ONE bounded collect decides all three shapes in the common case: a
    # batch with <= max_qt_rows (query, term) rows yields the rows AND
    # their distinct term set from a single driver job.  (The r5 form
    # paid three jobs per batch — distinct-term probe, row-count probe,
    # full collect — plus a persist/unpersist pin around them; serving
    # batches are small, so the per-batch driver round-trips were a
    # measurable slice of warm query latency.)  Only batches past the
    # row bound fall back to the bounded distinct-terms probe that
    # chooses between In() pushdown with a distributed qt join and the
    # plain join path.
    seg_cols = segments.select(
        "term", "doc_block", "idf", "doc_bytes", "tf_bytes",
        "sub_offsets", "sub_max",
    )
    qt_schema = ("query_id long, term string, neg boolean"
                 if boolean_not else "query_id long, term string")
    if term_boosts is not None:
        qt_schema += ", boost double"
    head = qt.limit(max_qt_rows + 1).collect()
    if not head:
        return None
    if len(head) <= max_qt_rows:
        # head is the COMPLETE (query, term) table
        term_list = sorted({r["term"] for r in head})
        if len(term_list) <= max_terms:
            # bounded row set: inline it as a LocalRelation so the
            # join broadcasts without a shuffle or a size estimate
            local_qt = spark.createDataFrame(
                [tuple(r) for r in head], qt_schema
            )
            hits = seg_cols.filter(F.col("term").isin(term_list)).join(
                F.broadcast(local_qt), "term"
            )
        else:
            # more distinct terms than the In() bound: join path (the
            # consumer job re-derives the term table inside its own
            # distributed pipeline — the documented cost of skipping
            # the driver funnel)
            hits = seg_cols.join(qt, "term")
    else:
        # (query, term) table too large to collect (e.g. 10^6 queries
        # over a 4k-word vocabulary): the bounded distinct probe still
        # decides whether the scan gets an In() predicate
        probe = (
            qt.select("term").distinct().limit(max_terms + 1).collect()
        )
        if not probe:
            return None
        if len(probe) <= max_terms:
            # keep the scan pushdown, join qt distributed
            term_list = sorted(r["term"] for r in probe)
            hits = seg_cols.filter(F.col("term").isin(term_list)).join(
                qt, "term"
            )
        else:
            # join path: the term table stays distributed; the segment
            # scan reads fully once, which at this query volume is
            # amortized over len(qt)/|segments| work anyway
            hits = seg_cols.join(qt, "term")
    grouped = hits.join(
        doc_lens.select("doc_block", "doc_ids_bin", "dls_bin"), "doc_block"
    )
    if doc_filter is not None:
        grouped = grouped.join(
            _pack_filter(doc_filter, p.doc_block_span), "doc_block"
        )
    if deny_filter is not None:
        # LEFT join: blocks with no deletions (the common case at any
        # realistic delete rate) carry a NULL denied_bin and skip the mask;
        # an inner join here would wrongly DROP every clean block.
        grouped = grouped.join(
            _pack_filter(deny_filter, p.doc_block_span, "denied_bin"),
            "doc_block", "left",
        )
    if require_all:
        # per-query distinct-term count for the conjunctive kernel; qt is
        # unpersisted above, so this tiny aggregate re-tokenizes the query
        # batch once (same documented trade-off as the join path)
        nt = (
            (qt_override if qt_override is not None
             else query_terms(queries, p.use_pandas_udf_tokenizer))
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_terms"))
        )
        grouped = grouped.join(F.broadcast(nt), "query_id")
    if search_after is not None:
        # per-query page cursor: LEFT join so cursor-less (first-page)
        # queries carry a NULL after_score into the kernel
        grouped = grouped.join(
            F.broadcast(
                search_after.select(
                    "query_id",
                    F.col("after_score").cast("double").alias("after_score"),
                )
            ),
            "query_id",
            "left",
        )
    return grouped


def wand_scan_stats(
    spark: SparkSession,
    handle: IndexHandle,
    queries: DataFrame,
    k: int = 10,
    segments: DataFrame | None = None,
    doc_lens: DataFrame | None = None,
    pushdown_max_terms: int | None = None,
    pushdown_max_qt_rows: int | None = None,
) -> DataFrame:
    """(query_id, doc_block, sub_total, sub_scored, sub_zero) —
    block-max pruning observability: the stats twin of :func:`wand_topk`
    runs the identical kernel loop and reports, per group, the sub-block
    total, how many were actually decoded+scored, and how many had NO
    postings for any query term (sub_zero — a naive scorer skips those
    too, so they are not credited to block-max).  The θ-bound's own
    contribution is sub_total - sub_zero - sub_scored; bench records
    both the raw skip rate and the zero-excluded theta rate."""
    p = handle.params
    grouped = _grouped_hits(spark, handle, queries, None, segments,
                            doc_lens, pushdown_max_terms,
                            pushdown_max_qt_rows)
    if grouped is None:
        return spark.createDataFrame([], STATS_SCHEMA)
    kernel = _wand_kernel(k, p.k1, p.b, handle.avgdl, p.doc_block_span,
                          stats=True)
    return grouped.groupBy("query_id", "doc_block").applyInPandas(
        kernel, schema=STATS_SCHEMA
    )


def wand_topk(
    spark: SparkSession,
    handle: IndexHandle,
    queries: DataFrame,
    k: int = 10,
    segments: DataFrame | None = None,
    doc_lens: DataFrame | None = None,
    doc_filter: DataFrame | None = None,
    pushdown_max_terms: int | None = None,
    pushdown_max_qt_rows: int | None = None,
    deny_filter: DataFrame | None = None,
    require_all: bool = False,
    qt_override: DataFrame | None = None,
    neg_queries: DataFrame | None = None,
    min_should_match: int | None = None,
    term_boosts: DataFrame | None = None,
    search_after: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — rank-identical to the oracle.

    ``require_all`` switches to boolean-AND (conjunctive) retrieval: only
    docs containing EVERY query term rank, same BM25 scoring — blocks
    missing any query term are skipped before decode (the strongest prune
    in the conjunctive path).

    ``min_should_match`` (Lucene BooleanQuery msm) keeps only docs
    matching at least that many DISTINCT query terms — msm=1 is plain OR,
    msm = the query's term count is ``require_all``; blocks carrying
    fewer distinct query-term rows than the floor skip before decode.
    Mutually exclusive with ``require_all`` (which reads the floor
    per-query instead of batch-wide).

    ``qt_override`` replaces query tokenization with a caller-supplied
    distinct (query_id, term) table (prefix expansion etc.); ``queries``
    is ignored when it is given.

    ``term_boosts`` is a (query_id, term, boost) table of query-time
    per-term boosts (Lucene ``term^boost``, boost > 0): the listed
    term's contribution AND its block-max upper bound scale by the boost
    — both are linear in it, so θ pruning stays admissible — while
    matching (require_all / min_should_match counts) is unchanged.
    Unlisted (query, term) pairs default to 1.0.  The kernel raises on a
    non-positive boost (a zero boost would also break the "every scored
    doc matched ≥1 term" invariant the msm fast path relies on).

    ``search_after`` is a (query_id, after_score, after_doc) cursor table
    for deep paging: results are the next ``k`` hits STRICTLY after the
    cursor in (round(score, 6) DESC, doc_id ASC) order — pass the
    previous page's last emitted (score, doc_id) verbatim.  Queries
    absent from the table get their first page.  Ranks restart at 1 per
    page (Elasticsearch search_after semantics).  The kernel drops docs
    provably before the cursor and counts only provably-after docs
    toward k/θ, so block-max pruning stays admissible per page; the
    exact cursor predicate is re-applied here with F.round before the
    final rank window.

    ``neg_queries`` (query_id, query_text) adds MUST_NOT clauses: a doc
    containing ANY of a query's prohibited terms never ranks for that
    query, scoring over the positive terms is otherwise unchanged (Lucene
    BooleanQuery prohibited-clause semantics).  Prohibited terms' postings
    ship into the kernel groups through the same pruned term join and
    build a per-block exclusion mask applied before every θ update, so
    block-max pruning stays exact.

    ``doc_filter`` (a DataFrame with a doc_id column) restricts results to
    that whitelist — filtered retrieval with GLOBAL corpus statistics
    (standard semantics: the predicate narrows candidates, not df/avgdl).
    Blocks with no allowed docs drop out of the plan via the inner join on
    the packed filter.

    ``deny_filter`` is the complement: doc_ids to EXCLUDE (tombstoned
    deletes, index/deletes.py) — also global stats (standard engine
    semantics: deleted docs leave results immediately, df/avgdl refresh at
    compaction).  Unlike the whitelist it LEFT-joins, so untouched blocks
    pay nothing."""
    if min_should_match is not None:
        if require_all:
            raise ValueError(
                "min_should_match and require_all are mutually exclusive"
            )
        if min_should_match < 1:
            raise ValueError("min_should_match must be >= 1")
    p = handle.params
    grouped = _grouped_hits(spark, handle, queries, doc_filter, segments,
                            doc_lens, pushdown_max_terms,
                            pushdown_max_qt_rows, deny_filter, require_all,
                            qt_override, neg_queries, term_boosts,
                            search_after)
    if grouped is None:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )

    kernel = _wand_kernel(k, p.k1, p.b, handle.avgdl, p.doc_block_span,
                          filtered=doc_filter is not None,
                          deny=deny_filter is not None,
                          require_all=require_all,
                          boolean_not=neg_queries is not None,
                          min_match=min_should_match,
                          boosted=term_boosts is not None,
                          paged=search_after is not None)
    candidates = grouped.groupBy("query_id", "doc_block").applyInPandas(
        kernel, schema=WAND_SCHEMA
    )
    if search_after is not None:
        # exact cursor predicate under the gather's own rounding rule —
        # resolves the kernel's ambiguous band and the doc_id tie-break
        cur = search_after.select(
            "query_id",
            F.col("after_score").cast("double").alias("after_score"),
            F.col("after_doc").cast("long").alias("after_doc"),
        )
        r6 = F.round(F.col("score_raw"), SCORE_DECIMALS)
        candidates = (
            candidates.join(F.broadcast(cur), "query_id", "left")
            .filter(
                F.col("after_score").isNull()
                | (r6 < F.col("after_score"))
                | ((r6 == F.col("after_score"))
                   & (F.col("doc_id") > F.col("after_doc")))
            )
            .drop("after_score", "after_doc")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round(F.col("score_raw"), SCORE_DECIMALS).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# full match-set decode (the index-backed source for facets / result-
# shaping modes, which aggregate over EVERY matching doc — no top-k, so
# block-max pruning does not apply; the win over the brute-force base is
# that postings come from the compressed segments instead of a
# re-tokenize of the corpus, and the term In() pushdown still skips
# every row group holding no query term)

MATCHSET_SCHEMA = "query_id long, doc_id long, dl long, score_raw double"


def _matchset_kernel(k1: float, b: float, avgdl: float, span: int):
    """applyInPandas kernel for one (query_id, doc_block) group: decode
    every query-term posting in the block and emit the complete scored
    match set (query_id, doc_id, dl, score_raw)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = int(pdf["query_id"].iloc[0])
        base = int(pdf["doc_block"].iloc[0]) * span
        block_docs = np.cumsum(
            varint_decode(pdf["doc_ids_bin"].iloc[0]), dtype=np.uint64
        ).astype(np.int64)
        dl_vals = varint_decode(pdf["dls_bin"].iloc[0]).astype(np.float64)
        scores = np.zeros(span, dtype=np.float64)
        hit = np.zeros(span, dtype=bool)
        for i in range(len(pdf)):
            d, tfs = decode_postings(pdf["doc_bytes"].iloc[i],
                                     pdf["tf_bytes"].iloc[i])
            d = d.astype(np.int64)
            tf = tfs.astype(np.float64)
            dl = dl_vals[np.searchsorted(block_docs, d)]
            idf = float(pdf["idf"].iloc[i])
            slot = d - base
            scores[slot] += (
                idf * tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * dl / avgdl))
            )
            hit[slot] = True
        nz = np.flatnonzero(hit)
        docs = nz + base
        dls = dl_vals[np.searchsorted(block_docs, docs)].astype(np.int64)
        return pd.DataFrame(
            {"query_id": query_id, "doc_id": docs, "dl": dls,
             "score_raw": scores[nz]}
        )

    return kernel


def scored_matches_from_index(
    spark: SparkSession,
    handle: IndexHandle,
    queries: DataFrame,
    segments: DataFrame | None = None,
    doc_lens: DataFrame | None = None,
    block_filter: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, dl, score_raw) — the complete OR-semantics BM25
    match set decoded from the compressed segments: same scatter
    construction as :func:`wand_topk` (term In() pushdown, broadcast
    query-term join, packed doc_lens per block), with a decode-everything
    kernel instead of the pruning one.  score_raw agrees with the
    brute-force base to the pinned round-6 quantum (same rank-identity
    argument as wand_topk vs bm25_topk).

    ``block_filter`` (query_id, doc_block) restricts decode to the listed
    groups — the hook for collectors that can prove whole blocks
    irrelevant BEFORE posting decode (modes.sorted_topk_from_index's
    index-sorted early termination)."""
    p = handle.params
    grouped = _grouped_hits(spark, handle, queries, None, segments,
                            doc_lens)
    if grouped is None:
        return spark.createDataFrame([], MATCHSET_SCHEMA)
    if block_filter is not None:
        grouped = grouped.join(
            block_filter.select("query_id", "doc_block"),
            ["query_id", "doc_block"], "left_semi",
        )
    kernel = _matchset_kernel(p.k1, p.b, handle.avgdl, p.doc_block_span)
    return grouped.groupBy("query_id", "doc_block").applyInPandas(
        kernel, schema=MATCHSET_SCHEMA
    )
