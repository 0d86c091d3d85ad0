"""Re-block: change a built index's doc_block geometry WITHOUT re-tokenizing.

The Elasticsearch shrink/split analog (fewer-or-more shards over the same
documents): ``reblock_index`` rewrites an index built at one
``doc_block_span`` / ``n_sub_blocks`` into a fresh index dir at another,
touching only the already-encoded postings — the tokenize pass, which
dominates build cost at corpus scale (the reference's equivalent wholesale
re-encode is instructor.py:577-694), is never repeated.  Global statistics
(N, avgdl, df, idf) depend only on the document set, so they pass through
unchanged; per-posting BM25 impacts are therefore bit-identical, and the
output is content-identical to a from-scratch build at the target geometry
(tested segment-row-for-row, like compaction).

Why this exists at 100 TB: block span is the salt unit that splits
stopword-skewed terms across shuffle partitions AND the WAND block-max
granularity.  The right span depends on corpus size and query shape — and
both change over an index's life (incremental merges grow N by orders of
magnitude).  Re-blocking is two shuffles over the
compressed postings — the attach-dls grouping and the new-geometry merge
re-key (bytes moved ≈ 2× compressed index size, no text) — versus
a full rebuild that re-reads and re-tokenizes every document.

Pipeline (all stages reuse the merge/compaction machinery, so re-block can
never drift from the build path):

  segments ⋈ doc_lens ─ _attach_dls ∘ split kernel (ONE grouped pass:
    attach dls, then re-key each run at new-block boundaries) ─► fragments
    ─ shuffle by hash(term, new_block) ─ _merge_kernel(new geometry) ─►
      segments'   (sub_offsets / sub_max recomputed for the new sub-span)
  doc_lens ─ split kernel ─► fragments ─ groupBy(new_block)
    ─ _doc_lens_merge_kernel ─► doc_lens'
  doc_stats / positions: doc_block is a derived column (doc_id // span) —
    recomputed as pure column arithmetic, no decode.
  term_stats / globals: copied through (document set unchanged).

Shrink (new_span a multiple of old): every old run lands whole in one new
block — the split kernel emits exactly one fragment per run and the merge
kernel concatenates same-term neighbours.  Split (new_span divides old):
runs fracture at new-block boundaries; fragments are single-source so the
merge kernel's ordered concat is a passthrough re-encode.  Arbitrary
incommensurate spans work too — the kernels only assume doc_ids ascend
within a run.
"""

from __future__ import annotations

import os
from dataclasses import asdict, replace

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import (
    decode_postings,
    varint_decode,
    varint_encode_segmented,
)
from instructor_embedding_spark.index.build import (
    DOC_LENS_SCHEMA,
    SEGMENT_SCHEMA,
    IndexHandle,
    IndexParams,
    _lineage_path,
    _write_lineage,
)
from instructor_embedding_spark.index.manifest import (
    ManifestStore,
    StageManifest,
    StageTimer,
    params_hash,
)
from instructor_embedding_spark.index.merge import (
    _RUN_WITH_DLS_SCHEMA,
    _attach_dls,
    _doc_lens_merge_kernel,
    _merge_kernel,
)

_EMPTY_RUNS = {
    "term": "object", "doc_block": "int64", "idf_new": "float64",
    "doc_bytes": "object", "tf_bytes": "object", "dls_run": "object",
}


def _split_runs_kernel(new_span: int):
    """Re-key encoded posting runs (with attached dls) at new-block
    boundaries: one whole-partition pass — per-run decode, then a single
    vectorized boundary scan + segmented re-encode across ALL fragments
    (no per-fragment codec calls, same amortization as the build encoder).
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {k: pd.Series([], dtype=v) for k, v in _EMPTY_RUNS.items()}
            )
        terms = pdf["term"].to_numpy()
        idfs = pdf["idf_new"].to_numpy()
        doc_col = pdf["doc_bytes"].to_numpy()
        tf_col = pdf["tf_bytes"].to_numpy()
        dl_col = pdf["dls_run"].to_numpy()
        ds: list[np.ndarray] = []
        ts: list[np.ndarray] = []
        ls: list[np.ndarray] = []
        for i in range(len(pdf)):
            d, t = decode_postings(bytes(doc_col[i]), bytes(tf_col[i]))
            ds.append(d)
            ts.append(t)
            ls.append(varint_decode(bytes(dl_col[i])))
        sizes = np.fromiter((a.size for a in ds), dtype=np.int64,
                            count=len(ds))
        all_d = np.concatenate(ds)
        all_t = np.concatenate(ts)
        all_l = np.concatenate(ls)
        run_of = np.repeat(np.arange(len(ds), dtype=np.int64), sizes)
        nb = (all_d // np.uint64(new_span)).astype(np.int64)
        newfrag = np.ones(all_d.size, dtype=bool)
        newfrag[1:] = (run_of[1:] != run_of[:-1]) | (nb[1:] != nb[:-1])
        fstarts = np.flatnonzero(newfrag)
        gaps = all_d.copy()
        gaps[1:] -= all_d[:-1]
        gaps[fstarts] = all_d[fstarts]
        return pd.DataFrame(
            {
                "term": terms[run_of[fstarts]],
                "doc_block": nb[fstarts],
                "idf_new": idfs[run_of[fstarts]].astype(np.float64),
                "doc_bytes": varint_encode_segmented(gaps, fstarts),
                "tf_bytes": varint_encode_segmented(all_t, fstarts),
                "dls_run": varint_encode_segmented(all_l, fstarts),
            }
        )

    return kernel


def _split_doc_lens_kernel(new_span: int):
    """Same re-key over the packed per-block (doc_ids, dls) rows; output
    fragments share DOC_LENS_SCHEMA so ``_doc_lens_merge_kernel`` folds
    them per new block unchanged."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "doc_block": pd.Series([], dtype="int64"),
                    "doc_ids_bin": pd.Series([], dtype="object"),
                    "dls_bin": pd.Series([], dtype="object"),
                    "n_docs": pd.Series([], dtype="int64"),
                    "bytes": pd.Series([], dtype="int64"),
                }
            )
        ids_col = pdf["doc_ids_bin"].to_numpy()
        dls_col = pdf["dls_bin"].to_numpy()
        ds = [
            np.cumsum(varint_decode(bytes(x)), dtype=np.uint64)
            for x in ids_col
        ]
        ls = [varint_decode(bytes(x)) for x in dls_col]
        sizes = np.fromiter((a.size for a in ds), dtype=np.int64,
                            count=len(ds))
        all_d = np.concatenate(ds)
        all_l = np.concatenate(ls)
        run_of = np.repeat(np.arange(len(ds), dtype=np.int64), sizes)
        nb = (all_d // np.uint64(new_span)).astype(np.int64)
        newfrag = np.ones(all_d.size, dtype=bool)
        newfrag[1:] = (run_of[1:] != run_of[:-1]) | (nb[1:] != nb[:-1])
        fstarts = np.flatnonzero(newfrag)
        fends = np.empty_like(fstarts)
        fends[:-1] = fstarts[1:]
        fends[-1] = all_d.size
        gaps = all_d.copy()
        gaps[1:] -= all_d[:-1]
        gaps[fstarts] = all_d[fstarts]
        d_bins = varint_encode_segmented(gaps, fstarts)
        l_bins = varint_encode_segmented(all_l, fstarts)
        return pd.DataFrame(
            {
                "doc_block": nb[fstarts],
                "doc_ids_bin": d_bins,
                "dls_bin": l_bins,
                "n_docs": (fends - fstarts),
                "bytes": [len(a) + len(b) for a, b in zip(d_bins, l_bins)],
            }
        )

    return kernel


def reblock_index(
    spark: SparkSession,
    src: IndexHandle,
    out_dir: str,
    doc_block_span: int | None = None,
    n_sub_blocks: int | None = None,
) -> IndexHandle:
    """Rewrite ``src`` into ``out_dir`` at a new block geometry.

    Content-identical to ``build_index`` over the same documents at the
    target geometry (tests/test_reblock.py byte-compares), but never
    touches document text.  Resumable like merge: a complete manifest for
    the same (source, geometry) short-circuits."""
    # `if X is None` (not `or`): an explicit invalid 0 must reach
    # IndexParams' positivity validation, not silently fall back
    params = replace(
        src.params,
        doc_block_span=(src.params.doc_block_span
                        if doc_block_span is None else doc_block_span),
        n_sub_blocks=(src.params.n_sub_blocks
                      if n_sub_blocks is None else n_sub_blocks),
    )
    store = ManifestStore(out_dir)
    phash = params_hash({**asdict(params), "source": src.index_dir,
                         "op": "reblock"})
    if store.is_complete("reblock", phash):
        return IndexHandle(index_dir=out_dir, n_docs=src.n_docs,
                           avgdl=src.avgdl, params=params)

    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    new_span = params.doc_block_span

    with StageTimer() as t_all:
        # ---- doc_lens: decode → re-key → merge per new block ------------
        p_doclens = os.path.join(out_dir, "doc_lens")
        (
            src.doc_lens(spark)
            .groupBy(F.pmod(F.hash("doc_block"), F.lit(nparts)).alias("part"))
            .applyInPandas(_split_doc_lens_kernel(new_span),
                           schema=DOC_LENS_SCHEMA)
            .groupBy("doc_block")
            .applyInPandas(_doc_lens_merge_kernel(), schema=DOC_LENS_SCHEMA)
            .write.mode("overwrite").parquet(p_doclens)
        )

        # ---- term_stats: document set unchanged → passthrough -----------
        p_termstats = os.path.join(out_dir, "term_stats")
        src.term_stats(spark).write.mode("overwrite").parquet(p_termstats)

        # ---- doc_stats: doc_block is derived — recompute as a column ----
        src.doc_stats(spark).withColumn(
            "doc_block",
            (F.col("doc_id") / F.lit(new_span)).cast("long"),
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "doc_stats"))

        # ---- segments: attach dls → split at new boundaries → merge -----
        dl_all = src.doc_lens(spark).select(
            "doc_block",
            F.col("doc_ids_bin").alias("src_ids_bin"),
            F.col("dls_bin").alias("src_dls_bin"),
        )
        # attach-dls and the split kernel are both whole-hash-partition
        # passes over the SAME (term, doc_block) grouping, so they chain
        # inside ONE applyInPandas: the r5 form ran them as two groupBys
        # on an identical key, paying a second full shuffle of the
        # compressed postings for nothing (the grouped-map output loses
        # its partitioning info, so the planner cannot elide it).  Bytes
        # moved is now attach + the new-geometry merge re-key ≈ 2× the
        # compressed index, as the module docstring claims.
        split = _split_runs_kernel(new_span)

        def _attach_and_split(pdf: pd.DataFrame) -> pd.DataFrame:
            return split(_attach_dls(pdf))

        fragments = (
            src.segments(spark)
            .withColumn("idf_new", F.col("idf"))
            .join(dl_all, "doc_block")
            .groupBy(
                F.pmod(F.hash("term", "doc_block"), F.lit(nparts))
                .alias("part")
            )
            .applyInPandas(_attach_and_split, schema=_RUN_WITH_DLS_SCHEMA)
        )
        p_segments = os.path.join(out_dir, "segments")
        (
            fragments
            .groupBy(
                F.pmod(F.hash("term", "doc_block"), F.lit(nparts))
                .alias("part")
            )
            .applyInPandas(_merge_kernel(params, src.avgdl),
                           schema=SEGMENT_SCHEMA)
            .sortWithinPartitions("term")
            .write.mode("overwrite").parquet(p_segments)
        )

        # ---- positions (optional): doc_block recompute, no decode -------
        if params.store_positions:
            (
                src.positions(spark)
                .withColumn(
                    "doc_block",
                    (F.col("doc_id") / F.lit(new_span)).cast("long"),
                )
                .repartition(nparts, "term", "doc_block")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "positions"))
            )

    store.write_globals(
        {"n_docs": src.n_docs, "avgdl": src.avgdl, "phash": phash,
         "params": asdict(params)}
    )
    seg_df = spark.read.parquet(p_segments)
    tot = _write_lineage(
        seg_df.groupBy(F.col("doc_block").alias("partition")).agg(
            F.count(F.lit(1)).alias("terms"),
            F.sum("df_block").alias("postings"),
            F.sum("bytes").alias("bytes"),
        ),
        out_dir, "reblock",
    )
    store.write(
        StageManifest(
            stage="reblock", phash=phash, status="complete",
            rows=int(tot["terms"]), wall_ms=t_all.ms,
            metrics={
                "source": src.index_dir,
                "from_span": src.params.doc_block_span,
                "to_span": new_span,
                "n_docs": src.n_docs,
                "bytes_compressed": int(tot["bytes"]),
                "postings": int(tot["postings"]),
                "lineage_path": _lineage_path(out_dir, "reblock"),
                "lineage_rows": int(tot["n_partitions"]),
            },
            lineage=[],
        )
    )
    return IndexHandle(index_dir=out_dir, n_docs=src.n_docs,
                       avgdl=src.avgdl, params=params)
