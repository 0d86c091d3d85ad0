"""Multi-way segment merge: combine K independently-built indexes into one.

The incremental-ingest path: corpora arrive in batches (disjoint doc_id
ranges — caller's contract, e.g. per-batch id offsets), each batch is
indexed independently (cheap, local), and this stage k-way merges the
per-batch segment sets into a global index — the Lucene-style segment
lifecycle, expressed as one Spark job:

1. union all sources' packed doc_lens → global N, avgdl (weighted)
2. union all sources' term_stats → global df per term → fresh idf
   (idf/avgdl CHANGE when corpora combine, so block-max metadata must be
   recomputed — stale upper bounds would break WAND's exactness guarantee)
3. shuffle segment rows by hash(term, doc_block); one kernel invocation
   per partition decodes each (term, doc_block) group's posting runs,
   merges them in doc_id order (ordered concat for disjoint ranges,
   mergesort otherwise), recomputes impacts with the global idf/avgdl,
   re-encodes delta+varint + fresh sub-block maxima

The merged output is a normal index dir (manifest + parquet) usable by
``load_index`` / ``wand_topk``; merging an index with itself is idempotent
in content (tested).
"""

from __future__ import annotations

import os
from dataclasses import asdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import (
    decode_postings,
    varint_decode,
    varint_encode,
    varint_encode_segmented,
)
from instructor_embedding_spark.index.build import (
    DOC_LENS_SCHEMA,
    SEGMENT_SCHEMA,
    IndexHandle,
    IndexParams,
)
from instructor_embedding_spark.index.manifest import (
    ManifestStore,
    StageManifest,
    StageTimer,
    params_hash,
)


def _merge_kernel(params: IndexParams, avgdl: float, deny: bool = False):
    """One hash partition of (term, doc_block) groups; each group holds one
    or more encoded runs from the source indexes.

    With ``deny`` each row MAY carry a ``denied_bin`` varint-delta column
    (the block's tombstoned doc_ids; NULL for clean blocks) — denied
    postings are dropped after decode, and groups that empty out vanish
    (the compaction path, index/deletes.py)."""
    span, n_sub, sub_span = (
        params.doc_block_span, params.n_sub_blocks, params.sub_span,
    )
    k1, b = params.k1, params.b

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {
            "term": [], "doc_block": [], "idf": [], "df_block": [],
            "doc_bytes": [], "tf_bytes": [], "sub_offsets": [],
            "sub_max": [], "bytes": [],
        }
        if len(pdf) == 0:
            return pd.DataFrame(
                {k: pd.Series([], dtype="object" if k in (
                    "term", "doc_bytes", "tf_bytes", "sub_offsets", "sub_max"
                ) else ("float64" if k == "idf" else "int64"))
                 for k in out}
            )
        pdf = pdf.sort_values(["term", "doc_block"], kind="stable",
                              ignore_index=True)
        terms = pdf["term"].to_numpy()
        blocks = pdf["doc_block"].to_numpy()
        new_grp = np.empty(len(pdf), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (terms[1:] != terms[:-1]) | (blocks[1:] != blocks[:-1])
        starts = np.flatnonzero(new_grp)
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = len(pdf)

        sub_idx = np.arange(1, n_sub + 1, dtype=np.int64)
        doc_col = pdf["doc_bytes"].to_numpy()
        tf_col = pdf["tf_bytes"].to_numpy()
        dls_col = pdf["dls_run"].to_numpy()
        idf_col = pdf["idf_new"].to_numpy()
        deny_col = pdf["denied_bin"].to_numpy() if deny else None
        deny_cache: dict[bytes, np.ndarray] = {}

        # pass 1: decode + merge per group, accumulate merged arrays; the
        # (re-)encode happens ONCE over the whole partition afterwards
        # (segmented varint — same rationale as the build encoder)
        merged_d: list[np.ndarray] = []
        merged_t: list[np.ndarray] = []
        for lo, hi in zip(starts, ends):
            runs = [
                decode_postings(doc_col[r], tf_col[r])
                for r in range(lo, hi)
            ]
            d = np.concatenate([r[0] for r in runs])
            t = np.concatenate([r[1] for r in runs])
            dls = np.concatenate(
                [varint_decode(dls_col[r]) for r in range(lo, hi)]
            ).astype(np.float64)
            if hi - lo > 1:
                order = np.argsort(d, kind="stable")
                d, t, dls = d[order], t[order], dls[order]
                if d.size > 1 and np.any(d[1:] == d[:-1]):
                    raise ValueError(
                        f"duplicate doc_id across merged indexes for term "
                        f"{terms[lo]!r} block {int(blocks[lo])} — sources "
                        "must have disjoint doc_id ranges"
                    )
            if deny_col is not None and deny_col[lo] is not None:
                key = bytes(deny_col[lo])
                if key not in deny_cache:
                    deny_cache[key] = np.cumsum(
                        varint_decode(key), dtype=np.uint64
                    )
                denied = deny_cache[key]
                pos = np.searchsorted(denied, d)
                dead = (pos < denied.size) & (
                    denied[np.minimum(pos, denied.size - 1)] == d
                )
                if dead.all():
                    continue  # every posting tombstoned: group vanishes
                d, t, dls = d[~dead], t[~dead], dls[~dead]
            idf = float(idf_col[lo])
            tff = t.astype(np.float64)
            impacts = idf * (
                tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dls / avgdl))
            )
            block = int(blocks[lo])
            bounds = (block * span + sub_idx * sub_span).astype(np.uint64)
            offsets = np.zeros(n_sub + 1, dtype=np.int64)
            offsets[1:] = np.searchsorted(d, bounds, "left")
            sub_max = np.zeros(n_sub, dtype=np.float64)
            nonempty = np.flatnonzero(offsets[1:] > offsets[:-1])
            if nonempty.size:
                sub_max[nonempty] = np.maximum.reduceat(
                    impacts, offsets[nonempty]
                )
            merged_d.append(d)
            merged_t.append(t)
            out["term"].append(terms[lo])
            out["doc_block"].append(block)
            out["idf"].append(idf)
            out["df_block"].append(int(d.size))
            out["sub_offsets"].append(offsets.astype(np.int32).tolist())
            out["sub_max"].append(sub_max.tolist())

        # pass 2: one segmented encode over all merged postings
        sizes = np.fromiter((a.size for a in merged_d), dtype=np.int64,
                            count=len(merged_d))
        gstarts = np.zeros(sizes.size, dtype=np.int64)
        np.cumsum(sizes[:-1], out=gstarts[1:])
        all_d = np.concatenate(merged_d) if merged_d else np.empty(
            0, dtype=np.uint64
        )
        all_t = np.concatenate(merged_t) if merged_t else np.empty(
            0, dtype=np.uint64
        )
        gaps = all_d.copy()
        if gaps.size:
            gaps[1:] -= all_d[:-1]
            gaps[gstarts] = all_d[gstarts]
        out["doc_bytes"] = varint_encode_segmented(gaps, gstarts)
        out["tf_bytes"] = varint_encode_segmented(all_t, gstarts)
        out["bytes"] = [
            len(a) + len(b) for a, b in zip(out["doc_bytes"], out["tf_bytes"])
        ]
        return pd.DataFrame(out)

    return kernel


def _doc_lens_merge_kernel():
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        block = int(pdf["doc_block"].iloc[0])
        ids = np.concatenate(
            [np.cumsum(varint_decode(x), dtype=np.uint64)
             for x in pdf["doc_ids_bin"]]
        )
        dls = np.concatenate([varint_decode(x) for x in pdf["dls_bin"]])
        order = np.argsort(ids, kind="stable")
        ids, dls = ids[order], dls[order]
        gaps = np.empty_like(ids)
        if ids.size:
            gaps[0] = ids[0]
            np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        d_bin = varint_encode(gaps)
        l_bin = varint_encode(dls)
        return pd.DataFrame(
            {
                "doc_block": [block],
                "doc_ids_bin": [d_bin],
                "dls_bin": [l_bin],
                "n_docs": [int(ids.size)],
                "bytes": [len(d_bin) + len(l_bin)],
            }
        )

    return kernel


#: kernel-side dls extraction needs the run's own doc ids and its
#: source block dls; we pass all source rows for the block
#: (duplicates per source are disambiguated by searchsorted)
_RUN_WITH_DLS_SCHEMA = (
    "term string, doc_block long, idf_new double, doc_bytes binary, "
    "tf_bytes binary, dls_run binary"
)


def _attach_dls(pdf: pd.DataFrame) -> pd.DataFrame:
    # column-array iteration (no pandas iterrows — per-row Series
    # construction is the slow path at millions of runs/partition)
    ids_cache: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}
    rows: dict[str, list] = {
        "term": [], "doc_block": [], "idf_new": [],
        "doc_bytes": [], "tf_bytes": [], "dls_run": [],
    }
    cols = [
        pdf[c].to_numpy()
        for c in ("term", "doc_block", "idf_new", "doc_bytes",
                  "tf_bytes", "src_ids_bin", "src_dls_bin")
    ]
    for term, doc_block, idf_new, doc_b, tf_b, src_ids_b, \
            src_dls_b in zip(*cols):
        key = bytes(src_ids_b)
        if key not in ids_cache:
            ids_cache[key] = (
                np.cumsum(varint_decode(key), dtype=np.uint64),
                varint_decode(bytes(src_dls_b)),
            )
        src_ids, src_dls = ids_cache[key]
        d, _t = decode_postings(bytes(doc_b), bytes(tf_b))
        pos = np.searchsorted(src_ids, d)
        # runs from a DIFFERENT source won't align — detect by
        # membership and skip (each run matches exactly one source)
        if d.size == 0 or np.any(pos >= src_ids.size) or not (
            np.array_equal(src_ids[pos], d)
        ):
            continue
        rows["term"].append(term)
        rows["doc_block"].append(int(doc_block))
        rows["idf_new"].append(float(idf_new))
        rows["doc_bytes"].append(bytes(doc_b))
        rows["tf_bytes"].append(bytes(tf_b))
        rows["dls_run"].append(varint_encode(src_dls[pos]))
    return pd.DataFrame(rows) if rows["term"] else pd.DataFrame(
        {k: pd.Series(
            [], dtype="float64" if k == "idf_new"
            else ("int64" if k == "doc_block" else "object"))
         for k in rows}
    )


def rewrite_segments(
    spark: SparkSession,
    segments: DataFrame,
    dl_union: DataFrame,
    term_stats: DataFrame,
    params: IndexParams,
    avgdl: float,
    deny_blocks: DataFrame | None = None,
) -> DataFrame:
    """Re-encode segment runs under fresh global stats — the shared engine
    of merge (K sources, no deny) and compaction (1 source + tombstones).

    ``term_stats`` carries the FRESH (term, idf); terms absent from it
    (df dropped to 0 under deletion) vanish via the inner join.
    ``dl_union`` is the SOURCE doc_lens — per-(term,block) runs need their
    docs' dls, derived by joining the source's packed doc_lens rows on
    doc_block and slicing in the kernel (storing dls alongside postings at
    build time would be overkill; re-deriving via a doc-level join would
    re-shuffle).  ``deny_blocks`` is an optional (doc_block, denied_bin)
    tombstone pack, LEFT-joined so clean blocks pay nothing."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dl_all = dl_union.select(
        "doc_block",
        F.col("doc_ids_bin").alias("src_ids_bin"),
        F.col("dls_bin").alias("src_dls_bin"),
    )
    joined = segments.join(
        term_stats.select("term", F.col("idf").alias("idf_new")), "term"
    )
    # slice each run's dls out of its source doc_lens row (small
    # applyInPandas over segment rows joined to the matching source row —
    # one row per (run, source block))
    runs = (
        joined.join(dl_all, "doc_block")
        .groupBy(
            F.pmod(F.hash("term", "doc_block"), F.lit(nparts)).alias("part")
        )
        .applyInPandas(_attach_dls, schema=_RUN_WITH_DLS_SCHEMA)
    )
    if deny_blocks is not None:
        runs = runs.join(deny_blocks, "doc_block", "left")
    return (
        runs.withColumn(
            "part", F.pmod(F.hash("term", "doc_block"), F.lit(nparts))
        )
        .groupBy("part")
        .applyInPandas(
            _merge_kernel(params, avgdl, deny=deny_blocks is not None),
            schema=SEGMENT_SCHEMA,
        )
    )


def merge_indexes(
    spark: SparkSession,
    sources: list[IndexHandle],
    out_dir: str,
    params: IndexParams | None = None,
) -> IndexHandle:
    """K-way merge of ≥1 indexes (disjoint doc_id ranges) into ``out_dir``.

    All sources must share doc_block_span / n_sub_blocks / k1 / b."""
    assert sources, "need at least one source index"
    params = params or sources[0].params
    for s in sources:
        assert (
            s.params.doc_block_span == params.doc_block_span
            and s.params.n_sub_blocks == params.n_sub_blocks
        ), "merge requires identical block geometry"

    # positions side index: per-(doc, term) position rows don't depend on
    # global stats, so merging is a plain union — but only when EVERY
    # source built the stage; otherwise the merged params must stop
    # advertising store_positions, or handle.positions()/phrase_topk would
    # fail on a missing path.
    merge_positions = params.store_positions and all(
        s.params.store_positions for s in sources
    )
    if params.store_positions and not merge_positions:
        from dataclasses import replace

        params = replace(params, store_positions=False)

    store = ManifestStore(out_dir)
    phash = params_hash(
        {**asdict(params), "sources": [s.index_dir for s in sources]}
    )

    # ---- global stats ----------------------------------------------------
    n_docs = sum(s.n_docs for s in sources)
    avgdl = (
        sum(s.avgdl * s.n_docs for s in sources) / n_docs if n_docs else 0.0
    )

    with StageTimer() as t_all:
        # merged doc_lens (also carries per-run dls into the segment merge)
        dl_union = sources[0].doc_lens(spark)
        for s in sources[1:]:
            dl_union = dl_union.unionByName(s.doc_lens(spark))
        p_doclens = os.path.join(out_dir, "doc_lens")
        (
            dl_union.groupBy("doc_block")
            .applyInPandas(_doc_lens_merge_kernel(), schema=DOC_LENS_SCHEMA)
            .write.mode("overwrite").parquet(p_doclens)
        )

        # fresh global df/idf
        ts_union = sources[0].term_stats(spark).select("term", "df")
        for s in sources[1:]:
            ts_union = ts_union.unionByName(
                s.term_stats(spark).select("term", "df")
            )
        ts = ts_union.groupBy("term").agg(F.sum("df").alias("df")).withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        p_termstats = os.path.join(out_dir, "term_stats")
        ts.write.mode("overwrite").parquet(p_termstats)

        # segment merge: attach fresh idf + per-run dls, shuffle, merge
        seg_union = sources[0].segments(spark)
        for s in sources[1:]:
            seg_union = seg_union.unionByName(s.segments(spark))
        p_segments = os.path.join(out_dir, "segments")
        merged = rewrite_segments(
            spark, seg_union, dl_union,
            spark.read.parquet(p_termstats), params, avgdl,
        )
        merged.sortWithinPartitions("term").write.mode("overwrite").parquet(
            p_segments
        )

        # doc_stats union (parquet passthrough)
        ds_union = sources[0].doc_stats(spark)
        for s in sources[1:]:
            ds_union = ds_union.unionByName(s.doc_stats(spark))
        ds_union.write.mode("overwrite").parquet(
            os.path.join(out_dir, "doc_stats")
        )

        if merge_positions:
            nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
            pos_union = sources[0].positions(spark)
            for s in sources[1:]:
                pos_union = pos_union.unionByName(s.positions(spark))
            (
                pos_union.repartition(nparts, "term", "doc_block")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "positions"))
            )

    store.write_globals(
        {"n_docs": n_docs, "avgdl": avgdl, "phash": phash,
         "params": asdict(params)}
    )
    from instructor_embedding_spark.index.build import (
        _lineage_path,
        _write_lineage,
    )

    seg_df = spark.read.parquet(p_segments)
    tot = _write_lineage(
        seg_df.groupBy(F.col("doc_block").alias("partition")).agg(
            F.count(F.lit(1)).alias("terms"),
            F.sum("df_block").alias("postings"),
            F.sum("bytes").alias("bytes"),
        ),
        out_dir, "merge",
    )
    store.write(
        StageManifest(
            stage="merge", phash=phash, status="complete",
            rows=int(tot["terms"]), wall_ms=t_all.ms,
            metrics={"sources": len(sources), "n_docs": n_docs,
                     "bytes_compressed": int(tot["bytes"]),
                     "postings": int(tot["postings"]),
                     "lineage_path": _lineage_path(out_dir, "merge"),
                     "lineage_rows": int(tot["n_partitions"])},
            lineage=[],
        )
    )
    return IndexHandle(index_dir=out_dir, n_docs=n_docs, avgdl=avgdl,
                       params=params)
