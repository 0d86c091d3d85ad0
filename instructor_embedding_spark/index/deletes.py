"""Tombstone deletes + compaction for the segmented index.

The Lucene live-docs lifecycle (segment files are immutable; deletes are a
side list consulted at query time and folded in at merge), re-expressed
for the parquet-backed index.  Reference analog: the reference has no
mutable index — its corpora are re-encoded wholesale (instructor.py:577) —
so this is part of the §2.10 incremental-lifecycle extension, alongside
streaming ingest and segment merge (index/merge.py).

Three operations:

1. :func:`delete_docs` — append doc_ids to ``<index>/tombstones``
   (parquet).  O(deleted) writes, the index files are untouched,
   idempotent (de-duplicated at read).
2. Query-time masking — :func:`wand_topk_live` (or ``wand_topk(...,
   deny_filter=...)``): tombstoned docs are dropped INSIDE the per-block
   kernel before the θ update and the per-group top-k cut, so results are
   exact over live docs.  Global stats (df/idf/avgdl/N) stay STALE by
   design — the standard engine semantics: a delete leaves results
   immediately, statistics refresh at compaction.  Equivalently: identical
   to filtered retrieval with the complement whitelist (property-tested).
3. :func:`compact_deletes` — rewrite into a fresh index dir with deleted
   postings dropped and N / avgdl / df / idf / block-max recomputed over
   the survivors.  Content-identical to a from-scratch build over the
   surviving documents (tested segment-row-for-row), so compaction never
   drifts from the build path.

Scale shape: tombstones pack to one varint row per doc_block
(query/wand.py ``_pack_filter``) and LEFT-join the query plan, so blocks
with no deletions — the overwhelming majority at any realistic delete
rate — pay nothing.  Compaction is two passes over only-what-changed plus
one stats-refresh re-encode (which ANY global-stats-exact engine must pay:
idf and avgdl change for every surviving posting): pass A decodes
doc_bytes for segments in touched blocks only to count removed df; pass B
is the shared :func:`~instructor_embedding_spark.index.merge.rewrite_segments`
shuffle, identical to the merge path.
"""

from __future__ import annotations

import os
from dataclasses import asdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import (
    varint_decode,
    varint_encode,
)
from instructor_embedding_spark.index.build import (
    DOC_LENS_SCHEMA,
    IndexHandle,
    _lineage_path,
    _write_lineage,
)
from instructor_embedding_spark.index.manifest import (
    ManifestStore,
    StageManifest,
    StageTimer,
    params_hash,
)
from instructor_embedding_spark.index.merge import rewrite_segments
from instructor_embedding_spark.query.wand import _pack_filter

TOMBSTONES = "tombstones"


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: DataFrame) -> int:
    """Tombstone ``doc_ids`` (a DataFrame with a doc_id column) in the
    index at ``index_dir``.  Appends to the tombstone list — no index file
    is rewritten; duplicate deletes are harmless (distinct at read).
    Returns the total distinct tombstone count after the append."""
    path = os.path.join(index_dir, TOMBSTONES)
    doc_ids.select(F.col("doc_id").cast("long")).write.mode("append").parquet(
        path
    )
    return spark.read.parquet(path).distinct().count()


def tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The index's distinct tombstoned doc_ids, or None if none exist."""
    path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path).select("doc_id").distinct()


def wand_topk_live(spark: SparkSession, handle: IndexHandle,
                   queries: DataFrame, k: int = 10, **kwargs) -> DataFrame:
    """:func:`~instructor_embedding_spark.query.wand.wand_topk` over live
    (non-tombstoned) docs — the read path a user should default to."""
    from instructor_embedding_spark.query.wand import wand_topk

    return wand_topk(
        spark, handle, queries, k=k,
        deny_filter=tombstones(spark, handle.index_dir), **kwargs,
    )


_REMOVED_SCHEMA = "term string, removed long"


def _removed_df_kernel(it):
    """Per-batch (term, removed-posting-count) over segments ⋈ deny blocks:
    decodes ONLY doc_bytes (gap varints), counts tombstone membership."""
    for pdf in it:
        deny_cache: dict[bytes, np.ndarray] = {}
        terms: list[str] = []
        removed: list[int] = []
        for term, doc_b, deny_b in zip(
            pdf["term"].to_numpy(), pdf["doc_bytes"].to_numpy(),
            pdf["denied_bin"].to_numpy(),
        ):
            key = bytes(deny_b)
            if key not in deny_cache:
                deny_cache[key] = np.cumsum(
                    varint_decode(key), dtype=np.uint64
                )
            denied = deny_cache[key]
            d = np.cumsum(varint_decode(bytes(doc_b)), dtype=np.uint64)
            pos = np.searchsorted(denied, d)
            hit = (pos < denied.size) & (
                denied[np.minimum(pos, denied.size - 1)] == d
            )
            n = int(hit.sum())
            if n:
                terms.append(term)
                removed.append(n)
        yield pd.DataFrame({"term": terms, "removed": removed})


def _doc_lens_compact_kernel():
    """Mask one doc_lens block against its (possibly NULL) tombstone pack;
    clean blocks pass their original bytes through untouched."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        block = int(pdf["doc_block"].iloc[0])
        d_bin = bytes(pdf["doc_ids_bin"].iloc[0])
        l_bin = bytes(pdf["dls_bin"].iloc[0])
        deny_b = pdf["denied_bin"].iloc[0]
        if deny_b is None:
            return pd.DataFrame(
                {
                    "doc_block": [block],
                    "doc_ids_bin": [d_bin],
                    "dls_bin": [l_bin],
                    "n_docs": [int(pdf["n_docs"].iloc[0])],
                    "bytes": [len(d_bin) + len(l_bin)],
                }
            )
        denied = np.cumsum(varint_decode(bytes(deny_b)), dtype=np.uint64)
        ids = np.cumsum(varint_decode(d_bin), dtype=np.uint64)
        dls = varint_decode(l_bin)
        pos = np.searchsorted(denied, ids)
        dead = (pos < denied.size) & (
            denied[np.minimum(pos, denied.size - 1)] == ids
        )
        if dead.all():
            return pd.DataFrame(
                {k: pd.Series([], dtype="object" if k.endswith("_bin")
                              else "int64")
                 for k in ("doc_block", "doc_ids_bin", "dls_bin", "n_docs",
                           "bytes")}
            )
        ids, dls = ids[~dead], dls[~dead]
        gaps = np.empty_like(ids)
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        nd_bin = varint_encode(gaps)
        nl_bin = varint_encode(dls)
        return pd.DataFrame(
            {
                "doc_block": [block],
                "doc_ids_bin": [nd_bin],
                "dls_bin": [nl_bin],
                "n_docs": [int(ids.size)],
                "bytes": [len(nd_bin) + len(nl_bin)],
            }
        )

    return kernel


def compact_deletes(spark: SparkSession, handle: IndexHandle,
                    out_dir: str) -> IndexHandle:
    """Fold the index's tombstones in: a fresh index at ``out_dir`` with
    deleted postings dropped and every statistic recomputed over the
    survivors — content-identical to building from scratch over the
    surviving documents (tested), without needing the source documents.

    With no tombstones this degrades to the single-source merge (still a
    full stats-preserving rewrite — useful for re-blocking, not a no-op).
    """
    ts = tombstones(spark, handle.index_dir)
    if ts is None:
        from instructor_embedding_spark.index.merge import merge_indexes

        return merge_indexes(spark, [handle], out_dir)

    params = handle.params
    span = params.doc_block_span
    store = ManifestStore(out_dir)

    ts = ts.cache()
    try:
        n_deleted = ts.count()
        deny_blocks = _pack_filter(ts, span, "denied_bin").cache()

        with StageTimer() as t_all:
            # ---- survivor globals + doc_stats ---------------------------
            ds_new = handle.doc_stats(spark).join(ts, "doc_id", "left_anti")
            ds_new.write.mode("overwrite").parquet(
                os.path.join(out_dir, "doc_stats")
            )
            ds_back = spark.read.parquet(os.path.join(out_dir, "doc_stats"))
            row = ds_back.agg(
                F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
            ).collect()[0]
            n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)

            # ---- fresh term_stats: df minus tombstoned postings ---------
            # pass A touches ONLY segments in blocks that have deletions
            # (inner join on the deny pack) and decodes only doc_bytes.
            removed = (
                handle.segments(spark)
                .select("term", "doc_block", "doc_bytes")
                .join(deny_blocks, "doc_block")
                .mapInPandas(_removed_df_kernel, schema=_REMOVED_SCHEMA)
                .groupBy("term")
                .agg(F.sum("removed").alias("removed"))
            )
            ts_new = (
                handle.term_stats(spark).select("term", "df")
                .join(removed, "term", "left")
                .withColumn(
                    "df", F.col("df") - F.coalesce("removed", F.lit(0))
                )
                .filter(F.col("df") > 0)
                .withColumn(
                    "idf",
                    F.log(
                        F.lit(1.0)
                        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))
                    ),
                )
                .select("term", "df", "idf")
            )
            p_termstats = os.path.join(out_dir, "term_stats")
            ts_new.write.mode("overwrite").parquet(p_termstats)

            # ---- doc_lens: mask touched blocks, pass clean ones through -
            (
                handle.doc_lens(spark)
                .join(deny_blocks, "doc_block", "left")
                .groupBy("doc_block")
                .applyInPandas(_doc_lens_compact_kernel(),
                               schema=DOC_LENS_SCHEMA)
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "doc_lens"))
            )

            # ---- segments: the shared merge rewrite, deny-masked --------
            # dl_union is the PRE-delete doc_lens: runs must align with
            # their source rows; surviving docs' dls are unchanged.
            p_segments = os.path.join(out_dir, "segments")
            (
                rewrite_segments(
                    spark, handle.segments(spark), handle.doc_lens(spark),
                    spark.read.parquet(p_termstats), params, avgdl,
                    deny_blocks=deny_blocks,
                )
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(p_segments)
            )

            # ---- positions side index: plain anti-join ------------------
            if params.store_positions:
                nparts = int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                )
                (
                    handle.positions(spark)
                    .join(ts, "doc_id", "left_anti")
                    .repartition(nparts, "term", "doc_block")
                    .sortWithinPartitions("term")
                    .write.mode("overwrite")
                    .parquet(os.path.join(out_dir, "positions"))
                )
    finally:
        ts.unpersist()
        try:
            deny_blocks.unpersist()
        except NameError:
            pass

    phash = params_hash(
        {**asdict(params), "source": handle.index_dir,
         "n_deleted": n_deleted}
    )
    store.write_globals(
        {"n_docs": n_docs, "avgdl": avgdl, "phash": phash,
         "params": asdict(params)}
    )
    seg_df = spark.read.parquet(p_segments)
    tot = _write_lineage(
        seg_df.groupBy(F.col("doc_block").alias("partition")).agg(
            F.count(F.lit(1)).alias("terms"),
            F.sum("df_block").alias("postings"),
            F.sum("bytes").alias("bytes"),
        ),
        out_dir, "compact",
    )
    store.write(
        StageManifest(
            stage="compact", phash=phash, status="complete",
            rows=int(tot["terms"]), wall_ms=t_all.ms,
            metrics={"n_deleted": n_deleted, "n_docs": n_docs,
                     "n_docs_before": handle.n_docs,
                     "bytes_compressed": int(tot["bytes"]),
                     "postings": int(tot["postings"]),
                     "lineage_path": _lineage_path(out_dir, "compact"),
                     "lineage_rows": int(tot["n_partitions"])},
            lineage=[],
        )
    )
    return IndexHandle(index_dir=out_dir, n_docs=n_docs, avgdl=avgdl,
                       params=params)
