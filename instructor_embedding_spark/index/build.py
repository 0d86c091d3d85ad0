"""Inverted-index build pipeline (checkpointed, lineage-tracked).

Stage graph (each stage = one parquet checkpoint + manifest; restart skips
complete stages whose parameter hash matches):

  documents ─ tokenize (vectorized) ─► postings_raw  (term, doc_id, tf, dl, doc_block)
            └───────────────────────► doc_stats      (doc_id, dl, doc_block)
  doc_stats ─ per-block pack ───────► doc_lens       (doc_block, doc_ids/dls varint)
  postings_raw ─ groupBy(term) ─────► term_stats     (term, df, idf)  + globals N, avgdl
  postings_raw ⋈ term_stats
     ─ salted repartition by (term, doc_block) ─ encode ─► segments
       (term, doc_block, idf, df_block, doc_bytes, tf_bytes,
        sub_offsets, sub_max, bytes)

Scale design notes (local[32] today, 1000 executors tomorrow):

- The tokenize stage is ONE narrow ``mapInPandas`` pass: tf is a per-doc
  aggregate, so it's counted map-side with zero shuffle (tfcount.py); the
  same pass emits a NULL-term row per doc that becomes doc_stats.  The only
  wide stages in the whole build are the df aggregation and the salted
  segment repartition, both over already-aggregated (doc, term) triples.
- The segment shuffle keys on (term, doc_block): doc_block (= doc_id //
  span) is the deterministic salt that splits stopword-like skewed terms
  across partitions, bounding any single task's postings to one term-block.
  AQE skew-join handles residual imbalance.
- Segments are written sorted by term within files, so query-time term
  filters prune parquet row groups; the doc_block column gives
  document-partitioned locality for block-max WAND (all of a query's terms
  for a doc range land in one group).
- impacts (idf * (k1+1) * tf / (tf + k1*(1-b+b*dl/avgdl))) are precomputed
  at build time into per-sub-block maxima — the block-max WAND skip
  metadata; exact doubles, so upper bounds are true bounds.

Reference analog: the encode pipeline instructor.py:577-694 (tokenize →
batch → pooled vectors) is the reference's "index build"; its chunked
corpus scan (RetrievalEvaluator.py:123-142) maps to our doc_block
partitioning (SURVEY.md §3.1).
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.codec import (
    varint_encode,
    varint_encode_segmented,
)
from instructor_embedding_spark.functions.batching import length_sorted
from instructor_embedding_spark.functions.tfcount import tf_pairs_map_side
from instructor_embedding_spark.index.manifest import (
    ManifestStore,
    StageManifest,
    StageTimer,
    params_hash,
)
from instructor_embedding_spark.query.bm25 import K1, B


@dataclass(frozen=True)
class IndexParams:
    doc_block_span: int = 8192      # docs per doc_block (the salt unit)
    n_sub_blocks: int = 16          # block-max granularity inside a block
    k1: float = K1
    b: float = B
    use_pandas_udf_tokenizer: bool = False
    segment_shuffle_partitions: int | None = None
    corpus_fingerprint: str = ""    # caller-supplied input identity
    store_positions: bool = False   # optional positional side index (phrase)
    #: W6 (instructor.py:632-641): length-sort docs WITHIN partitions
    #: before the tokenize UDF so each Arrow batch sees similar-length
    #: texts.  Logical output is identical (keyed rows, order-free
    #: downstream aggregation); measured default-off for the lexical
    #: kernel — see functions/batching.py.
    length_sorted_batches: bool = False

    def __post_init__(self) -> None:
        # sub_span floor-truncates: with a non-divisible combination the
        # trailing doc slots of every block would fall past the final
        # sub-block bound and the WAND kernel would silently never score
        # them.  Reject at construction (covers build, merge, and the CLI).
        if self.doc_block_span <= 0 or self.n_sub_blocks <= 0:
            raise ValueError(
                "doc_block_span and n_sub_blocks must be positive "
                f"(got {self.doc_block_span}, {self.n_sub_blocks})"
            )
        if self.doc_block_span % self.n_sub_blocks != 0:
            raise ValueError(
                f"doc_block_span ({self.doc_block_span}) must be divisible "
                f"by n_sub_blocks ({self.n_sub_blocks}); otherwise the last "
                "doc slots of every block are outside sub-block coverage"
            )

    @property
    def sub_span(self) -> int:
        return self.doc_block_span // self.n_sub_blocks


SEGMENT_SCHEMA = (
    "term string, doc_block long, idf double, df_block long, "
    "doc_bytes binary, tf_bytes binary, sub_offsets array<int>, "
    "sub_max array<double>, bytes long"
)

#: encoder output BEFORE idf is attached: the per-posting shuffle into
#: the encoder carries no idf column (8 bytes/posting saved, and the
#: term_stats join moves off the |postings| rows onto the ~|postings|/avgdl
#: (term, doc_block) segment rows).  idf is constant within a segment
#: and positive, so idf·max(f) == max(idf·f) bit-for-bit — the stored
#: sub_max is unchanged (byte-identity restart tests cover it).
SEGMENT_ENC_SCHEMA = (
    "term string, doc_block long, df_block long, "
    "doc_bytes binary, tf_bytes binary, sub_offsets array<int>, "
    "sub_max array<double>, bytes long"
)

DOC_LENS_SCHEMA = (
    "doc_block long, doc_ids_bin binary, dls_bin binary, n_docs long, bytes long"
)


@dataclass
class IndexHandle:
    index_dir: str
    n_docs: int
    avgdl: float
    params: IndexParams

    def segments(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "segments"))

    def doc_lens(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "doc_lens"))

    def term_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "term_stats"))

    def doc_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "doc_stats"))

    def positions(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.index_dir, "positions"))


def _lineage_path(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, "lineage", stage)


def _write_lineage(lin_df: DataFrame, index_dir: str, stage: str) -> dict:
    """Persist per-partition lineage as parquet (never collected — at the
    SCALING.md design point it's ~10^6 rows/stage); return the one-row
    stage totals: n_partitions + sum of every numeric lineage column."""
    path = _lineage_path(index_dir, stage)
    lin_df.write.mode("overwrite").parquet(path)
    back = lin_df.sparkSession.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_partitions")] + [
        F.sum(c).alias(c) for c in back.columns if c != "partition"
    ]
    return back.agg(*aggs).collect()[0].asDict()


def _segment_bulk_encoder(params: IndexParams, avgdl: float):
    """applyInPandas kernel over one HASH PARTITION of (term, doc_block)
    groups — thousands of posting lists encoded per invocation.

    A per-(term, doc_block) grouped-map would pay pandas group dispatch +
    tiny-DataFrame construction for every posting list (milliseconds each ×
    millions of term-blocks at scale); here one C-speed sort + boundary
    scan amortizes that across the whole shuffle partition.
    """
    span, n_sub, sub_span = (
        params.doc_block_span,
        params.n_sub_blocks,
        params.sub_span,
    )
    k1, b = params.k1, params.b

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "doc_block": pd.Series([], dtype="int64"),
                    "df_block": pd.Series([], dtype="int64"),
                    "doc_bytes": pd.Series([], dtype="object"),
                    "tf_bytes": pd.Series([], dtype="object"),
                    "sub_offsets": pd.Series([], dtype="object"),
                    "sub_max": pd.Series([], dtype="object"),
                    "bytes": pd.Series([], dtype="int64"),
                }
            )
        pdf = pdf.sort_values(
            ["term", "doc_block", "doc_id"], kind="stable", ignore_index=True
        )
        terms = pdf["term"].to_numpy()
        blocks = pdf["doc_block"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy().astype(np.uint64)
        tfs = pdf["tf"].to_numpy().astype(np.uint64)
        dls = pdf["dl"].to_numpy().astype(np.float64)

        # idf-free impact factors, vectorized once across the partition;
        # the true impact is idf * f and idf is constant per (term,
        # doc_block), so sub_max is attached post-kernel as idf * max(f)
        # — the identical product (see SEGMENT_ENC_SCHEMA note)
        tff = tfs.astype(np.float64)
        impacts = (
            tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dls / avgdl))
        )

        # group boundaries: change of (term, doc_block)
        new_grp = np.empty(len(pdf), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (terms[1:] != terms[:-1]) | (blocks[1:] != blocks[:-1])
        starts = np.flatnonzero(new_grp)
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = len(pdf)

        # codec runs ONCE over the whole partition (segmented varint):
        # per-group encode calls would dominate at millions of
        # (term, doc_block) posting lists per task
        gaps = doc_ids.copy()
        gaps[1:] -= doc_ids[:-1]
        gaps[starts] = doc_ids[starts]
        doc_blobs = varint_encode_segmented(gaps, starts)
        tf_blobs = varint_encode_segmented(tfs, starts)

        out: dict[str, list] = {
            "term": [], "doc_block": [], "df_block": [],
            "doc_bytes": [], "tf_bytes": [], "sub_offsets": [],
            "sub_max": [], "bytes": [],
        }
        sub_idx = np.arange(1, n_sub + 1, dtype=np.int64)
        for g, (lo, hi) in enumerate(zip(starts, ends)):
            d = doc_ids[lo:hi]
            imp = impacts[lo:hi]
            block = int(blocks[lo])
            doc_bytes, tf_bytes = doc_blobs[g], tf_blobs[g]
            base = block * span
            bounds = (base + sub_idx * sub_span).astype(np.uint64)
            offsets = np.zeros(n_sub + 1, dtype=np.int64)
            offsets[1:] = np.searchsorted(d, bounds, "left")
            sub_max = np.zeros(n_sub, dtype=np.float64)
            nonempty = np.flatnonzero(offsets[1:] > offsets[:-1])
            if nonempty.size:
                red = np.maximum.reduceat(imp, offsets[nonempty])
                sub_max[nonempty] = red
            out["term"].append(terms[lo])
            out["doc_block"].append(block)
            out["df_block"].append(int(d.size))
            out["doc_bytes"].append(doc_bytes)
            out["tf_bytes"].append(tf_bytes)
            out["sub_offsets"].append(offsets.astype(np.int32).tolist())
            out["sub_max"].append(sub_max.tolist())
            out["bytes"].append(len(doc_bytes) + len(tf_bytes))
        return pd.DataFrame(out)

    return encode


def _doc_lens_packer(params: IndexParams):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        block = int(pdf["doc_block"].iloc[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
        dls = pdf["dl"].to_numpy()[order].astype(np.uint64)
        d_bin = varint_encode(np.diff(doc_ids, prepend=np.uint64(0)).astype(np.uint64))
        # NOTE: prepend=0 makes gaps[0] = doc_ids[0] (absolute), matching codec
        l_bin = varint_encode(dls)
        return pd.DataFrame(
            {
                "doc_block": [block],
                "doc_ids_bin": [d_bin],
                "dls_bin": [l_bin],
                "n_docs": [int(doc_ids.size)],
                "bytes": [len(d_bin) + len(l_bin)],
            }
        )

    return pack


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    params: IndexParams = IndexParams(),
    text_col: str = "content",
    id_col: str = "doc_id",
    resume: bool = True,
) -> IndexHandle:
    """Build (or resume building) the full index under ``index_dir``."""
    store = ManifestStore(index_dir)
    phash = params_hash(asdict(params))

    def stage_done(name: str) -> bool:
        return resume and store.is_complete(name, phash)

    def commit_stage(name: str, timer: StageTimer, rows: int,
                     metrics: dict, lineage: list[dict]) -> None:
        store.write(
            StageManifest(
                stage=name, phash=phash, status="complete", rows=rows,
                wall_ms=timer.ms, metrics=metrics, lineage=lineage,
            )
        )

    span = params.doc_block_span
    p_raw = os.path.join(index_dir, "postings_raw")
    p_docstats = os.path.join(index_dir, "doc_stats")
    p_doclens = os.path.join(index_dir, "doc_lens")
    p_termstats = os.path.join(index_dir, "term_stats")
    p_segments = os.path.join(index_dir, "segments")

    # ---- stage 1: tokenize → postings_raw + doc_stats -------------------
    # tf is a per-doc aggregate → computed map-side (no shuffle); doc_stats
    # is a second narrow JVM-only pass (expression tokenizer) that also
    # covers zero-token docs.
    if not (stage_done("postings_raw") and stage_done("doc_stats")):
        with StageTimer() as t:
            tok_src = (
                length_sorted(docs, text_col)
                if params.length_sorted_batches else docs
            )
            combined = tf_pairs_map_side(
                tok_src, text_col, id_col, include_doc_rows=True
            ).withColumn("doc_block", (F.col("doc_id") / span).cast("long"))
            combined.write.mode("overwrite").parquet(p_raw)
            # doc_stats = the NULL-term rows of the same single tokenize
            # pass (cheap columnar re-read, no second tokenize)
            (
                spark.read.parquet(p_raw)
                .filter(F.col("term").isNull())
                .select("doc_id", "dl", "doc_block")
                .write.mode("overwrite")
                .parquet(p_docstats)
            )
        # per-block lineage: aggregated from the |docs| NULL-term rows
        # alone — their tf carries each doc's posting-row count, so the
        # old full-table groupBy over ALL |postings| rows (≈100× more at
        # avgdl≈200, ~10^14 at the SCALING.md design point) is gone;
        # written as a PARQUET side output, never collected (only the
        # one-row stage totals come back)
        lin_df = (
            spark.read.parquet(p_raw)
            .filter(F.col("term").isNull())
            .groupBy(F.col("doc_block").alias("partition"))
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("tf").alias("postings"),
            )
        )
        tot = _write_lineage(lin_df, index_dir, "postings_raw")
        n_docs_tok, n_postings = int(tot["docs"]), int(tot["postings"])
        commit_stage("postings_raw", t, n_postings,
                     {"docs_tokenized": n_docs_tok,
                      "lineage_path": _lineage_path(index_dir, "postings_raw"),
                      "lineage_rows": int(tot["n_partitions"])}, [])
        commit_stage("doc_stats", t, n_docs_tok, {}, [])

    # ---- stage 2: globals + term_stats ----------------------------------
    if not stage_done("term_stats"):
        with StageTimer() as t:
            ds = spark.read.parquet(p_docstats)
            row = ds.agg(
                F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
            ).collect()[0]
            n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
            raw = spark.read.parquet(p_raw).filter(F.col("term").isNotNull())
            ts = raw.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            ts = ts.withColumn(
                "idf",
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
            )
            ts.write.mode("overwrite").parquet(p_termstats)
        store.write_globals(
            {"n_docs": n_docs, "avgdl": avgdl, "phash": phash,
             "params": asdict(params)}
        )
        commit_stage(
            "term_stats", t, int(spark.read.parquet(p_termstats).count()),
            {"n_docs": n_docs, "avgdl": avgdl}, [],
        )
    g = store.load_globals()
    n_docs, avgdl = int(g["n_docs"]), float(g["avgdl"])

    # ---- stage 3: doc_lens (per-block packed lengths) --------------------
    if not stage_done("doc_lens"):
        with StageTimer() as t:
            ds = spark.read.parquet(p_docstats)
            (
                ds.groupBy("doc_block")
                .applyInPandas(_doc_lens_packer(params), schema=DOC_LENS_SCHEMA)
                .write.mode("overwrite")
                .parquet(p_doclens)
            )
        dl_df = spark.read.parquet(p_doclens)
        tot = _write_lineage(
            dl_df.select(
                F.col("doc_block").alias("partition"),
                F.col("n_docs").alias("docs"),
                "bytes",
            ),
            index_dir, "doc_lens",
        )
        commit_stage(
            "doc_lens", t, int(tot["n_partitions"]),
            {"lineage_path": _lineage_path(index_dir, "doc_lens"),
             "bytes": int(tot["bytes"])}, [],
        )

    # ---- stage 4: segments (salted shuffle + encode) ---------------------
    if not stage_done("segments"):
        with StageTimer() as t:
            raw = spark.read.parquet(p_raw).filter(F.col("term").isNotNull())
            ts = spark.read.parquet(p_termstats).select("term", "idf")
            nparts = params.segment_shuffle_partitions or int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            # salted shuffle: hash(term, doc_block) → one partition per
            # encoder task; the kernel vector-groups within the
            # partition.  The shuffle carries only (term, doc_block,
            # doc_id, tf, dl): idf joins AFTER the encoder onto the
            # ~|postings|/avgdl segment rows (8 bytes/posting less
            # through the exchange and the Arrow boundary), and sub_max
            # — stored as idf * max(f), the bit-identical product —
            # is finished with one JVM transform()
            enc = (
                raw.withColumn(
                    "part", F.pmod(F.hash("term", "doc_block"), F.lit(nparts))
                )
                .select("part", "term", "doc_block", "doc_id", "tf", "dl")
                .groupBy("part")
                .applyInPandas(
                    _segment_bulk_encoder(params, avgdl),
                    schema=SEGMENT_ENC_SCHEMA,
                )
            )
            seg = (
                enc.join(ts, "term")
                .withColumn(
                    "sub_max",
                    F.transform("sub_max", lambda x: x * F.col("idf")),
                )
                .select(
                    "term", "doc_block", "idf", "df_block", "doc_bytes",
                    "tf_bytes", "sub_offsets", "sub_max", "bytes",
                )
            )
            seg.sortWithinPartitions("term").write.mode("overwrite").parquet(
                p_segments
            )
        seg_df = spark.read.parquet(p_segments)
        tot = _write_lineage(
            seg_df.groupBy(F.col("doc_block").alias("partition")).agg(
                F.count(F.lit(1)).alias("terms"),
                F.sum("df_block").alias("postings"),
                F.sum("bytes").alias("bytes"),
            ),
            index_dir, "segments",
        )
        commit_stage(
            "segments", t, int(tot["terms"]),
            {"bytes_compressed": int(tot["bytes"]),
             "postings": int(tot["postings"]),
             "lineage_path": _lineage_path(index_dir, "segments"),
             "lineage_rows": int(tot["n_partitions"])}, [],
        )

    # ---- stage 5 (optional): positional side index for phrase search ----
    if params.store_positions and not stage_done("positions"):
        from instructor_embedding_spark.query.phrase import build_positions

        p_positions = os.path.join(index_dir, "positions")
        with StageTimer() as t:
            (
                build_positions(docs, span, text_col, id_col)
                .repartition(
                    params.segment_shuffle_partitions
                    or int(spark.conf.get("spark.sql.shuffle.partitions")),
                    "term", "doc_block",
                )
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(p_positions)
            )
        commit_stage(
            "positions", t,
            int(spark.read.parquet(p_positions).count()), {}, [],
        )

    return IndexHandle(index_dir=index_dir, n_docs=n_docs, avgdl=avgdl,
                       params=params)


def load_index(spark: SparkSession, index_dir: str) -> IndexHandle:
    """Open an existing index from its manifest."""
    store = ManifestStore(index_dir)
    g = store.load_globals()
    params = IndexParams(**{
        k: v for k, v in g["params"].items()
        if k in IndexParams.__dataclass_fields__
    })
    return IndexHandle(
        index_dir=index_dir, n_docs=int(g["n_docs"]),
        avgdl=float(g["avgdl"]), params=params,
    )
