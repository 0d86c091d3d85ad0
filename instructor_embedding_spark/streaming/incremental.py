"""Structured Streaming extensions.

The reference is batch-only (SURVEY.md §2.10) — its closest structure is
the bounded-memory chunked corpus loop (RetrievalEvaluator.py:123-129).
These operators extend the engine the way a Lucene-style system ingests:

- :func:`stream_build_batch_indexes` — ``readStream`` over a document
  directory; every micro-batch is indexed independently (the build
  pipeline is already checkpointed/idempotent), producing per-batch
  segment sets under ``<index_root>/batch_<id>/``.
- :func:`compact` — multi-way merge of all batch indexes into
  ``<index_root>/current`` (index/merge.py), the segment-compaction step.
- :func:`windowed_event_rollup` — watermark + tumbling-window aggregation
  over an event stream (late data dropped past the watermark), with a
  batch-equivalent formulation for testing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructor_embedding_spark.index.build import (
    IndexHandle,
    IndexParams,
    build_index,
    load_index,
)
from instructor_embedding_spark.index.merge import merge_indexes

DOCS_STREAM_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def stream_build_batch_indexes(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    params: IndexParams = IndexParams(),
    checkpoint_dir: str | None = None,
) -> list[str]:
    """Consume all available files from ``input_dir`` (parquet doc batches),
    building one index per micro-batch; returns the batch index dirs.

    Uses ``trigger(availableNow=True)`` — processes the backlog with
    streaming semantics (exactly-once via the stream checkpoint +
    idempotent per-stage manifests) then stops; a production deployment
    would run the same query continuously."""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        import dataclasses

        out = os.path.join(index_root, f"batch_{batch_id}")
        p = dataclasses.replace(
            params,
            corpus_fingerprint=f"{params.corpus_fingerprint}#b{batch_id}",
        )
        build_index(batch_df.sparkSession, batch_df, out, p,
                    text_col="content")

    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(index_root, "_stream_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        os.path.join(index_root, d)
        for d in os.listdir(index_root)
        if d.startswith("batch_")
    )


def compact(spark: SparkSession, index_root: str) -> IndexHandle:
    """Merge every ``batch_*`` index under ``index_root`` into
    ``<index_root>/current`` (the compaction step)."""
    batch_dirs = sorted(
        os.path.join(index_root, d)
        for d in os.listdir(index_root)
        if d.startswith("batch_")
    )
    handles = [load_index(spark, d) for d in batch_dirs]
    return merge_indexes(
        spark, handles, os.path.join(index_root, "current")
    )


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """(window_start, event_type, n_events, total_value) tumbling-window
    rollup.  With ``streaming=True`` applies a watermark (late rows beyond
    it are dropped, state is bounded); the ``streaming=False`` formulation
    is the batch-equivalent used to verify results."""
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ is cast up —
    # applied in BOTH modes so stream and batch window identically
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )
