"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` kernels.  The decode step itself is
STUBBED (no image/audio libraries in this container): the default
``fake_decoder`` is a deterministic bytes→features function so the Spark
plumbing — schema, partitioning, UDF signature, batch shape — is fully
real and tested; swap ``decoder=`` for a PIL/ffmpeg-backed callable in a
real deployment, or pass ``decoder=None`` to get the explicit
``NotImplementedError``.

Reference analog: the encode pipeline's opaque-tensor flow (features dict
instructor.py:334-361) — bytes in, fixed-width feature vector out — and
the batch-to-device boundary (instructor.py:19-23) maps to the Arrow
batch transfer here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    f"features array<float>"
)


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → FEATURE_DIM
    floats in [0, 1) derived from the sha256 digest."""
    d = hashlib.sha256(payload).digest()
    arr = np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (arr / np.float64(2 ** 32)).astype(np.float32)


def synth_media(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Manufacture a media table from any text table: payload = utf-8
    bytes, metadata derived deterministically — gives the binary pipeline
    a real distributed input without external files."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video")).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            (F.length(text_col) * 10).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = fake_decoder,
) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    ``decoder=None`` raises NotImplementedError at execution time — the
    explicit marker that a real codec is required in this environment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media codec available in this environment; supply "
                    "decoder= (e.g. PIL/ffmpeg-backed) to extract_features"
                )
            feats = [
                decoder(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, t_ms) — the explode pattern for frame
    sampling; pure JVM (sequence + explode), one row per sampled frame."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx", "step"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("step") * every_ms).cast("long").alias("t_ms"),
    )
