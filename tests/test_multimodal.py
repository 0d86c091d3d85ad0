"""Multimodal binary plumbing: schema, determinism, stub behavior."""

from __future__ import annotations

import pytest

from instructor_embedding_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    extract_features,
    fake_decoder,
    frame_sample_plan,
    synth_media,
)


def test_media_pipeline_end_to_end(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").limit(60)
    media = synth_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r.features) == FEATURE_DIM
        assert r.n_bytes > 0 and len(r.sha256) == 64
    # deterministic: same payload → same features
    again = {r.media_id: r.features for r in extract_features(media).collect()}
    assert all(again[r.media_id] == r.features for r in feats)


def test_fake_decoder_deterministic():
    a = fake_decoder(b"hello world")
    b = fake_decoder(b"hello world")
    c = fake_decoder(b"other")
    assert a.tolist() == b.tolist()
    assert a.tolist() != c.tolist()
    assert a.shape == (FEATURE_DIM,)


def test_decoder_none_raises(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").limit(5)
    media = synth_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|no media codec"):
        extract_features(media, decoder=None).collect()


def test_frame_sample_plan(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").limit(30)
    media = synth_media(docs)
    plan = frame_sample_plan(media, every_ms=500).collect()
    vids = {r.media_id for r in plan}
    assert vids  # every video row yields ≥1 frame
    for r in plan:
        assert r.t_ms % 500 == 0 and r.frame_idx >= 0
