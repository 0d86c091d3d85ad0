"""Multi-way segment merge: merged index ≡ index built over the union."""

from __future__ import annotations

import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.index.merge import merge_indexes
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.wand import wand_topk

PARAMS = IndexParams(doc_block_span=64, n_sub_blocks=4)


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


def test_merge_two_batches_equals_full_build(spark, tmp_path):
    n = 300
    docs = datagen.corpus(spark, n, partitions=4).cache()
    batch_a = docs.filter(f"doc_id < {n // 2}")
    batch_b = docs.filter(f"doc_id >= {n // 2}")

    pa = IndexParams(doc_block_span=64, n_sub_blocks=4,
                     corpus_fingerprint="batchA")
    pb = IndexParams(doc_block_span=64, n_sub_blocks=4,
                     corpus_fingerprint="batchB")
    ha = build_index(spark, batch_a, str(tmp_path / "a"), pa,
                     text_col="content")
    hb = build_index(spark, batch_b, str(tmp_path / "b"), pb,
                     text_col="content")
    merged = merge_indexes(spark, [ha, hb], str(tmp_path / "m"))

    assert merged.n_docs == n
    queries = datagen.queries_df(spark)
    got = _rows(wand_topk(spark, merged, queries, k=10))
    want = _rows(bm25_topk(docs, queries, k=10, text_col="content"))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_merge_single_source_idempotent(spark, tmp_path):
    docs = datagen.corpus(spark, 150, partitions=3)
    p = IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="solo")
    h = build_index(spark, docs, str(tmp_path / "src"), p,
                    text_col="content")
    m = merge_indexes(spark, [h], str(tmp_path / "out"))
    queries = datagen.queries_df(spark)
    assert _rows(wand_topk(spark, m, queries, k=10)) == _rows(
        wand_topk(spark, h, queries, k=10)
    )


def test_merge_unions_positions(spark, tmp_path):
    """Merged indexes must either carry a real positions stage (union of
    the sources') or stop advertising store_positions."""
    from instructor_embedding_spark.query.phrase import phrase_topk

    params = IndexParams(doc_block_span=64, n_sub_blocks=4,
                         store_positions=True)
    docs = datagen.corpus(spark, 200, partitions=3)
    d1, d2 = docs.filter("doc_id < 100"), docs.filter("doc_id >= 100")
    h1 = build_index(spark, d1, str(tmp_path / "i1"), params,
                     text_col="content")
    h2 = build_index(spark, d2, str(tmp_path / "i2"), params,
                     text_col="content")
    m = merge_indexes(spark, [h1, h2], str(tmp_path / "m"))
    assert m.params.store_positions

    full = build_index(spark, docs, str(tmp_path / "full"), params,
                       text_col="content")
    phrases = [(1, "shared buffer pool"), (2, "zzz missing phrase")]
    got = sorted(
        map(tuple, phrase_topk(spark, m.positions(spark), phrases,
                               k=10).collect())
    )
    want = sorted(
        map(tuple, phrase_topk(spark, full.positions(spark), phrases,
                               k=10).collect())
    )
    assert got == want and len(got) > 0

    # a source without positions: merged params must not advertise them
    params_np = IndexParams(doc_block_span=64, n_sub_blocks=4)
    h3 = build_index(spark, d2, str(tmp_path / "i3"), params_np,
                     text_col="content")
    m2 = merge_indexes(spark, [h1, h3], str(tmp_path / "m2"), params=params)
    assert not m2.params.store_positions
