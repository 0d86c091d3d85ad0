"""Re-block (ES shrink/split analog): changing a built index's block
geometry without re-tokenizing must be content-identical to a from-scratch
build at the target geometry, and query-invisible."""

from __future__ import annotations

import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import (
    IndexParams,
    build_index,
    load_index,
)
from instructor_embedding_spark.index.manifest import ManifestStore
from instructor_embedding_spark.index.reblock import reblock_index
from instructor_embedding_spark.query.phrase import phrase_topk
from instructor_embedding_spark.query.wand import wand_topk


def _corpus(spark, n=240):
    return datagen.corpus(spark, n, partitions=4)


def _seg_rows(spark, handle):
    return sorted(
        (r.term, r.doc_block, r.idf, r.df_block, bytes(r.doc_bytes),
         bytes(r.tf_bytes), tuple(r.sub_offsets), tuple(r.sub_max))
        for r in handle.segments(spark).collect()
    )


def _dl_rows(spark, handle):
    return sorted(
        (r.doc_block, bytes(r.doc_ids_bin), bytes(r.dls_bin), r.n_docs)
        for r in handle.doc_lens(spark).collect()
    )


def _topk(spark, handle, queries, k=10):
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in wand_topk(spark, handle, queries, k=k).collect()
    )


@pytest.mark.parametrize(
    "to_span,to_sub",
    [
        (32, 4),    # split: old span is a multiple of the new
        (256, 8),   # shrink: new span is a multiple of the old
        (48, 4),    # incommensurate: runs fracture mid-block
    ],
)
def test_reblock_content_identical_to_rebuild(spark, tmp_path, to_span,
                                              to_sub):
    docs = _corpus(spark).cache()
    src = build_index(
        spark, docs, str(tmp_path / "src"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="reblock-src"),
        text_col="content",
    )
    got = reblock_index(spark, src, str(tmp_path / f"re{to_span}"),
                        doc_block_span=to_span, n_sub_blocks=to_sub)
    want = build_index(
        spark, docs, str(tmp_path / f"fresh{to_span}"),
        IndexParams(doc_block_span=to_span, n_sub_blocks=to_sub,
                    corpus_fingerprint="reblock-src"),
        text_col="content",
    )
    assert got.n_docs == want.n_docs
    assert got.avgdl == want.avgdl
    assert _seg_rows(spark, got) == _seg_rows(spark, want)
    assert _dl_rows(spark, got) == _dl_rows(spark, want)


def test_reblock_is_query_invisible(spark, tmp_path):
    """Same corpus, same stats → rank- and score-identical top-k across
    geometries (block span is physical layout, not semantics)."""
    docs = _corpus(spark).cache()
    src = build_index(
        spark, docs, str(tmp_path / "src"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="reblock-q"),
        text_col="content",
    )
    re = reblock_index(spark, src, str(tmp_path / "re"),
                       doc_block_span=32, n_sub_blocks=8)
    queries = datagen.queries_df(spark)
    got = _topk(spark, re, queries)
    want = _topk(spark, src, queries)
    assert got == want and len(got) > 0


def test_reblock_carries_positions_and_phrases(spark, tmp_path):
    docs = _corpus(spark).cache()
    src = build_index(
        spark, docs, str(tmp_path / "src"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    store_positions=True, corpus_fingerprint="reblock-p"),
        text_col="content",
    )
    re = reblock_index(spark, src, str(tmp_path / "re"),
                       doc_block_span=128, n_sub_blocks=8)
    assert re.params.store_positions
    phrases = [(1, "merge sort"), (2, "hash join")]
    got = sorted(
        (r.phrase_id, r.doc_id, r.matches)
        for r in phrase_topk(spark, re.positions(spark), phrases,
                             k=10).collect()
    )
    want = sorted(
        (r.phrase_id, r.doc_id, r.matches)
        for r in phrase_topk(spark, src.positions(spark), phrases,
                             k=10).collect()
    )
    assert got == want and len(got) > 0
    # positions doc_block matches the new geometry
    bad = re.positions(spark).filter(
        "cast(doc_id / 128 as long) != doc_block"
    ).count()
    assert bad == 0


def test_reblock_resumes_from_manifest(spark, tmp_path):
    docs = _corpus(spark, n=120).cache()
    src = build_index(
        spark, docs, str(tmp_path / "src"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="reblock-r"),
        text_col="content",
    )
    out = str(tmp_path / "re")
    h1 = reblock_index(spark, src, out, doc_block_span=32)
    m1 = ManifestStore(out).load("reblock")
    h2 = reblock_index(spark, src, out, doc_block_span=32)
    m2 = ManifestStore(out).load("reblock")
    assert m1 == m2  # second call short-circuited: manifest untouched
    assert h1.params == h2.params
    # and the re-blocked dir round-trips through load_index
    h3 = load_index(spark, out)
    assert h3.params.doc_block_span == 32
    assert h3.n_docs == src.n_docs
