"""Tombstone deletes + compaction: live-doc masking is exact, compaction
is content-identical to rebuilding over the survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.index.deletes import (
    compact_deletes,
    delete_docs,
    tombstones,
    wand_topk_live,
)
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.wand import wand_topk

PARAMS = IndexParams(doc_block_span=64, n_sub_blocks=4)


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


def _corpus(spark, n=240):
    return datagen.corpus(spark, n, partitions=4)


def _deleted_pred(col):
    # deterministic ~1/7 of the corpus, spread across blocks
    return col % 7 == 3


def test_deny_equals_complement_whitelist(spark, tmp_path):
    """Tombstone masking (stale stats) must equal filtered retrieval with
    the complement whitelist — two independent kernel paths (left-join
    NULL-able deny vs inner-join allow) over the same index."""
    docs = _corpus(spark).cache()
    h = build_index(spark, docs, str(tmp_path / "idx"),
                    IndexParams(doc_block_span=64, n_sub_blocks=4,
                                corpus_fingerprint="deny"),
                    text_col="content")
    dead = docs.filter(_deleted_pred(F.col("doc_id"))).select("doc_id")
    live = docs.filter(~_deleted_pred(F.col("doc_id"))).select("doc_id")
    queries = datagen.queries_df(spark)
    got = _rows(wand_topk(spark, h, queries, k=10, deny_filter=dead))
    want = _rows(wand_topk(spark, h, queries, k=10, doc_filter=live))
    assert got == want and len(got) > 0


def test_delete_doc_leaves_topk_scores_stable(spark, tmp_path):
    """Deleting the rank-1 doc promotes rank-2 with its score UNCHANGED:
    pre-compaction deletes must not touch global statistics."""
    docs = _corpus(spark).cache()
    h = build_index(spark, docs, str(tmp_path / "idx"),
                    IndexParams(doc_block_span=64, n_sub_blocks=4,
                                corpus_fingerprint="stable"),
                    text_col="content")
    queries = datagen.queries_df(spark).limit(1)
    before = sorted(
        wand_topk(spark, h, queries, k=10).collect(), key=lambda r: r.rank
    )
    assert len(before) >= 3
    top = before[0]
    n_ts = delete_docs(
        spark, h.index_dir,
        spark.createDataFrame([(top.doc_id,)], "doc_id long"),
    )
    assert n_ts == 1
    after = sorted(
        wand_topk_live(spark, h, queries, k=10).collect(),
        key=lambda r: r.rank,
    )
    assert all(r.doc_id != top.doc_id for r in after)
    # every surviving doc keeps its exact score, ranks shift up by one
    for b, a in zip(before[1:], after):
        assert (a.doc_id, a.score) == (b.doc_id, b.score)
        assert a.rank == b.rank - 1


def test_delete_is_idempotent(spark, tmp_path):
    docs = _corpus(spark, 120).cache()
    h = build_index(spark, docs, str(tmp_path / "idx"),
                    IndexParams(doc_block_span=64, n_sub_blocks=4,
                                corpus_fingerprint="idem"),
                    text_col="content")
    dead = docs.filter("doc_id < 10").select("doc_id")
    assert delete_docs(spark, h.index_dir, dead) == 10
    assert delete_docs(spark, h.index_dir, dead) == 10  # re-delete: no-op
    ts = tombstones(spark, h.index_dir)
    assert ts.count() == 10


def _collect_index_content(spark, h):
    segs = sorted(
        (r.term, r.doc_block, r.idf, r.df_block, bytes(r.doc_bytes),
         bytes(r.tf_bytes), tuple(r.sub_offsets), tuple(r.sub_max))
        for r in h.segments(spark).collect()
    )
    dls = sorted(
        (r.doc_block, bytes(r.doc_ids_bin), bytes(r.dls_bin), r.n_docs)
        for r in h.doc_lens(spark).collect()
    )
    ts = sorted((r.term, r.df, r.idf) for r in h.term_stats(spark).collect())
    return segs, dls, ts


def test_compaction_content_identical_to_rebuild(spark, tmp_path):
    """compact(build(all) + tombstones) ≡ build(survivors), row for row —
    same postings bytes, same idf doubles, same block-max metadata."""
    docs = _corpus(spark).cache()
    h = build_index(spark, docs, str(tmp_path / "full"),
                    IndexParams(doc_block_span=64, n_sub_blocks=4,
                                corpus_fingerprint="full"),
                    text_col="content")
    dead = docs.filter(_deleted_pred(F.col("doc_id"))).select("doc_id")
    delete_docs(spark, h.index_dir, dead)
    compacted = compact_deletes(spark, h, str(tmp_path / "compacted"))

    survivors = docs.filter(~_deleted_pred(F.col("doc_id")))
    fresh = build_index(spark, survivors, str(tmp_path / "fresh"),
                        IndexParams(doc_block_span=64, n_sub_blocks=4,
                                    corpus_fingerprint="fresh"),
                        text_col="content")

    assert compacted.n_docs == fresh.n_docs
    assert compacted.avgdl == fresh.avgdl
    got = _collect_index_content(spark, compacted)
    want = _collect_index_content(spark, fresh)
    for g, w, name in zip(got, want, ("segments", "doc_lens", "term_stats")):
        assert g == w, f"{name} diverged between compaction and rebuild"

    # and the compacted index answers queries like the fresh one
    queries = datagen.queries_df(spark)
    assert _rows(wand_topk(spark, compacted, queries, k=10)) == _rows(
        wand_topk(spark, fresh, queries, k=10)
    )


def test_compacted_matches_bruteforce_fresh_stats(spark, tmp_path):
    """Post-compaction queries use REFRESHED stats: rank-identical to
    brute-force BM25 over the surviving documents."""
    docs = _corpus(spark).cache()
    h = build_index(spark, docs, str(tmp_path / "idx"),
                    IndexParams(doc_block_span=64, n_sub_blocks=4,
                                corpus_fingerprint="bf"),
                    text_col="content")
    dead = docs.filter(_deleted_pred(F.col("doc_id"))).select("doc_id")
    delete_docs(spark, h.index_dir, dead)
    compacted = compact_deletes(spark, h, str(tmp_path / "out"))
    survivors = docs.filter(~_deleted_pred(F.col("doc_id")))
    queries = datagen.queries_df(spark)
    got = _rows(wand_topk(spark, compacted, queries, k=10))
    want = _rows(bm25_topk(survivors, queries, k=10, text_col="content"))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_compaction_drops_df_zero_terms_and_positions(spark, tmp_path):
    """A term whose only document is deleted must vanish from term_stats,
    segments, and the positions side index."""
    rows = [(i, f"common words repeat here {i % 3}") for i in range(63)]
    rows.append((63, "common xylophonequark words"))
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    params = IndexParams(doc_block_span=16, n_sub_blocks=4,
                         corpus_fingerprint="uniq", store_positions=True)
    h = build_index(spark, docs, str(tmp_path / "idx"), params,
                    text_col="content")
    assert h.term_stats(spark).filter("term = 'xylophonequark'").count() == 1
    delete_docs(spark, h.index_dir,
                spark.createDataFrame([(63,)], "doc_id long"))
    compacted = compact_deletes(spark, h, str(tmp_path / "out"))
    assert compacted.n_docs == 63
    assert compacted.term_stats(spark).filter(
        "term = 'xylophonequark'").count() == 0
    assert compacted.segments(spark).filter(
        "term = 'xylophonequark'").count() == 0
    assert compacted.positions(spark).filter("doc_id = 63").count() == 0
    # sanity: the compacted positions still serve phrase queries
    from instructor_embedding_spark.query.phrase import phrase_topk

    got = phrase_topk(spark, compacted.positions(spark),
                      [(1, "common words")], k=5).collect()
    assert len(got) > 0


def test_compact_without_tombstones_is_merge(spark, tmp_path):
    docs = _corpus(spark, 120).cache()
    h = build_index(spark, docs, str(tmp_path / "idx"),
                    IndexParams(doc_block_span=64, n_sub_blocks=4,
                                corpus_fingerprint="nots"),
                    text_col="content")
    out = compact_deletes(spark, h, str(tmp_path / "out"))
    queries = datagen.queries_df(spark)
    assert _rows(wand_topk(spark, out, queries, k=10)) == _rows(
        wand_topk(spark, h, queries, k=10)
    )
