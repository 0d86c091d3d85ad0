"""Phrase search: hand-built adjacency fixtures + positional stage."""

from __future__ import annotations

from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.phrase import build_positions, phrase_topk


def test_phrase_adjacency_fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta"),   # "alpha beta" ×2
            (1, "beta alpha beta gamma"),         # ×1 (+ reversed decoy)
            (2, "alpha gamma beta"),              # terms present, not adjacent
            (3, "alpha alpha alpha"),             # dup-term phrase ×2
            (4, "delta delta"),
        ],
        "doc_id long, content string",
    )
    pos = build_positions(docs, span=4)
    phrases = [(1, "alpha beta"), (2, "alpha alpha"), (3, "gamma delta")]
    got = {
        (r.phrase_id, r.doc_id): (r.rank, r.matches)
        for r in phrase_topk(spark, pos, phrases, k=10).collect()
    }
    assert got[(1, 0)] == (1, 2)       # two occurrences → rank 1
    assert got[(1, 1)] == (2, 1)
    assert (1, 2) not in got           # non-adjacent excluded
    assert got[(2, 3)] == (1, 2)       # "alpha alpha" overlapping ×2
    assert not any(p == 3 for p, _ in got)  # cross-doc phrase never matches


def test_phrase_via_index_handle(spark, tmp_path):
    from instructor_embedding_spark import datagen

    docs = datagen.corpus(spark, 200, partitions=3)
    h = build_index(
        spark, docs, str(tmp_path / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="phrase", store_positions=True),
        text_col="content",
    )
    # the planted identifier tokenizes to an exact adjacent sequence
    res = phrase_topk(
        spark, h.positions(spark), [(1, "parse varint block header")], k=10
    ).collect()
    assert res, "planted phrase must match"
    qrels = {r.doc_id for r in datagen.qrels_df(spark, 200).collect()
             if r.query_id == 1}
    assert {r.doc_id for r in res} <= qrels
