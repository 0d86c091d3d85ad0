"""More-like-this: interesting-term selection + disjunctive BM25 with
source-doc exclusion, rank-identical to the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.mlt import (
    mlt_topk,
    mlt_topk_sql,
    select_like_terms,
)
from instructor_embedding_spark.query.wand import wand_topk


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("mlt") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="mlt"),
        text_col="content",
    )


LIKES = [(1, 7), (2, 42), (3, 123)]


def test_mlt_matches_duckdb_twin(spark, corpus, built, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    got = _rows(mlt_topk(spark, built, corpus, LIKES, k=10,
                         text_col="content"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(
            mlt_topk_sql("docs", LIKES, k=10, text_col="content")
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_mlt_excludes_source_docs(spark, corpus, built):
    res = mlt_topk(spark, built, corpus, LIKES, k=50, text_col="content")
    hits = {(r.query_id, r.doc_id) for r in res.collect()}
    for q, d in LIKES:
        assert (q, d) not in hits
    # ...and exclusion actually bit: without it the source doc tops its
    # own query (it matches every selected term at the selected tf)
    qt = select_like_terms(spark, built, corpus, LIKES, text_col="content")
    raw = wand_topk(spark, built, None, k=1, qt_override=qt)
    top1 = {(r.query_id, r.doc_id) for r in raw.collect()}
    assert top1 == set(LIKES)


def test_mlt_multi_like_sums_tf_and_excludes_all(spark, corpus, built):
    likes = [(9, 7), (9, 42)]
    res = mlt_topk(spark, built, corpus, likes, k=200, text_col="content")
    hits = {(r.query_id, r.doc_id) for r in res.collect()}
    assert (9, 7) not in hits and (9, 42) not in hits
    # selected terms ⊆ union of single-doc selections at an uncapped
    # budget (tf sums can only promote shared terms, never invent new)
    uni = {
        r.term for r in select_like_terms(
            spark, built, corpus, [(1, 7), (2, 42)],
            max_query_terms=10**6, text_col="content",
        ).collect()
    }
    both = {
        r.term for r in select_like_terms(
            spark, built, corpus, likes, max_query_terms=10**6,
            text_col="content",
        ).collect()
    }
    assert both == uni


def test_mlt_term_cap_and_floors(spark, corpus, built):
    sel = select_like_terms(
        spark, built, corpus, [(1, 7)], max_query_terms=3,
        text_col="content",
    ).collect()
    assert 0 < len(sel) <= 3
    # df floor: a min_doc_freq above the corpus size empties the selection
    none = select_like_terms(
        spark, built, corpus, [(1, 7)], min_doc_freq=10**9,
        text_col="content",
    ).count()
    assert none == 0
