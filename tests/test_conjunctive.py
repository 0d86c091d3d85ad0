"""Boolean-AND (conjunctive) BM25: only docs containing every query term
rank, scored identically to the disjunctive engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import bm25_topk, tokenized
from instructor_embedding_spark.query.wand import wand_topk


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("conj") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="conj"),
        text_col="content",
    )


def test_conjunctive_docs_contain_all_terms(spark, corpus):
    queries = datagen.queries_df(spark)
    got = bm25_topk(corpus, queries, k=10, text_col="content",
                    require_all=True)
    toks = tokenized(corpus, "content").select(
        "doc_id", F.explode("tokens").alias("term")
    ).distinct()
    from instructor_embedding_spark.query.bm25 import query_terms

    qt = query_terms(queries)
    # (query, doc) pairs in the result joined to query terms MISSING from
    # the doc must be empty
    missing = (
        got.select("query_id", "doc_id")
        .join(qt, "query_id")
        .join(toks, ["doc_id", "term"], "left_anti")
    )
    assert missing.count() == 0
    assert got.count() > 0


def test_conjunctive_is_all_matched_subset_reranked(spark, corpus):
    """Conjunctive == disjunctive restricted to all-terms docs, re-ranked:
    scores must be IDENTICAL for surviving (query, doc) pairs."""
    queries = datagen.queries_df(spark)
    dis = bm25_topk(corpus, queries, k=100000, text_col="content")
    conj = bm25_topk(corpus, queries, k=100000, text_col="content",
                     require_all=True)
    joined = conj.alias("c").join(
        dis.alias("d"), ["query_id", "doc_id"]
    ).select("query_id", "doc_id", F.col("c.score").alias("cs"),
             F.col("d.score").alias("ds"))
    # every conjunctive row exists disjunctively with the same score
    assert joined.count() == conj.count()
    assert joined.filter("cs <> ds").count() == 0
    # ranks are dense per query
    dense = conj.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    assert dense.filter("n <> mx").count() == 0


def test_wand_conjunctive_rank_identical_to_bruteforce(spark, corpus, built):
    queries = datagen.queries_df(spark)
    got = _rows(wand_topk(spark, built, queries, k=10, require_all=True))
    want = _rows(bm25_topk(corpus, queries, k=10, text_col="content",
                           require_all=True))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)
    assert len(got) > 0


def test_single_term_conjunctive_equals_disjunctive(spark, corpus, built):
    q = spark.createDataFrame([(1, "merge")],
                              "query_id long, query_text string")
    assert _rows(wand_topk(spark, built, q, k=10, require_all=True)) == \
        _rows(wand_topk(spark, built, q, k=10))


def test_duplicate_terms_collapse(spark, corpus, built):
    """'merge merge merge' conjunctive == 'merge': distinct-term set
    semantics (pinned D6) carries into the AND count."""
    q3 = spark.createDataFrame([(1, "merge merge merge")],
                               "query_id long, query_text string")
    q1 = spark.createDataFrame([(1, "merge")],
                               "query_id long, query_text string")
    assert _rows(wand_topk(spark, built, q3, k=10, require_all=True)) == \
        _rows(wand_topk(spark, built, q1, k=10, require_all=True))


def test_missing_term_yields_empty(spark, corpus, built):
    q = spark.createDataFrame(
        [(1, "merge zzzunseenterm")], "query_id long, query_text string"
    )
    assert wand_topk(spark, built, q, k=10, require_all=True).count() == 0
    assert bm25_topk(corpus, q, k=10, text_col="content",
                     require_all=True).count() == 0
