"""Query-time per-term boosting (Lucene ``term^boost``): a listed term's
BM25 contribution scales by its boost; matching is unchanged; the WAND
block-max bound scales with it so pruning stays admissible."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import bm25_topk, bm25_topk_sql
from instructor_embedding_spark.query.wand import wand_topk

QUERIES = [
    (1, "merge sort window"),
    (2, "fast hash join"),
    (3, "batch key stream"),
]
#: boost one real term up, one down, plus a term NOT in its query
#: (must be ignored: the join is FROM the query-term side)
BOOSTS = [
    (1, "sort", 3.0),
    (2, "join", 0.25),
    (3, "zzqqx", 5.0),
]


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


@pytest.fixture(scope="module")
def boosts(spark):
    return spark.createDataFrame(
        BOOSTS, "query_id long, term string, boost double"
    )


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("boost") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="boost"),
        text_col="content",
    )


def test_boost_changes_scores_not_matches(spark, corpus, queries, boosts):
    plain = bm25_topk(corpus, queries, k=100000, text_col="content")
    boosted = bm25_topk(corpus, queries, k=100000, text_col="content",
                        term_boosts=boosts)
    # identical (query, doc) match set — boost never adds/removes a doc
    assert (
        plain.select("query_id", "doc_id").exceptAll(
            boosted.select("query_id", "doc_id")).count() == 0
    )
    assert plain.count() == boosted.count()
    # query 3's boost names a term it doesn't contain: scores unchanged
    j = plain.alias("p").join(boosted.alias("b"), ["query_id", "doc_id"])
    assert j.filter("query_id = 3 AND p.score <> b.score").count() == 0
    # queries 1 and 2 must see at least one score move
    assert j.filter("query_id = 1 AND p.score <> b.score").count() > 0
    assert j.filter("query_id = 2 AND p.score <> b.score").count() > 0


def test_all_ones_boost_is_identity(spark, corpus, queries):
    ones = spark.createDataFrame(
        [(q, t, 1.0) for q, text in QUERIES for t in text.split()],
        "query_id long, term string, boost double",
    )
    assert _rows(
        bm25_topk(corpus, queries, k=10, text_col="content",
                  term_boosts=ones)
    ) == _rows(bm25_topk(corpus, queries, k=10, text_col="content"))


def test_wand_boost_rank_identical_to_bruteforce(
    spark, corpus, built, queries, boosts
):
    got = _rows(wand_topk(spark, built, queries, k=10, term_boosts=boosts))
    want = _rows(bm25_topk(corpus, queries, k=10, text_col="content",
                           term_boosts=boosts))
    assert got == want
    assert got
    # boost must actually reorder at least one query vs the plain ranking
    assert got != _rows(wand_topk(spark, built, queries, k=10))


def test_wand_boost_join_path_identical(spark, built, queries, boosts):
    assert _rows(
        wand_topk(spark, built, queries, k=10, term_boosts=boosts,
                  pushdown_max_terms=0)
    ) == _rows(wand_topk(spark, built, queries, k=10, term_boosts=boosts))


def test_boost_composes_with_msm(spark, corpus, built, queries, boosts):
    got = _rows(wand_topk(spark, built, queries, k=10, term_boosts=boosts,
                          min_should_match=2))
    want = _rows(bm25_topk(corpus, queries, k=10, text_col="content",
                           term_boosts=boosts, min_should_match=2))
    assert got == want
    assert got


def test_boost_matches_duckdb_twin(spark, corpus, built, queries, boosts):
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = bm25_topk_sql("docs", QUERIES, k=10, text_col="content",
                        boosts_values=BOOSTS)
    want = sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in con.execute(sql).fetchall()
    )
    got = [
        (q, r, d, round(s, 6))
        for q, r, d, s in _rows(
            wand_topk(spark, built, queries, k=10, term_boosts=boosts)
        )
    ]
    assert got == want


def test_nonpositive_boost_rejected(spark, built, queries):
    bad = spark.createDataFrame(
        [(1, "sort", 0.0)], "query_id long, term string, boost double"
    )
    with pytest.raises(Exception, match="boost must be > 0"):
        wand_topk(spark, built, queries, k=10, term_boosts=bad).collect()
