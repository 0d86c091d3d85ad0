"""minimum_should_match (Lucene BooleanQuery msm): only docs matching at
least msm DISTINCT query terms rank, scored identically to the
disjunctive engine; msm=1 is plain OR, msm=n_terms is require_all."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import (
    bm25_topk,
    bm25_topk_sql,
    query_terms,
    tokenized,
)
from instructor_embedding_spark.query.wand import wand_topk

#: three-term queries so msm=2 is strictly between OR and AND
QUERIES = [
    (1, "merge sort window"),
    (2, "fast hash join"),
    (3, "batch key stream"),
    (4, "zzqqx batch scan"),   # one never-matching term: msm=2 must still
                               # rank docs matching the other two
]
MSM = 2


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("msm") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="msm"),
        text_col="content",
    )


def test_msm_docs_match_at_least_msm_terms(spark, corpus, queries):
    got = bm25_topk(corpus, queries, k=100000, text_col="content",
                    min_should_match=MSM)
    toks = tokenized(corpus, "content").select(
        "doc_id", F.explode("tokens").alias("term")
    ).distinct()
    qt = query_terms(queries)
    matched = (
        got.select("query_id", "doc_id")
        .join(qt, "query_id")
        .join(toks, ["doc_id", "term"], "left_semi")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    assert matched.filter(F.col("m") < MSM).count() == 0
    assert matched.count() == got.count()
    assert got.count() > 0


def test_msm_is_filtered_disjunctive_rerank(spark, corpus, queries):
    """msm == disjunctive restricted to matched>=msm docs, re-ranked with
    IDENTICAL scores; msm=1 IS the disjunctive ranking."""
    dis = bm25_topk(corpus, queries, k=100000, text_col="content")
    msm = bm25_topk(corpus, queries, k=100000, text_col="content",
                    min_should_match=MSM)
    joined = msm.alias("m").join(
        dis.alias("d"), ["query_id", "doc_id"]
    ).select(F.col("m.score").alias("ms"), F.col("d.score").alias("ds"))
    assert joined.count() == msm.count()
    assert joined.filter("ms <> ds").count() == 0
    assert _rows(
        bm25_topk(corpus, queries, k=10, text_col="content",
                  min_should_match=1)
    ) == _rows(bm25_topk(corpus, queries, k=10, text_col="content"))


def test_msm_at_term_count_equals_require_all(spark, corpus, queries):
    three = queries.filter("query_id <= 3")  # all have 3 distinct terms
    assert _rows(
        bm25_topk(corpus, three, k=10, text_col="content",
                  min_should_match=3)
    ) == _rows(
        bm25_topk(corpus, three, k=10, text_col="content", require_all=True)
    )


def test_wand_msm_rank_identical_to_bruteforce(spark, corpus, built, queries):
    got = _rows(wand_topk(spark, built, queries, k=10, min_should_match=MSM))
    want = _rows(bm25_topk(corpus, queries, k=10, text_col="content",
                           min_should_match=MSM))
    assert got == want
    assert got  # non-empty


def test_wand_msm_join_path_identical(spark, built, queries):
    """The no-pushdown (join) path must rank identically under msm."""
    assert _rows(
        wand_topk(spark, built, queries, k=10, min_should_match=MSM,
                  pushdown_max_terms=0)
    ) == _rows(wand_topk(spark, built, queries, k=10, min_should_match=MSM))


def test_msm_matches_duckdb_twin(spark, corpus, built, queries):
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = bm25_topk_sql("docs", QUERIES, k=10, text_col="content",
                        min_should_match=MSM)
    want = sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in con.execute(sql).fetchall()
    )
    got = [
        (q, r, d, round(s, 6))
        for q, r, d, s in _rows(
            wand_topk(spark, built, queries, k=10, min_should_match=MSM)
        )
    ]
    assert got == want


def test_msm_validation(spark, built, queries):
    with pytest.raises(ValueError):
        wand_topk(spark, built, queries, k=10, min_should_match=0)
    with pytest.raises(ValueError):
        wand_topk(spark, built, queries, k=10, min_should_match=2,
                  require_all=True)
