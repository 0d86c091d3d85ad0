"""Brute-force BM25 vs DuckDB oracle on the driver's documents table,
plus a hand-computed micro-fixture (FIXTURES.md §5)."""

from __future__ import annotations

import math

import duckdb
import pytest

from instructor_embedding_spark.fixtures import DRIVER_QUERY_SET, TOP_K
from instructor_embedding_spark.query.bm25 import bm25_topk, bm25_topk_sql


def _spark_result(spark, sf_dir, use_pandas_udf=False):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = spark.createDataFrame(
        DRIVER_QUERY_SET, "query_id long, query_text string"
    )
    out = bm25_topk(
        docs, queries, k=TOP_K, text_col="text", use_pandas_udf=use_pandas_udf
    )
    return sorted(
        [(r.query_id, r.rank, r.doc_id, r.score) for r in out.collect()]
    )


def _duckdb_result(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = bm25_topk_sql("documents", DRIVER_QUERY_SET, k=TOP_K, text_col="text")
    return sorted([tuple(r) for r in con.execute(sql).fetchall()])


def test_bm25_matches_duckdb_oracle(spark, sf_small_dir):
    got = _spark_result(spark, sf_small_dir)
    want = _duckdb_result(sf_small_dir)
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)  # query_id, rank, doc_id identical
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_bm25_pandas_udf_path_matches_expression_path(spark, sf_small_dir):
    assert _spark_result(spark, sf_small_dir, False) == _spark_result(
        spark, sf_small_dir, True
    )


def test_bm25_micro_fixture_hand_computed(spark):
    """4 docs, hand-computable scores; includes a tie pinned by doc_id ASC.

    Corpus (after tokenization):
      d1: [alpha, beta]            dl=2
      d2: [alpha, alpha, gamma]    dl=3
      d3: [beta, beta, beta]       dl=3
      d4: [alpha, beta]            dl=2   (identical to d1 → tie on query 'alpha beta')
    N=4, avgdl=2.5
    df(alpha)=3, df(beta)=3, df(gamma)=1
    """
    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha alpha gamma"),
            (3, "beta beta beta"),
            (4, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "alpha beta"), (200, "gamma")], "query_id long, query_text string"
    )
    out = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in bm25_topk(docs, queries, k=10).collect()
    }

    k1, b = 1.2, 0.75
    N, avgdl = 4, 2.5

    def idf(df):
        return math.log(1 + (N - df + 0.5) / (df + 0.5))

    def w(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    s_d1_alpha_beta = idf(3) * w(1, 2) + idf(3) * w(1, 2)
    s_d2_alpha = idf(3) * w(2, 3)
    s_d3_beta = idf(3) * w(3, 3)
    s_d2_gamma = idf(1) * w(1, 3)

    # query 100: d1 and d4 tie → doc_id ASC pins d1 before d4
    assert out[(100, 1)][0] == 1
    assert out[(100, 2)][0] == 4
    assert out[(100, 1)][1] == pytest.approx(round(s_d1_alpha_beta, 6), abs=1e-9)
    assert out[(100, 2)][1] == pytest.approx(round(s_d1_alpha_beta, 6), abs=1e-9)
    ranked_34 = sorted(
        [(round(s_d2_alpha, 6), 2), (round(s_d3_beta, 6), 3)],
        key=lambda t: (-t[0], t[1]),
    )
    assert out[(100, 3)][0] == ranked_34[0][1]
    assert out[(100, 4)][0] == ranked_34[1][1]

    # query 200: only d2 matches gamma
    assert out[(200, 1)] == (2, pytest.approx(round(s_d2_gamma, 6), abs=1e-9))
    assert (200, 2) not in out

    # all-stopword query contributes nothing
    q_empty = spark.createDataFrame(
        [(300, "a of the")], "query_id long, query_text string"
    )
    assert bm25_topk(docs, q_empty, k=10).count() == 0


def test_fielded_single_field_equals_plain(spark, sf_small_dir):
    """bm25_topk_fielded with one weight-1.0 field degenerates exactly to
    plain bm25_topk — wtf=tf, wdl=dl, same df/idf/avgdl."""
    from instructor_embedding_spark.query.bm25 import bm25_topk_fielded

    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet")
    q = spark.createDataFrame(
        DRIVER_QUERY_SET, "query_id long, query_text string"
    )
    plain = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk(docs, q, k=TOP_K, text_col="text").collect()
    )
    fielded = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk_fielded(
            docs, q, k=TOP_K, fields=(("text", 1.0),)
        ).collect()
    )
    assert [p[:3] for p in plain] == [f[:3] for f in fielded]
    for p, f in zip(plain, fielded):
        assert p[3] == pytest.approx(f[3], abs=1e-6)


def test_fielded_title_boost_promotes_title_hits(spark):
    from instructor_embedding_spark.query.bm25 import bm25_topk_fielded

    docs = spark.createDataFrame(
        [
            (1, "apple pie recipe", "filler words here nothing else"),
            (2, "other thing entirely", "apple filler words here extra"),
            (3, "unrelated title", "unrelated body content words"),
        ],
        "doc_id long, title string, text string",
    )
    q = spark.createDataFrame(
        [(1, "apple")], "query_id long, query_text string"
    )
    out = {
        r.doc_id: r.rank
        for r in bm25_topk_fielded(
            docs, q, k=3, fields=(("title", 2.0), ("text", 1.0))
        ).collect()
    }
    assert out[1] == 1  # title hit (weight 2) outranks the body hit
    assert out[2] == 2
    assert 3 not in out


# ----------------------------------------------------------------- dismax


def test_dismax_single_field_degenerates_to_bm25(spark):
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.bm25 import bm25_topk, dismax_topk

    corpus = datagen.corpus(spark, 160, partitions=3)
    qdf = spark.createDataFrame(
        [(1, "merge sort window"), (2, "fast hash join")],
        "query_id long, query_text string",
    )
    plain = sorted(
        tuple(r)
        for r in bm25_topk(corpus, qdf, k=10, text_col="content").collect()
    )
    dm = sorted(
        tuple(r)
        for r in dismax_topk(
            corpus, qdf, k=10, fields=(("content", 1.0),), tie_breaker=0.3
        ).collect()
    )
    assert plain == dm


def test_dismax_max_and_sum_extremes(spark):
    """tie_breaker=0 → pure max of field scores; 1 → their sum."""
    from instructor_embedding_spark.query.bm25 import bm25_topk, dismax_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "gamma delta filler"),
            (2, "gamma", "alpha beta alpha"),
            (3, "filler", "filler tokens"),
        ],
        "doc_id long, title string, body string",
    )
    qdf = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    t = {r[2]: r[3] for r in
         bm25_topk(docs, qdf, k=10, text_col="title").collect()}
    b = {r[2]: r[3] for r in
         bm25_topk(docs, qdf, k=10, text_col="body").collect()}
    for tb, combine in ((0.0, max), (1.0, lambda s: round(sum(s), 6))):
        got = {r[2]: r[3] for r in dismax_topk(
            docs, qdf, k=10, fields=(("title", 1.0), ("body", 1.0)),
            tie_breaker=tb,
        ).collect()}
        for d in got:
            parts = [x for x in (t.get(d), b.get(d)) if x is not None]
            assert got[d] == pytest.approx(combine(parts), abs=2e-6), (tb, d)


def test_dismax_title_hit_beats_split_hit(spark):
    """best_fields intuition: both query terms in ONE field outranks the
    same terms scattered across fields (tie_breaker small)."""
    from instructor_embedding_spark.query.bm25 import dismax_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "filler filler filler"),
            (2, "alpha filler", "beta filler filler"),
            (3, "filler", "filler"),
        ],
        "doc_id long, title string, body string",
    )
    qdf = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    got = dismax_topk(
        docs, qdf, k=3, fields=(("title", 1.0), ("body", 1.0)),
        tie_breaker=0.1,
    ).orderBy("rank").collect()
    assert got[0]["doc_id"] == 1


def test_dismax_twin_matches_duckdb(spark):
    import duckdb

    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.bm25 import (
        dismax_topk,
        dismax_topk_sql,
    )

    from pyspark.sql import functions as F

    corpus = datagen.corpus(spark, 160, partitions=3).withColumn(
        "title", F.substring("content", 1, 48)
    )
    qv = [(1, "merge sort window"), (2, "fast hash join")]
    qdf = spark.createDataFrame(qv, "query_id long, query_text string")
    got = sorted(
        tuple(r) for r in dismax_topk(
            corpus, qdf, k=10,
            fields=(("title", 2.0), ("content", 1.0)),
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs_pd", corpus.select("doc_id", "content").toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(dismax_topk_sql(
            "SELECT doc_id, substr(content, 1, 48) AS title, content"
            " FROM docs_pd",
            qv, k=10, fields=(("title", 2.0), ("content", 1.0)),
        )).fetchall()
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) <= 2e-6


# ---------------------------------------------------------------- explain


def test_explain_sums_to_ranked_score(spark):
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.bm25 import bm25_topk, explain_topk
    from pyspark.sql import functions as F

    corpus = datagen.corpus(spark, 160, partitions=3)
    qdf = spark.createDataFrame(
        [(1, "merge sort window"), (2, "fast hash join")],
        "query_id long, query_text string",
    )
    top = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(corpus, qdf, k=5, text_col="content").collect()
    }
    exp = explain_topk(corpus, qdf, k=5, text_col="content")
    sums = {
        (r["query_id"], r["doc_id"]): r["s"]
        for r in exp.groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("s")).collect()
    }
    assert set(sums) == set(top)
    for key in top:
        # per-term contribs are individually rounded, so the re-sum can
        # drift by up to n_terms * 5e-7 from the ranked score
        assert abs(sums[key] - top[key]) <= 2e-6, key


def test_explain_twin_matches_duckdb(spark):
    import duckdb

    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.bm25 import (
        explain_topk,
        explain_topk_sql,
    )

    corpus = datagen.corpus(spark, 160, partitions=3)
    qv = [(1, "merge sort window"), (2, "fast hash join")]
    qdf = spark.createDataFrame(qv, "query_id long, query_text string")
    got = sorted(
        tuple(r)
        for r in explain_topk(corpus, qdf, k=5, text_col="content")
        .collect()
    )
    con = duckdb.connect()
    con.register("docs_pd", corpus.select("doc_id", "content").toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            explain_topk_sql("docs_pd", qv, k=5, text_col="content")
        ).fetchall()
    )
    assert [g[:6] for g in got] == [w[:6] for w in want]
    for g, w in zip(got, want):
        assert abs(g[6] - w[6]) <= 2e-6 and abs(g[7] - w[7]) <= 2e-6
    assert got
