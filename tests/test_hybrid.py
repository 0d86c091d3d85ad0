"""Hybrid retrieval (RRF + weighted min-max fusion): hand-computed
values, union semantics, tie-breaks, and the DuckDB twins."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query import hybrid


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in df.collect()
    )


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long"
    )


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double"
    )


W = int(1e9 / 61 + 0.5)   # rank-1 RRF weight at rrf_k=60
W2 = int(1e9 / 62 + 0.5)  # rank-2


def test_rrf_hand_value(spark):
    a = _ranking(spark, [(1, 10, 1), (1, 20, 2)])
    b = _ranking(spark, [(1, 20, 1), (1, 30, 2)])
    got = _rows(hybrid.rrf_fuse([a, b], k=10))
    # doc 20 fuses both rank weights; 10 and 30 carry one each, the
    # rank-1 weight (1/61) beating the rank-2 weight (1/62)
    assert got == [
        (1, 1, 20, round((W + W2) / 1e9, 6)),
        (1, 2, 10, round(W / 1e9, 6)),
        (1, 3, 30, round(W2 / 1e9, 6)),
    ]


def test_rrf_is_union_not_intersection(spark):
    # a doc retrieved by only ONE system must survive the fusion
    a = _ranking(spark, [(1, 10, 1)])
    b = _ranking(spark, [(1, 99, 1)])
    got = _rows(hybrid.rrf_fuse([a, b], k=10))
    assert {d for _, _, d, _ in got} == {10, 99}


def test_rrf_equal_scores_tiebreak_by_doc_id(spark):
    a = _ranking(spark, [(1, 7, 1), (1, 3, 2)])
    b = _ranking(spark, [(1, 3, 1), (1, 7, 2)])
    got = _rows(hybrid.rrf_fuse([a, b], k=10))
    # both docs sum the same (1/61 + 1/62) — doc_id ascending breaks it
    assert [(r, d) for _, r, d, _ in got] == [(1, 3), (2, 7)]


def test_linear_minmax_and_degenerate_page(spark):
    a = _scored(spark, [(1, 1, 10.0), (1, 2, 5.0), (1, 3, 0.0)])
    b = _scored(spark, [(1, 9, 7.0)])  # single-row page: norm pins to 1
    got = _rows(hybrid.linear_fuse([a, b], (0.7, 0.3), k=10))
    assert got == [
        (1, 1, 1, 0.7),    # norm 1.0 * 0.7
        (1, 2, 2, 0.35),   # norm 0.5 * 0.7
        (1, 3, 9, 0.3),    # degenerate page norm 1.0 * 0.3
        (1, 4, 3, 0.0),    # norm 0.0 still ranks (union semantics)
    ]


def test_linear_weight_count_mismatch_raises(spark):
    a = _scored(spark, [(1, 1, 1.0)])
    with pytest.raises(ValueError):
        hybrid.linear_fuse([a], (0.5, 0.5), k=5)


# ------------------------------------------------------------- twin parity


N_DOCS = 240
DIM = 8
QUERIES = [(1, "fast hash join"), (2, "window merge sort"),
           (3, "a of the"), (4, "vector column scan")]
PROBES = [(1, 11), (2, 53), (3, 107), (4, 211)]


def _emb_rows():
    rng = np.random.default_rng(7)
    return [
        (int(i), [float(x) for x in rng.standard_normal(DIM)])
        for i in range(N_DOCS)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, N_DOCS, partitions=4).cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.createDataFrame(
        _emb_rows(), "vec_id long, embedding array<double>"
    ).cache()


@pytest.fixture(scope="module")
def oracle(corpus, embeddings):
    con = duckdb.connect()
    con.register("documents_pd", corpus.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    epd = embeddings.toPandas()
    con.register("embeddings_pd", epd)
    con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_pd")
    return con


def _qdf(spark):
    return spark.createDataFrame(
        QUERIES, "query_id long, query_text string"
    )


def _pmap(spark):
    return spark.createDataFrame(PROBES, "query_id long, vec_id long")


def test_hybrid_rrf_twin_parity(spark, corpus, embeddings, oracle):
    got = _rows(hybrid.hybrid_rrf_topk(
        corpus, _qdf(spark), embeddings, _pmap(spark), k=10, k_each=15,
        text_col="content",
    ))
    want = sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in oracle.execute(hybrid.hybrid_rrf_topk_sql(
            "documents", QUERIES, "embeddings", PROBES, k=10, k_each=15,
            text_col="content",
        )).fetchall()
    )
    assert got == want


def test_hybrid_linear_twin_parity(spark, corpus, embeddings, oracle):
    got = _rows(hybrid.hybrid_linear_topk(
        corpus, _qdf(spark), embeddings, _pmap(spark), k=10, k_each=15,
        text_col="content",
    ))
    want = sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in oracle.execute(hybrid.hybrid_linear_topk_sql(
            "documents", QUERIES, "embeddings", PROBES, k=10, k_each=15,
            text_col="content",
        )).fetchall()
    )
    assert got == want


def test_all_stopword_query_served_dense_only(spark, corpus, embeddings):
    # query 3 tokenizes to nothing: its lexical page is empty, so the
    # fused page IS its dense page — hybrid's reason to exist
    fused = hybrid.hybrid_rrf_topk(
        corpus, _qdf(spark), embeddings, _pmap(spark), k=10, k_each=15,
        text_col="content",
    )
    q3 = [(r.rank, r.doc_id) for r in
          fused.filter(fused.query_id == 3).collect()]
    from instructor_embedding_spark.analytics.similarity import cosine_topk
    probe = embeddings.filter(embeddings.vec_id == 107)
    dense = sorted(
        (int(r.rank), int(r.neighbor_id))
        for r in cosine_topk(embeddings, k=10, queries=probe).collect()
    )
    assert sorted(q3) == dense


def test_dense_page_hook_takes_lsh_ann(spark, corpus, embeddings):
    # the scale path: the LSH ANN top-k replaces the exact dense default
    # through dense_page=, and the fusion is exactly the RRF of its two
    # input pages (re-derived via rrf_fuse on the same inputs)
    from instructor_embedding_spark.analytics.similarity import (
        lsh_cosine_topk,
    )
    from instructor_embedding_spark.query.bm25 import bm25_topk

    knn = lsh_cosine_topk(embeddings, k=15, dim=DIM).cache()
    page = (
        knn.join(_pmap(spark), "vec_id")
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    )
    fused = hybrid.hybrid_rrf_topk(
        corpus, _qdf(spark), embeddings, _pmap(spark), k=10, k_each=15,
        text_col="content", dense_page=page,
    )
    lex = bm25_topk(corpus, _qdf(spark), k=15, text_col="content")
    want = hybrid.rrf_fuse([lex, page], k=10)
    assert _rows(fused) == _rows(want) and fused.count() > 0
