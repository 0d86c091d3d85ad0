"""rescore (ES QueryRescorer): phrase second pass over the primary
window — degeneracy to plain BM25, real reordering, window confinement,
and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.modes import (
    rescore_topk,
    rescore_topk_sql,
)
from instructor_embedding_spark.query.phrase import build_positions


def _ranked(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"]) for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def positions(spark, corpus):
    return build_positions(corpus, span=64).cache()


def test_zero_rescore_weight_equals_plain_bm25(spark, corpus, positions):
    qv = [(1, "merge sort window"), (2, "fast hash join")]
    qdf = spark.createDataFrame(qv, "query_id long, query_text string")
    plain = bm25_topk(corpus, qdf, k=10, text_col="content")
    res = rescore_topk(
        spark, corpus, qv, positions, k=10, rescore_weight=0.0,
        text_col="content",
    )
    assert _ranked(plain) == _ranked(res)


def test_absent_phrase_degrades_to_primary(spark, corpus, positions):
    """A query whose exact phrase never occurs: pf=0 for every doc, so
    any rescore_weight leaves the primary order untouched."""
    qv = [(1, "merge zzqqxv sort")]
    base = rescore_topk(spark, corpus, qv, positions, k=10,
                        rescore_weight=0.0, text_col="content")
    boosted = rescore_topk(spark, corpus, qv, positions, k=10,
                           rescore_weight=50.0, text_col="content")
    assert _ranked(base) == _ranked(boosted)


def test_phrase_boost_reorders_window(spark, positions):
    """doc 1 wins the primary pass on raw tf; doc 2 holds the exact
    phrase — a large rescore weight must flip them."""
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha gamma beta beta beta"),
            (2, "alpha beta filler filler filler filler filler"),
            (3, "noise tokens only here"),
        ],
        "doc_id long, text string",
    )
    pos = build_positions(docs, span=16, text_col="text")
    qv = [(1, "alpha beta")]
    plain = _ranked(rescore_topk(spark, docs, qv, pos, k=3,
                                 rescore_weight=0.0))
    boosted = _ranked(rescore_topk(spark, docs, qv, pos, k=3,
                                   rescore_weight=50.0))
    assert plain[0] == (1, 1, 1)     # tf-heavy doc wins unrescored
    assert boosted[0] == (1, 1, 2)   # exact-phrase doc wins rescored
    # doc 3 matches nothing and never appears
    assert all(d != 3 for _, _, d in boosted)


def test_window_confines_candidates(spark, corpus, positions):
    """ES semantics: a doc outside the primary top-window_size can never
    enter the final ranking, whatever its phrase score."""
    qv = [(1, "merge sort window")]
    full = rescore_topk(spark, corpus, qv, positions, k=100,
                        window_size=100, text_col="content")
    tight = rescore_topk(spark, corpus, qv, positions, k=100,
                         window_size=5, text_col="content")
    tight_rows = _ranked(tight)
    assert len(tight_rows) == min(5, len(_ranked(full)))
    # the tight result's docs are a subset of the primary top-5
    prim = rescore_topk(spark, corpus, qv, positions, k=5,
                        rescore_weight=0.0, window_size=100,
                        text_col="content")
    assert {d for _, _, d in tight_rows} == {
        d for _, _, d in _ranked(prim)
    }


def test_twin_matches_duckdb(spark, corpus, positions):
    qv = [(1, "merge sort"), (2, "hash join"), (3, "merge sort zzqqxv")]
    got = sorted(
        tuple(r) for r in rescore_topk(
            spark, corpus, qv, positions, k=10, text_col="content"
        ).collect()
    )
    con = duckdb.connect()
    pdf = corpus.select("doc_id", "content").toPandas()
    con.register("docs_pd", pdf)
    con.execute("CREATE TABLE documents AS SELECT * FROM docs_pd")
    want = sorted(
        tuple(r)
        for r in con.execute(
            rescore_topk_sql("documents", qv, k=10, text_col="content")
        ).fetchall()
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=2e-6)
