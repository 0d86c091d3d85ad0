"""SpanNotQuery: include-term occurrences with no exclude-term
occurrence inside the [p - pre, p + post] window — hand fixtures,
brute-force re-derivation, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.functions.tokenize import tokenize_py
from instructor_embedding_spark.query.phrase import (
    build_positions,
    span_not_topk,
    span_not_topk_sql,
)


def _rows(df):
    return sorted(
        (r.phrase_id, r.rank, r.doc_id, r.matches) for r in df.collect()
    )


def test_hand_fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha gamma alpha"),  # beta kills #1 (post),
                                                  # #2 (pre); #3 survives
            (1, "alpha gamma gamma alpha"),       # no beta: both survive
            (2, "beta alpha beta"),               # fully killed
            (3, "gamma gamma"),                   # no include term
        ],
        "doc_id long, content string",
    )
    pos = build_positions(docs, span=4)
    got = {
        (r.phrase_id, r.doc_id): r.matches
        for r in span_not_topk(
            spark, pos, [(1, "alpha", "beta")], pre=1, post=1, k=10
        ).collect()
    }
    assert got == {(1, 0): 1, (1, 1): 2}


def test_zero_window_is_noop(spark):
    """pre = post = 0 (Lucene's overlap-only default) keeps every
    include occurrence for single-token spans."""
    docs = spark.createDataFrame(
        [(0, "alpha beta alpha")], "doc_id long, content string"
    )
    pos = build_positions(docs, span=4)
    got = _rows(span_not_topk(spark, pos, [(1, "alpha", "beta")], k=10))
    assert got == [(1, 1, 0, 2)]


def test_validation():
    from instructor_embedding_spark.query.phrase import _validate_span_not

    with pytest.raises(ValueError, match="single terms"):
        _validate_span_not([(1, "alpha beta", "gamma")], 1, 1)
    with pytest.raises(ValueError, match="single terms"):
        _validate_span_not([(1, "alpha", "the of")], 1, 1)
    with pytest.raises(ValueError, match="self-exclude"):
        _validate_span_not([(1, "alpha", "alpha")], 1, 1)
    with pytest.raises(ValueError, match=">= 0"):
        _validate_span_not([(1, "alpha", "beta")], -1, 0)


QUERIES = [
    (1, "merge", "sort"),
    (2, "hash", "join"),
    (3, "batch", "zzqqxv"),   # exclude term absent from the corpus
]
PRE, POST = 2, 3


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


def test_bruteforce_rederivation(spark, corpus):
    pos = build_positions(corpus, span=64, text_col="content")
    got = {
        (r.phrase_id, r.doc_id): r.matches
        for r in span_not_topk(
            spark, pos, QUERIES, pre=PRE, post=POST, k=10 ** 9
        ).collect()
    }
    want = {}
    for row in corpus.select("doc_id", "content").collect():
        toks = tokenize_py(row.content)
        for pid, it, et in QUERIES:
            m = sum(
                1
                for i, t in enumerate(toks)
                if t == it and not any(
                    toks[j] == et
                    for j in range(max(0, i - PRE),
                                   min(len(toks), i + POST + 1))
                )
            )
            if m:
                want[(pid, row.doc_id)] = m
    assert got == want
    assert len(got) > 0


def test_twin_parity(spark, corpus):
    pos = build_positions(corpus, span=64, text_col="content")
    got = _rows(span_not_topk(spark, pos, QUERIES, pre=PRE, post=POST, k=10))
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        (int(p), int(r), int(d), int(m))
        for p, r, d, m in con.execute(
            span_not_topk_sql("docs", QUERIES, pre=PRE, post=POST, k=10,
                              text_col="content")
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0
