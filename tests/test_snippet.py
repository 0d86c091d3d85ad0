"""Snippet extraction: best-window highlighting over the positions index,
verified against a first-principles DuckDB twin and the proximity kernel."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.functions.tokenize import tokenize_py
from instructor_embedding_spark.query.phrase import (
    build_positions,
    proximity_topk,
)
from instructor_embedding_spark.query.snippet import (
    _best_window,
    snippet_topk,
    snippet_topk_sql,
)

QUERIES = [
    (1, "merge sort"),
    (2, "fast key order"),
    (3, "batch"),
    (4, "zzz missing"),
]
WINDOW = 12


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def positions(spark, corpus):
    return build_positions(corpus, 64, "content").cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snippet_matches_duckdb_twin(spark, corpus, positions, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    got = _rows(
        snippet_topk(spark, positions, QUERIES, window=WINDOW, k=10).select(
            "query_id", "rank", "doc_id", "covered", "snippet_start"
        )
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = sorted(
        tuple(r)
        for r in con.execute(
            snippet_topk_sql("docs", QUERIES, window=WINDOW, k=10,
                             text_col="content")
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_snippet_window_really_covers(spark, corpus, positions):
    """Brute-force check: the reported window [start, start+w-1] contains
    exactly `covered` distinct query terms, and no window does better."""
    got = snippet_topk(spark, positions, QUERIES, window=WINDOW,
                       k=10).collect()
    toks_by_doc = {
        r.doc_id: tokenize_py(r.content)
        for r in corpus.collect()
    }
    terms_by_q = {qid: sorted(set(tokenize_py(t))) for qid, t in QUERIES}
    assert len(got) > 0
    for r in got:
        toks = toks_by_doc[r.doc_id]
        terms = terms_by_q[r.query_id]
        sl = set(toks[r.snippet_start - 1: r.snippet_start - 1 + WINDOW])
        assert sum(t in sl for t in terms) == r.covered
        best = max(
            sum(t in set(toks[i: i + WINDOW]) for t in terms)
            for i in range(len(toks))
        )
        assert r.covered == best
        # leftmost: no smaller start achieves `covered`
        for i in range(r.snippet_start - 1):
            assert sum(
                t in set(toks[i: i + WINDOW]) for t in terms
            ) < r.covered


def test_full_coverage_iff_proximity_match(spark, positions):
    """covered == n_terms exactly when the unordered-NEAR kernel (slop =
    window - n_terms) matches — two independent kernels over the same
    intervals cross-check each other."""
    queries = [(1, "merge sort"), (2, "fast key order")]
    snip = snippet_topk(spark, positions, queries, window=WINDOW,
                        k=10**6).collect()
    full = {
        (r.query_id, r.doc_id) for r in snip
        if r.covered == len(set(tokenize_py(dict(queries)[r.query_id])))
    }
    prox_docs = set()
    for qid, text in queries:
        n_terms = len(set(tokenize_py(text)))
        prox = proximity_topk(spark, positions, [(qid, text)],
                              slop=WINDOW - n_terms, k=10**6).collect()
        prox_docs |= {(qid, r.doc_id) for r in prox}
    assert full == prox_docs and len(full) > 0


def test_missing_term_query_ranks_zero_covered_never(spark, positions):
    got = snippet_topk(spark, positions, [(4, "zzqqxx")], k=10).collect()
    assert got == []


def test_best_window_kernel_bruteforce_property():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n_terms = int(rng.integers(1, 4))
        w = int(rng.integers(1, 8))
        doc_len = int(rng.integers(1, 40))
        pos_lists = []
        for _t in range(n_terms):
            npos = int(rng.integers(1, 6))
            pos_lists.append(np.unique(
                rng.integers(1, doc_len + 1, size=npos).astype(np.uint64)
            ))
        got_cov, got_start = _best_window(pos_lists, w)
        best, arg = 0, None
        for s in range(1, doc_len + 1):
            c = sum(
                bool(((p >= s) & (p <= s + w - 1)).any()) for p in pos_lists
            )
            if c > best:
                best, arg = c, s
        assert (got_cov, got_start) == (best, arg)
