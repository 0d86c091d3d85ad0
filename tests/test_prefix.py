"""Prefix (wildcard) retrieval: dictionary expansion + disjunctive BM25."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.prefix import (
    expand_prefixes,
    prefix_topk,
)


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("pfx") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="pfx"),
        text_col="content",
    )


def test_expansion_is_sorted_capped_distinct(spark, built):
    all_terms = sorted(
        r.term for r in built.term_stats(spark).collect()
        if r.term.startswith("s")
    )
    assert len(all_terms) > 2
    got = sorted(
        r.term for r in expand_prefixes(
            spark, built.term_stats(spark), [(1, "s")], max_expansions=2
        ).collect()
    )
    assert got == all_terms[:2]
    full = sorted(
        r.term for r in expand_prefixes(
            spark, built.term_stats(spark), [(1, "s")], max_expansions=10**6
        ).collect()
    )
    assert full == all_terms


def test_prefix_topk_equals_expanded_bruteforce(spark, corpus, built):
    """prefix_topk == brute-force BM25 over query texts spelling out the
    expansion (tokens are tokenizer-stable, so re-tokenizing the expanded
    term list reproduces the same distinct term set)."""
    prefixes = [(1, "mer"), (2, "sor"), (3, "ha")]
    exp = expand_prefixes(spark, built.term_stats(spark), prefixes)
    by_q = {}
    for r in exp.collect():
        by_q.setdefault(r.query_id, []).append(r.term)
    queries = spark.createDataFrame(
        [(qid, " ".join(sorted(ts))) for qid, ts in by_q.items()],
        "query_id long, query_text string",
    )
    got = _rows(prefix_topk(spark, built, prefixes, k=10))
    want = _rows(bm25_topk(corpus, queries, k=10, text_col="content"))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)
    assert len(got) > 0


def test_multi_prefix_query_scores_shared_term_once(spark, corpus, built):
    """A query with overlapping prefixes ('me', 'mer' both cover 'merge')
    must equal the query with the distinct union of their expansions."""
    both = prefix_topk(spark, built, [(1, "me"), (1, "mer")], k=10)
    # distinct union == expansion of 'me' alone plus mer-only terms; since
    # mer ⊂ me (every mer-term is a me-term), both == just 'me'
    only = prefix_topk(spark, built, [(1, "me")], k=10)
    assert _rows(both) == _rows(only)


def test_unmatched_prefix_is_empty(spark, built):
    assert prefix_topk(spark, built, [(1, "zzqqx")], k=10).count() == 0
