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


# ------------------------------------------------ match_phrase_prefix


@pytest.fixture(scope="module")
def mpp_built(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "merge sort fast"),
            (2, "merge sorted tree"),
            (3, "merge sort merge sort"),
            (4, "sort merge"),           # reversed: stem must not match
            (5, "join join filler"),
        ],
        "doc_id long, content string",
    )
    h = build_index(
        spark, docs,
        str(tmp_path_factory.mktemp("mpp") / "idx"),
        IndexParams(doc_block_span=4, n_sub_blocks=2,
                    corpus_fingerprint="mpp", store_positions=True),
        text_col="content",
    )
    return docs, h


def test_mpp_sums_over_completions(spark, mpp_built):
    from instructor_embedding_spark.query.prefix import (
        match_phrase_prefix_topk,
    )

    _, h = mpp_built
    got = {
        (r.query_id, r.doc_id): r.matches
        for r in match_phrase_prefix_topk(
            spark, h, [(1, "merge sor")], k=10
        ).collect()
    }
    # "sor" completes to sort AND sorted: "merge sort" in 1 (x1), 3
    # (x2); "merge sorted" in 2 (x1); doc 4 reversed never matches.
    # (NB a prefix that is itself a stopword tokenizes away — the
    # analyzer applies to the prefix token like any other.)
    assert got == {(1, 1): 1, (1, 3): 2, (1, 2): 1}


def test_mpp_bare_prefix_counts_expansion_tf(spark, mpp_built):
    from instructor_embedding_spark.query.prefix import (
        match_phrase_prefix_topk,
    )

    _, h = mpp_built
    got = {
        r.doc_id: r.matches
        for r in match_phrase_prefix_topk(
            spark, h, [(1, "joi")], k=10
        ).collect()
    }
    assert got == {5: 2}
    assert match_phrase_prefix_topk(
        spark, h, [(1, "zzqx")], k=10
    ).count() == 0


def test_mpp_twin_matches_duckdb(spark, mpp_built):
    import duckdb

    from instructor_embedding_spark.query.prefix import (
        match_phrase_prefix_topk,
        match_phrase_prefix_topk_sql,
    )

    docs, h = mpp_built
    qv = [(1, "merge sor"), (2, "joi"), (3, "zzqx")]
    got = sorted(
        tuple(r)
        for r in match_phrase_prefix_topk(spark, h, qv, k=10).collect()
    )
    con = duckdb.connect()
    con.register("docs_pd", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(match_phrase_prefix_topk_sql(
            "docs_pd", qv, k=10, text_col="content"
        )).fetchall()
    )
    assert got == want and got
