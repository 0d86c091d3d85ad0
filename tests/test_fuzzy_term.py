"""Fuzzy (edit-distance) retrieval: dictionary expansion + disjunctive
BM25, verified against the DuckDB twin and a brute-force expansion."""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.prefix import (
    expand_fuzzy,
    fuzzy_topk,
    fuzzy_topk_sql,
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
        str(tmp_path_factory.mktemp("fz") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="fz"),
        text_col="content",
    )


def _edit1(a: str, b: str) -> bool:
    """Brute-force levenshtein(a, b) <= 1."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    s, t = (a, b) if la < lb else (b, a)  # s shorter by 1
    i = 0
    while i < len(s) and s[i] == t[i]:
        i += 1
    return s[i:] == t[i + 1:]


def test_expansion_matches_bruteforce_rule(spark, built):
    """The expansion equals the brute-force {dict term : same first char,
    |len diff| <= 1, edit distance <= 1} set (cap not binding here)."""
    terms = [r.term for r in built.term_stats(spark).collect()]
    for qterm in ("merge", "hash", "sorz"):
        want = sorted(
            t for t in terms if t[0] == qterm[0] and _edit1(t, qterm)
        )
        got = sorted(
            r.term for r in expand_fuzzy(
                spark, built.term_stats(spark), [(1, qterm)]
            ).collect()
        )
        assert got == want, qterm


def test_expansion_cap_keeps_nearest_first(spark, built):
    """max_expansions=1 must keep the (distance, term)-smallest variant:
    an exact dictionary hit always survives its own cap."""
    got = [
        r.term for r in expand_fuzzy(
            spark, built.term_stats(spark), [(1, "merge")],
            max_expansions=1,
        ).collect()
    ]
    assert got == ["merge"]


def test_prefix_len_gates_expansion(spark, built):
    """prefix_len excludes same-distance terms with a different first
    char: 'latch' and 'batch' are 1 edit apart, but a 'latch' query may
    only expand to l- terms."""
    got = sorted(
        r.term for r in expand_fuzzy(
            spark, built.term_stats(spark), [(1, "latch")]
        ).collect()
    )
    terms = {r.term for r in built.term_stats(spark).collect()}
    assert "latch" in terms and "batch" in terms
    assert "latch" in got and "batch" not in got


def test_fuzzy_topk_equals_expanded_bruteforce(spark, corpus, built):
    """fuzzy_topk == brute-force BM25 over query texts spelling out the
    expansion (tokenizer-stable terms re-tokenize to the same set)."""
    queries = [(1, "merge"), (2, "hashe"), (3, "scam")]
    exp = expand_fuzzy(spark, built.term_stats(spark), queries)
    by_q = {}
    for r in exp.collect():
        by_q.setdefault(r.query_id, []).append(r.term)
    qdf = spark.createDataFrame(
        [(qid, " ".join(sorted(ts))) for qid, ts in by_q.items()],
        "query_id long, query_text string",
    )
    got = _rows(fuzzy_topk(spark, built, queries, k=10))
    want = _rows(bm25_topk(corpus, qdf, k=10, text_col="content"))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)
    assert len(got) > 0


def test_fuzzy_topk_matches_duckdb_twin(spark, corpus, built, tmp_path):
    queries = [(1, "merge"), (2, "hashe"), (3, "sow"), (4, "zzqqx")]
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    got = _rows(fuzzy_topk(spark, built, queries, k=10))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(
            fuzzy_topk_sql("docs", queries, k=10, text_col="content")
        ).fetchall()
    )
    got = [(a, b, c, round(d, 6)) for a, b, c, d in got]
    assert got == want and len(got) > 0
    assert not any(q == 4 for q, *_ in got)


def test_unmatched_fuzzy_is_empty(spark, built):
    assert fuzzy_topk(spark, built, [(1, "zzqqx")], k=10).count() == 0
