"""Phrase suggester (ES phrase suggester with collate): whole-query
"did you mean" — per-position candidate caps, identity exclusion, the
conjunctive collate probe, and the recursive-CTE DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark.query.bm25 import (
    corpus_stats,
    term_stats,
    tf_table,
    tokenized,
)
from instructor_embedding_spark.query.suggest import (
    phrase_suggest,
    phrase_suggest_sql,
)

#: "merge sort"/"hash join" co-occur in docs; "merge"+"join" co-occur in
#: doc 4; "window"+"hash" NEVER co-occur (collate kill probe).
DOCS = [
    (1, "merge sort window"),
    (2, "merge sort window"),
    (3, "hash join data"),
    (4, "merge join data"),
    (5, "sort data window"),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def ts(docs):
    toks = tokenized(docs, "text")
    return term_stats(tf_table(toks), corpus_stats(toks)).cache()


def test_corrects_both_terms(spark, docs, ts):
    got = phrase_suggest(spark, ts, docs, [(1, "merge sortt")], k=3)
    top = got.filter("rank = 1").collect()[0]
    assert top["suggestion"] == "merge sort"
    assert top["total_dist"] == 1
    # "hsah"→"hash" is a transposition = 2 plain-Levenshtein edits
    got2 = phrase_suggest(spark, ts, docs, [(2, "hsah joinn")], k=3)
    top2 = got2.filter("rank = 1").collect()[0]
    assert top2["suggestion"] == "hash join"
    assert top2["total_dist"] == 3


def test_identity_phrase_excluded(spark, docs, ts):
    """A fully-correct query has no distance-0 suggestion of itself."""
    got = phrase_suggest(spark, ts, docs, [(1, "merge sort")], k=10)
    sugs = {r["suggestion"] for r in got.collect()}
    assert "merge sort" not in sugs
    assert all(r["total_dist"] >= 1 for r in got.collect())


def test_collate_drops_non_cooccurring(spark, docs, ts):
    """'window hash': both terms exist but NO doc holds both, and every
    candidate phrase pairing them must be collated away; corrections
    that do co-occur (e.g. 'window' kept + 'hash'→'sort'? not within
    edits) — the probe just asserts no suggestion pairs window+hash."""
    got = phrase_suggest(spark, ts, docs, [(1, "window hash")], k=10)
    for r in got.collect():
        terms = set(r["suggestion"].split(" "))
        assert not {"window", "hash"} <= terms


def test_rank_is_dist_then_sumdf(spark, docs, ts):
    got = phrase_suggest(spark, ts, docs, [(1, "merge sortt")], k=10)
    rows = [
        (r["rank"], r["total_dist"], r["sum_df"])
        for r in got.orderBy("rank").collect()
    ]
    assert rows == sorted(rows, key=lambda t: (t[1], -t[2], t[0]))


def test_twin_matches_duckdb(spark, docs, ts):
    qv = [(1, "merge sortt"), (2, "hsah join"), (3, "window hash"),
          (4, "zzqqxv")]
    got = _rows(phrase_suggest(spark, ts, docs, qv, k=3))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") v(doc_id, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(phrase_suggest_sql("documents", qv, k=3))
        .fetchall()
    )
    assert got == want
