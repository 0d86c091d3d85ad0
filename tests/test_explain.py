"""Explain (_explain score breakdown) and term vectors (_termvectors):
the debug surface must decompose exactly what the gated ranking computes.
"""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.explain import (
    explain_score,
    explain_score_sql,
    term_vectors,
    term_vectors_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


QUERIES = [(1, "merge sort buffer"), (2, "hash join"), (3, "zzqqx")]


def test_explain_contributions_sum_to_gated_score(spark, corpus):
    """The identity that ties the debug layer to the oracle-gated path:
    per-(query, doc) round-6 sums of the breakdown == bm25_topk scores,
    and the explained pair set == the top-k pair set."""
    qdf = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    want = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(corpus, qdf, k=10, text_col="content").collect()
    }
    ex = explain_score(corpus, qdf, k=10, text_col="content").collect()
    got: dict[tuple, float] = {}
    for r in ex:
        got[(r.query_id, r.doc_id)] = got.get((r.query_id, r.doc_id), 0.0) \
            + r.contribution
    got = {k_: round(v, 6) for k_, v in got.items()}
    assert set(got) == set(want)
    for pair, s in want.items():
        assert got[pair] == pytest.approx(s, abs=2e-6)


def test_explain_matches_duckdb_twin(spark, corpus, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    got = sorted(
        (r.query_id, r.doc_id, r.term, r.tf, r.dl,
         round(r.idf, 6), round(r.contribution, 6))
        for r in explain_score(
            corpus,
            spark.createDataFrame(QUERIES,
                                  "query_id long, query_text string"),
            k=10, text_col="content",
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], r[3], r[4], round(r[5], 6), round(r[6], 6))
        for r in con.execute(
            explain_score_sql("docs", QUERIES, k=10, text_col="content")
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_term_vectors_match_duckdb_and_self_consistent(spark, corpus,
                                                       tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    ids = [7, 42, 123]
    rows = term_vectors(corpus, ids, text_col="content").collect()
    assert {r.doc_id for r in rows} == set(ids)
    for r in rows:
        assert len(r.positions) == r.tf          # one position per hit
        assert r.positions == sorted(r.positions)
    got = sorted(
        (r.doc_id, r.term, r.tf, tuple(r.positions)) for r in rows
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], tuple(r[3]))
        for r in con.execute(
            term_vectors_sql("docs", ids, text_col="content")
        ).fetchall()
    )
    assert got == want and len(got) > 0
