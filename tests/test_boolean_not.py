"""MUST_NOT (prohibited clauses): per-query exclusion inside the WAND
kernel, verified against the DuckDB twin and a from-first-principles
exclusion invariant."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.functions.tokenize import tokenize_py
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import bm25_topk_sql
from instructor_embedding_spark.query.wand import wand_topk

POS = [(1, "merge sort"), (2, "hash"), (3, "batch key")]
NEG = [(1, "hash"), (2, "zzqqx"), (3, "batch")]


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("bn") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="bn"),
        text_col="content",
    )


def _qdf(spark, pairs):
    return spark.createDataFrame(pairs, "query_id long, query_text string")


def test_must_not_equals_plain_minus_excluded(spark, corpus, built):
    """At unbounded k, must_not == plain results minus (query, doc) pairs
    where the doc contains a prohibited term — scoring is untouched, only
    membership changes (checked per query from the raw corpus)."""
    plain = wand_topk(spark, built, _qdf(spark, POS), k=10**6)
    noted = wand_topk(spark, built, _qdf(spark, POS), k=10**6,
                      neg_queries=_qdf(spark, NEG))
    toks = {r.doc_id: set(tokenize_py(r.content)) for r in corpus.collect()}
    neg_terms = {qid: set(tokenize_py(t)) for qid, t in NEG}
    want = {}
    for r in plain.collect():
        if toks[r.doc_id] & neg_terms.get(r.query_id, set()):
            continue
        want.setdefault(r.query_id, []).append((r.doc_id, r.score))
    got = {}
    for r in noted.collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert {q: sorted(v) for q, v in got.items()} == {
        q: sorted(v) for q, v in want.items()
    }
    # the exclusion actually bit: query 1 lost rows, query 2 (no-hit
    # prohibited term) lost none
    n_plain = {q: 0 for q, _ in POS}
    for r in plain.collect():
        n_plain[r.query_id] += 1
    assert len(got[1]) < n_plain[1]
    assert len(got[2]) == n_plain[2]


def test_must_not_matches_duckdb_twin(spark, corpus, built, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    got = _rows(wand_topk(spark, built, _qdf(spark, POS), k=10,
                          neg_queries=_qdf(spark, NEG)))
    got = [(a, b, c, round(d, 6)) for a, b, c, d in got]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(
            bm25_topk_sql("docs", POS, k=10, text_col="content",
                          neg_queries_values=NEG)
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_self_prohibited_query_is_empty(spark, built):
    """A query whose only positive term is also prohibited returns
    nothing (the prohibited clause wins — every matching doc is
    excluded)."""
    got = wand_topk(spark, built, _qdf(spark, [(1, "hash")]), k=10,
                    neg_queries=_qdf(spark, [(1, "hash")]))
    assert got.count() == 0


def test_must_not_with_conjunctive_and_filter(spark, corpus, built):
    """must_not composes with require_all and doc_filter: the result is
    the conjunctive filtered result minus excluded docs."""
    doc_filter = corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    base = wand_topk(spark, built, _qdf(spark, POS), k=10**6,
                     doc_filter=doc_filter, require_all=True)
    noted = wand_topk(spark, built, _qdf(spark, POS), k=10**6,
                      doc_filter=doc_filter, require_all=True,
                      neg_queries=_qdf(spark, NEG))
    toks = {r.doc_id: set(tokenize_py(r.content)) for r in corpus.collect()}
    neg_terms = {qid: set(tokenize_py(t)) for qid, t in NEG}
    want = sorted(
        (r.query_id, r.doc_id, r.score) for r in base.collect()
        if not (toks[r.doc_id] & neg_terms.get(r.query_id, set()))
    )
    got = sorted((r.query_id, r.doc_id, r.score) for r in noted.collect())
    assert got == want
