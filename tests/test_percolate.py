"""Percolator (reverse search): stored queries matched against incoming
docs — batch kernel ≡ stateless column ≡ DuckDB twin, and stream ==
batch for the streaming form."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.functions.tokenize import tokenize_py
from instructor_embedding_spark.query.percolate import (
    percolate,
    percolate_batch_stateless,
    percolate_sql,
    percolate_stream,
    prepare_stored_queries,
)

# mixed monitors over the synthetic source-code vocabulary: require-all
# defaults, an explicit msm, and an OR (msm=1)
STORED = [
    (1, "merge posting segments", None),
    (2, "parse varint block header", 3),
    (3, "wand scorer", None),
    (4, "buffer pool checkpoint", 1),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 300, partitions=4).cache()


@pytest.fixture(scope="module")
def oracle(corpus):
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    return con


def _rows(df):
    return sorted(
        (int(r.doc_id), int(r.query_id), int(r.matched), int(r.n_terms))
        for r in df.collect()
    )


def test_twin_parity(spark, corpus, oracle):
    got = _rows(percolate(spark, corpus, STORED, text_col="content"))
    want = sorted(
        (int(d), int(q), int(m), int(n))
        for d, q, m, n in oracle.execute(
            percolate_sql("docs", STORED, text_col="content")
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_stateless_form_identical(spark, corpus):
    a = _rows(percolate(spark, corpus, STORED, text_col="content"))
    b = _rows(percolate_batch_stateless(corpus, STORED, text_col="content"))
    assert a == b


def test_require_all_and_msm_semantics(spark, corpus):
    """Brute-force re-derivation: matched == |query_terms ∩ doc_terms|
    and the msm threshold is applied exactly."""
    prepared = {q: (set(t), m) for q, t, m in prepare_stored_queries(STORED)}
    got = {
        (d, q): (m, n)
        for d, q, m, n in _rows(
            percolate(spark, corpus, STORED, text_col="content")
        )
    }
    docs = corpus.select("doc_id", "content").collect()
    want = {}
    for r in docs:
        dterms = set(tokenize_py(r.content))
        for qid, (qterms, msm) in prepared.items():
            m = len(qterms & dterms)
            if m >= msm:
                want[(r.doc_id, qid)] = (m, len(qterms))
    assert got == want
    # the require-all monitors really required all their terms
    for (d, q), (m, n) in got.items():
        if STORED[q - 1][2] is None:
            assert m == n


def test_msm1_is_any_term_or(spark, corpus):
    one = [(7, "merge posting segments", 1)]
    got = {d for d, _, _, _ in _rows(
        percolate(spark, corpus, one, text_col="content"))}
    qterms = set(tokenize_py(one[0][1]))
    want = {
        r.doc_id for r in corpus.select("doc_id", "content").collect()
        if qterms & set(tokenize_py(r.content))
    }
    assert got == want


def test_planted_doc_and_near_miss(spark):
    docs = spark.createDataFrame(
        [
            (100, "the mergeSort uses a postingList over segments"),
            (101, "posting segments only, no merging here"),
        ],
        "doc_id long, text string",
    )
    full = _rows(percolate(spark, docs, [(1, "merge posting segments", None)]))
    assert [(d, q) for d, q, _, _ in full] == [(100, 1)]
    relaxed = _rows(percolate(spark, docs, [(1, "merge posting segments", 2)]))
    assert [(d, q) for d, q, _, _ in relaxed] == [(100, 1), (101, 1)]


def test_zero_term_and_bad_msm_rejected():
    with pytest.raises(ValueError, match="no analyzed terms"):
        prepare_stored_queries([(1, "the of a to", None)])
    with pytest.raises(ValueError, match="outside"):
        prepare_stored_queries([(1, "merge posting", 3)])
    with pytest.raises(ValueError, match="outside"):
        prepare_stored_queries([(1, "merge posting", 0)])


def test_stateless_plan_has_no_exchange(spark, corpus):
    df = percolate_batch_stateless(corpus, STORED, text_col="content")
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained


def test_stream_equals_batch(spark, corpus, tmp_path):
    src = str(tmp_path / "stream_src")
    corpus.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(datagen.CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out = percolate_stream(stream, STORED, text_col="content")
    q = (
        out.writeStream.format("memory")
        .queryName("perc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.sql("SELECT * FROM perc_stream"))
    want = _rows(percolate_batch_stateless(corpus, STORED, text_col="content"))
    assert got == want
    assert len(got) > 0
