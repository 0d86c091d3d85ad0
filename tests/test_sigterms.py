"""significant_terms (ES JLH aggregation): hand-computed scores, the
fgr>bgr and min_doc_count prunes, index-vs-brute parity, and the DuckDB
twin.

Reference parity note: the reference repo evaluates retrieval only;
significant_terms is the standard engine companion aggregation
(Elasticsearch SignificantTermsAggregator, JLH heuristic), re-expressed
as Spark hash aggregation over the decoded match set.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import build_index
from instructor_embedding_spark.query.facets import (
    significant_terms,
    significant_terms_from_index,
    significant_terms_sql,
)

#: every doc shares the ubiquitous term "omni"; "alpha" docs also carry
#: the companion "beta" (the significant association to find); "gamma"
#: rides only SOME alpha docs (weaker); the rest is noise.
DOCS = [
    (1, "alpha beta omni"),
    (2, "alpha beta omni"),
    (3, "alpha beta gamma omni"),
    (4, "alpha beta gamma omni"),
    (5, "alpha beta omni"),
    (6, "noise omni fish"),
    (7, "noise omni dog"),
    (8, "beta omni dog"),
    (9, "cat omni fish"),
    (10, "cat omni dog"),
]
QUERIES = [(1, "alpha")]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def test_jlh_hand_computed(spark, docs, queries):
    """fg = docs 1-5 (the alpha docs).  beta: fg_df=5, bg_df=6 →
    fgr=1.0, bgr=0.6, jlh=(0.4)*(1/0.6); alpha: fg_df=5, bg_df=5 →
    fgr=1.0, bgr=0.5, jlh=0.5*2=1.0; gamma(fg_df=2) and omni(fgr==bgr)
    must be pruned (min_doc_count / no-lift)."""
    got = {
        r["term"]: r
        for r in significant_terms(
            docs, queries, size=10, min_doc_count=3
        ).collect()
    }
    assert set(got) == {"alpha", "beta"}
    assert got["alpha"]["fg_df"] == 5 and got["alpha"]["bg_df"] == 5
    assert got["alpha"]["sig_score"] == pytest.approx(1.0, abs=1e-9)
    assert got["beta"]["fg_df"] == 5 and got["beta"]["bg_df"] == 6
    assert got["beta"]["sig_score"] == pytest.approx(
        round((1.0 - 0.6) * (1.0 / 0.6), 6), abs=1e-9
    )
    # ranking: alpha (1.0) above beta (0.666667)
    ranked = significant_terms(docs, queries, size=1, min_doc_count=3)
    assert [r["term"] for r in ranked.collect()] == ["alpha"]


def test_ubiquitous_term_has_no_lift(spark, docs, queries):
    """omni appears in EVERY doc: fgr == bgr == 1.0, so it is dropped by
    the strict fgr > bgr filter even at min_doc_count=1."""
    got = significant_terms(docs, queries, size=100, min_doc_count=1)
    assert "omni" not in {r["term"] for r in got.collect()}


def test_min_doc_count_prunes_tail(spark, docs, queries):
    wide = significant_terms(docs, queries, size=100, min_doc_count=1)
    assert "gamma" in {r["term"] for r in wide.collect()}
    tight = significant_terms(docs, queries, size=100, min_doc_count=3)
    assert "gamma" not in {r["term"] for r in tight.collect()}


def test_twin_matches_duckdb(spark, docs, queries):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") v(doc_id, text)"
    )
    want = con.execute(
        significant_terms_sql("documents", QUERIES, size=5,
                              min_doc_count=1)
    ).fetchall()
    got = _rows(significant_terms(docs, queries, size=5, min_doc_count=1))
    assert got == sorted(tuple(r) for r in want)


@pytest.fixture(scope="module")
def corpus_and_index(spark, tmp_path_factory):
    corpus = datagen.corpus(spark, 240, partitions=4).cache()
    root = str(tmp_path_factory.mktemp("sigterms_idx"))
    handle = build_index(spark, corpus, root, text_col="content")
    return corpus, handle


def test_index_matches_bruteforce(spark, corpus_and_index):
    corpus, handle = corpus_and_index
    qdf = spark.createDataFrame(
        [(1, "merge sort window"), (2, "fast hash join")],
        "query_id long, query_text string",
    )
    brute = significant_terms(
        corpus, qdf, size=5, min_doc_count=3, text_col="content"
    )
    served = significant_terms_from_index(
        spark, handle, qdf, corpus, size=5, min_doc_count=3,
        text_col="content",
    )
    assert _rows(brute) == _rows(served)
    assert brute.count() > 0


def test_index_plan_shape(spark, corpus_and_index):
    """No cartesian anywhere; the top-size window group-limits; the
    fg_n join broadcasts."""
    corpus, handle = corpus_and_index
    qdf = spark.createDataFrame(
        [(1, "merge sort window")], "query_id long, query_text string"
    )
    df = significant_terms_from_index(
        spark, handle, qdf, corpus, text_col="content"
    )
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan
