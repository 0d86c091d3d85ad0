"""Index-backed full match set: scored_matches_from_index must agree
with the brute-force scoring base to the round-6 quantum, and the
facet / collapse / sort / range consumers must be path-identical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query import facets, modes
from instructor_embedding_spark.query.wand import scored_matches_from_index

QUERIES = [
    (1, "merge sort window"),
    (2, "fast hash join"),
    (3, "a of the"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("msidx"))
    docs = datagen.corpus(spark, 260, partitions=4).withColumn(
        "grp",
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    ).withColumn("n_chars", F.length("content")).cache()
    h = build_index(
        spark, docs, idx,
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="matchset"),
        text_col="content",
    )
    return h, docs


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def _r6rows(df):
    return sorted(
        (r.query_id, r.doc_id, r.dl, round(r.score_raw, 6))
        for r in df.collect()
    )


def test_matchset_equals_bruteforce_base(spark, built, queries):
    h, docs = built
    got = scored_matches_from_index(spark, h, queries)
    # the facets scoring base carries dl — the exact same quadruple
    want = facets._scored_matches(docs, queries, "content", "doc_id", None) \
        .select("query_id", "doc_id", "dl", "score_raw")
    assert _r6rows(got) == _r6rows(want)
    assert got.count() > 0
    assert got.filter("query_id = 3").count() == 0  # all-stopword query


def test_facets_from_index_parity(spark, built, queries):
    h, docs = built
    grp = docs.select("doc_id", F.col("grp").alias("facet"))
    got = facets.facet_counts_from_index(spark, h, queries, grp)
    want = facets.facet_counts(docs, queries, "grp", text_col="content")
    norm = lambda df: sorted(  # noqa: E731
        (r.query_id, r.facet, r.n_docs, round(r.top_score, 6), r.min_dl,
         r.max_dl, round(r.avg_dl, 6)) for r in df.collect()
    )
    assert norm(got) == norm(want)

    got_h = facets.facet_histogram_from_index(spark, h, queries, 16)
    want_h = facets.facet_histogram(docs, queries, 16, text_col="content")
    assert norm(got_h) == norm(want_h)


def test_modes_over_index_matchset_parity(spark, built, queries):
    h, docs = built
    m = scored_matches_from_index(spark, h, queries)
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731

    grp = docs.select("doc_id", F.col("grp").alias("grp"))
    assert rows(modes.collapse_over(m, grp, k=10)) == \
        rows(modes.collapse_topk(docs, queries, "grp", k=10,
                                 text_col="content"))

    attr = docs.select("doc_id", F.col("n_chars").alias("sort_key"))
    assert rows(modes.sort_over(m, attr, k=10)) == \
        rows(modes.sort_topk(docs, queries, "n_chars", k=10,
                             text_col="content"))

    keep = docs.filter((F.col("n_chars") >= 200) & (F.col("n_chars") < 600)) \
        .select("doc_id")
    assert rows(modes.range_over(m, keep, k=10)) == \
        rows(modes.range_topk(docs, queries, "n_chars", 200, 600, k=10,
                              text_col="content"))


def test_matchset_plan_pushes_terms_and_broadcasts(spark, built, queries):
    h, _ = built
    df = scored_matches_from_index(spark, h, queries)
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    plan = jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
    )
    assert "In(term" in plan  # pushdown reaches the segment scan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
