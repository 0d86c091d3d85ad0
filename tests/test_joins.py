"""Parent/child join queries: has_child score modes and has_parent
propagation, plus the DuckDB twins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.joins import (
    has_child_topk,
    has_child_topk_sql,
    has_parent_topk,
    has_parent_topk_sql,
)

QS = [(1, "merge posting segments"), (2, "salted shuffle router"),
      (3, "zzzunknowntermzzz")]


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    # `repo` plays the parent key (the ES join-field relation)
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(QS, "query_id long, query_text string")


def _duck(corpus, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    return con


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "min"])
def test_has_child_matches_duckdb(spark, corpus, qdf, tmp_path, mode):
    got = _rows(has_child_topk(
        corpus, qdf, "repo", k=10, score_mode=mode, text_col="content"
    ))
    con = _duck(corpus, tmp_path)
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(has_child_topk_sql(
            "docs", QS, "repo", k=10, score_mode=mode, text_col="content"
        )).fetchall()
    )
    assert got == want and len(got) > 0
    assert all(q != 3 for q, *_ in got)  # zero-hit query returns nothing


def test_has_child_max_equals_best_child(spark, corpus, qdf):
    """score_mode=max: each parent's score is its best child's bm25
    score, and the surrogate id is the group's min doc_id."""
    parents = _rows(has_child_topk(
        corpus, qdf, "repo", k=10**6, score_mode="max", text_col="content"
    ))
    child = bm25_topk(corpus, qdf, k=10**6, text_col="content")
    cmap = {}  # (query, repo) -> best child score
    rep_of = {
        r.doc_id: r.repo for r in corpus.select("doc_id", "repo").collect()
    }
    gmin = {}
    for d, rp in rep_of.items():
        gmin[rp] = min(gmin.get(rp, d), d)
    for r in child.collect():
        key = (r.query_id, rep_of[r.doc_id])
        cmap[key] = max(cmap.get(key, 0.0), round(r.score, 6))
    want = sorted(
        (q, gmin[rp], s) for (q, rp), s in cmap.items()
    )
    got = sorted((q, d, s) for q, _, d, s in parents)
    assert got == want and len(got) > 0


def test_has_child_min_children_prunes(spark, corpus, qdf):
    all_p = has_child_topk(
        corpus, qdf, "repo", k=10**6, text_col="content"
    )
    # fixture density: 240 docs over ~161 repos -> max matching
    # children per (query, repo) group is 2, so 2 prunes, 3 empties
    pruned = has_child_topk(
        corpus, qdf, "repo", k=10**6, min_children=2, text_col="content"
    )
    assert pruned.count() < all_p.count()
    assert pruned.count() > 0


def test_has_parent_matches_duckdb(spark, corpus, qdf, tmp_path):
    got = _rows(has_parent_topk(
        corpus, qdf, "repo", k=10, text_col="content"
    ))
    con = _duck(corpus, tmp_path)
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(has_parent_topk_sql(
            "docs", QS, "repo", k=10, text_col="content"
        )).fetchall()
    )
    assert got == want and len(got) > 0


def test_has_parent_children_inherit_parent_score(spark, corpus, qdf):
    got = has_parent_topk(
        corpus, qdf, "repo", k=10**6, text_col="content"
    )
    rep_rows = corpus.groupBy("repo").agg(
        F.min("doc_id").alias("pid")
    ).collect()
    pid_of = {r.repo: r.pid for r in rep_rows}
    child_repo = {
        r.doc_id: r.repo for r in corpus.select("doc_id", "repo").collect()
    }
    # parent scores straight from bm25 restricted to representative docs
    base = {
        (r.query_id, r.doc_id): round(r.score, 6)
        for r in bm25_topk(corpus, qdf, k=10**6, text_col="content").collect()
    }
    for r in got.collect():
        rp = child_repo[r.doc_id]
        assert round(r.score, 6) == base[(r.query_id, pid_of[rp])]
    # every child of a matching parent is present
    matching = {
        (q, rp) for (q, d), _ in base.items()
        for rp, pid in pid_of.items() if pid == d
    }
    expect_n = sum(
        1 for d, rp in child_repo.items() for q in (1, 2)
        if (q, rp) in matching
    )
    assert got.count() == expect_n > 0
