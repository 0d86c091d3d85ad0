"""Metric goldens reproduced exactly from the reference's own unit tests
(/root/reference/evaluation/MTEB/tests/test_RetrievalEvaluator.py:10-100,
via FIXTURES.md §4), TOL 1e-4."""

from __future__ import annotations

import pytest

from instructor_embedding_spark.metrics.ranking import (
    per_query_metrics,
    summary_metrics,
)

TOL = 1e-4

# queries 0,1,2; qrels 0→{0,1,2}, 1→{9}, 2→{4,5,9}
QRELS = [(0, 0), (0, 1), (0, 2), (1, 9), (2, 4), (2, 5), (2, 9)]
# ranked results: q0: (0,.9),(1,.7); q1: (5,.5),(7,.5),(8,.5); q2: (4,.9)
RESULTS = [
    (0, 1, 0, 0.9),
    (0, 2, 1, 0.7),
    (1, 1, 5, 0.5),
    (1, 2, 7, 0.5),
    (1, 3, 8, 0.5),
    (2, 1, 4, 0.9),
]

GOLDEN = {
    "accuracy": {1: 0.66666, 2: 0.66666, 3: 0.66666},
    "ndcg": {1: 0.66666, 2: 0.53771, 3: 0.41154},
    "mrr": {1: 0.66666, 2: 0.66666, 3: 0.66666},
    "map": {1: 0.66666, 2: 0.5, 3: 0.33333},
    "precision": {1: 0.66666, 2: 0.5, 3: 0.33333},
    "recall": {1: 0.22222, 2: 0.33333, 3: 0.33333},
}


@pytest.fixture(scope="module")
def summary(spark):
    results = spark.createDataFrame(
        RESULTS, "query_id long, rank long, doc_id long, score double"
    )
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long")
    pq = per_query_metrics(spark, results, qrels, ks=(1, 2, 3))
    return {r["k"]: r.asDict() for r in summary_metrics(pq).collect()}


@pytest.mark.parametrize("metric", sorted(GOLDEN))
def test_reference_goldens(summary, metric):
    for k, want in GOLDEN[metric].items():
        assert summary[k][metric] == pytest.approx(want, abs=TOL), (metric, k)


def test_query_with_zero_hits_counts_in_average(spark):
    """A qrels-bearing query that retrieved nothing must drag averages down
    (reference divides by len(queries), not len(queries-with-results))."""
    results = spark.createDataFrame(
        [(0, 1, 0, 1.0)], "query_id long, rank long, doc_id long, score double"
    )
    qrels = spark.createDataFrame(
        [(0, 0), (7, 5)], "query_id long, doc_id long"
    )
    pq = per_query_metrics(spark, results, qrels, ks=(1,))
    s = {r["k"]: r.asDict() for r in summary_metrics(pq).collect()}
    assert s[1]["accuracy"] == pytest.approx(0.5, abs=TOL)
    assert s[1]["ndcg"] == pytest.approx(0.5, abs=TOL)


def test_reranking_reference_goldens(spark):
    """RerankingEvaluator goldens (tests/test_RerankingEvaluator.py:17-30):
    mrr@{10,3}=0.5, mrr@1=0; AP([1,1,1,0,0],[.75,.93,.85,.76,.75])=0.86666
    (score tie pinned rel-last, matching sklearn)."""
    is_relevant = [1, 1, 1, 0, 0, 0, 0, 0, 0]
    pred_ranking = [5, 2, 6, 1, 3, 4, 7, 8, 9]
    results = spark.createDataFrame(
        [(0, r + 1, idx, 0.0) for r, idx in enumerate(pred_ranking)],
        "query_id long, rank long, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [(0, i) for i, rel in enumerate(is_relevant) if rel],
        "query_id long, doc_id long",
    )
    pq = per_query_metrics(spark, results, qrels, ks=(1, 3, 10))
    s = {r["k"]: r.asDict() for r in summary_metrics(pq).collect()}
    assert s[10]["mrr"] == pytest.approx(0.5, abs=TOL)
    assert s[3]["mrr"] == pytest.approx(0.5, abs=TOL)
    assert s[1]["mrr"] == pytest.approx(0.0, abs=TOL)

    # AP fixture with a score tie: order (score DESC, rel ASC) → sklearn
    scores = [0.75, 0.93, 0.85, 0.76, 0.75]
    rel = [1, 1, 1, 0, 0]
    order = sorted(range(5), key=lambda i: (-scores[i], rel[i]))
    results2 = spark.createDataFrame(
        [(0, r + 1, i, scores[i]) for r, i in enumerate(order)],
        "query_id long, rank long, doc_id long, score double",
    )
    qrels2 = spark.createDataFrame(
        [(0, i) for i in range(5) if rel[i]], "query_id long, doc_id long"
    )
    pq2 = per_query_metrics(spark, results2, qrels2, ks=(5,))
    s2 = {r["k"]: r.asDict() for r in summary_metrics(pq2).collect()}
    assert s2[5]["map"] == pytest.approx(0.86666, abs=TOL)


def test_rerank_metrics_goldens(spark):
    """rerank_metrics on the reference AP fixture (score tie pinned via
    cand_id so (score DESC, cand_id ASC) reproduces sklearn's order):
    AP([1,1,0,0,1]-ranked) = 0.86666; plus a second query with first
    positive at rank 2 (mrr 0.5, ap 0.5) and a degenerate all-positive
    query that must be excluded."""
    from instructor_embedding_spark.metrics.ranking import rerank_metrics

    rows = [
        (0, 1, 0.93, 1), (0, 2, 0.85, 1), (0, 3, 0.76, 0),
        (0, 4, 0.75, 0), (0, 5, 0.75, 1),
        (1, 1, 0.9, 0), (1, 2, 0.8, 1), (1, 3, 0.7, 0),
        (2, 1, 0.9, 1), (2, 2, 0.8, 1),  # no negatives -> dropped
    ]
    df = spark.createDataFrame(
        rows, "query_id long, cand_id long, score double, is_pos int"
    )
    out = rerank_metrics(df, k=10).collect()[0]
    assert out.n_queries == 2
    assert out.mean_mrr == pytest.approx((1.0 + 0.5) / 2, abs=TOL)
    assert out.mean_map == pytest.approx((0.8666667 + 0.5) / 2, abs=TOL)
