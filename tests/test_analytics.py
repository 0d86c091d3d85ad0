"""Analytics ops: reference-golden threshold sweep, LSH recall property,
dedup on planted duplicates, spearman sanity.

(The Spark-vs-DuckDB parity of every analytics op is covered by
tests/test_entry.py, which parametrizes over all queries() entries.)
"""

from __future__ import annotations

import pytest

from instructor_embedding_spark.analytics.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from instructor_embedding_spark.analytics.pairs import spearman, threshold_sweep
from instructor_embedding_spark.analytics.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)

TOL = 1e-4

# reference fixture: tests/test_PairClassificationEvaluator.py:10-38
REF_SCORES = [6.12, 5.39, 5.28, 5.94, 6.34, 6.47, 7.88, 6.62, 8.04, 5.9]
REF_LABELS = [0, 0, 0, 0, 1, 0, 0, 0, 1, 0]


def test_threshold_sweep_reference_goldens(spark):
    pairs = spark.createDataFrame(
        list(zip(REF_SCORES, REF_LABELS)), "score double, label int"
    )
    row = threshold_sweep(pairs).collect()[0]
    assert row["best_acc"] == pytest.approx(0.9, abs=TOL)
    assert row["best_acc_threshold"] == pytest.approx(7.95999, abs=TOL)
    assert row["best_f1"] == pytest.approx(0.66666, abs=TOL)
    assert row["best_f1_threshold"] == pytest.approx(7.95999, abs=TOL)
    assert row["ap"] == pytest.approx(0.7, abs=TOL)


def test_exact_dedup_planted(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "ccc ddd"), (3, "aaa bbb"), (4, "aaa bbb"),
         (5, "eee fff")],
        "doc_id long, text string",
    )
    got = {(r.keep_doc_id, r.group_size)
           for r in exact_duplicates(docs).collect()}
    assert got == {(1, 3)}


def test_lsh_finds_planted_near_dupes(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = [(1, base), (2, base + " phi"), (3, "totally different words here "
            "nothing shared with others at all between them")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cand = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(df).collect()}
    assert (1, 2) in cand
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    assert jac[(1, 2)] > 0.8


def test_simhash_near_dupes_close(spark):
    base = " ".join(f"token{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extraword"), (3, " ".join(
            f"other{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    ham12 = bin(h[1] ^ h[2]).count("1")
    ham13 = bin(h[1] ^ h[3]).count("1")
    assert ham12 <= 6
    assert ham13 > 15


def test_lsh_cosine_recall_vs_bruteforce(spark, sf_small_dir):
    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in cosine_topk(emb, k=5).collect()
    }
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in lsh_cosine_topk(
            emb, k=5, planes_per_table=4, n_tables=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random 64-dim vectors are LSH's worst case; multi-table buckets must
    # still recover a solid share while comparing far fewer pairs than n²
    assert recall > 0.4, recall


def test_spearman_perfect_and_inverse(spark):
    df = spark.createDataFrame(
        [(i, i * 2.0, -i * 3.0) for i in range(50)],
        "i long, up double, down double",
    )
    assert spearman(df, "i", "up").collect()[0]["spearman"] == pytest.approx(
        1.0, abs=1e-6
    )
    assert spearman(df, "i", "down").collect()[0][
        "spearman"
    ] == pytest.approx(-1.0, abs=1e-6)
