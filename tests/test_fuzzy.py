"""Fuzzy picklist matching (M16/J7-lite) — difflib-pinned goldens.

Reference behavior: bridge_content_encoder.py:112-189 ranks picklist values
by a difflib-style ratio against the query; :215-250 applies threshold
rules.  The goldens below are hand-checked SequenceMatcher ratios.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pytest

from instructor_embedding_spark.analytics.fuzzy import fuzzy_match_topk

VALUES = ["United States", "United Kingdom", "Unified Team", "Germany",
          "France", "united-states of america"]


def _mk(spark):
    q = spark.createDataFrame(
        [(1, "united states"), (2, "german"), (3, "zzzz qqqq")],
        "query_id long, query_text string",
    )
    c = spark.createDataFrame([(v,) for v in VALUES], "value string")
    return q, c


def test_fuzzy_matches_difflib_exactly(spark):
    q, c = _mk(spark)
    got = {
        (r.query_id, r.rank): (r.value, r.score)
        for r in fuzzy_match_topk(q, c, k=2, threshold=0.3).collect()
    }
    # rank 1 for "united states" is the case-folded exact match, ratio 1.0
    assert got[(1, 1)] == ("United States", 1.0)
    want_2 = round(
        SequenceMatcher(None, "german", "germany".lower()).ratio(), 6
    )
    assert got[(2, 1)] == ("Germany", want_2)
    # every emitted score must equal difflib's ratio recomputed here
    for (qid, _), (v, s) in got.items():
        qt = {1: "united states", 2: "german", 3: "zzzz qqqq"}[qid]
        assert s == round(SequenceMatcher(None, qt, v.lower()).ratio(), 6)


def test_fuzzy_threshold_and_k(spark):
    q, c = _mk(spark)
    rows = fuzzy_match_topk(q, c, k=2, threshold=0.3).collect()
    assert all(r.score >= 0.3 for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) <= 2 for v in by_q.values())
    # nothing within threshold of the junk query
    assert 3 not in by_q
    # ranks ordered by (score desc, value asc)
    for v in by_q.values():
        v.sort(key=lambda r: r.rank)
        for a, b in zip(v, v[1:]):
            assert a.score > b.score or (
                a.score == b.score and a.value < b.value
            )


def test_fuzzy_lcs_scorer_properties(spark):
    """D6 scorer sanity: exact match ⇒ 1.0; LCS-ratio >= difflib ratio on
    every pair (LCS >= Ratcliff-Obershelp's matched-block total); junk
    stays below threshold."""
    from instructor_embedding_spark.analytics.fuzzy import (
        fuzzy_match_topk_lcs,
    )

    q, c = _mk(spark)
    rows = fuzzy_match_topk_lcs(q, c, k=3, threshold=0.3).collect()
    got = {(r.query_id, r.rank): (r.value, r.score) for r in rows}
    assert got[(1, 1)] == ("United States", 1.0)
    assert 3 not in {r.query_id for r in rows}
    texts = {1: "united states", 2: "german", 3: "zzzz qqqq"}
    for (qid, _), (v, s) in got.items():
        dr = SequenceMatcher(None, texts[qid], v.lower()).ratio()
        assert s >= round(dr, 6) - 1e-9, (qid, v, s, dr)


def test_fuzzy_lcs_spark_matches_duckdb(spark):
    """Engine parity for the D6 gate path on a local fixture (the driver
    repeats this at sf0.01)."""
    import duckdb

    from instructor_embedding_spark.analytics.fuzzy import (
        fuzzy_match_topk_lcs,
        fuzzy_match_topk_lcs_sql,
    )

    qrows = [(1, "united states"), (2, "german"), (3, "zzzz qqqq"),
             (4, "o'brien's query")]  # quote-escape path
    q = spark.createDataFrame(qrows, "query_id long, query_text string")
    c = spark.createDataFrame([(v,) for v in VALUES], "value string")
    got = sorted(
        tuple(r) for r in fuzzy_match_topk_lcs(q, c, k=3,
                                               threshold=0.3).collect()
    )
    con = duckdb.connect()
    vals = " UNION ALL ".join(
        "SELECT '" + v.replace("'", "''") + "' AS value" for v in VALUES
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            fuzzy_match_topk_lcs_sql(qrows, vals, k=3, threshold=0.3)
        ).fetchall()
    )
    assert got == want
