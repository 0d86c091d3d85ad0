"""ROUGE-L (M15) + sentence split (M14): goldens and naive-DP parity."""

from __future__ import annotations

import pytest

from instructor_embedding_spark.analytics.text_stats import sentences
from instructor_embedding_spark.functions.tokenize import tokenize_py
from instructor_embedding_spark.metrics.generation import lcs_len, rouge_l


def _naive_lcs(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[-1][-1]


def test_lcs_hand_goldens():
    assert lcs_len(list("abcbdab"), list("bdcaba")) == 4
    assert lcs_len([], list("ab")) == 0
    assert lcs_len(list("xyz"), list("xyz")) == 3
    assert lcs_len(list("abc"), list("def")) == 0


def test_lcs_matches_naive_dp_on_corpus(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet")
    texts = [r.text for r in docs.limit(12).collect()]
    toks = [tokenize_py(t)[:60] for t in texts]
    for i in range(len(toks) - 1):
        assert lcs_len(toks[i], toks[i + 1]) == _naive_lcs(
            toks[i], toks[i + 1]
        )


def test_rouge_l_pinned_semantics(spark):
    # candidate is a strict token-prefix of the reference -> P = 1.0
    pairs = spark.createDataFrame(
        [
            (1, "merge sort table", "merge sort table scan window"),
            (2, "nothing shared here", "completely different tokens"),
            (3, "", "some reference text"),
        ],
        "pair_id long, candidate string, reference string",
    )
    out = {r.pair_id: r for r in rouge_l(pairs).collect()}
    ct = tokenize_py("merge sort table")
    rt = tokenize_py("merge sort table scan window")
    assert out[1].lcs == len(ct)
    assert out[1].rouge_p == pytest.approx(1.0)
    assert out[1].rouge_r == pytest.approx(len(ct) / len(rt), abs=1e-6)
    p, r = 1.0, len(ct) / len(rt)
    assert out[1].rouge_f == pytest.approx(2 * p * r / (p + r), abs=1e-6)
    assert out[2].rouge_f == 0.0 and out[2].lcs == 0
    assert out[3].rouge_f == 0.0 and out[3].rouge_p == 0.0


def test_sentences_split_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine! trailing bit"),
         (2, "no terminators at all"),
         (3, "...")],
        "doc_id long, text string",
    )
    rows = sentences(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    assert [s for _, s in sorted(by_doc[1])] == [
        "Hello world.", "How are you?", "Fine!", "trailing bit",
    ]
    assert [s for _, s in sorted(by_doc[2])] == ["no terminators at all"]
    assert 3 not in by_doc  # only terminators -> no non-empty sentence


def test_rouge_l_summary(spark):
    from instructor_embedding_spark.metrics.generation import (
        rouge_l,
        rouge_l_summary,
    )

    pairs = spark.createDataFrame(
        [(1, "merge sort", "merge sort"), (2, "alpha beta", "gamma delta")],
        "pair_id long, candidate string, reference string",
    )
    row = rouge_l_summary(rouge_l(pairs)).collect()[0]
    assert row.n_pairs == 2
    assert row.mean_f == pytest.approx(0.5, abs=1e-6)  # (1.0 + 0.0) / 2


def test_rouge_l_sql_twin_property(spark):
    """The recursive-CTE LCS must equal the naive O(nm) DP on adversarial
    token sequences: empties, all-repeats, disjoint, near-identical."""
    import duckdb
    import pandas as pd
    from instructor_embedding_spark.metrics.generation import rouge_l_sql
    from instructor_embedding_spark.functions.tokenize import tokenize_py

    def naive_lcs(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return dp[-1][-1]

    cases = [
        ("", ""),
        ("alpha beta gamma", ""),
        ("", "alpha beta"),
        ("aaa aaa aaa aaa", "aaa aaa"),
        ("alpha beta gamma delta", "delta gamma beta alpha"),
        ("merge sort quick sort heap sort", "sort merge sort quick"),
        ("one two three four five six seven", "zero two four six eight"),
        ("xx yy " * 30, "yy xx " * 25),
        ("the of and or", "the of and or"),  # all stopwords → empty tokens
    ]
    pdf = pd.DataFrame(
        [(i, c, r) for i, (c, r) in enumerate(cases)],
        columns=["pair_id", "candidate", "reference"],
    )
    con = duckdb.connect()
    con.register("pairs_py", pdf)
    got = {
        r[0]: r[1]
        for r in con.execute(
            rouge_l_sql("SELECT * FROM pairs_py")
        ).fetchall()
    }
    for i, (c, r) in enumerate(cases):
        want = naive_lcs(tokenize_py(c), tokenize_py(r))
        assert got[i] == want, (i, c, r, got[i], want)


def test_lcs_cte_char_level_property():
    """The shared recursive-CTE LCS core (now also the D6 fuzzy scorer's
    engine) must equal the numpy DP on random CHARACTER sequences — the
    fuzzy path feeds it char lists rather than token lists, so exercise
    that shape directly in DuckDB."""
    import random

    import duckdb

    from instructor_embedding_spark.metrics.generation import (
        lcs_cte_sql,
        lcs_len,
    )

    rng = random.Random(99)
    alphabet = "abcdx"
    pairs = []
    for pid in range(30):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        pairs.append((pid, a, b))
    vals = ", ".join(
        f"({pid}, '{a}', '{b}')" for pid, a, b in pairs
    )
    chars = "list_transform(range(1, length({0}) + 1), i -> {0}[i])"
    tok = (
        f"SELECT pair_id, {chars.format('a')} AS ct, "
        f"{chars.format('b')} AS rt "
        f"FROM (VALUES {vals}) t(pair_id, a, b)"
    )
    got = dict(
        duckdb.connect().execute(
            f"SELECT pair_id, lcs FROM ({lcs_cte_sql(tok)}) q"
        ).fetchall()
    )
    for pid, a, b in pairs:
        want = lcs_len(list(a), list(b))
        # empty ct short-circuits the recursion at i=0 rows
        assert got.get(pid, 0) == want, (pid, a, b, got.get(pid), want)
