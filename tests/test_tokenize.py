"""Tokenizer: golden cases + four-way implementation parity.

Style follows the reference's unit tests (tiny literal fixtures, exact
asserts — /root/reference/evaluation/MTEB/tests/test_RetrievalEvaluator.py).
"""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokenize_py,
    tokens_col,
    tokens_pandas_udf,
)

GOLDENS = [
    ("parseVarintBlockHeader", ["parse", "varint", "block", "header"]),
    ("HTTPServerConfig", ["http", "server", "config"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("the quick Fox is a fox", ["quick", "fox", "fox"]),  # stopwords + len<2
    ("x = y + 1;", []),  # all single-char / numeric-short
    ("read_XMLFile2Json", ["read", "xml", "file2", "json"]),
    ("", []),
    (None, []),
    ("a of the", []),
    ("Merge MERGE merge", ["merge", "merge", "merge"]),
    ("foo.bar::baz->qux", ["foo", "bar", "baz", "qux"]),
    ("UTF8String value_42", ["utf8", "string", "value", "42"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_tokenize_py_goldens(text, expected):
    assert tokenize_py(text) == expected


def test_spark_expression_parity(spark):
    rows = [(i, t) for i, (t, _) in enumerate(GOLDENS)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokens_col("text").alias("toks")).collect()
    }
    for i, (text, expected) in enumerate(GOLDENS):
        # Spark split of null text yields null → treat as []
        assert (got[i] or []) == expected, f"case {i}: {text!r}"


def test_pandas_udf_parity(spark):
    rows = [(i, t) for i, (t, _) in enumerate(GOLDENS)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokens_pandas_udf("text").alias("toks")).collect()
    }
    for i, (text, expected) in enumerate(GOLDENS):
        assert (got[i] or []) == expected, f"case {i}: {text!r}"


def test_duckdb_sql_parity():
    con = duckdb.connect()
    for text, expected in GOLDENS:
        if text is None:
            continue
        expr = sql_tokens_expr("?")
        # inline the literal instead of a parameter (expr embeds the column)
        expr = sql_tokens_expr(f"'{text}'")
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert list(got) == expected, text


def test_term_counts_parity_with_tokenize_py():
    from collections import Counter

    from instructor_embedding_spark.functions.tokenize import term_counts

    import random, string
    rng = random.Random(99)
    alphabet = string.ascii_letters + string.digits + " _.-/:;()[]{}\n\t"
    cases = [t for t, _ in GOLDENS if t is not None] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(2000)
    ]
    for s in cases:
        toks = tokenize_py(s)
        counts, dl = term_counts(s)
        assert counts == dict(Counter(toks)), s
        assert dl == len(toks), s
    assert term_counts(None) == ({}, 0)
    assert term_counts("") == ({}, 0)
