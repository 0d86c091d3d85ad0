"""Tokenizer: golden cases + four-way implementation parity.

Style follows the reference's unit tests (tiny literal fixtures, exact
asserts — /root/reference/evaluation/MTEB/tests/test_RetrievalEvaluator.py).
"""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark.functions.batching import length_sorted
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


# ---- W6: length-sorted batching (functions/batching.py) ----------------


def _corpus(spark, n=400, parts=4):
    from instructor_embedding_spark import datagen

    return datagen.corpus(spark, n, partitions=parts)


def test_length_sorted_is_local_sort_no_shuffle(spark):
    """W6's whole point at scale: a within-partition sort must compile to
    Sort [.. global=false] with NO Exchange added over the source scan."""
    df = _corpus(spark)
    base = df._jdf.queryExecution().executedPlan().toString()
    sorted_plan = (
        length_sorted(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Sort [length" in sorted_plan, sorted_plan[:800]
    assert "global=false" in sorted_plan.replace(" ", "").lower() or \
        ", false, 0" in sorted_plan, sorted_plan[:800]
    assert sorted_plan.count("Exchange") == base.count("Exchange"), (
        sorted_plan[:800]
    )


def test_length_sorted_orders_within_each_partition(spark):
    from pyspark.sql import functions as F

    df = length_sorted(_corpus(spark), "content").select(
        F.spark_partition_id().alias("pid"),
        F.length("content").alias("ln"),
    )
    pdf = df.toPandas()
    for pid, grp in pdf.groupby("pid"):
        lens = grp["ln"].tolist()
        assert lens == sorted(lens, reverse=True), f"partition {pid}"


def test_length_sorted_build_produces_identical_index(spark, tmp_path):
    """Flag on vs off must yield row-identical segments + doc_lens (the
    sort only changes Arrow batch composition, never the logical index)."""
    from instructor_embedding_spark.index.build import (
        IndexParams,
        build_index,
    )

    docs = _corpus(spark, n=300, parts=3)
    outs = {}
    for flag in (False, True):
        d = str(tmp_path / f"w6_{int(flag)}")
        h = build_index(
            spark, docs, d,
            IndexParams(doc_block_span=64, n_sub_blocks=4,
                        corpus_fingerprint=f"w6:{flag}",
                        length_sorted_batches=flag),
            text_col="content",
        )
        seg = sorted(
            (r["term"], r["doc_block"], bytes(r["doc_bytes"]),
             bytes(r["tf_bytes"]))
            for r in h.segments(spark).collect()
        )
        dl = sorted(
            (r["doc_block"], bytes(r["doc_ids_bin"]), bytes(r["dls_bin"]))
            for r in h.doc_lens(spark).collect()
        )
        outs[flag] = (seg, dl)
    assert outs[False] == outs[True]


def test_length_sorted_reduces_padded_batch_cells(spark):
    """The claim behind the flag (instructor.py:632-641): an encoder-shaped
    kernel pays batch_rows * batch_max_len (padding semantics).  Count
    those padded cells per Arrow batch deterministically — sorted batches
    must waste strictly less than unsorted ones.  No wall-clock involved."""
    import pandas as pd
    from pyspark.sql import functions as F

    df = _corpus(spark, n=2000, parts=4).select("doc_id", "content")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        def padded_cells(d):
            def kern(batches):
                for pdf in batches:
                    lens = pdf["content"].str.len()
                    yield pd.DataFrame(
                        {"cells": [int(len(pdf) * lens.max())],
                         "real": [int(lens.sum())]}
                    )
            agg = d.mapInPandas(kern, "cells long, real long").agg(
                F.sum("cells").alias("cells"), F.sum("real").alias("real")
            ).collect()[0]
            return agg["cells"], agg["real"]

        plain_cells, plain_real = padded_cells(df)
        sort_cells, sort_real = padded_cells(length_sorted(df, "content"))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    # identical real work, strictly less padded waste when sorted
    assert sort_real == plain_real
    assert plain_cells > plain_real  # unsorted genuinely pads
    assert sort_cells < plain_cells, (sort_cells, plain_cells)
    waste_plain = plain_cells - plain_real
    waste_sort = sort_cells - sort_real
    assert waste_sort < 0.5 * waste_plain, (waste_sort, waste_plain)
