"""Replicates the driver's correctness gate locally: every queries() entry
is run at sf0.001 and compared (row count + sorted values) against its
oracle_sql() twin on DuckDB."""

from __future__ import annotations

import importlib.util
import math

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.IOException:
            pass
    return con


def _type_key(t):
    """Coarse arrow-type class: catches decimal-vs-int (DuckDB sum(BIGINT)
    returns HUGEINT → decimal128) and string-vs-numeric mismatches, which
    the driver's representation-sensitive value hash rejects, without
    false-positives on int width / timestamp tz differences."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_key(t.value_type)}>"
    return str(t)


def _norm(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def test_entry_smoke(spark, sf_small_dir):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["query_id", "rank", "doc_id", "score"]


@pytest.mark.parametrize("name", sorted(_load_entry_module().queries()))
def test_query_vs_oracle(spark, sf_small_dir, name):
    mod = _load_entry_module()
    q = mod.queries()[name]
    sdf = q(spark, sf_small_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = _norm(
        [tuple(r[c] for c in spark_cols) for r in sdf.collect()]
    )

    sql = mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check, like the driver
        return
    con = _duck(sf_small_dir)
    duck_tbl = con.execute(sql).fetch_arrow_table()
    duck_cols_all = list(duck_tbl.column_names)
    duck_rows_raw = list(
        zip(*[duck_tbl.column(i).to_pylist() for i in range(duck_tbl.num_columns)])
    ) if duck_tbl.num_columns else []
    order = sorted(range(len(duck_cols_all)), key=lambda i: duck_cols_all[i])
    duck_cols = [duck_cols_all[i] for i in order]
    duck_rows = _norm([tuple(r[i] for i in order) for r in duck_rows_raw])

    assert spark_cols == duck_cols, (spark_cols, duck_cols)

    # arrow-type class parity (the driver hash is representation-sensitive)
    spark_schema = sdf.limit(0).toArrow().schema
    for c in spark_cols:
        sk = _type_key(spark_schema.field(c).type)
        dk = _type_key(duck_tbl.schema.field(c).type)
        assert sk == dk, (name, c, sk, dk)
    assert len(spark_rows) == len(duck_rows)
    for s, d in zip(spark_rows, duck_rows):
        for a, b in zip(s, d):
            if isinstance(a, float) and not (
                isinstance(a, float) and math.isnan(a)
            ):
                assert a == pytest.approx(b, abs=2e-6), (name, s, d)
            else:
                assert a == b, (name, s, d)


def test_select_queries_category_filter():
    """P9 (task-selection filter chain): the reference runs a selected
    subset of tasks by type/category (MTEB.py task_types filter); the
    registry analog must (a) classify every entry (no 'other'), (b)
    partition the registry across categories, (c) compose category and
    name filters."""
    mod = _load_entry_module()
    all_q = mod.queries()
    cats = {n: mod.query_category(n) for n in all_q}
    assert "other" not in cats.values(), {
        n: c for n, c in cats.items() if c == "other"
    }
    # partition: union of per-category selections == full registry
    union: set = set()
    for cat in mod.QUERY_CATEGORY_PREFIXES:
        sel = mod.select_queries(categories=[cat])
        assert all(cats[n] == cat for n in sel)
        union |= set(sel)
    assert union == set(all_q)
    # composition: category AND substring
    sel = mod.select_queries(categories=["dedup"], name_contains="simhash")
    assert sel and all(n.startswith("dedup_") and "simhash" in n
                       for n in sel)
    # empty result is valid, not an error
    assert mod.select_queries(name_contains="zzz_nothing") == {}


def test_bench_retrieval_metrics_equals_gated_entry(spark, sf_small_dir):
    """The bench-path retrieval_metrics (k=20 qrels served from the
    checkpointed WAND index) must produce EXACTLY the gated entry's
    output — WAND rank-identity makes them the same computation."""
    mod = _load_entry_module()
    gated = mod.queries()["retrieval_metrics"](spark, sf_small_dir)
    bench = mod.bench_retrieval_metrics(spark, sf_small_dir)
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, gated.collect())) == sorted(
        map(key, bench.collect())
    )


def test_prepend_instruction_join_semantics(spark):
    """P2 first-class (instructor.py:404-427): instruction ++ text with
    NO separator; NULLs coalesce to '' like ''.join over empty members;
    per-row Column instructions work the same as a frame-wide literal."""
    from pyspark.sql import functions as F

    from instructor_embedding_spark.functions.project import (
        prepend_instruction,
    )

    df = spark.createDataFrame(
        [(1, "Represent: ", "doc one"), (2, None, "doc two"),
         (3, "Q: ", None)],
        "id long, instr string, text string",
    )
    lit = {r.id: r.instructed
           for r in prepend_instruction(df, "T: ").collect()}
    assert lit[1] == "T: doc one"          # no extra separator
    assert lit[3] == "T: "                 # NULL text -> ''
    per_row = {r.id: r.instructed
               for r in prepend_instruction(df, F.col("instr")).collect()}
    assert per_row[1] == "Represent: doc one"
    assert per_row[2] == "doc two"         # NULL instruction -> ''
    assert per_row[3] == "Q: "
