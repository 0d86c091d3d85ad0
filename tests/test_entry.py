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
    cur = con.execute(sql)
    duck_cols_all = [d[0] for d in cur.description]
    duck_rows_raw = cur.fetchall()
    order = sorted(range(len(duck_cols_all)), key=lambda i: duck_cols_all[i])
    duck_cols = [duck_cols_all[i] for i in order]
    duck_rows = _norm([tuple(r[i] for i in order) for r in duck_rows_raw])

    assert spark_cols == duck_cols, (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows)
    for s, d in zip(spark_rows, duck_rows):
        for a, b in zip(s, d):
            if isinstance(a, float) and not (
                isinstance(a, float) and math.isnan(a)
            ):
                assert a == pytest.approx(b, abs=2e-6), (name, s, d)
            else:
                assert a == b, (name, s, d)
