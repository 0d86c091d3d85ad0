"""JDBC column scan (S6) — embedded Apache Derby backend.

Reference analog: bridge_content_encoder.py:215-250 reads picklist column
values out of a SQLite database for fuzzy matching.  No SQLite JDBC driver
ships in this sandbox, but Spark bundles embedded Derby (its Hive-metastore
dependency), which exercises the identical Spark surface:
``spark.read.format("jdbc")`` with partitioned reads via
(partitionColumn, lowerBound, upperBound, numPartitions).

What this exercises is the partitioned-read API SHAPE — N tasks each
issuing a range-bounded query instead of one driver-side scan.  Embedded
Derby itself is local-mode-only: the EmbeddedDriver boots the database
in-process under a single-JVM directory lock, so executor JVMs on a real
cluster could not open the same path.  On a multi-JVM cluster the same
``read_jdbc_table`` call points at a network-served backend (Derby
network server, Postgres, MySQL, ...) and the partitioned scan then runs
executor-parallel for real.  ``seed_derby`` exists for tests/fixtures
only — it pushes fixture-sized row lists through a JDBC batch insert
using the session JVM's DriverManager (no extra Python driver needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_URL = "jdbc:derby:{path}"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
) -> DataFrame:
    """S6: scan a JDBC table as a DataFrame.

    With ``partition_col`` (+ bounds) the scan splits into
    ``num_partitions`` range queries — the executor-parallel shape; without
    it, a single-partition read (fine for picklist-sized tables)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_col is not None:
        reader = (
            reader.option("partitionColumn", partition_col)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def seed_derby(spark: SparkSession, db_path: str, table: str,
               columns_ddl: str, rows: list[tuple],
               insert_sql: str) -> None:
    """Create (or replace) a Derby table and batch-insert ``rows`` through
    the session JVM's JDBC DriverManager.  Test/fixture helper."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        DERBY_URL.format(path=db_path) + ";create=true"
    )
    try:
        st = conn.createStatement()
        try:
            st.executeUpdate(f"DROP TABLE {table}")
        except Exception:
            pass  # first run: table doesn't exist
        st.executeUpdate(f"CREATE TABLE {table} ({columns_ddl})")
        st.close()
        ps = conn.prepareStatement(insert_sql)
        for row in rows:
            for i, v in enumerate(row, start=1):
                if isinstance(v, bool):
                    ps.setBoolean(i, v)
                elif isinstance(v, int):
                    ps.setLong(i, v)
                elif isinstance(v, float):
                    ps.setDouble(i, v)
                else:
                    ps.setString(i, str(v))
            ps.addBatch()
        ps.executeBatch()
        ps.close()
        conn.commit()
    finally:
        conn.close()
