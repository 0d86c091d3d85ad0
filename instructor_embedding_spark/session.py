"""SparkSession factory with scale-appropriate defaults.

Local sandbox runs on local[N] (single JVM); on a real cluster the same
config block applies minus master/driver-memory (ship with
``spark-submit --py-files engine.zip``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "instructor_embedding_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Defaults follow the sandbox contract: ``local[$SPARK_GRAFT_CPUS]``
    (falling back to ``local[*]``), AQE on, Arrow on, shuffle partitions
    matched to cores rather than the 200 default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate copies the generator expression into a
        # pushed-down Filter (size(e) > 0 AND isnotnull(e)).  Every
        # explode in this engine generates from an EXPENSIVE expression
        # (the regex tokenizer / shingle builder), so the inferred filter
        # re-evaluates the tokenizer once more per row for a guard the
        # Generate node already performs (explode of an empty array emits
        # no rows).  Excluding the rule removes the duplicate evaluation
        # at every scale; measured -35% on the tf aggregation
        # (OPTIMIZATION_r06.md).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # filterless count()/min/max over plain parquet scans answer from
        # row-group footers instead of scanning data — the LSH families
        # issue an eager count() per call to derive planes-per-table
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
