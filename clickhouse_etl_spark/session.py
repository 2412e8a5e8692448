"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM; the same config block is
what we'd ship to a 1000-executor cluster — AQE owns runtime
re-planning (partition coalescing, skew-join splitting), shuffle
partition count is a starting hint that AQE adjusts, and ANSI mode is
off so casts follow the permissive null-on-error semantics the engine's
type-conversion matrix defines (reference behavior: parse failures
route to DLQ rather than aborting the batch —
glassflow-api/internal/mapper/types.go).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clickhouse_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # parallelism: local default = cores; AQE coalesces small shuffles
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # deterministic time semantics for the oracle comparison
        .config("spark.sql.session.timeZone", "UTC")
        # permissive casts (try-semantics); the engine's DLQ owns failures
        .config("spark.sql.ansi.enabled", "false")
        # parseQuery keeps the last value for duplicate keys
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # Arrow for any pandas-UDF path (dataops / multimodal)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "90g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
