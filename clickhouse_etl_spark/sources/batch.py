"""Batch parquet sources for the TPC-H-ish test tables (TESTDATA.md).

The driver-generated tables store timestamps as parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects by
default — ``spark.sql.legacy.parquet.nanosAsLong`` turns them into
nano-epoch longs, which ``load_table`` normalizes back to proper
TimestampType (microsecond truncation, matching a ``::TIMESTAMP`` cast
in DuckDB) so downstream operators see real event-time columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: columns stored as TIMESTAMP(NANOS) in the generated parquet
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`, not `/`: double division of nano-epochs loses
            # precision past 2^53 and rounds the microsecond
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
