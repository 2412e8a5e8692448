"""Batch parquet sources for the TPC-H-ish test tables (TESTDATA.md).

The driver-generated tables have stored ``events.ts`` in different
physical forms across rounds — parquet ``TIMESTAMP(NANOS)`` (which,
under ``spark.sql.legacy.parquet.nanosAsLong``, reads as a nano-epoch
long) and plain ``TIMESTAMP(MICROS)`` without a UTC flag (which Spark 4
reads as ``TIMESTAMP_NTZ``).  ``load_table`` normalizes every form to
session-zone ``TimestampType`` (session tz is pinned to UTC by
``session.get_spark``), matching DuckDB's naive-as-UTC ``epoch_us``
semantics, so downstream operators can rely on instant-typed event-time
columns regardless of how the generator wrote the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: event-time columns whose physical parquet type has varied across
#: generator versions (nano-epoch long / TIMESTAMP_NTZ / TIMESTAMP)
_EVENT_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _EVENT_TS_COLS.get(name, []):
        if c not in df.columns:
            continue
        dtype = dict(df.dtypes)[c]
        if dtype == "bigint":
            # integer `div`, not `/`: double division of nano-epochs loses
            # precision past 2^53 and rounds the microsecond
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            # session tz is UTC, so the cast reinterprets NTZ wall-time as
            # the same UTC instant — identical to DuckDB epoch_us(naive)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
