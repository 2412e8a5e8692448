"""Dead-letter queue as a first-class table.

The reference keeps a per-pipeline NATS stream of
``{component, error, original_payload}`` with consume/state/purge APIs
(glassflow-api/internal/dlq/dlq.go:39-165). Here the DLQ is a
partitioned parquet (or Delta, when available) table with the same
row shape (operators/validate.py dlq_schema) — consume/state/purge
become ordinary queries, which is strictly more capable than the
reference's destructive-read API.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.validate import dlq_schema


class DLQWriter:
    def __init__(self, path: str):
        self.path = path

    def write(self, dlq_df: DataFrame) -> None:
        """Append failure rows; partitioned by component so per-operator
        triage prunes partitions."""
        (
            dlq_df.write.mode("append")
            .partitionBy("component")
            .parquet(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(dlq_schema()).parquet(self.path)
        except Exception:
            return spark.createDataFrame([], schema=dlq_schema())

    def state(self, spark: SparkSession) -> DataFrame:
        """Counts + last event per component (dlq.go 'state' API)."""
        return (
            self.read(spark)
            .groupBy("component")
            .agg(
                F.count("*").alias("n_failed"),
                F.max("dlq_ts").alias("last_failure_ts"),
            )
        )

    def consume(self, spark: SparkSession, limit: int = 1000) -> DataFrame:
        """Non-destructive batch read (the reference's consume is a
        destructive pop; batch tables make destruction unnecessary)."""
        return self.read(spark).orderBy(F.col("dlq_ts")).limit(limit)

    def purge(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
        Path(self.path).mkdir(parents=True, exist_ok=True)
