"""Bucketed tables: shuffle-free co-located joins for repeated keys.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides. Writing the tables bucketed by the join key
(``bucketBy(n, key).sortBy(key)`` into the warehouse) lets every later
join/aggregation on that key run with NO exchange: Spark matches
bucket specs and plans a sort-merge join directly on the bucket files.

This is the reference's "partition-aligned sources" knob
(docs scaling guide) generalized: pick bucket counts so one bucket of
the larger table fits an executor core's working memory
(~size / n_buckets), and use the same count on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (parquet)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
