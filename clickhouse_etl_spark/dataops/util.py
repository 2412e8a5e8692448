"""Shared dataops utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow-but-compute-heavy input to use the cluster.

    Single-file parquet inputs arrive as one partition (one row group),
    which would serialize expensive per-row expression work (shingle
    hashing, fold hashes, vector math) onto one core. One cheap
    round-robin shuffle of the raw rows buys full parallelism. At real
    scale inputs arrive well-partitioned and this is a no-op.
    """
    if df.isStreaming:
        # micro-batch partitioning is the source's concern (e.g. kafka
        # minPartitions); .rdd is illegal on an unstarted streaming plan
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # cheap physical-partition probe: the input RDD of the (lazy) plan —
    # no job runs; at real scale inputs arrive well-partitioned and the
    # branch is never taken
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
