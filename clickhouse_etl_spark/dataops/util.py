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


#: measured healthy load per shuffle partition for sort/state-heavy
#: operators (dedup_windowed's per-partition sort was the recurring
#: false regression): 100M rows at 256 partitions (~390k rows each)
#: and 1B at 1024 (~980k) both restore the 10M-row per-row cost, while
#: 100M into the 32-partition default (3.1M rows each) reads 2-3x slow
#: purely from sort depth/spill (r8/r9 scale sections).
SHUFFLE_TARGET_ROWS = 500_000


def shuffle_partitions_for(
    n_rows: int,
    target_rows_per_partition: int = SHUFFLE_TARGET_ROWS,
    min_partitions: int = 32,
    max_partitions: int = 8192,
) -> int:
    """Shuffle-partition count sized to the data (VERDICT r9 #7):
    ``ceil(n_rows / target)`` rounded up to a power of two, clamped to
    [min, max]. Sizing ``spark.sql.shuffle.partitions`` this way is
    what keeps per-partition sort depth constant as data scales — the
    decade-scale dedup_windowed reading needed the same manual
    re-attribution three rounds running; this encodes the fix. On a
    real cluster pair it with AQE coalescing (small stages shrink back
    automatically); the power-of-two rounding keeps hash partitioning
    even."""
    import math

    need = max(
        min_partitions,
        math.ceil(max(int(n_rows), 1) / max(int(target_rows_per_partition), 1)),
    )
    return min(max_partitions, 1 << (need - 1).bit_length())


def path_exists(spark, path: str) -> bool:
    """Filesystem-agnostic existence check through the session's Hadoop
    FileSystem (works for local paths in tests and object-store URIs at
    scale) — the pre-write guard the artifact writers use to validate
    an existing geometry sidecar BEFORE touching the key data."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


class sized_shuffle:
    """Context manager: set ``spark.sql.shuffle.partitions`` via
    :func:`shuffle_partitions_for` for the block, restore on exit —
    the scale sections' way of sizing a decade-up measurement without
    leaking the setting into the next section."""

    def __init__(self, spark, n_rows: int, **kw):
        self.spark = spark
        self.parts = shuffle_partitions_for(n_rows, **kw)

    def __enter__(self):
        self._old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.parts))
        return self.parts

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self._old)
        return False
