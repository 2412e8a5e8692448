"""Streaming throughput bench: the reference's headline metric is
events/s through an ingest pipeline (BASELINE.md: ~110-150k events/s
sustained per 2-replica pair; ~510k/s peak on a 10+10-replica
multi-node cluster).

This drives the engine's streaming chain — validate-equivalent typed
source -> filter -> windowed dedup -> sink mapping -> foreachBatch
parquet sink — over the 10M-row /tmp/scale events as a file stream in
bounded micro-batches, and reports sustained rows/s end-to-end
(including sink writes and checkpointing).

Run after scripts/scale_test.py: python scripts/streaming_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickhouse_etl_spark.session import get_spark
from clickhouse_etl_spark.sinks import ClickHouseSink

BASE = "/tmp/scale"
OUT = f"{BASE}/stream_out"
CKPT = f"{BASE}/stream_ckpt"


def main() -> None:
    spark = get_spark(app_name="streaming-bench")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if not os.path.isdir(f"{BASE}/events"):
        raise SystemExit("run scripts/scale_test.py first to materialize /tmp/scale")

    for p in (OUT, CKPT):
        shutil.rmtree(p, ignore_errors=True)

    schema = spark.read.parquet(f"{BASE}/events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)  # bounded micro-batches (C4 intake cap)
        .parquet(f"{BASE}/events")
    )

    chain = (
        stream.filter(F.col("value") > 0)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("event_type").alias("etype"),
            F.col("ts").alias("created_at"),
            F.col("value").cast("double").alias("value"),
        )
    )

    sink = ClickHouseSink(table="bench_out", parquet_fallback_path=OUT)
    t0 = time.perf_counter()
    q = (
        chain.writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", CKPT)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0

    n_in = spark.read.parquet(f"{BASE}/events").count()
    n_out = spark.read.parquet(OUT).count()
    # rows_in drives the throughput claim: every input row is validated,
    # filtered, and checked against dedup state; watermark-late
    # duplicates legitimately stop at the dedup operator.
    print(
        json.dumps(
            {
                "metric": "streaming_pipeline_throughput",
                "rows_in": n_in,
                "rows_out": n_out,
                "seconds": round(dt, 2),
                "rows_in_per_sec": int(n_in / dt),
                "batches": len(sink.reports),
            }
        )
    )


if __name__ == "__main__":
    main()
