"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is executed to completion via the no-op sink (full compute,
no write cost). Timings include plan + execution, not session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_etl_spark.queries import QUERIES  # noqa: E402
from clickhouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    bench_queries = {n: qd for n, qd in QUERIES.items() if "bench" in qd.tags}
    # BENCH_FILTER=name1,name2 restricts the set (debug / contract tests)
    flt = os.environ.get("BENCH_FILTER")
    if flt:
        wanted = set(flt.split(","))
        bench_queries = {n: qd for n, qd in bench_queries.items() if n in wanted}

    # Warm-up: run every query once at the smallest SF so whole-stage
    # codegen (Janino) and JIT compilation are paid outside the timed
    # region — the metric is data-scale efficiency, not JVM warm-up.
    warm_dir = "/root/testdata/sf0.001"

    # best-of-2: local[32] timings are noisy (GC, page cache); the min is
    # the stable measure of the plan's cost.  Warm-up runs IMMEDIATELY
    # before each query's timed runs (not one pass over the whole set up
    # front): with 50+ queries a single warm-up pass outruns the JVM's
    # codegen class cache, and the timed run re-pays Janino compilation —
    # a multi-second stall that has nothing to do with the plan.
    timings: dict[str, float] = {}
    for name, qd in bench_queries.items():
        if os.path.isdir(warm_dir):
            try:
                qd.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    streaming = {} if flt else _streaming_ingest_bench(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "streaming_ingest": streaming,
            }
        )
    )


def _streaming_ingest_bench(spark, sf_dir: str) -> dict:
    """End-to-end streaming chain throughput (validate-typed source ->
    filter -> watermark dedup -> sink mapping -> foreachBatch sink with
    checkpoints) — the number comparable to BASELINE.md's events/s
    (the reference sustains ~110-150k/s per 2-replica pair).

    A warm-up pass at the small SF runs first: the streaming paths
    (state store, foreachBatch sink, checkpoint IO) are otherwise cold
    in a session that has only run batch queries, and the recorded
    number would measure first-query JIT instead of throughput."""
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        _streaming_ingest_once(spark, warm_dir, "/tmp/bench_stream_warm")
    return _streaming_ingest_once(spark, sf_dir, "/tmp/bench_stream")


def _streaming_ingest_once(spark, sf_dir: str, base: str) -> dict:
    import shutil

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.sinks import ClickHouseSink
    from clickhouse_etl_spark.sources.batch import load_table

    try:
        shutil.rmtree(base, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events")
        mult = spark.range(20).select(F.col("id").alias("rep"))
        big = (
            ev.crossJoin(mult)
            .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
            .drop("rep")
        )
        big.repartition(32).write.mode("overwrite").parquet(f"{base}/in")
        n_in = spark.read.parquet(f"{base}/in").count()

        stream = (
            spark.readStream.schema(spark.read.parquet(f"{base}/in").schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(f"{base}/in")
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
        sink = ClickHouseSink(table="bench_out", parquet_fallback_path=f"{base}/out")
        t0 = time.perf_counter()
        q = (
            chain.writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        return {
            "rows_in": n_in,
            "seconds": round(dt, 2),
            "rows_in_per_sec": int(n_in / dt),
        }
    except Exception as e:  # bench must always emit its JSON line
        return {"error": str(e)[:200]}
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
