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

    # Warm-up: run every query once at the smallest SF so whole-stage
    # codegen (Janino) and JIT compilation are paid outside the timed
    # region — the metric is data-scale efficiency, not JVM warm-up.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for qd in bench_queries.values():
            try:
                qd.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass

    # best-of-2: local[32] timings are noisy (GC, page cache); the min is
    # the stable measure of the plan's cost
    timings: dict[str, float] = {}
    for name, qd in bench_queries.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
