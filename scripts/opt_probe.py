"""Isolated per-query timing probe for the optimization rounds.

Usage:
    python scripts/opt_probe.py q1,q2,... [--runs N] [--conf k=v ...]

Fresh JVM, bench methodology (warm each query at sf0.001 immediately
before its timed runs, best-of-N via the noop sink at
$SPARK_GRAFT_SF_DIR), with optional session-conf overrides so config
experiments (guide §1.2 step 3) can be A/B'd without editing
session.py. Prints one JSON line {name: best_sec, ...} plus a q1
contamination control (the bench's convention) so a steal-inflated
window is visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_etl_spark.queries import QUERIES  # noqa: E402
from clickhouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    runs = 2
    conf: dict[str, str] = {}
    args = sys.argv[2:]
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            conf[k] = v
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="opt_probe", extra_conf=conf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def _timed(fn, d: str, n: int) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, d).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out: dict[str, float] = {}
    for name in names:
        qd = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            qd.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"timed:{name}")
        out[name] = _timed(qd.fn, sf_dir, runs)
        spark.sparkContext.setJobDescription(None)

    ctl = QUERIES.get("q1_pricing_summary")
    if ctl is not None:
        ctl.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        out["_control_q1"] = _timed(ctl.fn, sf_dir, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
