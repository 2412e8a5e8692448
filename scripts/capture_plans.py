"""Capture .explain("formatted") for bench-tagged queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> [comma-separated names]

Writes plans/r11/<query>_<suffix>.txt for every bench-tagged registry
entry (or the filtered subset). Planning only — no execution — so the
whole surface captures in one session in well under a minute. The
optimization-round judge checks plan claims (Exchange counts, join
strategies, PushedFilters, Batch/ArrowEvalPython nodes) against these
files (guide §1 / §7.2).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_etl_spark.queries import QUERIES  # noqa: E402
from clickhouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    if len(sys.argv) > 2:
        # explicit list: any registry entry, bench-tagged or not
        names = [n for n in sys.argv[2].split(",") if n in QUERIES]
    else:
        names = [n for n, qd in QUERIES.items() if "bench" in qd.tags]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for name in names:
        qd = QUERIES[name]
        try:
            df = qd.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
