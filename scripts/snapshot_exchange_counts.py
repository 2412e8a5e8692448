"""Freeze the per-entry physical-plan Exchange counts (VERDICT r6 #8).

The plan sweep in tests/test_plans.py catches cartesians and BNLJs but
not a GRATUITOUS extra shuffle — an edit that silently adds an Exchange
passes every correctness gate and only shows up as a perf regression at
scale. This script snapshots, per registry entry, the number of shuffle
Exchanges and BroadcastExchanges in the initial physical plan at
sf0.001 (the test fixture's SF — plan shapes are size-estimate
dependent, so the audit only runs there) to
``clickhouse_etl_spark/exchange_counts_signed.json``;
``tests/test_plans.py::test_exchange_counts_match_signed_baseline``
fails any entry whose current counts drift from the snapshot.

Update path (documented, like impl_hashes_signed.json): when a plan
change is INTENTIONAL — a new entry, an optimization that removes a
shuffle, an accepted trade — re-run

    python scripts/snapshot_exchange_counts.py

review the printed diff, and commit the regenerated JSON together with
the code change that caused it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "clickhouse_etl_spark",
    "exchange_counts_signed.json",
)


from clickhouse_etl_spark.planstats import exchange_counts  # noqa: E402


def main() -> int:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    from clickhouse_etl_spark.queries import QUERIES
    from clickhouse_etl_spark.session import get_spark

    spark = get_spark(app_name="exchange-snapshot", shuffle_partitions=8)
    old = {}
    if os.path.exists(OUT):
        old = json.load(open(OUT))
    out = {}
    for name, qd in QUERIES.items():
        plan = qd.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        out[name] = exchange_counts(plan)
        if name in old and old[name] != out[name]:
            print(f"CHANGED {name}: {old[name]} -> {out[name]}")
        elif name not in old:
            print(f"NEW     {name}: {out[name]}")
    for name in set(old) - set(out):
        print(f"REMOVED {name}")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} entries -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
