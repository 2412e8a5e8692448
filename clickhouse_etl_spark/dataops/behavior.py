"""User-behavior analytics: funnel conversion and cohort retention.

The reference's ClickHouse sink feeds dashboards whose canonical
queries are funnel/retention shapes (windowFunnel / retention in
ClickHouse SQL); these implement the same semantics engine-side so the
pipeline can publish them as derived tables instead of shipping raw
events. Reference context: sink tables land in ClickHouse for exactly
this class of analytics (glassflow-api/internal/client/clickhouse.go,
demos' materialized views).

Both operators are single-shuffle designs: one hash shuffle on
``user_id``, per-user state folded inside Catalyst higher-order
functions (sorted event arrays are small per user — the standard
assumption behind every sessionization/funnel engine). No Python in
the row path, no windows over the global corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: microseconds per day — integer arithmetic everywhere
US_PER_DAY = 86_400_000_000


def funnel_steps(
    events: DataFrame,
    chain: tuple[str, str, str] = ("view", "click", "purchase"),
    window_us: int = 7 * US_PER_DAY,
) -> DataFrame:
    """Greedy in-order funnel per user: earliest chain[0] event opens
    the funnel; the first chain[1] event at-or-after it advances, then
    the first chain[2] after that — all within ``window_us`` of the
    opening event (ClickHouse ``windowFunnel``-style semantics, the
    deterministic greedy variant).

    Plan shape: one hash shuffle on user_id, events sorted per user as
    an array of (ts, event_id, type) structs, then a single Catalyst
    ``aggregate`` fold walks the timeline — no second shuffle, no
    Python. Per-user arrays are bounded by per-user activity, the same
    memory contract as any sessionizer.

    Returns one row per user: ``user_id``, ``steps`` (0-3),
    ``t1_us``/``t2_us``/``t3_us`` (nullable step timestamps).
    """
    a, b, c = chain
    ev = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.col("event_type").alias("et"),
    )
    timeline = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("us", "event_id", "et"))).alias("evs")
    )
    init = F.struct(
        F.lit(None).cast("bigint").alias("t1"),
        F.lit(None).cast("bigint").alias("t2"),
        F.lit(None).cast("bigint").alias("t3"),
    )

    def step(acc, e):
        in_window = (e["us"] - acc["t1"]) <= F.lit(window_us)
        t1 = F.when(acc["t1"].isNull() & (e["et"] == a), e["us"]).otherwise(acc["t1"])
        t2 = F.when(
            acc["t1"].isNotNull() & acc["t2"].isNull() & (e["et"] == b) & in_window,
            e["us"],
        ).otherwise(acc["t2"])
        t3 = F.when(
            acc["t2"].isNotNull() & acc["t3"].isNull() & (e["et"] == c) & in_window,
            e["us"],
        ).otherwise(acc["t3"])
        return F.struct(t1.alias("t1"), t2.alias("t2"), t3.alias("t3"))

    folded = timeline.select(
        "user_id", F.aggregate("evs", init, step).alias("st")
    )
    steps = (
        F.when(F.col("st.t3").isNotNull(), 3)
        .when(F.col("st.t2").isNotNull(), 2)
        .when(F.col("st.t1").isNotNull(), 1)
        .otherwise(0)
    )
    return folded.select(
        "user_id",
        steps.cast("int").alias("steps"),
        F.col("st.t1").alias("t1_us"),
        F.col("st.t2").alias("t2_us"),
        F.col("st.t3").alias("t3_us"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by the day of their first event;
    a cohort member counts as retained at day *k* iff they produced any
    event exactly k days after their cohort day (ClickHouse
    ``retention``-style flags, aggregated to cohort counts).

    Plan shape: one shuffle on user_id collecting the distinct active
    days per user (bounded: days, not events), array ops derive the
    flags, then a tiny re-aggregation on cohort_day. Days are integer
    ``epoch_us div us_per_day`` — exact in any engine.

    Returns per cohort: ``cohort_day``, ``n_users``, ``retained_d1``,
    ``retained_d7``.
    """
    days = events.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day"),
    )
    per_user = days.groupBy("user_id").agg(
        F.collect_set("day").alias("active_days")
    )
    d0 = F.array_min("active_days")
    flagged = per_user.select(
        d0.alias("cohort_day"),
        F.array_contains("active_days", d0 + 1).alias("r1"),
        F.array_contains("active_days", d0 + 7).alias("r7"),
    )
    return flagged.groupBy("cohort_day").agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("r1"), 1).otherwise(0)).cast("bigint").alias("retained_d1"),
        F.sum(F.when(F.col("r7"), 1).otherwise(0)).cast("bigint").alias("retained_d7"),
    )
