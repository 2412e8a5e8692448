"""Scale validation: replicate sf0.1 100x (10M events / 1.5M orders) into
/tmp/scale and measure core-operator throughput. Evidence that the
operator plans hold beyond the test SF: every stage distributes across
all cores, no driver-side collection, shuffles only on declared keys.

Run: python scripts/scale_test.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickhouse_etl_spark.operators.dedup import dedup_windowed
from clickhouse_etl_spark.operators.filter import apply_filter
from clickhouse_etl_spark.operators.join import asof_join, temporal_join_batch
from clickhouse_etl_spark.session import get_spark
from clickhouse_etl_spark.sources.batch import load_table
from clickhouse_etl_spark.spec.model import (
    FilterConfig,
    JoinConfig,
    JoinOutputField,
    JoinSourceConfig,
)

BASE = "/tmp/scale"
N_ROWS = 10_000_000


def materialize(spark) -> None:
    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    orders = load_table(spark, "/root/testdata/sf0.1", "orders")
    mult = spark.range(100).select(F.col("id").alias("rep"))
    big_ev = (
        ev.crossJoin(mult)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 10_000_000)
        .withColumn("user_id", F.col("user_id") + (F.col("rep") % 10) * 1_000_000)
        .drop("rep")
    )
    big_ord = (
        orders.crossJoin(mult.filter(F.col("rep") < 10))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    big_ev.repartition(64).write.mode("overwrite").parquet(f"{BASE}/events")
    big_ord.repartition(16).write.mode("overwrite").parquet(f"{BASE}/orders")


def main() -> None:
    spark = get_spark(
        app_name="scale-test",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if not os.path.isdir(f"{BASE}/events"):
        t0 = time.perf_counter()
        materialize(spark)
        print(f"materialized 10M events + 1.5M orders in {time.perf_counter()-t0:.1f}s")

    bev = spark.read.parquet(f"{BASE}/events")
    bord = spark.read.parquet(f"{BASE}/orders")

    def timed(name, df):
        # best-of-2: the host VM has bursty CPU steal (measured ~0.7%
        # average with multi-second spikes) — the min reflects the plan
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = min(dt, time.perf_counter() - t0)
        print(f"{name}: {dt:.2f}s ({N_ROWS/dt/1e6:.1f}M rows/s)")

    timed("filter_project", apply_filter(bev, FilterConfig("value > 50 and event_type == 'click'")))
    timed("dedup_windowed", dedup_windowed(bev, "user_id", "ts", 3600, ["event_id"]))
    cfg = JoinConfig(
        left=JoinSourceConfig("e", "user_id", 0, "left"),
        right=JoinSourceConfig("o", "o_custkey", 0, "right"),
        output_fields=(
            JoinOutputField("e", "event_id", "event_id"),
            JoinOutputField("e", "user_id", "user_id"),
            JoinOutputField("o", "o_totalprice", "total_price"),
        ),
    )
    timed(
        "temporal_join",
        temporal_join_batch(bev, bord, cfg, right_ts_col="o_orderdate", right_tiebreak=["o_orderkey"]),
    )
    clicks = bev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = bev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts"
    )
    timed("asof_join", asof_join(clicks, purch, "user_id", "ts", "ts", right_cols=["p_event_id"], how="left"))
    timed("group_agg", bev.groupBy("event_type").agg(F.sum("value"), F.countDistinct("user_id")))

    # ---- text dataops at 100k docs (20x replicated sf0.1 documents) ----
    from clickhouse_etl_spark.dataops.chunking import chunk_documents, top_terms
    from clickhouse_etl_spark.dataops.dedup import exact_dedup, ngram_jaccard_pairs, simhash
    from clickhouse_etl_spark.dataops.text import language_id

    if not os.path.isdir(f"{BASE}/docs"):
        docs = load_table(spark, "/root/testdata/sf0.1", "documents")
        mult = spark.range(20).select(F.col("id").alias("rep"))
        (
            docs.crossJoin(mult)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
            .drop("rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{BASE}/docs")
        )
    bd = spark.read.parquet(f"{BASE}/docs")
    nd = bd.count()

    def timed_docs(name, df, warm=None):
        # first execution of a heavy expression pays Janino/codegen
        # compilation (10s+ for wide expressions) — warm on a tiny
        # slice so the timed run measures throughput, not compilation
        if warm is not None:
            warm.write.mode("overwrite").format("noop").save()
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = min(dt, time.perf_counter() - t0)
        print(f"{name}: {dt:.1f}s ({nd/dt/1000:.0f}k docs/s)")

    tiny = bd.limit(200)
    timed_docs("docs_exact_dedup", exact_dedup(bd), warm=exact_dedup(tiny))
    timed_docs("docs_chunking", chunk_documents(bd), warm=chunk_documents(tiny))
    timed_docs("docs_langid", language_id(bd), warm=language_id(tiny))
    timed_docs("docs_top_terms", top_terms(bd), warm=top_terms(tiny))
    timed_docs("docs_simhash", simhash(bd), warm=simhash(tiny))
    timed_docs(
        "docs_ngram_jaccard",
        ngram_jaccard_pairs(bd, n=5, threshold=0.5),
        warm=ngram_jaccard_pairs(tiny, n=5, threshold=0.5),
    )

    from clickhouse_etl_spark.dataops.text import (
        boilerplate_ngrams,
        mixture_sample,
        repetition_signals,
        split_assign,
    )

    timed_docs("docs_repetition_signals", repetition_signals(bd), warm=repetition_signals(tiny))
    timed_docs(
        "docs_boilerplate_ngrams",
        boilerplate_ngrams(bd, n=3, min_doc_freq=100),
        warm=boilerplate_ngrams(tiny, n=3, min_doc_freq=100),
    )
    timed_docs("docs_split_assign", split_assign(bd), warm=split_assign(tiny))
    timed_docs("docs_mixture_sample", mixture_sample(bd), warm=mixture_sample(tiny))

    # ---- multimodal decode plumbing at 100k assets ----
    from clickhouse_etl_spark.dataops.multimodal import decode_assets

    assets = bd.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("png"))
            .when(F.col("doc_id") % 3 == 1, F.lit("jpeg"))
            .otherwise(F.lit("tiff"))
            .alias("format"),
            F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
        ).alias("asset_meta"),
    )
    timed_docs("multimodal_decode", decode_assets(assets), warm=decode_assets(assets.limit(200)))


if __name__ == "__main__":
    main()
