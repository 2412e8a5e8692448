"""Streaming-path tests: watermark dedup, faithful temporal join state
machine, sink error classification + DLQ, end-to-end streaming pipeline
over file sources (no Kafka broker in this environment — the Kafka
reader builder is covered by option-mapping unit tests).

Ports the semantics of the reference's Gherkin scenarios
(tests/features/pipeline/pipeline.feature, join/join.feature).
"""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import types as T

from clickhouse_etl_spark.sinks import (
    Classification,
    ClickHouseSink,
    DLQWriter,
    classify_clickhouse_error,
)
from clickhouse_etl_spark.spec.model import (
    JoinConfig,
    JoinOutputField,
    JoinSourceConfig,
    parse_pipeline_json,
)
from clickhouse_etl_spark.streaming import StreamingPipeline, temporal_join_streaming


def ts(s):
    return dt.datetime.fromisoformat(s)


LEFT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("lts", T.TimestampType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("rts", T.TimestampType()),
    ]
)


def _write_stream_input(spark, tmpdir, name, rows, schema):
    path = os.path.join(tmpdir, name)
    spark.createDataFrame(rows, schema=schema).write.mode("overwrite").parquet(path)
    return path


def _join_cfg(lw="2s", rw="2s"):
    return JoinConfig(
        left=JoinSourceConfig("left", "id", 2.0, "left"),
        right=JoinSourceConfig("right", "id", 2.0, "right"),
        output_fields=(
            JoinOutputField("left", "id", "id"),
            JoinOutputField("left", "name", "name"),
            JoinOutputField("right", "email", "email"),
        ),
    )


def test_temporal_join_streaming_semantics(spark, tmp_path):
    """join.feature:33-138 semantics: right latest-wins, left buffered
    then drained on right arrival, output projection with rename."""
    base = ts("2024-01-01T10:00:00")

    left_rows = [
        ("u1", "Alice", base),                                  # before right -> buffered, drained at +0.5s
        ("u2", "Bob", base + dt.timedelta(seconds=1)),          # after right u2 -> immediate join
        ("u3", "Carol", base),                                  # no right ever -> dropped
    ]
    right_rows = [
        ("u1", "old@x.com", base + dt.timedelta(milliseconds=200)),
        ("u1", "new@x.com", base + dt.timedelta(milliseconds=500)),  # latest wins for later lefts
        ("u2", "bob@x.com", base + dt.timedelta(milliseconds=300)),
    ]

    lpath = _write_stream_input(spark, str(tmp_path), "left", left_rows, LEFT_SCHEMA)
    rpath = _write_stream_input(spark, str(tmp_path), "right", right_rows, RIGHT_SCHEMA)

    left = spark.readStream.schema(LEFT_SCHEMA).parquet(lpath)
    right = spark.readStream.schema(RIGHT_SCHEMA).parquet(rpath)

    out_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    joined = temporal_join_streaming(
        left, right, _join_cfg(), left_ts="lts", right_ts="rts", output_schema=out_schema
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("tj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["id"], r["name"], r["email"]) for r in spark.sql("SELECT * FROM tj_out").collect()}
    # u1: buffered left drained by FIRST right arrival (old@) — reference
    # drains pending lefts on every right arrival
    assert ("u1", "Alice", "old@x.com") in rows
    # u2: left arrived after right -> immediate join
    assert ("u2", "Bob", "bob@x.com") in rows
    # u3: no right -> dropped (inner semantics)
    assert not any(r[0] == "u3" for r in rows)
    assert len(rows) == 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """pipeline.feature:1-75: 4 events, duplicate key -> 3 survive."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = ts("2024-01-01T00:00:00")
    rows = [
        ("123", "John Doe", base),
        ("456", "Jane Smith", base + dt.timedelta(seconds=1)),
        ("789", "Bob Johnson", base + dt.timedelta(seconds=2)),
        ("789", "Ulm Petterson", base + dt.timedelta(seconds=3)),  # dup within window
    ]
    path = _write_stream_input(spark, str(tmp_path), "events", rows, schema)
    stream = spark.readStream.schema(schema).parquet(path)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT id FROM dd_out").collect()
    assert sorted(r["id"] for r in got) == ["123", "456", "789"]


def test_sink_error_classification():
    # retryable: timeout code 159 / network error
    assert classify_clickhouse_error("Code: 159. DB::Exception: Timeout exceeded") is Classification.RETRYABLE
    assert classify_clickhouse_error("connection refused") is Classification.RETRYABLE
    # permanent: parse error 6, unknown table 60, auth 516
    assert classify_clickhouse_error("Code: 6. Cannot parse") is Classification.PERMANENT
    assert classify_clickhouse_error("Code: 60. Table x does not exist") is Classification.PERMANENT
    assert classify_clickhouse_error("Code: 516. Authentication failed") is Classification.PERMANENT
    # unknown code / unknown text
    assert classify_clickhouse_error("Code: 48. Not implemented") is Classification.UNKNOWN
    assert classify_clickhouse_error("something odd") is Classification.UNKNOWN


def test_sink_write_and_idempotency_column(spark, tmp_path):
    sink = ClickHouseSink(table="t", parquet_fallback_path=str(tmp_path / "out"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    report = sink.write_batch(df, batch_id=7)
    assert report.outcome == "written" and report.rows == 2
    back = spark.read.parquet(str(tmp_path / "out"))
    assert set(back.columns) == {"k", "v", "_batch_id"}
    assert {r["_batch_id"] for r in back.collect()} == {7}


def test_sink_permanent_error_routes_to_dlq(spark, tmp_path):
    class FailingSink(ClickHouseSink):
        def _write_once(self, df, batch_id=None):
            raise RuntimeError("Code: 6. DB::Exception: Cannot parse text")

    dlq = DLQWriter(str(tmp_path / "dlq"))
    sink = FailingSink(table="t", parquet_fallback_path=str(tmp_path / "out"), dlq=dlq)
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    report = sink.write_batch(df, batch_id=1)
    assert report.outcome == "dlq"
    state = dlq.state(spark).collect()
    assert state[0]["component"] == "sink" and state[0]["n_failed"] == 1
    payload = json.loads(dlq.read(spark).collect()[0]["payload"])
    assert payload == {"k": 1, "v": "a"}


def test_sink_retryable_error_reraises(spark, tmp_path):
    class FlakySink(ClickHouseSink):
        def _write_once(self, df, batch_id=None):
            raise RuntimeError("Code: 159. Timeout exceeded")

    sink = FlakySink(table="t", parquet_fallback_path=str(tmp_path / "out"))
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(RuntimeError):
        sink.write_batch(df, batch_id=1)
    assert sink.reports[-1].outcome == "retry"


def test_streaming_pipeline_end_to_end(spark, tmp_path):
    """Full spec -> StreamingPipeline over file sources -> sink parquet."""
    doc = {
        "version": "v3",
        "pipeline_id": "sp",
        "name": "stream-pipe",
        "sources": [
            {"type": "kafka", "source_id": "left", "topic": "left",
             "schema_fields": [{"name": "id", "type": "string"}, {"name": "name", "type": "string"}]},
            {"type": "kafka", "source_id": "right", "topic": "right",
             "schema_fields": [{"name": "id", "type": "string"}, {"name": "email", "type": "string"}]},
        ],
        "join": {
            "enabled": True, "type": "temporal",
            "left_source": {"source_id": "left", "key": "id", "time_window": "1h"},
            "right_source": {"source_id": "right", "key": "id", "time_window": "1h"},
            "output_fields": [
                {"source_id": "left", "name": "id"},
                {"source_id": "left", "name": "name"},
                {"source_id": "right", "name": "email"},
            ],
        },
        "sink": {
            "type": "clickhouse", "table": "out", "max_batch_size": 1000,
            "max_delay_time": "1s",
            "mapping": [
                {"name": "id", "column_name": "id", "column_type": "String"},
                {"name": "name", "column_name": "name", "column_type": "String"},
                {"name": "email", "column_name": "email", "column_type": "String"},
            ],
        },
    }
    spec = parse_pipeline_json(json.dumps(doc))

    base = ts("2024-01-01T10:00:00")
    lpath = _write_stream_input(
        spark, str(tmp_path), "l",
        [("u1", "Alice", base + dt.timedelta(seconds=1))], LEFT_SCHEMA,
    )
    rpath = _write_stream_input(
        spark, str(tmp_path), "r",
        [("u1", "a@x.com", base)], RIGHT_SCHEMA,
    )
    sink = ClickHouseSink(table="out", parquet_fallback_path=str(tmp_path / "sinkout"))
    pipe = StreamingPipeline(spec=spec, checkpoint_dir=str(tmp_path / "ckpt_e2e"))
    q = pipe.start(
        spark,
        sources={
            "left": spark.readStream.schema(LEFT_SCHEMA).parquet(lpath),
            "right": spark.readStream.schema(RIGHT_SCHEMA).parquet(rpath),
        },
        ts_cols={"left": "lts", "right": "rts"},
        sink_fn=sink.foreach_batch(),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "sinkout"))
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "u1" and rows[0]["name"] == "Alice" and rows[0]["email"] == "a@x.com"


def test_streaming_dlq_branch(spark, tmp_path):
    """Per-operator DLQ middleware in streaming: malformed payloads land
    in the DLQ table while valid rows flow to the sink
    (pipeline/dlq.feature semantics)."""
    from clickhouse_etl_spark.sinks.dlq import DLQWriter

    doc = {
        "version": "v3",
        "pipeline_id": "dlqp",
        "name": "dlq-pipe",
        "sources": [
            {"type": "kafka", "source_id": "s", "topic": "s",
             "schema_fields": [{"name": "id", "type": "string"}, {"name": "n", "type": "int"}]},
        ],
        "sink": {
            "type": "clickhouse", "table": "out", "max_batch_size": 100,
            "max_delay_time": "1s",
            "mapping": [
                {"name": "id", "column_name": "id", "column_type": "String"},
                {"name": "n", "column_name": "n", "column_type": "Int64"},
            ],
        },
    }
    spec = parse_pipeline_json(json.dumps(doc))

    payloads = [
        ('{"id":"a","n":1}',),
        ('{"id":"b","n":2}',),
        ('{"id":"c"}',),        # missing n -> DLQ
        ('{broken',),           # malformed -> DLQ
    ]
    inp = str(tmp_path / "in")
    spark.createDataFrame(payloads, ["value"]).write.mode("overwrite").parquet(inp)

    sink = ClickHouseSink(table="out", parquet_fallback_path=str(tmp_path / "sinkout"))
    dlq = DLQWriter(str(tmp_path / "dlq"))
    pipe = StreamingPipeline(spec=spec, checkpoint_dir=str(tmp_path / "ckpt"))

    raw_schema = T.StructType([T.StructField("value", T.StringType())])
    q = pipe.start(
        spark,
        sources={"s": spark.readStream.schema(raw_schema).parquet(inp)},
        ts_cols={"s": "id"},  # no event-time ops in this pipeline
        sink_fn=sink.foreach_batch(),
        trigger={"availableNow": True},
        dlq_writer=dlq,
    )
    q.awaitTermination(120)
    for dq in pipe.dlq_queries:
        dq.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "sinkout"))
    assert {(r["id"], r["n"]) for r in out.collect()} == {("a", 1), ("b", 2)}

    failures = dlq.read(spark).collect()
    assert len(failures) == 2
    errs = sorted(r["error"] for r in failures)
    assert any("malformed" in e for e in errs)
    assert any("missing" in e for e in errs)
    assert all(r["component"] == "ingestor:s" for r in failures)


def test_sink_replay_idempotency(spark, tmp_path):
    """At-least-once + idempotent write: replaying the same epoch (same
    batch_id, same rows) leaves exactly one logical copy after the
    ReplacingMergeTree-equivalent dedup (SURVEY.md §7.5.4)."""
    sink = ClickHouseSink(table="t", parquet_fallback_path=str(tmp_path / "out"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    sink.write_batch(df, batch_id=3)
    sink.write_batch(df, batch_id=3)  # replayed epoch
    # per-epoch directory overwrite -> even the PHYSICAL copy is single
    # (the fallback-side ReplacingMergeTree equivalence)
    raw = spark.read.parquet(str(tmp_path / "out"))
    assert raw.count() == 2
    deduped = sink.read_deduped(spark)
    assert deduped.count() == 2
    assert {(r["k"], r["v"]) for r in deduped.collect()} == {(1, "a"), (2, "b")}


def test_metrics_listener_captures_progress(spark, tmp_path):
    from clickhouse_etl_spark.streaming.metrics import PipelineMetricsListener

    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        schema = T.StructType([T.StructField("id", T.LongType())])
        inp = str(tmp_path / "in")
        spark.range(1000).write.mode("overwrite").parquet(inp)
        q = (
            spark.readStream.schema(schema).parquet(inp)
            .writeStream.format("noop")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import time
        for _ in range(20):  # listener delivery is async
            snap = listener.snapshot("metrics_probe")
            if snap.get("metrics_probe", {}).get("total_input_rows", 0) >= 1000:
                break
            time.sleep(0.5)
        snap = listener.snapshot("metrics_probe")["metrics_probe"]
        assert snap["total_input_rows"] == 1000
        assert snap["batches"] >= 1
    finally:
        spark.streams.removeListener(listener)


def test_temporal_join_tws_semantics(spark, tmp_path):
    """Same golden scenario as the applyInPandasWithState variant, on the
    Spark 4 transformWithStateInPandas API."""
    from clickhouse_etl_spark.streaming.temporal_join_tws import HAS_TWS, temporal_join_tws

    if not HAS_TWS:
        pytest.skip("transformWithStateInPandas unavailable")

    base = ts("2024-01-01T10:00:00")
    left_rows = [
        ("u1", "Alice", base),
        ("u2", "Bob", base + dt.timedelta(seconds=1)),
        ("u3", "Carol", base),
    ]
    right_rows = [
        ("u1", "old@x.com", base + dt.timedelta(milliseconds=200)),
        ("u1", "new@x.com", base + dt.timedelta(milliseconds=500)),
        ("u2", "bob@x.com", base + dt.timedelta(milliseconds=300)),
    ]
    lpath = _write_stream_input(spark, str(tmp_path), "left", left_rows, LEFT_SCHEMA)
    rpath = _write_stream_input(spark, str(tmp_path), "right", right_rows, RIGHT_SCHEMA)
    left = spark.readStream.schema(LEFT_SCHEMA).parquet(lpath)
    right = spark.readStream.schema(RIGHT_SCHEMA).parquet(rpath)
    out_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    joined = temporal_join_tws(
        left, right, _join_cfg(), left_ts="lts", right_ts="rts", output_schema=out_schema
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {(r["id"], r["name"], r["email"]) for r in spark.sql("SELECT * FROM tws_out").collect()}
    assert ("u1", "Alice", "old@x.com") in rows
    assert ("u2", "Bob", "bob@x.com") in rows
    assert not any(r[0] == "u3" for r in rows)
    assert len(rows) == 2


def test_stream_stream_join_all_matches(spark, tmp_path):
    """Built-in watermarked stream-stream join: emits ALL in-window right
    matches (vs the stateful temporal join's latest-wins)."""
    from clickhouse_etl_spark.streaming.stream_join import stream_stream_join

    base = ts("2024-01-01T10:00:00")
    lpath = _write_stream_input(
        spark, str(tmp_path), "l",
        [("u1", "Alice", base + dt.timedelta(seconds=1))], LEFT_SCHEMA,
    )
    rpath = _write_stream_input(
        spark, str(tmp_path), "r",
        [("u1", "old@x.com", base), ("u1", "new@x.com", base + dt.timedelta(milliseconds=500))],
        RIGHT_SCHEMA,
    )
    joined = stream_stream_join(
        spark.readStream.schema(LEFT_SCHEMA).parquet(lpath),
        spark.readStream.schema(RIGHT_SCHEMA).parquet(rpath),
        _join_cfg(),
        left_ts="lts",
        right_ts="rts",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["id"], r["email"]) for r in spark.sql("SELECT * FROM ssj_out").collect()}
    # BOTH right rows match (multi-match semantics — documented contrast)
    assert rows == {("u1", "old@x.com"), ("u1", "new@x.com")}


def test_streaming_otlp_metric_rollup(spark, tmp_path):
    """VERDICT r6 #7: the flatten -> 5-minute tumbling rollup chain runs
    as a STREAM (watermark + window agg under the state store) and its
    closed windows agree exactly with the batch form of the same
    aggregation on the same payloads."""
    import time as _time

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.queries import _otlp_metrics_payload
    from clickhouse_etl_spark.sources import load_table
    from clickhouse_etl_spark.sources.otlp import flatten_metrics
    from clickhouse_etl_spark.streaming.rollup import metric_rollup_stream

    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") % 37 == 0)
    payloads = ev.select(_otlp_metrics_payload().alias("value"))

    # batch truth: identical chain, batch execution (watermark no-ops)
    truth = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["sum_cents"], r["min_cents"], r["max_cents"],
            r["points_per_sec"],
        )
        for r in metric_rollup_stream(flatten_metrics(payloads)).collect()
    }
    assert truth, "no gauge rollup rows in the batch truth"

    # stream: real payload file first, then a far-future sentinel whose
    # event time pushes the watermark past every real window so append
    # mode emits them all (two files + maxFilesPerTrigger=1 => the
    # sentinel lands in a later micro-batch)
    src = str(tmp_path / "otlp_stream")
    payloads.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)  # file-mtime order drives parquet-source batching
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame([(max_ts,)], ["ts"]).select(
        (F.unix_micros(F.col("ts").cast("timestamp")) + 86_400_000_000)
        .alias("us")
    ).select(
        F.concat(
            F.lit('{"resourceMetrics":[{"resource":{"attributes":[{"key":"host",'
                  '"value":{"stringValue":"__sentinel__"}}]},"scopeMetrics":'
                  '[{"scope":{"name":"meter","version":"1"},"metrics":'
                  '[{"name":"g","unit":"1","gauge":{"dataPoints":'
                  '[{"timeUnixNano":"'),
            (F.col("us") * 1000).cast("string"),
            F.lit('","asDouble":1.0}]}}]}]}]}'),
        ).alias("value")
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rolled = metric_rollup_stream(flatten_metrics(stream))
    q = (
        rolled.writeStream.format("memory")
        .queryName("otlp_rollup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["sum_cents"], r["min_cents"], r["max_cents"],
            r["points_per_sec"],
        )
        for r in spark.sql("SELECT * FROM otlp_rollup_out").collect()
        if r["host"] != "__sentinel__"
    }
    assert got == truth


def test_streaming_otlp_sum_and_histogram_rollup(spark, tmp_path):
    """VERDICT r7 #6: the rollup extends past gauges — sum datapoints
    (asInt/asDouble) and the histogram family (count/sum/bucket_counts
    are associative) roll up in the same watermark + tumbling-window
    form, and every closed window agrees exactly with the batch form
    of the same aggregation on the same payloads."""
    import datetime as _dt
    import time as _time

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.queries import _otlp_metrics_payload
    from clickhouse_etl_spark.sources import load_table
    from clickhouse_etl_spark.sources.otlp import flatten_metrics
    from clickhouse_etl_spark.streaming.rollup import (
        histogram_rollup_stream,
        metric_rollup_stream,
    )

    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") % 37 == 0)
    payloads = ev.select(_otlp_metrics_payload().alias("value"))
    flat_b = flatten_metrics(payloads)

    truth_sum = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["sum_cents"], r["min_cents"], r["max_cents"],
        )
        for r in metric_rollup_stream(flat_b, metric_type="sum").collect()
    }
    truth_hist = {
        (r["host"], r["window_start_us"], r["bucket_idx"]): (
            r["n_points"], r["total_count"], r["sum_cents"],
            r["min_cents"], r["max_cents"], r["bucket_n"],
        )
        for r in histogram_rollup_stream(flat_b).collect()
    }
    assert truth_sum, "no sum rollup rows in the batch truth"
    assert any(k[2] >= 0 for k in truth_hist), "no bucket-grain rows"
    assert any(k[2] == -1 for k in truth_hist), "no scalar-grain rows"

    # stream: real payloads first, then a far-future sentinel carrying
    # ALL metric families (each family's branch filters by metric_type
    # BEFORE the watermark, so the sentinel must reach every branch to
    # close the real windows)
    src = str(tmp_path / "otlp_stream_multi")
    payloads.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)  # file-mtime order drives parquet-source batching
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sent = spark.createDataFrame(
        [(max_ts + _dt.timedelta(days=1), "__sentinel__", 1.0, 1)],
        "ts timestamp, event_type string, value double, user_id long",
    ).select(_otlp_metrics_payload().alias("value"))
    sent.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flat_s = flatten_metrics(stream)
    q1 = (
        metric_rollup_stream(flat_s, metric_type="sum")
        .writeStream.format("memory")
        .queryName("otlp_sum_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sum"))
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        histogram_rollup_stream(flat_s)
        .writeStream.format("memory")
        .queryName("otlp_hist_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(180)
    q2.awaitTermination(180)
    got_sum = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["sum_cents"], r["min_cents"], r["max_cents"],
        )
        for r in spark.sql("SELECT * FROM otlp_sum_out").collect()
        if r["host"] != "__sentinel__"
    }
    got_hist = {
        (r["host"], r["window_start_us"], r["bucket_idx"]): (
            r["n_points"], r["total_count"], r["sum_cents"],
            r["min_cents"], r["max_cents"], r["bucket_n"],
        )
        for r in spark.sql("SELECT * FROM otlp_hist_out").collect()
        if r["host"] != "__sentinel__"
    }
    assert got_sum == truth_sum
    assert got_hist == truth_hist


def test_streaming_otlp_exp_hist_and_summary_rollup(spark, tmp_path):
    """VERDICT r8 #3: the rollup covers all five OTLP datapoint
    families — exponential-histogram scalars (count/sum/min/max,
    associative, the flattened record carries no bucket runs) and
    summary snapshots (cumulative temporality: the window merge is
    latest-snapshot via lexicographic struct max, not addition). Every
    closed window equals the batch form on the same payloads."""
    import datetime as _dt
    import time as _time

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.queries import _otlp_metrics_payload
    from clickhouse_etl_spark.sources import load_table
    from clickhouse_etl_spark.sources.otlp import flatten_metrics
    from clickhouse_etl_spark.streaming.rollup import (
        exp_histogram_rollup_stream,
        summary_rollup_stream,
    )

    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") % 7 == 0)
    payloads = ev.select(_otlp_metrics_payload().alias("value"))
    flat_b = flatten_metrics(payloads)

    truth_eh = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["total_count"], r["sum_cents"],
            r["min_cents"], r["max_cents"],
        )
        for r in exp_histogram_rollup_stream(flat_b, window_duration="1 day", watermark="2 days").collect()
    }
    truth_sm = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["last_count"], r["last_sum_cents"],
        )
        for r in summary_rollup_stream(flat_b, window_duration="1 day", watermark="2 days").collect()
    }
    assert truth_eh, "no exp-histogram rollup rows in the batch truth"
    assert truth_sm, "no summary rollup rows in the batch truth"
    # the synthetic summary snapshot count is the constant 9 — the
    # latest-snapshot merge must surface it, not a sum of snapshots
    assert all(v[1] == 9 for v in truth_sm.values())
    # windows with >1 snapshot prove the merge is NOT addition
    assert any(v[0] > 1 for v in truth_sm.values())

    # all-family sentinel (each branch filters metric_type BEFORE the
    # watermark, so the sentinel must reach every branch)
    src = str(tmp_path / "otlp_stream_eh_sm")
    payloads.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)  # file-mtime order drives parquet-source batching
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sent = spark.createDataFrame(
        [(max_ts + _dt.timedelta(days=30), "__sentinel__", 1.0, 1)],
        "ts timestamp, event_type string, value double, user_id long",
    ).select(_otlp_metrics_payload().alias("value"))
    sent.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flat_s = flatten_metrics(stream)
    q1 = (
        exp_histogram_rollup_stream(flat_s, window_duration="1 day", watermark="2 days")
        .writeStream.format("memory")
        .queryName("otlp_eh_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_eh"))
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        summary_rollup_stream(flat_s, window_duration="1 day", watermark="2 days")
        .writeStream.format("memory")
        .queryName("otlp_sm_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sm"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(180)
    q2.awaitTermination(180)
    got_eh = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["total_count"], r["sum_cents"],
            r["min_cents"], r["max_cents"],
        )
        for r in spark.sql("SELECT * FROM otlp_eh_out").collect()
        if r["host"] != "__sentinel__"
    }
    got_sm = {
        (r["host"], r["window_start_us"]): (
            r["n_points"], r["last_count"], r["last_sum_cents"],
        )
        for r in spark.sql("SELECT * FROM otlp_sm_out").collect()
        if r["host"] != "__sentinel__"
    }
    assert got_eh == truth_eh
    assert got_sm == truth_sm


def test_streaming_curation_chain_parity_with_batch(spark, tmp_path):
    """VERDICT r7 #2: the full production curation chain — normalize →
    bloom dedup_against → classify_against scoring → windowed rollup —
    runs as ONE StreamingQuery, and its closed windows equal the batch
    chain on the same corpus exactly (the plan is identical; the
    watermark no-ops in batch)."""
    import datetime as _dt
    import time as _time

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        release_bloom_cache,
        write_bloom_table,
    )
    from clickhouse_etl_spark.dataops.text import (
        normalize_text,
        write_classifier_table,
    )
    from clickhouse_etl_spark.sources import load_table
    from clickhouse_etl_spark.streaming.curation import curation_rollup_stream

    from tests.conftest import SF_DIR

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id", "text",
            F.timestamp_seconds(1_700_000_000 + F.col("doc_id") * 13).alias("ts"),
        )
    )
    # cross-wave seen-set: the even half, keyed by CANONICAL text
    bloom = str(tmp_path / "curation_bloom")
    write_bloom_table(
        normalize_text(docs.filter("doc_id % 2 = 0")),
        bloom, capacity=1000, text_col="text_norm",
    )
    # persisted classifier trained on the canonical corpus
    weights = str(tmp_path / "curation_weights")
    write_classifier_table(normalize_text(docs), weights, text_col="text_norm")

    truth = {
        (r["window_start_us"], r["pred"]): (
            r["n_docs"], r["sum_tokens"], r["sum_score"],
        )
        for r in curation_rollup_stream(docs, bloom, weights).collect()
    }
    assert truth, "batch curation rollup is empty"
    assert len({k[0] for k in truth}) > 3, "need several windows"
    release_bloom_cache(bloom)

    # stream the same corpus + a far-future sentinel doc that survives
    # every row-local stage (fresh text, trained stopword buckets) so
    # the watermark closes all real windows
    src = str(tmp_path / "curation_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)
    max_ts = docs.agg(F.max("ts")).collect()[0][0]
    sentinel_ts = max_ts + _dt.timedelta(days=1)
    spark.createDataFrame(
        [(10**9, "the and is of to in completely fresh sentinel text", sentinel_ts)],
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        curation_rollup_stream(stream, bloom, weights)
        .writeStream.format("memory")
        .queryName("curation_rollup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_curation"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    sentinel_us = int(sentinel_ts.timestamp()) * 1_000_000
    got = {
        (r["window_start_us"], r["pred"]): (
            r["n_docs"], r["sum_tokens"], r["sum_score"],
        )
        for r in spark.sql("SELECT * FROM curation_rollup_out").collect()
        if r["window_start_us"] < sentinel_us - 600_000_000
    }
    assert got == truth
    release_bloom_cache(bloom)


def test_sum_rollup_int_cents_exact_past_2e53(spark):
    """Review r8: sum datapoints carrying asInt must produce exact
    integer cents (value_int*100 in integer arithmetic — a double
    round-trip corrupts cents past 2^53), and the gauge family keeps
    the oracle-backed batch entry's contract (value_double ONLY; an
    int-valued gauge contributes a null-cents point, never a coerced
    value)."""
    from clickhouse_etl_spark.streaming.rollup import metric_rollup_stream

    big = 9007199254740993  # 2^53 + 1
    flat = spark.createDataFrame(
        [
            ("sum", {"host": "h"}, "2024-01-01 00:00:00", None, big),
            ("gauge", {"host": "h"}, "2024-01-01 00:00:00", None, big),
        ],
        "metric_type string, resource_attributes map<string,string>, "
        "timestamp string, value_double double, value_int long",
    )
    s = metric_rollup_stream(flat, metric_type="sum").collect()
    assert len(s) == 1
    assert s[0]["sum_cents"] == big * 100  # exact, past the double range
    g = metric_rollup_stream(flat, metric_type="gauge").collect()
    assert len(g) == 1
    assert g[0]["n_points"] == 1 and g[0]["sum_cents"] is None


def test_curation_stream_to_idempotent_sink_with_replay(spark, tmp_path):
    """The flagship deployment end to end THROUGH the sink contract:
    curation rollup -> ClickHouseSink.foreach_batch with _batch_id
    idempotency stamping. A checkpoint-resumed replay of the same
    source must not duplicate sink rows per (batch, key) — the
    reference's commit-after-write guarantee (sink/clickhouse.go
    batch dedup) on the curation stream."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops.dedup import (
        release_bloom_cache,
        write_bloom_table,
    )
    from clickhouse_etl_spark.dataops.text import (
        normalize_text,
        write_classifier_table,
    )
    from clickhouse_etl_spark.sinks import ClickHouseSink
    from clickhouse_etl_spark.sources import load_table
    from clickhouse_etl_spark.streaming.curation import curation_rollup_stream

    from tests.conftest import SF_DIR

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id", "text",
            F.timestamp_seconds(1_700_000_000 + F.col("doc_id") * 13).alias("ts"),
        )
    )
    bloom = str(tmp_path / "sink_bloom")
    write_bloom_table(
        normalize_text(docs.filter("doc_id % 2 = 0")),
        bloom, capacity=1000, text_col="text_norm",
    )
    weights = str(tmp_path / "sink_weights")
    write_classifier_table(normalize_text(docs), weights, text_col="text_norm")

    src = str(tmp_path / "sink_src")
    docs.coalesce(2).write.parquet(src)
    out_dir = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink = ClickHouseSink(table="curation_rollup", parquet_fallback_path=out_dir)
        q = (
            curation_rollup_stream(stream, bloom, weights)
            .writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    # the corpus spans ~108 minutes of event time across two files, so
    # the second micro-batch's watermark closes most windows — rows
    # MUST land (idempotency on an empty sink would be vacuous); the
    # trailing windows legitimately stay open on a bounded run
    assert n_first > 0
    batches_first = {
        r["_batch_id"]
        for r in spark.read.option("basePath", out_dir).parquet(out_dir)
        .select(F.col("_batch_id")).distinct().collect()
    } if n_first else set()

    # replay from the SAME checkpoint: no new input -> no new batches,
    # no duplicated rows
    run_once()
    again = spark.read.parquet(out_dir)
    assert again.count() == n_first
    if n_first:
        batches_again = {
            r["_batch_id"]
            for r in spark.read.option("basePath", out_dir).parquet(out_dir)
            .select(F.col("_batch_id")).distinct().collect()
        }
        assert batches_again == batches_first
    release_bloom_cache(bloom)


def test_pq_index_online_serving_parity(spark, tmp_path):
    """Online ANN serving (pq_index_serve_foreach_batch): a STREAM of
    query vectors answered per micro-batch against the persisted index
    must reproduce the batch pq_index_query answers exactly, and the
    loaded-index cache must serve every batch from one artifact load
    (invalidating only when the artifact is rebuilt)."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.dataops import similarity as sim
    from clickhouse_etl_spark.sources import load_table

    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "serve_index")
    sim.pq_index_build(emb, path)

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = sorted(
        tuple(r) for r in sim.pq_index_query(spark, path, queries).collect()
    )
    assert truth
    entry0 = sim._INDEX_CACHES[path]

    src = str(tmp_path / "serve_queries")
    # two files -> two micro-batches
    queries.filter("query_id < 4").coalesce(1).write.mode("overwrite").parquet(src)
    queries.filter("query_id >= 4").coalesce(1).write.mode("append").parquet(src)

    got = []
    q = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            sim.pq_index_serve_foreach_batch(
                spark, path,
                lambda ans, bid: got.extend(tuple(r) for r in ans.collect()),
            )
        )
        .option("checkpointLocation", str(tmp_path / "serve_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(got) == truth
    # every batch served from the ONE cached artifact load
    assert sim._INDEX_CACHES[path] is entry0
    # rebuild rotates the cache (new artifact listing)
    sim.pq_index_build(emb.filter("vec_id % 2 = 0"), path)
    sim.pq_index_query(spark, path, queries.limit(1))
    assert sim._INDEX_CACHES[path] is not entry0
    assert sim.release_index_cache(path) == 1
    assert sim.release_index_cache(path) == 0


def test_line_dedup_against_stream_parity_and_wave_lifecycle(spark, tmp_path):
    """VERDICT r9 #3: streaming line-grain dedup. Wave 1's corpus ->
    write_line_digest_table; wave 2 streams through the spec chain with
    the line_dedup_against dataop mid-chain (two parquet files -> two
    micro-batches, append mode) and lands EXACTLY the batch probe's
    rows — seen lines dropped, text reassembled, fully-seen docs gone.
    Then the multi-wave step: append wave 2's digests and probe a
    wave-3 doc against the accumulated set."""
    from clickhouse_etl_spark.dataops.dedup import (
        line_dedup_against_path,
        release_line_digest_cache,
        write_line_digest_table,
    )
    from clickhouse_etl_spark.spec.model import DataopConfig, SourceConfig
    from clickhouse_etl_spark.streaming.runner import streaming_source_chain

    wave1 = spark.createDataFrame(
        [
            (0, "cookie banner line.\nalpha unique one."),
            (1, "nav bar line.\ncookie banner line."),
        ],
        "doc_id long, text string",
    )
    seen = str(tmp_path / "seen_lines")
    write_line_digest_table(wave1, seen, mode="overwrite")

    wave2 = spark.createDataFrame(
        [
            (10, "cookie banner line.\nwave two fresh line.", ),
            (11, "nav bar line."),
            (12, "brand new only.\ncookie banner line.\nsecond new."),
        ],
        "doc_id long, text string",
    )
    truth = {
        (r["doc_id"], r["text"], r["n_lines_kept"])
        for r in line_dedup_against_path(wave2, seen).collect()
    }
    assert truth, "batch probe is empty"

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 10)
    src = str(tmp_path / "wave2_src")
    w2rows = wave2.collect()
    spark.createDataFrame(
        [(r["doc_id"], r["text"], ts) for r in w2rows[:2]], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(r["doc_id"], r["text"], ts) for r in w2rows[2:]], schema
    ).coalesce(1).write.mode("append").parquet(src)

    cfg = SourceConfig(
        source_id="documents",
        dataops=(
            DataopConfig(op="line_dedup_against", params={"seen_path": seen}),
        ),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_source_chain(cfg, "ts", value_is_json=False)(stream)
        .writeStream.format("memory")
        .queryName("line_dedup_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ld_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["text"], r["n_lines_kept"])
        for r in spark.sql("SELECT * FROM line_dedup_stream_out").collect()
    }
    assert got == truth

    # wave N survivors feed wave N+1: append wave-2 digests, then a
    # wave-3 doc made entirely of wave-1 + wave-2 lines vanishes while
    # its genuinely new line survives
    write_line_digest_table(wave2, seen, mode="append")
    wave3 = spark.createDataFrame(
        [
            (20, "wave two fresh line.\ncookie banner line."),
            (21, "wave two fresh line.\nthird wave only line."),
        ],
        "doc_id long, text string",
    )
    out3 = {
        r["doc_id"]: r["text"]
        for r in line_dedup_against_path(wave3, seen).collect()
    }
    assert out3 == {21: "third wave only line."}
    release_line_digest_cache()

def test_decontaminate_against_stream_parity(spark, tmp_path):
    """Streaming decontamination: a training stream probes the
    persisted eval-set n-gram artifact mid-chain (two parquet files ->
    two micro-batches, append mode, drop action) and lands EXACTLY the
    batch probe's surviving rows — the dedup_against deployment shape
    at n-gram grain."""
    from clickhouse_etl_spark.dataops.dedup import (
        decontaminate_against_path,
        release_ngram_digest_cache,
        write_ngram_digest_table,
    )
    from clickhouse_etl_spark.spec.model import DataopConfig, SourceConfig
    from clickhouse_etl_spark.streaming.runner import streaming_source_chain

    bench = spark.createDataFrame(
        [
            (0, "held out benchmark question one"),
            (1, "held out benchmark question two"),
        ],
        "bench_id long, text string",
    )
    seen = str(tmp_path / "eval_ngrams")
    write_ngram_digest_table(bench, seen, n=4, mode="overwrite")

    train = spark.createDataFrame(
        [
            (10, "copied the held out benchmark question one verbatim"),
            (11, "a fresh training document about nothing"),
            (12, "another clean one entirely"),
            (13, "Held OUT: benchmark; question two!"),  # case/punct fold
        ],
        "doc_id long, text string",
    )
    truth = {
        (r["doc_id"], r["text"])
        for r in decontaminate_against_path(train, seen, n=4).collect()
    }
    assert truth == {
        (11, "a fresh training document about nothing"),
        (12, "another clean one entirely"),
    }

    import datetime as dt

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    ts = dt.datetime(2024, 1, 1, 10)
    src = str(tmp_path / "train_src")
    rows = train.collect()
    spark.createDataFrame(
        [(r["doc_id"], r["text"], ts) for r in rows[:2]], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(r["doc_id"], r["text"], ts) for r in rows[2:]], schema
    ).coalesce(1).write.mode("append").parquet(src)

    cfg = SourceConfig(
        source_id="documents",
        dataops=(DataopConfig(
            op="decontaminate_against", params={"seen_path": seen, "n": 4}
        ),),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_source_chain(cfg, "ts", value_is_json=False)(stream)
        .writeStream.format("memory")
        .queryName("decontam_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT * FROM decontam_stream_out").collect()
    }
    assert got == truth
    release_ngram_digest_cache()


def test_neardup_against_stream_parity(spark, tmp_path):
    """Streaming near-dup removal: a training stream probes the
    persisted band artifact mid-chain (two parquet files -> two
    micro-batches, append mode, drop action) and lands EXACTLY the
    batch probe's surviving rows — the dedup_against deployment shape
    at near-dup grain."""
    from clickhouse_etl_spark.dataops.dedup import (
        neardup_against_path,
        release_band_digest_cache,
        write_band_digest_table,
    )
    from clickhouse_etl_spark.spec.model import DataopConfig, SourceConfig
    from clickhouse_etl_spark.streaming.runner import streaming_source_chain

    wave1 = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "pack my box with five dozen liquor jugs today"),
        ],
        "wave_id long, text string",
    )
    seen = str(tmp_path / "band_seen")
    write_band_digest_table(wave1, seen, mode="overwrite")

    train = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "a fresh training document about nothing at all"),
            (12, "prefix pack my box with five dozen liquor jugs today"),
            (13, "another clean one entirely unrelated to anything"),
        ],
        "doc_id long, text string",
    )
    truth = {
        (r["doc_id"], r["text"])
        for r in neardup_against_path(train, seen).collect()
    }
    assert (11, "a fresh training document about nothing at all") in truth
    assert not any(d == 10 for d, _ in truth)  # exact copy always drops

    import datetime as dt

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    ts = dt.datetime(2024, 1, 1, 10)
    src = str(tmp_path / "train_src")
    rows = train.collect()
    spark.createDataFrame(
        [(r["doc_id"], r["text"], ts) for r in rows[:2]], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(r["doc_id"], r["text"], ts) for r in rows[2:]], schema
    ).coalesce(1).write.mode("append").parquet(src)

    cfg = SourceConfig(
        source_id="documents",
        dataops=(DataopConfig(
            op="neardup_against", params={"seen_path": seen}
        ),),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_source_chain(cfg, "ts", value_is_json=False)(stream)
        .writeStream.format("memory")
        .queryName("neardup_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT * FROM neardup_stream_out").collect()
    }
    assert got == truth
    release_band_digest_cache()
