"""Pipeline lifecycle: stop persists state in the checkpoint; resume
continues from it (offsets not re-read); terminate cleans up.
"""

import pytest
import datetime as dt
import json
import os

from pyspark.sql import types as T

from clickhouse_etl_spark.sinks import ClickHouseSink
from clickhouse_etl_spark.spec.model import parse_pipeline_json
from clickhouse_etl_spark.streaming.lifecycle import PipelineManager

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

DOC = {
    "version": "v3",
    "pipeline_id": "lc1",
    "name": "lifecycle",
    "sources": [
        {"type": "kafka", "source_id": "s", "topic": "s",
         "schema_fields": [{"name": "id", "type": "string"}, {"name": "name", "type": "string"}]},
    ],
    "sink": {
        "type": "clickhouse", "table": "out", "max_batch_size": 100,
        "max_delay_time": "1s",
        "mapping": [
            {"name": "id", "column_name": "id", "column_type": "String"},
            {"name": "name", "column_name": "name", "column_type": "String"},
        ],
    },
}


def test_stop_resume_continues_from_checkpoint(spark, tmp_path):
    spec = parse_pipeline_json(json.dumps(DOC))
    inp = str(tmp_path / "in")
    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame([("a", "A", base)], SCHEMA).write.mode("append").parquet(inp)

    sink = ClickHouseSink(table="out", parquet_fallback_path=str(tmp_path / "out"))
    mgr = PipelineManager()

    def sources():
        return {"s": spark.readStream.schema(SCHEMA).parquet(inp)}

    rp = mgr.create(
        spark, spec, str(tmp_path / "ckpt"), sources(), {"s": "ts"},
        sink.foreach_batch(), trigger={"availableNow": True},
    )
    rp.query.awaitTermination(120)
    assert mgr.status() == {"lc1": "stopped"} or not rp.query.isActive
    n1 = spark.read.parquet(str(tmp_path / "out")).count()
    assert n1 == 1

    # add a second row; resume must process ONLY the new file (offsets
    # resumed from checkpoint), so the sink gains exactly one row
    spark.createDataFrame([("b", "B", base)], SCHEMA).write.mode("append").parquet(inp)
    mgr.stop("lc1")
    rp = mgr.resume(spark, "lc1")
    rp.query.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2
    assert {r["id"] for r in out.collect()} == {"a", "b"}

    mgr.terminate("lc1")
    assert "lc1" not in mgr.pipelines
    assert not os.path.isdir(str(tmp_path / "ckpt"))


@pytest.mark.heavy
def test_edit_incompatible_spec_rotates_checkpoint(spark, tmp_path):
    """A state-shape-changing edit (adding windowed dedup) cannot resume
    the old checkpoint — edit() must detect the failed restart and
    rotate to a fresh checkpoint directory instead of reporting success
    and dying in the background."""
    spec = parse_pipeline_json(json.dumps(DOC))
    inp = str(tmp_path / "in")
    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame([("a", "A", base)], SCHEMA).write.mode("append").parquet(inp)

    sink = ClickHouseSink(table="out", parquet_fallback_path=str(tmp_path / "out"))
    mgr = PipelineManager()
    rp = mgr.create(
        spark, spec, str(tmp_path / "ckpt"),
        {"s": spark.readStream.schema(SCHEMA).parquet(inp)}, {"s": "ts"},
        sink.foreach_batch(), trigger={"availableNow": True},
    )
    rp.query.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1

    # edited spec adds a dedup stage -> dropDuplicatesWithinWatermark
    # state the old checkpoint doesn't have
    doc2 = dict(DOC)
    doc2["transforms"] = [
        {"type": "dedup", "source_id": "s", "config": {"key": "id", "time_window": "1h"}},
    ]
    spec2 = parse_pipeline_json(json.dumps(doc2))
    # replays everything from the fresh checkpoint: 'a' again (replay =
    # at-least-once, same as the reference's Kafka-offset replay)
    spark.createDataFrame([("b", "B", base)], SCHEMA).write.mode("append").parquet(inp)
    mgr.pipelines["lc1"].start_args["sources"] = {
        "s": spark.readStream.schema(SCHEMA).parquet(inp)
    }
    rp = mgr.edit(spark, "lc1", spec2)
    rp.query.awaitTermination(120)
    assert rp.checkpoint_dir != str(tmp_path / "ckpt")
    out = spark.read.parquet(str(tmp_path / "out"))
    assert {r["id"] for r in out.collect()} == {"a", "b"}
