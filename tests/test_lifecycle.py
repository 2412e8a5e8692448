"""Pipeline lifecycle: stop persists state in the checkpoint; resume
continues from it (offsets not re-read); terminate cleans up.
"""

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
