"""Schema evolution: SR wire envelope strip + backward-compat checks."""

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.spec.model import Field
from clickhouse_etl_spark.spec.schema_registry import (
    check_backward_compatible,
    strip_sr_envelope,
    widest_schema,
)


def test_strip_sr_envelope(spark):
    enveloped = bytes([0x00, 0x00, 0x01, 0x86, 0xA0]) + b'{"a":1}'  # id=100000
    bare = b'{"b":2}'
    df = spark.createDataFrame([(enveloped,), (bare,)], ["value"])
    payload, sid = strip_sr_envelope(F.col("value"))
    rows = df.select(
        payload.cast("string").alias("p"), sid.alias("sid")
    ).collect()
    got = {r["p"]: r["sid"] for r in rows}
    assert got['{"a":1}'] == 100000
    assert got['{"b":2}'] is None


def test_backward_compat():
    v1 = [Field("id", "string"), Field("n", "int")]
    v2 = v1 + [Field("extra", "float")]           # additive -> compatible
    ok, _ = check_backward_compatible(v1, v2)
    assert ok
    # normalized type spellings still match (int64 ≡ int)
    ok, _ = check_backward_compatible(v1, [Field("id", "string"), Field("n", "int64")])
    assert ok
    # removal -> incompatible
    ok, reason = check_backward_compatible(v1, [Field("id", "string")])
    assert not ok and "removed" in reason
    # type change -> incompatible
    ok, reason = check_backward_compatible(v1, [Field("id", "string"), Field("n", "float")])
    assert not ok and "changed type" in reason


def test_widest_schema():
    v1 = [Field("id", "string")]
    v2 = [Field("id", "string"), Field("n", "int")]
    assert widest_schema([v1, v2]) == tuple(v2)
    with pytest.raises(ValueError, match="incompatible"):
        widest_schema([v2, v1])


def test_multi_schema_version_interleave_end_to_end(spark, tmp_path):
    """Two live schema versions interleaved on ONE source, streamed
    through envelope-strip -> validate -> transform -> sink: the output
    collapses to the widest schema with v1 rows null-filled in the
    v2-only column (SURVEY §1.3 divergence from the reference's
    per-version INSERT batches, sink/clickhouse.go:622-668 — asserted
    here so the divergence stays intentional)."""
    import json as _json

    from pyspark.sql import types as T

    from clickhouse_etl_spark.operators.mapper import apply_sink_mapping
    from clickhouse_etl_spark.operators.transform import apply_transform
    from clickhouse_etl_spark.operators.validate import validate_json_versioned
    from clickhouse_etl_spark.sinks import ClickHouseSink
    from clickhouse_etl_spark.spec.model import parse_pipeline_json

    def envelope(schema_id: int, payload: dict) -> bytes:
        return bytes([0x00]) + schema_id.to_bytes(4, "big") + _json.dumps(payload).encode()

    v1_fields = [Field("id", "string"), Field("name", "string")]
    v2_fields = v1_fields + [Field("score", "float")]

    rows = [
        (envelope(1, {"id": "a", "name": "alice"}),),
        (envelope(2, {"id": "b", "name": "bob", "score": 2.5}),),
        (envelope(1, {"id": "c", "name": "carol"}),),
        (envelope(2, {"id": "d", "name": "dave", "score": 4.0}),),
    ]
    inp = str(tmp_path / "in")
    spark.createDataFrame(
        rows, T.StructType([T.StructField("value", T.BinaryType())])
    ).write.parquet(inp)

    doc = {
        "version": "v3",
        "pipeline_id": "sv",
        "name": "schema-versions",
        "sources": [
            {
                "type": "kafka", "source_id": "s", "topic": "s",
                "schema_fields": [
                    {"name": f.name, "type": f.type} for f in v2_fields
                ],
            }
        ],
        "transforms": [
            {
                "type": "stateless", "source_id": "s",
                "config": {
                    "transforms": [
                        {"expression": "id", "output_name": "id", "output_type": "string"},
                        {"expression": "upper(name)", "output_name": "label",
                         "output_type": "string"},
                        {"expression": "score * 2", "output_name": "dscore",
                         "output_type": "float64"},
                    ]
                },
            }
        ],
        "sink": {
            "type": "clickhouse", "table": "out",
            "mapping": [
                {"name": "id", "column_name": "id", "column_type": "String"},
                {"name": "label", "column_name": "label", "column_type": "String"},
                {"name": "dscore", "column_name": "dscore", "column_type": "Float64"},
            ],
        },
    }
    spec = parse_pipeline_json(_json.dumps(doc))
    src = spec.source("s")
    sink = ClickHouseSink(table="out", parquet_fallback_path=str(tmp_path / "out"))

    stream = spark.readStream.schema("value binary").parquet(inp)
    payload, sid = strip_sr_envelope(F.col("value"))
    stripped = stream.select(
        payload.cast("string").alias("value"), sid.alias("_schema_id")
    )
    # each message validates against ITS version; valid rows collapse
    # to the widest shape with v1 rows null-filled in 'score'
    ok, _dlq = validate_json_versioned(
        stripped, {1: v1_fields, 2: v2_fields}, component="ingestor:s"
    )
    transformed = apply_transform(ok, src.transform)
    mapped = apply_sink_mapping(transformed, spec.sink.mapping)
    q = (
        mapped.writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    # _batch_id is the sink's epoch partition dir (idempotency key)
    assert set(out.columns) - {"_batch_id"} == {"id", "label", "dscore"}  # widest shape
    got = {r["id"]: (r["label"], r["dscore"]) for r in out.collect()}
    assert got == {
        "a": ("ALICE", None),   # v1 row: v2-only column null-filled
        "b": ("BOB", 5.0),
        "c": ("CAROL", None),
        "d": ("DAVE", 8.0),
    }
