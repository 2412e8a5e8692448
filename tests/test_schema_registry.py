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
