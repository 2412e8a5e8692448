"""Sink mapper type-conversion matrix (FIXTURES.md F8; semantics from
mapper/types.go:79-305 + utils.go parse helpers)."""

import datetime as dt
import json

from pyspark.sql import Row
from pyspark.sql import types as T

from clickhouse_etl_spark.operators.mapper import apply_sink_mapping
from clickhouse_etl_spark.spec.model import SinkMapping


def _map_one(spark, value, spark_type, ch_type):
    schema = T.StructType([T.StructField("v", spark_type, True)])
    df = spark.createDataFrame([Row(v=value)], schema=schema)
    out = apply_sink_mapping(df, (SinkMapping("v", "out", ch_type),))
    return out.collect()[0]["out"]


def test_datetime_from_three_sources(spark):
    # string ISO-8601 / int unix seconds / float fractional unix
    want = dt.datetime(2024, 1, 1, 0, 0, 0)
    assert _map_one(spark, "2024-01-01T00:00:00Z", T.StringType(), "DateTime") == want
    assert _map_one(spark, 1704067200, T.LongType(), "DateTime") == want
    got = _map_one(spark, 1704067200.5, T.DoubleType(), "DateTime64(3)")
    assert got == dt.datetime(2024, 1, 1, 0, 0, 0, 500000)


def test_unparsable_datetime_is_null(spark):
    assert _map_one(spark, "not a date", T.StringType(), "DateTime") is None


def test_int_range_checks(spark):
    # mapper/utils.go overflow behavior -> NULL (DLQ at sink layer)
    assert _map_one(spark, 127, T.LongType(), "Int8") == 127
    assert _map_one(spark, 128, T.LongType(), "Int8") is None
    assert _map_one(spark, -129, T.LongType(), "Int8") is None
    assert _map_one(spark, 255, T.LongType(), "UInt8") == 255
    assert _map_one(spark, 256, T.LongType(), "UInt8") is None
    assert _map_one(spark, -1, T.LongType(), "UInt8") is None
    assert _map_one(spark, 65535, T.LongType(), "UInt16") == 65535
    assert _map_one(spark, 2**31 - 1, T.LongType(), "Int32") == 2**31 - 1
    assert _map_one(spark, 2**31, T.LongType(), "Int32") is None
    assert _map_one(spark, "42", T.StringType(), "Int64") == 42


def test_map_value_stringification(spark):
    # %d ints, %g floats, %t bools, JSON nested (types.go:237-276)
    mt = T.MapType(T.StringType(), T.DoubleType())
    assert _map_one(spark, {"a": 2.0, "b": 2.75}, mt, "Map(String,String)") == {
        "a": "2", "b": "2.75"
    }
    mb = T.MapType(T.StringType(), T.BooleanType())
    assert _map_one(spark, {"x": True, "y": False}, mb, "Map(String,String)") == {
        "x": "true", "y": "false"
    }
    nested = T.MapType(T.StringType(), T.ArrayType(T.LongType()))
    got = _map_one(spark, {"k": [1, 2]}, nested, "Map(String,String)")
    assert json.loads(got["k"]) == [1, 2]


def test_null_map_becomes_empty(spark):
    mt = T.MapType(T.StringType(), T.StringType())
    assert _map_one(spark, None, mt, "Map(String,String)") == {}


def test_array_to_string_is_json(spark):
    at = T.ArrayType(T.LongType())
    assert json.loads(_map_one(spark, [1, 2, 3], at, "String")) == [1, 2, 3]


def test_array_of_maps(spark):
    at = T.ArrayType(T.MapType(T.StringType(), T.LongType()))
    got = _map_one(spark, [{"a": 1}, None], at, "Array(Map(String,String))")
    assert got == [{"a": "1"}, {}]  # null element -> {} (types.go:47-54)


def test_lowcardinality_and_nullable_unwrap(spark):
    assert _map_one(spark, "x", T.StringType(), "LowCardinality(String)") == "x"
    assert _map_one(spark, 5, T.LongType(), "Nullable(Int32)") == 5
    assert _map_one(spark, "y", T.StringType(), "LowCardinality(Nullable(String))") == "y"


def test_fixed_string_and_uuid_passthrough(spark):
    assert _map_one(spark, "abcd", T.StringType(), "FixedString(4)") == "abcd"
    u = "550e8400-e29b-41d4-a716-446655440000"
    assert _map_one(spark, u, T.StringType(), "UUID") == u


def test_bool_and_float_casts(spark):
    assert _map_one(spark, True, T.BooleanType(), "Bool") is True
    assert _map_one(spark, 1.5, T.DoubleType(), "Float32") == 1.5
    assert _map_one(spark, 1.5, T.DoubleType(), "Float64") == 1.5
