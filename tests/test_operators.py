"""Operator golden tests on tiny DataFrames (SURVEY.md §5 unit layer)."""

import datetime as dt
import json

from pyspark.sql import Row
from pyspark.sql import types as T

from clickhouse_etl_spark.operators import (
    apply_filter,
    apply_sink_mapping,
    apply_transform,
    asof_join,
    dedup_first_wins,
    dedup_windowed,
    temporal_join_batch,
    validate_json,
)
from clickhouse_etl_spark.spec.model import (
    DedupConfig,
    Field,
    FilterConfig,
    JoinConfig,
    JoinOutputField,
    JoinSourceConfig,
    SinkMapping,
    TransformConfig,
    TransformOutput,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_filter(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 30)], ["name", "age"]
    )
    out = apply_filter(df, FilterConfig("age > 18 and name != 'x'"))
    assert [r["name"] for r in out.collect()] == ["b"]


def test_transform_projection_only_outputs(spark):
    df = spark.createDataFrame([("alice", "29.9")], ["name", "amount"])
    cfg = TransformConfig(
        outputs=(
            TransformOutput("upper(name)", "NAME", "string"),
            TransformOutput("toFloat(amount) * 2", "double_amount", "float64"),
            TransformOutput("toInt(amount)", "int_amount", "int64"),
        )
    )
    out = apply_transform(df, cfg)
    assert out.columns == ["NAME", "double_amount", "int_amount"]
    row = out.collect()[0]
    assert row["NAME"] == "ALICE"
    assert row["double_amount"] == 59.8
    assert row["int_amount"] == 29


def test_dedup_first_wins(spark):
    # FIXTURES.md F1: 4 events, duplicate id 789 — first (by order col) wins
    df = spark.createDataFrame(
        [("123", "John Doe", 1), ("456", "Jane Smith", 2),
         ("789", "Bob Johnson", 3), ("789", "Ulm Petterson", 4)],
        ["id", "name", "seq"],
    )
    out = dedup_first_wins(df, "id", ["seq"]).orderBy("seq").collect()
    assert [(r["id"], r["name"]) for r in out] == [
        ("123", "John Doe"), ("456", "Jane Smith"), ("789", "Bob Johnson")
    ]


def test_dedup_windowed_expires(spark):
    # same key re-appears after the window -> kept again
    df = spark.createDataFrame(
        [("k", ts("2024-01-01T00:00:00"), 1),
         ("k", ts("2024-01-01T00:30:00"), 2),   # same 1h bucket -> dropped
         ("k", ts("2024-01-01T01:10:00"), 3)],  # next bucket -> kept
        ["id", "ts", "seq"],
    )
    out = dedup_windowed(df, "id", "ts", 3600, ["seq"])
    assert sorted(r["seq"] for r in out.collect()) == [1, 3]


def test_dedup_windowed_subsecond_window(spark):
    """A '500ms' window must honor 500ms buckets, not truncate to 0 and
    silently collapse to whole-history dedup (the µs-bucket fix)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", base, 1),
         ("k", base + dt.timedelta(milliseconds=200), 2),  # same 500ms bucket
         ("k", base + dt.timedelta(milliseconds=700), 3)],  # next bucket
        ["id", "ts", "seq"],
    )
    out = dedup_windowed(df, "id", "ts", 0.5, ["seq"])
    assert sorted(r["seq"] for r in out.collect()) == [1, 3]


def test_dedup_windowed_zero_window_raises(spark):
    import pytest

    df = spark.createDataFrame([("k", ts("2024-01-01T00:00:00"), 1)], ["id", "ts", "seq"])
    with pytest.raises(ValueError, match="time_window"):
        dedup_windowed(df, "id", "ts", 0, ["seq"])


def _join_cfg(**kw):
    return JoinConfig(
        left=JoinSourceConfig("orders", "user_id", 3600, "left"),
        right=JoinSourceConfig("users", "user_id", 3600, "right"),
        **kw,
    )


def test_temporal_join_latest_right_wins(spark):
    left = spark.createDataFrame(
        [("o1", "u1", ts("2024-01-01T10:00:00")),
         ("o2", "u2", ts("2024-01-01T10:05:00"))],
        ["order_id", "user_id", "lts"],
    )
    right = spark.createDataFrame(
        [("u1", "old@x.com", ts("2024-01-01T09:00:00")),
         ("u1", "new@x.com", ts("2024-01-01T09:30:00"))],  # latest wins
        ["user_id", "email", "rts"],
    )
    cfg = _join_cfg(
        output_fields=(
            JoinOutputField("orders", "order_id", "order_id"),
            JoinOutputField("orders", "user_id", "user_id"),
            JoinOutputField("users", "email", "email"),
        )
    )
    out = temporal_join_batch(left, right, cfg, right_ts_col="rts")
    rows = out.collect()
    assert len(rows) == 1  # u2 unmatched -> dropped (inner semantics)
    assert rows[0]["email"] == "new@x.com"


def test_temporal_join_right_overwrites_on_collision(spark):
    left = spark.createDataFrame([("u1", "left_name")], ["user_id", "name"])
    right = spark.createDataFrame([("u1", "right_name")], ["user_id", "name"])
    cfg = _join_cfg()
    out = temporal_join_batch(left, right, cfg)
    assert out.columns == ["user_id", "name"]
    assert out.collect()[0]["name"] == "right_name"


def test_asof_join(spark):
    trades = spark.createDataFrame(
        [("A", ts("2024-01-01T10:00:05"), 100),
         ("A", ts("2024-01-01T10:00:30"), 200),
         ("B", ts("2024-01-01T10:00:10"), 300)],
        ["sym", "tts", "qty"],
    )
    quotes = spark.createDataFrame(
        [("A", ts("2024-01-01T10:00:00"), 1.0),
         ("A", ts("2024-01-01T10:00:20"), 2.0),
         ("B", ts("2024-01-01T10:00:15"), 9.0)],  # after the only B trade
        ["sym", "qts", "px"],
    )
    out = asof_join(trades, quotes, "sym", "tts", "qts", right_cols=["px"], how="left")
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    assert got[("A", 100)] == 1.0
    assert got[("A", 200)] == 2.0
    assert got[("B", 300)] is None


def test_sink_mapping_casts(spark):
    df = spark.createDataFrame(
        [Row(
            id="42",
            when_str="2024-01-01T00:00:00Z",
            when_int=1704067200,
            amount=1.5,
            tags=["a", "b"],
            m={"k": 2.0, "j": 2.5},
        )],
        schema=T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("when_str", T.StringType()),
            T.StructField("when_int", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
        ]),
    )
    mapping = (
        SinkMapping("id", "id_col", "Int32"),
        SinkMapping("when_str", "dt_from_str", "DateTime"),
        SinkMapping("when_int", "dt_from_int", "DateTime"),
        SinkMapping("amount", "amount_str", "String"),
        SinkMapping("tags", "tags_json", "String"),
        SinkMapping("m", "m_col", "Map(String,String)"),
        SinkMapping("missing", "m_null", "Map(String,String)"),
    )
    row = apply_sink_mapping(df, mapping).collect()[0]
    assert row["id_col"] == 42
    assert row["dt_from_str"] == row["dt_from_int"] == ts("2024-01-01T00:00:00")
    assert row["amount_str"] == "1.5"
    assert json.loads(row["tags_json"]) == ["a", "b"]
    # %g formatting: 2.0 -> "2", 2.5 -> "2.5" (mapper/types.go:256-272)
    assert row["m_col"] == {"k": "2", "j": "2.5"}
    # null map -> {} because CH maps can't be NULL (types.go:47-54)
    assert row["m_null"] == {}


def test_validate_json_split(spark):
    fields = (Field("id", "string"), Field("age", "int"))
    payloads = [
        ('{"id":"a","age":30}',),          # valid
        ('{"id":"b"}',),                   # missing age
        ('{"id":"c","age":"not_int"}',),   # wrong type
        ('{broken',),                      # malformed
    ]
    df = spark.createDataFrame(payloads, ["value"])
    ok, dlq = validate_json(df, fields)
    assert ok.count() == 1
    assert ok.collect()[0]["age"] == 30
    errs = sorted(r["error"] for r in dlq.collect())
    assert len(errs) == 3
    assert any("malformed" in e for e in errs)
    assert any("missing" in e for e in errs)
    assert any("not int" in e for e in errs)


def test_versioned_transform_dispatch(spark):
    """R3 (versioned_transformation.go:60-140): rows dispatch to their
    schema version's transform; outputs union with null fill."""
    from clickhouse_etl_spark.operators.transform import apply_versioned_transform

    df = spark.createDataFrame(
        [("a", 10, 1), ("b", 20, 2)], ["name", "amount", "_schema_id"]
    )
    configs = {
        1: TransformConfig(outputs=(TransformOutput("upper(name)", "label", "string"),)),
        2: TransformConfig(
            outputs=(
                TransformOutput("upper(name)", "label", "string"),
                TransformOutput("amount * 2", "doubled", "int64"),
            )
        ),
    }
    out = apply_versioned_transform(df, configs)
    rows = {r["label"]: r for r in out.collect()}
    assert rows["A"]["doubled"] is None      # v1 has no 'doubled' output
    assert rows["B"]["doubled"] == 40
    assert rows["A"]["_schema_id"] == 1 and rows["B"]["_schema_id"] == 2
