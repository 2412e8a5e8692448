"""load_table temporal normalization: the testdata generator has
stored timestamps in different physical forms across rounds (nano-epoch
long, TIMESTAMP_NTZ, TIMESTAMP, DATE); every form must normalize to the
same logical column with identical epoch values."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.sources.batch import load_table

UTC = datetime.timezone.utc
TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 1, 15, 12, 34, 56, 789012),
]
EXPECT_US = [int(t.replace(tzinfo=UTC).timestamp() * 1_000_000) for t in TS]


def _write(tmp_path, name, arrow_type, values):
    d = tmp_path / name
    d.mkdir()
    tbl = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                    "ts": pa.array(values, arrow_type)})
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "arrow_type,values",
    [
        (pa.timestamp("ns"), TS),                       # r1-2 generator
        (pa.timestamp("us"), TS),                       # r3 generator (NTZ)
        (pa.timestamp("us", tz="UTC"), [t.replace(tzinfo=UTC) for t in TS]),
    ],
)
def test_events_ts_normalizes_every_storage_form(spark, tmp_path, arrow_type, values):
    sf_dir = _write(tmp_path, f"form_{str(arrow_type).replace('[','_').replace(']','').replace(':','')}", arrow_type, values)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["us"] for r in df.select(F.unix_micros("ts").alias("us")).orderBy("event_id").collect()]
    assert got == EXPECT_US


def test_orders_orderdate_normalizes_to_ntz(spark, tmp_path):
    d = tmp_path / "orders_date"
    d.mkdir()
    dates = [datetime.date(1996, 1, 1), datetime.date(1997, 6, 15)]
    tbl = pa.table({"o_orderkey": pa.array([1, 2], pa.int64()),
                    "o_orderdate": pa.array(dates, pa.date32())})
    pq.write_table(tbl, str(d / "orders.parquet"))
    df = load_table(spark, str(d), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp_ntz"
    # the comparison form every TPC-H query uses still works
    n = df.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    ).count()
    assert n == 2
