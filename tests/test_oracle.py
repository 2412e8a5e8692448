"""Replays the driver's t2 correctness gate locally: every oracle-backed
query in the registry must match DuckDB exactly (row count, column
names, values) at sf0.001. The driver runs the same comparison at
sf0.01 — this test is the early-warning mirror.
"""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from clickhouse_etl_spark.queries import QUERIES
from clickhouse_etl_spark.sources.batch import TABLES


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


ORACLE_NAMES = [n for n, qd in QUERIES.items() if qd.sql is not None]
ROWS_ONLY_NAMES = [n for n, qd in QUERIES.items() if qd.sql is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    qd = QUERIES[name]
    entry_mod._configure(spark)
    spark_df = qd.fn(spark, sf_dir).toPandas()
    duck_df = ddb.execute(qd.sql).fetchdf()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    )
    s = _normalize(spark_df)
    d = _normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        mismatches = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not _values_equal(a, b)
        ]
        assert not mismatches, f"{name}.{c}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    entry_mod._configure(spark)
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    qs = entry_mod.queries()
    oss = entry_mod.oracle_sql()
    assert set(oss) <= set(qs)
    assert len(qs) >= 20


def test_entry_schema_stable(spark):
    """The driver smoke-checks entry() for a stable schema across runs."""
    a = entry_mod.entry(spark)
    b = entry_mod.entry(spark)
    assert a.schema == b.schema
