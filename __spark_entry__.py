"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (the reference's canonical
filter -> dedup -> temporal-join -> mapped-sink chain) at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 plus the large-scale dataops — see
clickhouse_etl_spark/queries.py for the registry and the cross-engine
determinism rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_etl_spark.queries import QUERIES  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Session invariants the operators rely on (the driver may hand us
    a session built elsewhere)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the canonical reference pipeline (filter -> windowed
    dedup -> temporal enrichment join -> sink mapping) over sf0.001."""
    _configure(spark)
    return QUERIES["pipeline_canonical"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(qd.fn) for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in QUERIES.items() if qd.sql is not None}
