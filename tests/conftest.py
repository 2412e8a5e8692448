import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "live: smoke tests against real Kafka/ClickHouse endpoints "
        "(skip unless KAFKA_BOOTSTRAP / CLICKHOUSE_JDBC_URL are set)",
    )
    config.addinivalue_line(
        "markers",
        "heavy: artifact-lifecycle / serving-scale tests (index builds,"
        " multi-wave lifecycles, engine-equality sweeps over built"
        " artifacts). Skipped by default so the fast suite fits the"
        " driver's verify window (VERDICT r11 #3); run with -m heavy"
        " or SPARK_GRAFT_HEAVY_TESTS=1. The end-of-round validation"
        " runs BOTH (see CLAUDE.md).",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_HEAVY_TESTS"):
        return
    if "heavy" in (config.getoption("-m") or ""):
        return
    skip_heavy = pytest.mark.skip(
        reason="heavy tier — run with -m heavy or SPARK_GRAFT_HEAVY_TESTS=1"
    )
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip_heavy)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
