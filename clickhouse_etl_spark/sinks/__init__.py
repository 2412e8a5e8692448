"""sinks — ClickHouse batched sink, error classification, DLQ."""

from .errors import Classification, classify_clickhouse_error
from .clickhouse import ClickHouseSink, SinkWriteReport
from .dlq import DLQWriter

__all__ = [
    "Classification",
    "classify_clickhouse_error",
    "ClickHouseSink",
    "SinkWriteReport",
    "DLQWriter",
]
