"""Batched, idempotent ClickHouse sink for foreachBatch.

Reference semantics (glassflow-api/internal/sink/clickhouse.go:94-752):
buffer to max_batch_size / flush every max_delay_time, one INSERT per
batch, ack on success, classify errors -> NACK-retry (retryable) or
DLQ (permanent), backtick-quote identifiers. Spark mapping:

- buffering/flush cadence -> micro-batch trigger(processingTime=
  max_delay_time) + maxOffsetsPerTrigger ≈ max_batch_size;
- worker-pool parallel mapping -> partition-parallel JDBC writes
  (numPartitions = sink parallelism);
- at-least-once + idempotency -> checkpointing + a deterministic
  ``_batch_id`` column: replays write the same (batch_id, row) keys, so
  a ReplacingMergeTree ORDER BY (batch_id, row_hash) (or any dedup-on
  key) makes redelivery harmless — the design the reference reaches
  with its 3 idempotency layers (SURVEY.md §2.4);
- error classification -> errors.classify_clickhouse_error around the
  write: RETRYABLE re-raises (Spark retries the epoch from the
  checkpoint), PERMANENT/UNKNOWN divert the batch to the DLQ.

The JDBC driver jar is not bundled in this environment; writes fall
back to a parquet "table directory" target so the full control flow
(idempotency column, classification, DLQ diversion) is testable
offline. Point ``jdbc_url`` at a real ClickHouse to go live.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dlq import DLQWriter
from .errors import Classification, classify_clickhouse_error


def quote_ident(name: str) -> str:
    """Backtick-quote a ClickHouse identifier (sink/quote.go:1-18)."""
    return "`" + name.replace("`", "\\`") + "`"


@dataclass
class SinkWriteReport:
    batch_id: int
    rows: int
    outcome: str  # 'written' | 'dlq' | 'retry'
    error: Optional[str] = None


@dataclass
class ClickHouseSink:
    table: str
    jdbc_url: Optional[str] = None          # jdbc:clickhouse://host:port/db
    jdbc_options: dict = field(default_factory=dict)
    parquet_fallback_path: Optional[str] = None
    dlq: Optional[DLQWriter] = None
    write_parallelism: int = 4              # ≈ reference worker pool (GOMAXPROCS-2)
    max_retries: int = 3
    reports: list = field(default_factory=list)

    def _write_once(self, df: DataFrame, batch_id: Optional[int] = None) -> None:
        if self.jdbc_url:
            (
                df.repartition(self.write_parallelism)
                .write.mode("append")
                .format("jdbc")
                .option("url", self.jdbc_url)
                .option("dbtable", quote_ident(self.table))
                .options(**self.jdbc_options)
                .save()
            )
        elif self.parquet_fallback_path:
            # per-epoch directory overwrite: a replayed batch rewrites its
            # own partition instead of appending a second physical copy —
            # the fallback-side equivalent of ReplacingMergeTree collapsing
            # replayed inserts on the real ClickHouse target
            if batch_id is not None:
                batch_dir = f"{self.parquet_fallback_path}/_batch_id={batch_id}"
                df.drop("_batch_id").write.mode("overwrite").parquet(batch_dir)
            else:
                df.write.mode("append").parquet(self.parquet_fallback_path)
        else:
            raise ValueError("ClickHouseSink needs jdbc_url or parquet_fallback_path")

    def write_batch(self, df: DataFrame, batch_id: int) -> SinkWriteReport:
        """foreachBatch body: stamp the idempotency key, write, classify
        failures. Retryable errors re-raise so the streaming engine
        replays the epoch (commit-after-write ordering, exactly the
        reference's NACK path).

        The micro-batch is evaluated exactly once: the row count for the
        success report rides on the write job as an observed metric (no
        post-write recount), and the epoch's target directory comes from
        the ``batch_id`` argument (no driver round-trip to re-read the
        stamp column). At thousands of epochs both used to cost a full
        second evaluation + a collect per batch."""
        from pyspark.sql import Observation

        obs = Observation()
        stamped = df.withColumn("_batch_id", F.lit(batch_id).cast("bigint")).observe(
            obs, F.count(F.lit(1)).alias("rows")
        )
        try:
            self._write_once(stamped, batch_id)
            report = SinkWriteReport(batch_id, obs.get["rows"], "written")
        except Exception as err:  # noqa: BLE001 — classification boundary
            cls = classify_clickhouse_error(err)
            if cls is Classification.RETRYABLE:
                report = SinkWriteReport(batch_id, -1, "retry", str(err)[:500])
                self.reports.append(report)
                raise  # streaming engine retries the epoch from checkpoint
            # permanent/unknown -> DLQ the whole batch payload-wise
            if self.dlq is not None:
                failed = df.select(
                    F.lit("sink").alias("component"),
                    F.lit(f"{cls.value}: {str(err)[:200]}").alias("error"),
                    F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("payload"),
                    F.current_timestamp().alias("dlq_ts"),
                )
                self.dlq.write(failed)
            report = SinkWriteReport(batch_id, df.count(), "dlq", str(err)[:500])
        self.reports.append(report)
        return report

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        def fn(df: DataFrame, batch_id: int) -> None:
            self.write_batch(df, batch_id)

        return fn

    def read_deduped(self, spark) -> DataFrame:
        """Read the parquet-fallback target with replay duplicates
        collapsed: one copy per (_batch_id, row content).

        On real ClickHouse the same guarantee comes from the table
        engine — ReplacingMergeTree ORDER BY (_batch_id, row key)
        collapses replayed inserts at merge time (the design SURVEY.md
        §7.5.4 calls for). This helper is the fallback-side equivalent
        so the at-least-once + idempotent-write story is testable
        offline.
        """
        if not self.parquet_fallback_path:
            raise ValueError("read_deduped applies to the parquet fallback target")
        df = spark.read.parquet(self.parquet_fallback_path)
        return df.dropDuplicates(df.columns)
