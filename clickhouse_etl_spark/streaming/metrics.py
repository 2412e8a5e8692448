"""Streaming observability: per-query throughput/state metrics.

The reference exports per-component throughput and DLQ counters (it
drives the scaling guide's replica sizing). Spark surfaces the same
signals through StreamingQueryListener progress events; this collector
keeps a bounded in-memory window per query with the fields that matter
for sizing decisions:

- input/process rate (rows/s) — the replica-count signal,
- batch duration vs trigger interval — backpressure signal,
- state rows/memory — join/dedup state growth signal.
"""

from __future__ import annotations

from collections import defaultdict, deque
from dataclasses import dataclass
from typing import Optional

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    batch_duration_ms: int
    state_rows: int
    state_memory_bytes: int


class PipelineMetricsListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(listener)``."""

    def __init__(self, window: int = 256):
        self.window = window
        self.batches: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    # -- listener callbacks ------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = 0
        state_mem = 0
        for op in p.stateOperators or []:
            state_rows += op.numRowsTotal or 0
            state_mem += op.memoryUsedBytes or 0
        duration = (p.durationMs or {}).get("triggerExecution", 0)
        name = p.name or p.id
        self.batches[str(name)].append(
            BatchMetric(
                query_name=str(name),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows or 0,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                process_rows_per_second=p.processedRowsPerSecond or 0.0,
                batch_duration_ms=duration,
                state_rows=state_rows,
                state_memory_bytes=state_mem,
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- read side ----------------------------------------------------
    def snapshot(self, query_name: Optional[str] = None) -> dict:
        """Aggregated view: totals + sustained rates per query."""
        out = {}
        for name, dq in self.batches.items():
            if query_name and name != query_name:
                continue
            total_rows = sum(b.num_input_rows for b in dq)
            total_ms = sum(b.batch_duration_ms for b in dq)
            out[name] = {
                "batches": len(dq),
                "total_input_rows": total_rows,
                "sustained_rows_per_sec": (
                    total_rows / (total_ms / 1000.0) if total_ms else 0.0
                ),
                "last_state_rows": dq[-1].state_rows if dq else 0,
                "last_state_memory_bytes": dq[-1].state_memory_bytes if dq else 0,
            }
        return out
