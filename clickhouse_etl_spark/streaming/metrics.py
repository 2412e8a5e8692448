"""Streaming observability: per-query throughput/state metrics +
component signals.

The reference exports per-component throughput and DLQ counters (they
drive the scaling guide's replica sizing) and emits ComponentSignals on
back-pressure with a cooldown (processor/streaming_component.go:
183-263: RecordBackpressureStart/Stop, 'stream back-pressure' signal at
most once per cooldown window). Spark surfaces the raw numbers through
StreamingQueryListener progress events; this collector keeps a bounded
in-memory window per query and derives the same signals:

- input/process rate (rows/s) — the replica-count signal,
- batch duration vs trigger interval — the back-pressure signal: a
  micro-batch that takes longer than the trigger cadence (or processes
  slower than input arrives) is exactly the condition the reference's
  write-retry loop externalizes,
- intake throttling — numInputRows pinned at maxOffsetsPerTrigger
  means the source has a backlog (C4 intake cap engaged),
- state rows/memory — join/dedup state growth signal,
- query termination with an exception — the component-death signal.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql.streaming import StreamingQueryListener

#: signal cooldown, mirroring backpressureSignalCooldown
DEFAULT_SIGNAL_COOLDOWN_S = 30.0


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


@dataclass
class ComponentSignal:
    component: str
    reason: str
    text: str
    ts: float


class PipelineMetricsListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(listener)``.

    ``trigger_interval_ms``: the micro-batch cadence; batches exceeding
    it flag back-pressure. ``max_offsets_per_trigger``: the C4 intake
    cap; batches pinned at it flag throttling. ``on_signal``: callback
    for derived signals (the reference's signalPublisher seam).
    """

    def __init__(
        self,
        window: int = 256,
        trigger_interval_ms: Optional[int] = None,
        max_offsets_per_trigger: Optional[int] = None,
        on_signal: Optional[Callable[[ComponentSignal], None]] = None,
        signal_cooldown_s: float = DEFAULT_SIGNAL_COOLDOWN_S,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.window = window
        self.trigger_interval_ms = trigger_interval_ms
        self.max_offsets_per_trigger = max_offsets_per_trigger
        self.on_signal = on_signal
        self.signal_cooldown_s = signal_cooldown_s
        self.clock = clock
        self.batches: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self.signals: deque = deque(maxlen=window)
        self._bp_active: dict[str, float] = {}       # query -> start ts
        self._last_signal_ts: dict[tuple, float] = {}  # (query, reason) -> ts

    # -- signal plumbing ----------------------------------------------
    def _emit(self, query: str, reason: str, text: str, cooldown: bool = True) -> None:
        now = self.clock()
        key = (query, reason)
        if cooldown and now - self._last_signal_ts.get(key, -1e18) < self.signal_cooldown_s:
            return
        self._last_signal_ts[key] = now
        sig = ComponentSignal(component=query, reason=reason, text=text, ts=now)
        self.signals.append(sig)
        if self.on_signal is not None:
            self.on_signal(sig)

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
        name = str(p.name or p.id)
        num_rows = p.numInputRows or 0
        in_rate = p.inputRowsPerSecond or 0.0
        proc_rate = p.processedRowsPerSecond or 0.0
        self.batches[name].append(
            BatchMetric(
                query_name=name,
                batch_id=p.batchId,
                num_input_rows=num_rows,
                input_rows_per_second=in_rate,
                process_rows_per_second=proc_rate,
                batch_duration_ms=duration,
                state_rows=state_rows,
                state_memory_bytes=state_mem,
            )
        )

        # back-pressure: the batch can't keep up with the trigger cadence
        # (or with the arrival rate when no cadence is configured)
        lagging = (
            self.trigger_interval_ms is not None
            and duration > self.trigger_interval_ms
        ) or (in_rate > 0 and proc_rate > 0 and proc_rate < in_rate)
        if lagging:
            if name not in self._bp_active:
                self._bp_active[name] = self.clock()
            self._emit(
                name,
                "stream back-pressure",
                f"batch {p.batchId} ran {duration}ms"
                f" (trigger {self.trigger_interval_ms}ms,"
                f" in {in_rate:.0f}/s, proc {proc_rate:.0f}/s)",
            )
        elif name in self._bp_active:
            lasted = self.clock() - self._bp_active.pop(name)
            self._emit(
                name,
                "back-pressure cleared",
                f"back-pressure lasted {lasted:.1f}s",
                cooldown=False,
            )

        # intake throttling: batch pinned at the C4 cap -> source backlog
        if (
            self.max_offsets_per_trigger is not None
            and num_rows >= self.max_offsets_per_trigger
        ):
            self._emit(
                name,
                "intake throttled",
                f"batch {p.batchId} hit maxOffsetsPerTrigger="
                f"{self.max_offsets_per_trigger}",
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        exc = getattr(event, "exception", None)
        if exc:
            self._emit(
                str(event.id), "query terminated with error", str(exc), cooldown=False
            )

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
                "backpressure_active": name in self._bp_active,
            }
        return out
