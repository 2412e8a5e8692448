"""Derived component signals from streaming progress events
(reference: processor/streaming_component.go:183-263 — back-pressure
start/stop with cooldown, intake throttling)."""

from types import SimpleNamespace

from clickhouse_etl_spark.streaming.metrics import PipelineMetricsListener


def _progress(batch_id, duration_ms, in_rate=0.0, proc_rate=0.0, rows=100,
              name="q1"):
    p = SimpleNamespace(
        name=name, id="id1", batchId=batch_id, numInputRows=rows,
        inputRowsPerSecond=in_rate, processedRowsPerSecond=proc_rate,
        durationMs={"triggerExecution": duration_ms}, stateOperators=[],
    )
    return SimpleNamespace(progress=p)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_backpressure_signal_with_cooldown_and_clear():
    clock = Clock()
    sigs = []
    lst = PipelineMetricsListener(
        trigger_interval_ms=1000, on_signal=sigs.append,
        signal_cooldown_s=30, clock=clock,
    )
    # three slow batches inside one cooldown window -> ONE signal
    lst.onQueryProgress(_progress(1, 5000))
    clock.t += 5
    lst.onQueryProgress(_progress(2, 5000))
    clock.t += 5
    lst.onQueryProgress(_progress(3, 5000))
    assert [s.reason for s in sigs] == ["stream back-pressure"]
    assert lst.snapshot("q1")["q1"]["backpressure_active"]

    # cooldown expires -> signal again
    clock.t += 31
    lst.onQueryProgress(_progress(4, 5000))
    assert [s.reason for s in sigs] == ["stream back-pressure"] * 2

    # fast batch clears it (no cooldown on the stop signal)
    clock.t += 1
    lst.onQueryProgress(_progress(5, 100))
    assert sigs[-1].reason == "back-pressure cleared"
    assert not lst.snapshot("q1")["q1"]["backpressure_active"]


def test_processing_slower_than_input_flags_backpressure():
    sigs = []
    lst = PipelineMetricsListener(on_signal=sigs.append, clock=Clock())
    lst.onQueryProgress(_progress(1, 100, in_rate=1000.0, proc_rate=400.0))
    assert sigs and sigs[0].reason == "stream back-pressure"


def test_intake_throttle_signal():
    sigs = []
    lst = PipelineMetricsListener(
        max_offsets_per_trigger=1000, on_signal=sigs.append, clock=Clock()
    )
    lst.onQueryProgress(_progress(1, 100, rows=1000))
    assert [s.reason for s in sigs] == ["intake throttled"]
    lst.onQueryProgress(_progress(2, 100, rows=500))  # below cap -> nothing
    assert len(sigs) == 1


def test_terminated_with_exception_signals():
    sigs = []
    lst = PipelineMetricsListener(on_signal=sigs.append, clock=Clock())
    lst.onQueryTerminated(SimpleNamespace(id="id1", exception="boom"))
    assert sigs[-1].reason == "query terminated with error"
    lst.onQueryTerminated(SimpleNamespace(id="id1", exception=None))
    assert len(sigs) == 1
