"""Pipeline lifecycle: create / stop / resume / edit / terminate.

Parity with the reference's pipeline-management API
(glassflow-api/internal/service/pipeline.go:108-156 create,
426-590 stop/resume/edit-as-stop-reconfigure-resume). In Spark terms a
running pipeline is a StreamingQuery + its checkpoint directory:

- stop   -> graceful ``query.stop()``; state persists in the checkpoint;
- resume -> restart from the same checkpoint (offsets + state resume —
  the at-least-once story the reference builds from ack choreography);
- edit   -> stop, swap the spec, restart. Spark requires the new plan
  to be state-compatible with the checkpoint; incompatible edits get a
  fresh checkpoint (documented: the reference replays from Kafka
  offsets in the same situation);
- terminate -> stop + drop the checkpoint.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..spec.model import PipelineSpec
from .runner import StreamingPipeline


def _await_first_progress(query, timeout_s: float = 30.0) -> None:
    """Block until the restarted query makes progress, terminates
    cleanly (bounded triggers), or fails — raising the failure so the
    caller can rotate the checkpoint. Without this, a state-incompatible
    restart reports success and dies in the background."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if query.exception() is not None:
            raise query.exception()
        if query.recentProgress:
            return
        if not query.isActive:
            return  # terminated without error (availableNow/once runs)
        time.sleep(0.25)


def _fresh_checkpoint_dir(current: str) -> str:
    """Next unused '<dir>-editN' sibling of the current checkpoint."""
    import os

    base = current.rstrip("/")
    n = 1
    while os.path.exists(f"{base}-edit{n}"):
        n += 1
    return f"{base}-edit{n}"


@dataclass
class RunningPipeline:
    spec: PipelineSpec
    checkpoint_dir: str
    query: object  # StreamingQuery
    start_args: dict


@dataclass
class PipelineManager:
    """In-process catalog of running pipelines (the reference keeps this
    in Postgres + an orchestrator; one Spark application holds its own)."""

    pipelines: dict[str, RunningPipeline] = field(default_factory=dict)

    def create(
        self,
        spark: SparkSession,
        spec: PipelineSpec,
        checkpoint_dir: str,
        sources: dict[str, DataFrame],
        ts_cols: dict[str, str],
        sink_fn: Callable[[DataFrame, int], None],
        trigger: Optional[dict] = None,
    ) -> RunningPipeline:
        if spec.pipeline_id in self.pipelines:
            raise ValueError(f"pipeline {spec.pipeline_id!r} already exists")
        runner = StreamingPipeline(spec=spec, checkpoint_dir=checkpoint_dir)
        query = runner.start(spark, sources, ts_cols, sink_fn, trigger)
        rp = RunningPipeline(
            spec=spec,
            checkpoint_dir=checkpoint_dir,
            query=query,
            start_args={
                "sources": sources, "ts_cols": ts_cols,
                "sink_fn": sink_fn, "trigger": trigger,
            },
        )
        self.pipelines[spec.pipeline_id] = rp
        return rp

    def stop(self, pipeline_id: str) -> None:
        rp = self._get(pipeline_id)
        if rp.query.isActive:
            rp.query.stop()
            rp.query.awaitTermination(60)

    def resume(self, spark: SparkSession, pipeline_id: str) -> RunningPipeline:
        rp = self._get(pipeline_id)
        if rp.query.isActive:
            return rp
        runner = StreamingPipeline(spec=rp.spec, checkpoint_dir=rp.checkpoint_dir)
        rp.query = runner.start(
            spark,
            rp.start_args["sources"],
            rp.start_args["ts_cols"],
            rp.start_args["sink_fn"],
            rp.start_args["trigger"],
        )
        return rp

    def edit(
        self, spark: SparkSession, pipeline_id: str, new_spec: PipelineSpec
    ) -> RunningPipeline:
        """stop -> reconfigure -> resume (service/pipeline.go:426-590).

        A state-incompatible edit (e.g. adding/removing a stateful
        operator) makes the resumed query fail against the old
        checkpoint — Spark surfaces that asynchronously in the first
        micro-batch. edit() waits for the restarted query to become
        healthy; on failure it rotates to a fresh checkpoint directory
        and restarts (the analog of the reference replaying from Kafka
        offsets after a reconfigure: at-least-once, state rebuilt)."""
        self.stop(pipeline_id)
        rp = self._get(pipeline_id)
        rp.spec = new_spec
        try:
            out = self.resume(spark, pipeline_id)
            _await_first_progress(out.query)
            return out
        except Exception:  # noqa: BLE001 — any restart failure rotates
            fresh = _fresh_checkpoint_dir(rp.checkpoint_dir)
            rp.checkpoint_dir = fresh
            return self.resume(spark, pipeline_id)

    def terminate(self, pipeline_id: str) -> None:
        self.stop(pipeline_id)
        rp = self.pipelines.pop(pipeline_id)
        shutil.rmtree(rp.checkpoint_dir, ignore_errors=True)

    def status(self) -> dict[str, str]:
        return {
            pid: ("running" if rp.query.isActive else "stopped")
            for pid, rp in self.pipelines.items()
        }

    def _get(self, pipeline_id: str) -> RunningPipeline:
        if pipeline_id not in self.pipelines:
            raise KeyError(f"unknown pipeline {pipeline_id!r}")
        return self.pipelines[pipeline_id]
