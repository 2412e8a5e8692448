"""Temporal join on the transformWithStateInPandas API (Spark 4).

Same semantics as streaming/temporal_join.py (latest-wins right buffer,
left pending queue, TTL expiry — reference algorithm at
glassflow-api/internal/join/temporal.go:119-291) expressed on the
modern arbitrary-stateful API: typed state variables (ValueState for
the right buffer, ListState for pending lefts) with native state TTL
instead of hand-rolled timestamp pruning. Preferred for new
deployments; the applyInPandasWithState variant remains for engines
without the new API.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # Spark 4 API; its state protocol additionally needs protobuf
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover — older Spark or no protobuf
    StatefulProcessor = object  # type: ignore[assignment]
    HAS_TWS = False

from ..spec.model import JoinConfig
from .temporal_join import _tagged_union

_RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("us", T.LongType()),
    ]
)
_LEFT_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("us", T.LongType()),
    ]
)


class _TemporalJoinProcessor(StatefulProcessor):
    def __init__(self, cfg: JoinConfig, out_fields: list[tuple[str, str, str]]):
        self.cfg = cfg
        self.out_fields = out_fields
        self.left_ttl_us = int(cfg.left.time_window_s * 1_000_000)
        self.right_ttl_us = int(cfg.right.time_window_s * 1_000_000)

    def init(self, handle: "StatefulProcessorHandle") -> None:
        ttl_ms = max(self.left_ttl_us, self.right_ttl_us) // 1000 * 2 or 60_000
        self.right = handle.getValueState("right", _RIGHT_SCHEMA, ttlDurationMs=ttl_ms)
        self.pending = handle.getListState("pending", _LEFT_SCHEMA, ttlDurationMs=ttl_ms)

    def _emit(self, left_row: dict, right_row: dict) -> dict:
        out: dict[str, Any] = {}
        for source_id, name, out_name in self.out_fields:
            src = left_row if source_id == self.cfg.left.source_id else right_row
            out[out_name] = src.get(name)
        return out

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:  # noqa: N802
        right_state = self.right.get() if self.right.exists() else None
        right_json, right_us = (right_state[0], right_state[1]) if right_state else (None, None)
        pending = [(r[1], r[0]) for r in self.pending.get()] if self._has_pending() else []

        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["_us", "_side"], kind="mergesort")

        out_rows: list[dict] = []
        max_us = 0
        for _, r in batch.iterrows():
            us = int(r["_us"]) if pd.notna(r["_us"]) else 0
            max_us = max(max_us, us)
            payload = json.loads(r["_payload"]) if r["_payload"] else {}
            if int(r["_side"]) == 1:  # right: overwrite + drain lefts
                right_json, right_us = r["_payload"], us
                for lus, lj in pending:
                    if self.left_ttl_us == 0 or us - lus <= self.left_ttl_us:
                        out_rows.append(self._emit(json.loads(lj), payload))
                pending = []
            else:  # left: immediate join or buffer
                right_alive = right_json is not None and (
                    self.right_ttl_us == 0 or us - (right_us or 0) <= self.right_ttl_us
                )
                if right_alive:
                    out_rows.append(self._emit(payload, json.loads(right_json)))
                else:
                    pending.append((us, r["_payload"]))

        if self.left_ttl_us:
            pending = [(u, j) for u, j in pending if max_us - u <= self.left_ttl_us]
        if self.right_ttl_us and right_us is not None and max_us - right_us > self.right_ttl_us:
            right_json, right_us = None, None

        if right_json is not None:
            self.right.update((right_json, right_us))
        else:
            self.right.clear()
        self.pending.clear()
        if pending:
            self.pending.put([(j, u) for u, j in pending])

        yield pd.DataFrame(out_rows, columns=[o[2] for o in self.out_fields])

    def _has_pending(self) -> bool:
        try:
            return self.pending.exists()
        except Exception:
            return True

    def close(self) -> None:
        pass


def temporal_join_tws(
    left: DataFrame,
    right: DataFrame,
    cfg: JoinConfig,
    left_ts: str,
    right_ts: str,
    output_schema: T.StructType,
) -> DataFrame:
    """transformWithStateInPandas wiring; requires Spark 4 (HAS_TWS)."""
    if not HAS_TWS:
        raise RuntimeError("transformWithStateInPandas requires Spark 4")
    out_fields = [(r.source_id, r.name, r.output_name) for r in cfg.output_fields]
    if not out_fields:
        raise ValueError("streaming temporal join requires explicit output_fields")
    union = _tagged_union(left, right, cfg, left_ts, right_ts)
    return union.groupBy("_key").transformWithStateInPandas(
        statefulProcessor=_TemporalJoinProcessor(cfg, out_fields),
        outputStructType=output_schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )
