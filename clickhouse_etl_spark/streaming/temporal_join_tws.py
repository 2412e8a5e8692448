"""Temporal join on the transformWithStateInPandas API (Spark 4).

Same semantics as streaming/temporal_join.py (latest-wins right buffer,
left pending queue, TTL expiry — reference algorithm at
glassflow-api/internal/join/temporal.go:119-291) expressed on the
modern arbitrary-stateful API: typed state variables (ValueState for
the right buffer, ListState for pending lefts) with native state TTL
as the GC backstop instead of a registered timer.

The join computation itself is NOT duplicated: both this processor and
the applyInPandasWithState variant call ``temporal_join._make_step`` —
the vectorized searchsorted step over one key's sorted rows and the
columnar state tuple. This module only adapts the state tuple to/from
the TWS typed state variables (ValueState row for the right side,
ListState rows for pending lefts — typed columns, no JSON, no Python
row loops).

Gated by ``HAS_TWS``: the TWS state protocol needs google.protobuf,
which is unavailable in some environments — the applyInPandasWithState
variant is the active path there.
"""

from __future__ import annotations

from typing import Iterator

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
from .temporal_join import _coercer, _make_step, _side_fields, _tagged_union


def _right_schema(r_fields) -> T.StructType:
    return T.StructType(
        [
            T.StructField("has_right", T.BooleanType()),
            T.StructField("right_us", T.LongType()),
            *[T.StructField(f"_r{i}", t) for i, (_, _, t) in enumerate(r_fields)],
        ]
    )


def _pending_schema(l_fields) -> T.StructType:
    return T.StructType(
        [
            T.StructField("us", T.LongType()),
            *[T.StructField(f"_l{i}", t) for i, (_, _, t) in enumerate(l_fields)],
        ]
    )


class _TemporalJoinProcessor(StatefulProcessor):
    """Adapter: TWS typed state <-> the shared columnar state tuple."""

    def __init__(self, step, n_l: int, n_r: int,
                 right_schema: T.StructType, pending_schema: T.StructType,
                 out_names: list[str], ttl_ms: int | None):
        self.step = step
        self.n_l = n_l
        self.n_r = n_r
        self.right_schema = right_schema
        self.pending_schema = pending_schema
        self.out_names = out_names
        self.ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        kw = {"ttlDurationMs": self.ttl_ms} if self.ttl_ms else {}
        self.right = handle.getValueState("right", self.right_schema, **kw)
        self.pending = handle.getListState("pending", self.pending_schema, **kw)

    def _load_state(self) -> tuple | None:
        right = self.right.get() if self.right.exists() else None
        pend = list(self.pending.get()) if self._pending_exists() else []
        if right is None and not pend:
            return None
        if right is None:
            has_right, right_us, st_r = False, None, [None] * self.n_r
        else:
            has_right, right_us = bool(right[0]), right[1]
            st_r = list(right[2 : 2 + self.n_r])
        # ListState rows -> columnar lists (us list + one list per field)
        left_us = [r[0] for r in pend]
        st_l = [[r[1 + i] for r in pend] for i in range(self.n_l)]
        return (has_right, right_us, *st_r, left_us, *st_l)

    def _store_state(self, new_state: tuple | None) -> None:
        self.right.clear()
        self.pending.clear()
        if new_state is None:
            return
        has_right, right_us = new_state[0], new_state[1]
        st_r = new_state[2 : 2 + self.n_r]
        left_us = new_state[2 + self.n_r]
        st_l = new_state[3 + self.n_r :]
        if has_right:
            self.right.update((True, right_us, *st_r))
        if left_us:
            self.pending.put(
                [tuple([u, *(col[i] for col in st_l)]) for i, u in enumerate(left_us)]
            )

    def _pending_exists(self) -> bool:
        try:
            return self.pending.exists()
        except Exception:  # some engine versions lack exists() on ListState
            return True

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:  # noqa: N802
        chunks = list(rows)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        out, new_state = self.step(batch, self._load_state())
        self._store_state(new_state)
        yield out if out is not None else pd.DataFrame(columns=self.out_names)

    def close(self) -> None:
        pass


def temporal_join_tws(
    left: DataFrame,
    right: DataFrame,
    cfg: JoinConfig,
    left_ts: str,
    right_ts: str,
    output_schema: T.StructType,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """transformWithStateInPandas wiring; requires Spark 4 + protobuf
    (``HAS_TWS``).  Same contract as
    ``temporal_join.temporal_join_streaming``; ``state_ttl_ms`` maps to
    native state-variable TTL (GC backstop — event-time pruning inside
    the shared step is the semantic expiry)."""
    if not HAS_TWS:
        raise RuntimeError("transformWithStateInPandas requires Spark 4 + protobuf")
    if not cfg.output_fields:
        raise ValueError("streaming temporal join requires explicit output_fields")
    l_rules = [r for r in cfg.output_fields if r.source_id == cfg.left.source_id]
    r_rules = [r for r in cfg.output_fields if r.source_id != cfg.left.source_id]
    l_fields = _side_fields(left, l_rules)
    r_fields = _side_fields(right, r_rules)
    out_names = [r.output_name for r in cfg.output_fields]

    step = _make_step(
        cfg,
        [o for _, o, _ in l_fields],
        [o for _, o, _ in r_fields],
        [_coercer(t) for _, _, t in l_fields],
        [_coercer(t) for _, _, t in r_fields],
        out_names,
    )
    union = _tagged_union(left, right, cfg, left_ts, right_ts, l_fields, r_fields)
    return union.groupBy("_key").transformWithStateInPandas(
        statefulProcessor=_TemporalJoinProcessor(
            step, len(l_fields), len(r_fields),
            _right_schema(r_fields), _pending_schema(l_fields),
            out_names, state_ttl_ms,
        ),
        outputStructType=output_schema,
        outputMode="Append",
        timeMode="None",
    )
