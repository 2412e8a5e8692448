"""Faithful streaming temporal join: latest-wins right buffer + left
pending queue, per key, with TTL expiry.

This is the one operator whose semantics Spark's built-in stream-stream
join cannot express (it would emit *all* right matches in the window,
not latest-wins; reference algorithm at
glassflow-api/internal/join/temporal.go:119-291):

- right event arrives: overwrite the key's right buffer (latest wins),
  then drain ALL buffered lefts for that key -> emit joined rows;
- left event arrives: if a right value exists -> join + emit
  immediately (the left is consumed, never buffered); else buffer it;
- buffers expire after their side's time_window; expired rows vanish
  (inner-join behavior).

Implementation: both streams union into one tagged stream; groupBy(key)
.applyInPandasWithState keeps {latest right, pending lefts} per key.
Within a micro-batch, rows process in event-time order (batch stands in
for arrival order — same tie-break the batch oracle documents).
State is sharded by key across executors — unlike the reference, which
pins the join to a single replica (scaling/page.mdx:211), this scales
horizontally; ordering guarantees are per-key, which is exactly what
the KV-buffer algorithm provides anyway.

Expiry uses event time relative to the maximum timestamp seen per key
(processing-time TTL in the reference — the documented semantic shift,
SURVEY.md §7.5.2) plus a processing-time state timeout as a GC
backstop for keys that stop receiving events.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..spec.model import JoinConfig

#: state layout: latest right row (JSON), its µs timestamp, and the
#: pending left rows as (µs, JSON) pairs
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("right_json", T.StringType()),
        T.StructField("right_us", T.LongType()),
        T.StructField("left_us", T.ArrayType(T.LongType())),
        T.StructField("left_json", T.ArrayType(T.StringType())),
    ]
)


def _tagged_union(
    left: DataFrame, right: DataFrame, cfg: JoinConfig, left_ts: str, right_ts: str
) -> DataFrame:
    # keys go through the same dual literal-dotted/nested-path
    # resolution as the batch join/dedup (a key spelled 'a.b' may be a
    # literal top-level column) — raw F.col would resolve differently
    # in streaming than in batch
    from ..operators.dedup import _key_col

    l_payload = F.to_json(F.struct(*[F.col(c) for c in left.columns]))
    r_payload = F.to_json(F.struct(*[F.col(c) for c in right.columns]))
    lhs = left.select(
        _key_col(left, cfg.left.key).cast("string").alias("_key"),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("_us"),
        F.lit(0).alias("_side"),  # left
        l_payload.alias("_payload"),
    )
    rhs = right.select(
        _key_col(right, cfg.right.key).cast("string").alias("_key"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_us"),
        F.lit(1).alias("_side"),  # right
        r_payload.alias("_payload"),
    )
    return lhs.unionByName(rhs)


def _make_processor(
    cfg: JoinConfig,
    out_fields: list[tuple[str, str, str]],
    state_gc_timeout_ms: int | None,
):
    left_ttl_us = int(cfg.left.time_window_s * 1_000_000)
    right_ttl_us = int(cfg.right.time_window_s * 1_000_000)
    left_sid = cfg.left.source_id

    def emit(left_row: dict, right_row: dict) -> dict:
        out: dict[str, Any] = {}
        for source_id, name, out_name in out_fields:
            src = left_row if source_id == left_sid else right_row
            out[out_name] = src.get(name)
        return out

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[o[2] for o in out_fields])
            return

        if state.exists:
            right_json, right_us, left_us, left_json = state.get
            pending = list(zip(left_us or [], left_json or []))
        else:
            right_json, right_us, pending = None, None, []

        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        rows = rows.sort_values(["_us", "_side"], kind="mergesort")

        out_rows: list[dict] = []
        max_us = 0
        # plain tuples, not iterrows: per-row Series construction dominates
        # the state loop otherwise
        for row_us, row_side, row_payload in rows[["_us", "_side", "_payload"]].itertuples(
            index=False, name=None
        ):
            us = int(row_us) if pd.notna(row_us) else 0
            max_us = max(max_us, us)
            payload = json.loads(row_payload) if row_payload else {}
            if int(row_side) == 1:
                # right arrival: overwrite buffer, drain ALL pending lefts
                right_json, right_us = row_payload, us
                still_alive = [
                    (lus, lj) for lus, lj in pending if us - lus <= left_ttl_us or left_ttl_us == 0
                ]
                for _lus, lj in still_alive:
                    out_rows.append(emit(json.loads(lj), payload))
                pending = []
            else:
                # left arrival: join immediately if right alive, else buffer
                right_alive = (
                    right_json is not None
                    and (right_ttl_us == 0 or us - (right_us or 0) <= right_ttl_us)
                )
                if right_alive:
                    out_rows.append(emit(payload, json.loads(right_json)))
                else:
                    pending.append((us, row_payload))

        # expire buffered lefts and the right value relative to max seen ts
        if left_ttl_us:
            pending = [(lus, lj) for lus, lj in pending if max_us - lus <= left_ttl_us]
        if right_ttl_us and right_us is not None and max_us - right_us > right_ttl_us:
            right_json, right_us = None, None

        if right_json is None and not pending:
            state.remove()
        else:
            state.update(
                (
                    right_json,
                    right_us,
                    [lus for lus, _ in pending],
                    [lj for _, lj in pending],
                )
            )
            # GC backstop for keys that go quiet — ONLY when configured:
            # a registered processing-time timer keeps an availableNow
            # query alive with empty epochs until it fires, so
            # bounded/batch-parity runs must leave it off (event-time
            # pruning above already caps state for active keys)
            if state_gc_timeout_ms is not None:
                state.setTimeoutDuration(state_gc_timeout_ms)

        yield pd.DataFrame(out_rows, columns=[o[2] for o in out_fields])

    return process


def temporal_join_streaming(
    left: DataFrame,
    right: DataFrame,
    cfg: JoinConfig,
    left_ts: str,
    right_ts: str,
    output_schema: T.StructType,
    state_gc_timeout_ms: int | None = None,
) -> DataFrame:
    """Wire the tagged-union stateful processor; ``output_schema`` must
    cover cfg.output_fields' names/types.

    ``state_gc_timeout_ms``: optional processing-time GC for keys that
    stop receiving events (long-running continuous deployments). Leave
    None for availableNow / bounded runs — registered timers force the
    engine to keep scheduling empty micro-batches until they fire.
    """
    out_fields = [(r.source_id, r.name, r.output_name) for r in cfg.output_fields]
    if not out_fields:
        raise ValueError("streaming temporal join requires explicit output_fields")
    union = _tagged_union(left, right, cfg, left_ts, right_ts)
    return union.groupBy("_key").applyInPandasWithState(
        _make_processor(cfg, out_fields, state_gc_timeout_ms),
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if state_gc_timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
