"""Temporal enrichment join (the reference's single join operator) + as-of join.

Reference semantics (glassflow-api/internal/join/temporal.go:119-291,
SURVEY.md §2.5): 2 sources, equi-join on one key per side; the right
side is a latest-wins buffer (new value overwrites), each left event
joins at most once against the current right value; unmatched rows
expire silently (inner-join behavior). Output projection renames
fields per source; right overwrites left on name collision
(join/utils.go:16-60).

Batch oracle form (used for correctness): right deduped to latest per
key — max(ts), ties by a deterministic id — then inner equi-join.
"Latest" must be defined explicitly because arrival order does not
exist in batch (SURVEY.md §7.5.1).

Scale notes: the right side after latest-per-key dedup is typically a
dimension — the planner broadcast-joins it when it fits
(autoBroadcastJoinThreshold / AQE); otherwise a single hash shuffle on
the key for both sides. The as-of variant is a union + window scan:
one shuffle, no per-key loops, no driver collect — survives 100×.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..expr.translate import ExprTranslator
from ..spec.model import JoinConfig


def _resolve(df: DataFrame, name: str):
    col, _ = ExprTranslator(df.schema)._resolve_field(name)
    return col


def latest_per_key(df: DataFrame, key: str, ts_col: str, tiebreak: Sequence[str] = ()) -> DataFrame:
    """Latest-wins buffer materialized in batch: one row per key."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(_resolve(df, key)).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def temporal_join_batch(
    left: DataFrame,
    right: DataFrame,
    cfg: JoinConfig,
    right_ts_col: Optional[str] = None,
    right_tiebreak: Sequence[str] = (),
    left_ts_col: Optional[str] = None,
) -> DataFrame:
    """Batch form of the temporal enrichment join.

    right is reduced to latest-per-key when ``right_ts_col`` is given
    (temporal.go:267-283 overwrite semantics), then inner equi-joined.
    When both ts columns and windows are provided, the match is
    additionally constrained to |left_ts - right_ts| <= left_window +
    right_window (the widest survival envelope of the two TTL buffers).
    """
    if right_ts_col is not None:
        right = latest_per_key(right, cfg.right.key, right_ts_col, right_tiebreak)

    lkey = _resolve(left, cfg.left.key).alias("_jk_l")
    rkey = _resolve(right, cfg.right.key).alias("_jk_r")
    lw = left.withColumn("_jk", lkey)
    rw = right.withColumn("_jk", rkey)

    cond = lw["_jk"] == rw["_jk"]
    if left_ts_col and right_ts_col and (cfg.left.time_window_s or cfg.right.time_window_s):
        envelope = cfg.left.time_window_s + cfg.right.time_window_s
        cond = cond & (
            F.abs(
                F.unix_seconds(lw[left_ts_col].cast("timestamp"))
                - F.unix_seconds(rw[right_ts_col].cast("timestamp"))
            )
            <= F.lit(envelope)
        )

    joined = lw.join(rw, cond, "inner")

    if cfg.output_fields:
        # per-source projection rules; right overwrites left on collision
        # (join/utils.go:16-60)
        out: dict[str, object] = {}
        for rule in cfg.output_fields:
            side = lw if rule.source_id == cfg.left.source_id else rw
            out[rule.output_name] = side[rule.name].alias(rule.output_name)
        return joined.select(*out.values())

    # default projection: all left fields then right fields, right wins
    # on collision, join-key helper dropped
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns]
    out_cols = []
    for c in lcols:
        if c not in rcols:
            out_cols.append(lw[c].alias(c))
    out_cols += [rw[c].alias(c) for c in rcols]
    return joined.select(*out_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
    tolerance_s: Optional[float] = None,
    how: str = "inner",
) -> DataFrame:
    """Distributed as-of join: each left row gets the most recent right
    row with ``right.ts <= left.ts`` (optionally within ``tolerance_s``).

    Implemented as union + partitioned window scan (no per-key loops,
    no broadcast requirement): tag rows, sort each key partition by
    (ts, tag) with right-before-left on ties, and carry the last seen
    right payload forward with ``last(..., ignorenulls)``. One shuffle
    on the key; linear scan per partition — the classic scalable
    formulation for trades/quotes-style enrichment.

    DuckDB oracle equivalent: native ``ASOF JOIN``.
    """
    rcols = list(right_cols) if right_cols is not None else [c for c in right.columns if c not in (key, right_ts)]

    lhs = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts).cast("timestamp"))
    rhs_payload = F.struct(*[F.col(c) for c in rcols], F.col(right_ts).cast("timestamp").alias("_rts"))
    rhs = (
        right.select(
            F.col(key),
            F.col(right_ts).cast("timestamp").alias("_ats"),
            rhs_payload.alias("_rpayload"),
        )
        .withColumn("_tag", F.lit(0))
    )

    lhs_u = lhs.select(
        F.col(key), F.col("_ats"), F.col("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpayload"),
        F.lit(None).cast(rhs.schema["_rpayload"].dataType).alias("_rpayload"),
    )
    rhs_u = rhs.select(
        F.col(key), F.col("_ats"), F.col("_tag"),
        F.lit(None).cast(lhs_u.schema["_lpayload"].dataType).alias("_lpayload"),
        F.col("_rpayload"),
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = lhs_u.unionByName(rhs_u).withColumn(
        "_match", F.last("_rpayload", ignorenulls=True).over(w)
    )

    rows = scanned.filter(F.col("_tag") == 1)
    if tolerance_s is not None:
        rows = rows.withColumn(
            "_match",
            F.when(
                F.col("_match").isNotNull()
                & (
                    F.unix_seconds(F.col("_ats")) - F.unix_seconds(F.col("_match._rts"))
                    <= F.lit(tolerance_s)
                ),
                F.col("_match"),
            ),
        )
    if how == "inner":
        rows = rows.filter(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports inner|left, got {how!r}")

    out = [F.col(f"_lpayload.{c}").alias(c) for c in left.columns]
    out += [F.col(f"_match.{c}").alias(c) for c in rcols]
    return rows.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    key: Optional[str] = None,
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Distributed interval (range) join: left rows match right rows
    whose ``[start, end)`` interval contains ``left_ts`` (plus an
    optional equi-key).

    Naively this is a non-equi theta join — Catalyst plans it as a
    BroadcastNestedLoopJoin (or cartesian), which dies at scale.  The
    scalable formulation buckets time into ``bucket_s``-second cells:
    each right interval explodes to every bucket it overlaps
    (``sequence`` — bounded by interval length / bucket size), the left
    row computes its single containing bucket, and the join becomes an
    EQUI-join on (key, bucket) refined by the exact range predicate.
    Each (left, right) match shares exactly one bucket — the left's —
    so no post-join dedup is needed.  One hash shuffle per side; same
    pattern as Databricks' range-join optimization / Flink's interval
    join.

    Pick ``bucket_s`` near the typical interval length: too small
    explodes the right side, too large degrades to a per-key bucket
    scan (AQE skew-split covers hot buckets).
    """
    bus = int(bucket_s) * 1_000_000  # bucket width in µs; integer div = exact
    rhs = right.withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence(unix_micros(cast(`{start_col}` as timestamp)) div {bus},"
                # end is exclusive: the last overlapped bucket holds end-1µs
                f" (unix_micros(cast(`{end_col}` as timestamp)) - 1) div {bus})"
            )
        ),
    )
    if key is not None:
        rhs = rhs.withColumnRenamed(key, f"_r_{key}")
    lhs = left.withColumn(
        "_bucket", F.expr(f"unix_micros(cast(`{left_ts}` as timestamp)) div {bus}")
    )
    cond = (
        (lhs["_bucket"] == rhs["_bucket"])
        & (F.col(left_ts).cast("timestamp") >= F.col(start_col).cast("timestamp"))
        & (F.col(left_ts).cast("timestamp") < F.col(end_col).cast("timestamp"))
    )
    if key is not None:
        cond = cond & (lhs[key] == rhs[f"_r_{key}"])
    out = lhs.join(rhs, cond, how)
    for c in ["_bucket"] + ([f"_r_{key}"] if key is not None else []):
        out = out.drop(c)
    return out
