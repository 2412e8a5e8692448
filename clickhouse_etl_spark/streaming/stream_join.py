"""Symmetric watermarked stream-stream join — the built-in alternative
to the faithful stateful temporal join.

SURVEY.md §2.5 option 1: ``left JOIN right`` with watermarks on both
sides and a time-range condition approximates the reference's
windowing but emits ALL right matches inside the window rather than
latest-wins. Use it when multi-match enrichment is acceptable — it is
pure built-in Spark (state managed by the join operator, no Python),
so it scales with zero custom code. For exact reference semantics use
streaming/temporal_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec.model import JoinConfig


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    cfg: JoinConfig,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    from ..operators.dedup import _key_col

    lw_s = int(cfg.left.time_window_s) or 3600
    rw_s = int(cfg.right.time_window_s) or 3600
    # materialize the (dual-resolved, dot-path capable) join keys as
    # helper columns so the aliased join condition can't re-resolve a
    # literal dotted key differently than the batch form does
    left = left.withColumn("_jk", _key_col(left, cfg.left.key))
    right = right.withColumn("_jk", _key_col(right, cfg.right.key))
    lw = left.withWatermark(left_ts, f"{lw_s} seconds").alias("l")
    rw = right.withWatermark(right_ts, f"{rw_s} seconds").alias("r")

    cond = (
        (F.col("l._jk") == F.col("r._jk"))
        # right row is joinable while inside either side's buffer window
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {rw_s} SECONDS"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lw_s} SECONDS"))
    )
    joined = lw.join(rw, cond, "inner")

    if cfg.output_fields:
        cols = []
        for rule in cfg.output_fields:
            side = "l" if rule.source_id == cfg.left.source_id else "r"
            cols.append(F.col(f"{side}.{rule.name}").alias(rule.output_name))
        return joined.select(*cols)
    return joined.drop("_jk")
