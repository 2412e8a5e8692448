"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages — the Spark
side (schema contracts, batch iteration, partition sizing) is real and
tested; the codec itself is stubbed behind ``_decode_bytes`` because
the image/audio libraries are not available in this environment
(clearly marked; swap in PIL/libav there).

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
size skew; repartition by a size-bucketed key upstream when payloads
vary by orders of magnitude so one partition doesn't hold all the
4K videos.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata contract for a multimodal asset column
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("format", T.StringType()),       # png/jpeg/wav/mp4/...
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _decode_bytes(payload: bytes, fmt: str) -> tuple[int, int, int]:
    """STUB — deterministic fake decoder.

    Real deployments replace this with PIL / soundfile / pyav. The
    fake derives (width, height, channels) deterministically from the
    payload so tests are stable. Raises for unknown formats exactly
    like a real codec would.
    """
    if fmt not in ("png", "jpeg", "wav", "mp4"):
        raise NotImplementedError(f"no codec for format {fmt!r} (decode stub)")
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3 if fmt in ("png", "jpeg") else 1)


def attach_asset_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image", fmt: str = "png"
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    return df.withColumn(
        "asset_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        ),
    )


def decode_assets(
    df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode binary assets to shape metadata via Arrow-batched
    mapInPandas. Failed decodes produce decode_ok=false rows instead of
    failing the stage (DLQ-style row-level error isolation)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["asset_meta"]
                fmt = meta["format"] if isinstance(meta, dict) else meta.format
                mt = meta["media_type"] if isinstance(meta, dict) else meta.media_type
                payload = r[payload_col] or b""
                try:
                    w, h, ch = _decode_bytes(bytes(payload), fmt)
                    ok = True
                except NotImplementedError:
                    w = h = ch = None
                    ok = False
                rows.append(
                    {
                        "asset_id": r[id_col],
                        "media_type": mt,
                        "format": fmt,
                        "n_bytes": len(payload),
                        "width": w,
                        "height": h,
                        "n_channels": ch,
                        "decode_ok": ok,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
