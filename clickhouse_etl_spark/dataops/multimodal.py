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


_KNOWN_FORMATS = ("png", "jpeg", "wav", "mp4")


def _meta_field(m, name: str):
    # struct cells arrive as dicts via Arrow; Rows when built driver-side
    return m[name] if isinstance(m, dict) else getattr(m, name)


def decode_assets(
    df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode binary assets to shape metadata via Arrow-batched
    mapInPandas. Failed decodes produce decode_ok=false rows instead of
    failing the stage (DLQ-style row-level error isolation).

    The batch loop is columnar: metadata fields and byte lengths are
    extracted as whole Series, and only rows with a known format reach
    the codec — as a zip over plain arrays, not ``iterrows`` (per-row
    Series construction is the classic mapInPandas hot-loop killer).
    """
    import numpy as np

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            meta = pdf["asset_meta"]
            fmts = meta.map(lambda m: _meta_field(m, "format"))
            mts = meta.map(lambda m: _meta_field(m, "media_type"))
            payloads = pdf[payload_col].map(
                lambda b: b if isinstance(b, bytes) else (b"" if b is None else bytes(b))
            )
            n_bytes = payloads.map(len).astype("int64")

            width = np.full(n, None, dtype=object)
            height = np.full(n, None, dtype=object)
            channels = np.full(n, None, dtype=object)
            ok = np.zeros(n, dtype=bool)

            decodable = fmts.isin(_KNOWN_FORMATS).to_numpy()
            idxs = np.flatnonzero(decodable)
            # codec seam: per-row by nature (swap _decode_bytes for
            # PIL/soundfile/pyav); corrupt payloads flip decode_ok only
            for i, payload, fmt in zip(
                idxs, payloads.to_numpy()[idxs], fmts.to_numpy()[idxs]
            ):
                try:
                    width[i], height[i], channels[i] = _decode_bytes(payload, fmt)
                    ok[i] = True
                except Exception:  # noqa: BLE001 — row-level isolation
                    pass

            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": mts,
                    "format": fmts,
                    "n_bytes": n_bytes,
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "n_channels": pd.array(channels, dtype="Int32"),
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
