"""Schema validation with DLQ routing — schema-on-read over JSON payloads.

Reference semantics (glassflow-api/internal/schema_v2/validate.go:117-230):
every ingested message is checked against the declared field list —
presence AND type of each declared field — in a single precompiled
pass; failures route to the DLQ with the originating component and
error. Dot-named fields match either a literal dotted key or a nested
path (validate.go:64-87).

Spark mapping: ``from_json`` parses against the declared StructType
(malformed JSON -> corrupt record); presence/type checks are Catalyst
boolean columns computed in the same projection; the frame splits into
(valid typed rows, DLQ rows). Everything is JVM-side — the validator
is a projection, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..spec.model import Field
from ..spec.types import fields_to_struct

#: DLQ frame layout (reference: models/dlq.go — component, error, original payload)
DLQ_FIELDS = [
    ("component", T.StringType()),
    ("error", T.StringType()),
    ("payload", T.StringType()),
    ("dlq_ts", T.TimestampType()),
]


def dlq_schema() -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in DLQ_FIELDS])


def dlq_frame(df: DataFrame, component: str, error_col: Column, payload_col: Column) -> DataFrame:
    return df.select(
        F.lit(component).alias("component"),
        error_col.cast("string").alias("error"),
        payload_col.cast("string").alias("payload"),
        F.current_timestamp().alias("dlq_ts"),
    )


def validate_json(
    df: DataFrame,
    fields: list[Field] | tuple[Field, ...],
    value_col: str = "value",
    component: str = "ingestor",
    keep_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split a frame of raw JSON strings into (typed valid rows, DLQ rows).

    A row is valid iff the payload parses as a JSON object, every
    declared field is present (literal dotted key OR nested path), and
    every present value coerces to the declared type. Type-coercion
    failure detection: the typed parse yields NULL where the lenient
    string parse yields a value.

    ``keep_cols``: pass-through columns carried alongside the typed
    payload in the valid frame (e.g. the schema-version id for
    downstream per-version dispatch).
    """
    struct = fields_to_struct(list(fields))
    raw = F.col(value_col).cast("string")

    # typed parse (PERMISSIVE: malformed -> all-null struct)
    typed = F.from_json(raw, struct)
    # lenient parse: every top-level value as a string, for presence checks
    lenient = F.from_json(raw, T.MapType(T.StringType(), T.StringType()))

    checks: list[tuple[Column, str]] = []
    malformed = lenient.isNull()
    checks.append((malformed, "malformed JSON"))

    for f in fields:
        name = f.name
        present = F.map_contains_key(lenient, name)
        typed_val = typed.getField(name)
        if "." in name:
            # nested-path fallback: walk the JSON with get_json_object
            nested = F.get_json_object(raw, "$." + name)
            present = present | nested.isNotNull()
            typed_val = F.coalesce(
                typed_val.cast("string"), nested
            )
        missing = ~F.coalesce(present, F.lit(False))
        checks.append((missing, f"missing field {name!r}"))
        if f.type not in ("string",):
            raw_val = F.coalesce(lenient.getItem(name), F.get_json_object(raw, "$." + name) if "." in name else F.lit(None))
            type_bad = typed_val.isNull() & raw_val.isNotNull() & (raw_val != F.lit("null"))
            checks.append((type_bad, f"field {name!r} is not {f.type}"))

    error = F.lit(None).cast("string")
    for cond, msg in reversed(checks):
        error = F.when(cond, F.lit(msg)).otherwise(error)

    tagged = df.withColumn("_verror", error).withColumn("_typed", typed)
    ok = tagged.filter(F.col("_verror").isNull()).select(
        "_typed.*", *[F.col(c) for c in (keep_cols or [])]
    )
    bad = dlq_frame(
        tagged.filter(F.col("_verror").isNotNull()),
        component,
        F.col("_verror"),
        raw,
    )
    return ok, bad


def validate_json_versioned(
    df: DataFrame,
    versions: dict[int, list[Field] | tuple[Field, ...]],
    value_col: str = "value",
    version_col: str = "_schema_id",
    component: str = "ingestor",
) -> tuple[DataFrame, DataFrame]:
    """Per-version validation for streams interleaving live schema
    versions: each message validates against ITS OWN version's field
    list (reference: schema_v2/validate.go — the validator is resolved
    by the message's schema id), so a v1 message is not failed for
    lacking a field added in v2.

    Unknown or NULL version ids (bare, un-enveloped messages) validate
    against the latest version. Valid rows union to the widest shape
    with version-absent columns null-filled — the widest-schema
    collapse of SURVEY §1.3 — and keep ``version_col`` for downstream
    per-version transform dispatch (apply_versioned_transform).
    """
    if not versions:
        raise ValueError("versioned validation requires at least one version")
    latest = max(versions)
    vids = [F.lit(v) for v in versions]
    resolved = F.when(
        F.col(version_col).isin(*vids), F.col(version_col)
    ).otherwise(F.lit(latest))
    tagged = df.withColumn("_v_resolved", resolved)

    ok_frames, dlq_frames = [], []
    for vid, fields in sorted(versions.items()):
        branch = tagged.filter(F.col("_v_resolved") == vid).drop("_v_resolved")
        ok, bad = validate_json(
            branch,
            fields,
            value_col,
            component=f"{component}:v{vid}",
            keep_cols=[version_col] if version_col in df.columns else None,
        )
        ok_frames.append(ok)
        dlq_frames.append(bad)

    ok_all = ok_frames[0]
    for f in ok_frames[1:]:
        ok_all = ok_all.unionByName(f, allowMissingColumns=True)
    bad_all = dlq_frames[0]
    for f in dlq_frames[1:]:
        bad_all = bad_all.unionByName(f)
    return ok_all, bad_all
