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
) -> tuple[DataFrame, DataFrame]:
    """Split a frame of raw JSON strings into (typed valid rows, DLQ rows).

    A row is valid iff the payload parses as a JSON object, every
    declared field is present (literal dotted key OR nested path), and
    every present value coerces to the declared type. Type-coercion
    failure detection: the typed parse yields NULL where the lenient
    string parse yields a value.
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
    ok = tagged.filter(F.col("_verror").isNull()).select("_typed.*")
    bad = dlq_frame(
        tagged.filter(F.col("_verror").isNotNull()),
        component,
        F.col("_verror"),
        raw,
    )
    return ok, bad
