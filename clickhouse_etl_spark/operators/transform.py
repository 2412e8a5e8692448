"""Stateless transform: full reprojection with expression outputs + casts.

Reference semantics (glassflow-api/internal/transformer/json/
transformation.go:50-131): for each configured output column, evaluate
an expression against the input row and cast to the declared output
type; the result contains ONLY the configured outputs (input fields are
dropped unless re-selected). Output types are the reference's
``string | int | int64 | float64 | bool | []string`` set with
permissive cast-to-zero-value semantics (convertType, go:102-131).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..expr import ExprTranslator
from ..spec.model import TransformConfig

_OUTPUT_CASTS = {
    "string": "string",
    "int": "bigint",
    "int64": "bigint",
    "float": "double",
    "float64": "double",
    "bool": "boolean",
    "boolean": "boolean",
}


def _cast_output(col: Column, output_type: str) -> Column:
    t = output_type.strip().lower()
    if t in _OUTPUT_CASTS:
        return col.cast(_OUTPUT_CASTS[t])
    if t in ("[]string", "array", "array(string)"):
        return F.transform(col, lambda x: x.cast("string"))
    raise ValueError(f"unsupported transform output type {output_type!r}")


def apply_transform(df: DataFrame, cfg: TransformConfig) -> DataFrame:
    tr = ExprTranslator(df.schema)
    cols = [
        _cast_output(tr.column(o.expression), o.output_type).alias(o.output_name)
        for o in cfg.outputs
    ]
    return df.select(*cols)


def apply_versioned_transform(
    df: DataFrame,
    configs: dict[int, TransformConfig],
    version_col: str = "_schema_id",
) -> DataFrame:
    """R3 versioned transform dispatch (reference: transformer/versioned/
    versioned_transformation.go:60-140): rows carry a schema-version id
    and each version resolves its own compiled transform; rows whose
    version has no config pass through unchanged semantics — here they
    are dropped from the reprojection (the widest-schema collapse in
    spec/schema_registry.py is the preferred path; this operator exists
    for pipelines that genuinely need per-version outputs).

    Relational formulation: one filtered branch per version, unioned by
    name with missing columns null-filled — no per-row Python dispatch.
    """
    if not configs:
        raise ValueError("versioned transform requires at least one version config")
    branches = []
    for version, cfg in sorted(configs.items()):
        branch = apply_transform(df.filter(F.col(version_col) == version), cfg)
        branches.append(branch.withColumn(version_col, F.lit(version).cast("bigint")))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out
