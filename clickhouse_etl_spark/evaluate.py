"""Ad-hoc expression evaluation + filter validation.

Parity with the reference's UI support endpoints
(POST /api/v1/transform/expression/evaluate ->
glassflow-api/internal/api/evaluate_transform.go:39-69 and
POST /api/v1/filter/validate -> api/validate_filter.go, core at
filter/validate.go:14-94): evaluate a single expression against one
sample JSON document, or validate that a filter expression compiles
and returns a boolean over the declared schema.

Spark formulation: build a one-row DataFrame from the sample (or a
zero-value row from the declared fields, mirroring validate.go:19-31)
and run the translated Column.
"""

from __future__ import annotations

import json
from typing import Any, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .expr import ExprTranslator
from .expr.parser import ExprSyntaxError, parse
from .expr.translate import ExprTranslationError
from .spec.model import Field
from .spec.types import fields_to_struct

#: zero values per basic type (filter/validate.go:19-31 builds the same)
_ZERO: dict[str, Any] = {
    "string": "", "bool": False, "int": 0, "uint": 0, "float": 0.0,
    "array": [], "map": {}, "bytes": b"",
}


def _infer_schema(sample: dict) -> T.StructType:
    fields = []
    for k, v in sample.items():
        if isinstance(v, bool):
            dt: T.DataType = T.BooleanType()
        elif isinstance(v, int):
            dt = T.LongType()
        elif isinstance(v, float):
            dt = T.DoubleType()
        elif isinstance(v, list):
            dt = T.ArrayType(T.StringType())
            v = [str(x) for x in v]
        elif isinstance(v, dict):
            if all(isinstance(x, (str, int, float, bool)) for x in v.values()):
                dt = T.MapType(T.StringType(), T.StringType())
            else:
                dt = T.MapType(T.StringType(), T.StringType())
        else:
            dt = T.StringType()
        fields.append(T.StructField(k, dt, True))
    return T.StructType(fields)


def evaluate_expression(
    spark: SparkSession, expression: str, sample_json: str | dict
) -> Any:
    """Evaluate one expression against one sample document; returns the
    scalar result (evaluate_transform.go semantics)."""
    sample = json.loads(sample_json) if isinstance(sample_json, str) else sample_json
    schema = _infer_schema(sample)
    row = {
        f.name: (
            {str(k): str(v) for k, v in sample[f.name].items()}
            if isinstance(f.dataType, T.MapType) and isinstance(sample.get(f.name), dict)
            else sample.get(f.name)
        )
        for f in schema.fields
    }
    df = spark.createDataFrame([row], schema=schema)
    col = ExprTranslator(schema).column(expression)
    return df.select(col.alias("result")).collect()[0]["result"]


def validate_filter(
    fields: Sequence[Field] | Sequence[tuple[str, str]], expression: str
) -> tuple[bool, str]:
    """Compile-check a filter expression against declared fields;
    returns (ok, message). Mirrors filter/validate.go:14-94: syntax
    errors and non-boolean results are rejected without running data."""
    fs = [f if isinstance(f, Field) else Field(f[0], f[1]) for f in fields]
    schema = fields_to_struct(fs)
    try:
        parse(expression)
        ExprTranslator(schema).predicate(expression)
    except (ExprSyntaxError, ExprTranslationError) as e:
        return False, str(e)
    return True, "ok"
