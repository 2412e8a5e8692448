"""Filter operator: keep rows where a compiled boolean expression is true.

Reference semantics (glassflow-api/internal/filter/json/filter.go:17-54):
the expression is compiled once per pipeline and evaluated per row; rows
where it returns true pass, false are dropped, evaluation errors route
to the DLQ. Here the expression compiles to a Catalyst predicate so
the filter is JVM-side, codegen'd, and pushed down toward the scan when
possible — rows where the predicate evaluates NULL (missing fields) are
dropped, matching "not true".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..expr import ExprTranslator
from ..spec.model import FilterConfig


def apply_filter(df: DataFrame, cfg: FilterConfig) -> DataFrame:
    pred = ExprTranslator(df.schema).predicate(cfg.expression)
    return df.filter(pred)
