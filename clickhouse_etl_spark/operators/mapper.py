"""Sink field mapping: source fields -> ClickHouse columns with casts.

Reference semantics (glassflow-api/internal/mapper/mapper.go:37-121 and
mapper/types.go:47-305): per mapping entry, extract the source field
(dot-path capable, literal dotted key tried first), convert to the
destination ClickHouse column type, emit columns in config order.
Notable conversions ported:

- string/int/float -> DateTime/DateTime64: ISO-8601 string, Unix
  seconds int, or fractional Unix float (types.go:156-187);
- map -> Map(String,String): values stringified — ints as %d, floats
  as %g (shortest), bools as %t, nested as JSON (types.go:237-276);
- array -> String: JSON-marshalled (types.go:213-220);
- null/missing passes NULL through, EXCEPT Map columns which become {}
  because ClickHouse maps cannot be NULL (types.go:47-54, 80-88);
- integer range checks for Int8/16/32/64 + UInt8/16/32/64 via bounded
  casts (mapper/utils.go) — out-of-range -> NULL (routed to DLQ by the
  sink's error classifier rather than silently wrapped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..expr.translate import ExprTranslator
from ..spec.model import SinkMapping
from ..spec.types import ch_type_to_spark

_INT_BOUNDS = {
    "int8": (-(2**7), 2**7 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "int64": (-(2**63), 2**63 - 1),
    "uint8": (0, 2**8 - 1),
    "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1),
    "uint64": (0, 2**63 - 1),  # clamped to signed-long range Spark can hold
}


def _fmt_g(c: Column) -> Column:
    """Go's %g float formatting: integral floats print without '.0'."""
    d = c.cast("double")
    return F.when(
        d == F.floor(d), d.cast("bigint").cast("string")
    ).otherwise(d.cast("string"))


def _stringify_any(c: Column, dt: T.DataType) -> Column:
    """Value -> string per the reference's map-stringification rules."""
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return _fmt_g(c)
    if isinstance(dt, T.BooleanType):
        return F.when(c, F.lit("true")).otherwise(F.lit("false"))
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return F.to_json(c)
    return c.cast("string")


def _to_timestamp_any(c: Column, dt: T.DataType) -> Column:
    """The triple-source DateTime parse (types.go:156-187)."""
    if isinstance(dt, T.TimestampType):
        return c
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.timestamp_seconds(c)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return F.timestamp_seconds(c.cast("double"))
    s = c.cast("string")
    return F.coalesce(
        F.try_to_timestamp(s),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.timestamp_seconds(s.try_cast("double")),
    )


def _convert(col: Column, src_dt: T.DataType, ch_type: str) -> Column:
    s = ch_type.strip().lower()
    if s.startswith("lowcardinality(") and s.endswith(")"):
        return _convert(col, src_dt, ch_type.strip()[15:-1])
    if s.startswith("nullable(") and s.endswith(")"):
        return _convert(col, src_dt, ch_type.strip()[9:-1])

    if s.startswith("datetime") or s in ("date", "date32"):
        ts = _to_timestamp_any(col, src_dt)
        return ts.cast("date") if s in ("date", "date32") else ts

    if s in _INT_BOUNDS:
        lo, hi = _INT_BOUNDS[s]
        target = ch_type_to_spark(s)
        if isinstance(src_dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            # integral source: range-check only when the target is narrower
            src_bits = {T.ByteType: 8, T.ShortType: 16, T.IntegerType: 32, T.LongType: 64}[type(src_dt)]
            tgt_bits = int(s.removeprefix("int").removeprefix("uint") or 64)
            if s.startswith("int") and tgt_bits >= src_bits:
                return col.cast(target)
            return F.when((col >= lo) & (col <= hi), col).cast(target)
        v = col.cast("string").try_cast("bigint")
        return F.when((v >= lo) & (v <= hi), v).cast(target)

    if s == "string" or s.startswith("fixedstring") or s in ("uuid", "enum8", "enum16"):
        return _stringify_any(col, src_dt)

    if s.startswith("map("):
        target = ch_type_to_spark(s)
        if isinstance(src_dt, T.MapType):
            converted = F.map_from_arrays(
                F.map_keys(col),
                F.transform(F.map_values(col), lambda v: _stringify_any(v, src_dt.valueType)),
            )
        else:
            converted = F.from_json(col.cast("string"), target)
        # CH maps cannot be NULL -> {} (types.go:47-54)
        return F.coalesce(converted, F.expr("map()")).cast(target)

    if s.startswith("array("):
        inner = s[6:-1]
        if not isinstance(src_dt, T.ArrayType):
            return F.from_json(col.cast("string"), ch_type_to_spark(s))
        if inner.startswith("map("):
            return F.transform(
                col,
                lambda e: F.coalesce(
                    _convert(e, src_dt.elementType, inner), F.expr("map()")
                ),
            )
        return F.transform(col, lambda e: _convert(e, src_dt.elementType, inner))

    return col.cast(ch_type_to_spark(s))


def apply_sink_mapping(df: DataFrame, mapping: list[SinkMapping] | tuple[SinkMapping, ...]) -> DataFrame:
    """Project the DataFrame into the sink's column layout.

    array -> String columns are JSON-marshalled (types.go:213-220);
    every output column is aliased to its ClickHouse column name.
    """
    tr = ExprTranslator(df.schema)
    out: list[Column] = []
    for m in mapping:
        col, _ = tr._resolve_field(m.name)
        # find source dtype for conversion dispatch
        src_dt: T.DataType = T.StringType()
        if m.name in df.schema.fieldNames():
            src_dt = df.schema[m.name].dataType
        else:
            head = m.name.split(".")[0]
            if head in df.schema.fieldNames():
                dt = df.schema[head].dataType
                for p in m.name.split(".")[1:]:
                    if isinstance(dt, T.StructType) and p in dt.fieldNames():
                        dt = dt[p].dataType
                    elif isinstance(dt, T.MapType):
                        dt = dt.valueType
                src_dt = dt
        ch = m.column_type.strip().lower()
        if ch == "string" and isinstance(src_dt, T.ArrayType):
            out.append(F.to_json(col).alias(m.column_name))
        else:
            out.append(_convert(col, src_dt, m.column_type).alias(m.column_name))
    return df.select(*out)
