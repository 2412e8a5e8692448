"""Type system: source-type normalization and ClickHouse -> Spark mapping.

Ports the *semantics* of the reference's two type tables:

- seven basic source types ``string bool int uint float array map``
  with precision spellings normalized onto them (reference:
  glassflow-api/internal/constants.go:79-85, kafka_types.go:6-25);
- supported ClickHouse column types and their conversion behavior
  (reference: glassflow-api/internal/constants.go:88-118,
  mapper/types.go:79-225). ``LowCardinality(T)`` is storage-level and
  maps to plain ``T``; ``Nullable(T)`` maps to nullable ``T``.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

BASIC_TYPES = {"string", "bool", "int", "uint", "float", "array", "map", "bytes"}

#: precision spellings -> basic seven (kafka_types.go:6-25)
_NORMALIZE = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "integer": "int",
    "uint8": "uint", "uint16": "uint", "uint32": "uint", "uint64": "uint",
    "float32": "float", "float64": "float", "number": "float",
    "boolean": "bool",
    "object": "map",
    "bytes": "bytes",
}


def normalize_source_type(t: str) -> str:
    t = t.strip().lower()
    if t in BASIC_TYPES:
        return t
    if t in _NORMALIZE:
        return _NORMALIZE[t]
    raise ValueError(f"unsupported source type {t!r}")


#: basic source type -> Spark type used when building the declared schema
_SOURCE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bool": T.BooleanType(),
    "int": T.LongType(),
    "uint": T.LongType(),  # range-checked at validation, stored signed
    "float": T.DoubleType(),
    "array": T.ArrayType(T.StringType()),
    "map": T.MapType(T.StringType(), T.StringType()),
    "bytes": T.BinaryType(),
}


def source_type_to_spark(t: str) -> T.DataType:
    return _SOURCE_TO_SPARK[normalize_source_type(t)]


def fields_to_struct(fields: list) -> T.StructType:
    """Declared schema fields -> StructType (schema_v2.go Field{Name,Type})."""
    return T.StructType(
        [T.StructField(f.name, source_type_to_spark(f.type), True) for f in fields]
    )


_CH_SIMPLE: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # unsigned: widened so the full positive range fits; uint64 keeps
    # LongType with a range check at map time (mapper/utils.go parse helpers)
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    # uint64 values above 2^63-1 don't fit a JVM long; they fail the
    # range-checked cast and route to the DLQ (documented divergence —
    # the reference parses the full uint64 range via strconv.ParseUint)
    "uint64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "datetime": T.TimestampType(),
    "date": T.DateType(),
    "date32": T.DateType(),
    "uuid": T.StringType(),
    "enum8": T.StringType(),
    "enum16": T.StringType(),
}

_RE_LOWCARD = re.compile(r"^lowcardinality\((.*)\)$")
_RE_NULLABLE = re.compile(r"^nullable\((.*)\)$")
_RE_FIXED = re.compile(r"^fixedstring\(\s*\d+\s*\)$")
_RE_DT64 = re.compile(r"^datetime64(\(.*\))?$")
_RE_DT_TZ = re.compile(r"^datetime\(.*\)$")
_RE_ARRAY = re.compile(r"^array\((.*)\)$")
_RE_MAP = re.compile(r"^map\(\s*string\s*,\s*string\s*\)$")


def ch_type_to_spark(ch: str) -> T.DataType:
    """ClickHouse column type spelling -> Spark DataType.

    Covers the reference's supported matrix (constants.go:88-118):
    scalars, FixedString(N), DateTime[64] with precision/tz,
    LowCardinality / Nullable wrappers, Map(String,String), Array(T)
    including Array(Map(String,String)).
    """
    s = ch.strip().lower()
    m = _RE_LOWCARD.match(s)
    if m:
        return ch_type_to_spark(m.group(1))
    m = _RE_NULLABLE.match(s)
    if m:
        return ch_type_to_spark(m.group(1))
    if s in _CH_SIMPLE:
        return _CH_SIMPLE[s]
    if _RE_FIXED.match(s):
        return T.StringType()
    if _RE_DT64.match(s) or _RE_DT_TZ.match(s):
        return T.TimestampType()
    m = _RE_ARRAY.match(s)
    if m:
        return T.ArrayType(ch_type_to_spark(m.group(1)))
    if _RE_MAP.match(s):
        return T.MapType(T.StringType(), T.StringType())
    raise ValueError(f"unsupported ClickHouse column type {ch!r}")


def parse_duration_seconds(d: str | int | float | None) -> float:
    """Go-style duration string ('1h', '30s', '100ms', '2h45m') -> seconds."""
    if d is None:
        return 0.0
    if isinstance(d, (int, float)):
        return float(d)
    s = d.strip().lower()
    if not s:
        return 0.0
    units = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}
    matches = re.findall(r"([0-9]*\.?[0-9]+)\s*(ns|us|µs|ms|s|m|h|d)", s)
    if matches:
        return sum(float(num) * units[unit] for num, unit in matches)
    try:
        return float(s)
    except ValueError as e:
        raise ValueError(f"cannot parse duration {d!r}") from e
