"""The engine's scalar-function surface as Catalyst Column builders.

One builder per custom function the reference registers into its
expression VM (reference: glassflow-api/internal/transformer/json/
transformation.go:22-47, implementations in custom_expr_functions.go,
557 LoC). Every builder returns a ``pyspark.sql.Column`` so the whole
expression stays JVM-side under whole-stage codegen — no Python UDFs.

Edge-case parity notes are inline; the general conventions ported from
the reference are: parse failures default to ``0`` / ``0.0`` / ``""`` /
``false`` rather than null, and string tests on missing input are
``false``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _s(c: Column) -> Column:
    """Stringify like Go's cast.ToString: null stays null (guarded by callers)."""
    return c.cast("string")


# --------------------------------------------------------------- URL / query


def parse_query(s: Column) -> Column:
    """URL query string -> Map(String,String); parse error -> empty map.

    Reference: custom_expr_functions.go:16-41. The reference returns
    multi-valued keys as arrays inside map[string]any; a typed Spark map
    keeps the LAST value per key (requires
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN``, set by our session
    builder). Values are percent-decoded; '+' decodes to space.
    """
    cleaned = F.coalesce(_s(s), F.lit(""))
    m = F.str_to_map(cleaned, F.lit("&"), F.lit("="))
    decoded = F.map_from_arrays(
        F.transform(F.map_keys(m), _try_url_decode),
        F.transform(F.map_values(m), _try_url_decode),
    )
    return F.when(cleaned == "", F.expr("map()")).otherwise(decoded)


def _try_url_decode(c: Column) -> Column:
    # '+' means space in query strings; try_url_decode -> null on bad escapes
    plused = F.replace(c.cast("string"), F.lit("+"), F.lit(" "))
    return F.coalesce(F.try_url_decode(plused), F.lit(""))


def get_query_param(s: Column, key: Column) -> Column:
    """Extract one query param (decoded); missing -> ''.

    Reference: custom_expr_functions.go:44-75. Uses Spark's
    ``parse_url(..., 'QUERY', key)`` then decodes.
    """
    url = F.concat(F.lit("http://x/?"), F.coalesce(_s(s), F.lit("")))
    raw = F.parse_url(url, F.lit("QUERY"), key.cast("string"))
    return F.when(raw.isNull(), F.lit("")).otherwise(_try_url_decode(raw))


def url_decode(s: Column) -> Column:
    """Percent-decode; decode error or non-string -> ''.

    Reference: custom_expr_functions.go:340-360 (url.QueryUnescape).
    """
    return F.coalesce(F.try_url_decode(F.replace(_s(s), F.lit("+"), F.lit(" "))), F.lit(""))


def extract_path_type(p: Column) -> Column:
    """Exact-match path classifier.

    Reference: custom_expr_functions.go:78-92 — a *switch on the exact
    path*: '/g/collect' -> 'collect', '/_/set_cookie' -> 'set_cookie',
    anything else -> 'unknown'.
    """
    p = _s(p)
    return (
        F.when(p == "/g/collect", F.lit("collect"))
        .when(p == "/_/set_cookie", F.lit("set_cookie"))
        .otherwise(F.lit("unknown"))
    )


# --------------------------------------------------------------- maps


def has_key_prefix(m: Column, prefixes: Column) -> Column:
    """True iff any map key starts with any prefix; non-map/null -> false.

    Reference: custom_expr_functions.go:95-122.
    """
    hit = F.exists(
        F.map_keys(m),
        lambda k: F.exists(prefixes, lambda p: k.startswith(p.cast("string"))),
    )
    return F.coalesce(hit, F.lit(False))


def has_any_key(m: Column, keys: Column) -> Column:
    """True iff any listed (non-empty) key exists in the map.

    Presence, not non-null value — uses map_contains_key.
    Reference: custom_expr_functions.go:125-152.
    """
    hit = F.exists(
        keys,
        lambda k: (F.length(k.cast("string")) > 0) & F.map_contains_key(m, k.cast("string")),
    )
    return F.coalesce(hit, F.lit(False))


def keys_sorted(m: Column) -> Column:
    """Sorted key list of a map. Reference: custom_expr_functions.go:541-557."""
    return F.array_sort(F.map_keys(m))


# --------------------------------------------------------------- waterfall


def waterfall(*args: Column) -> Column:
    """First non-null, non-empty-string value, stringified; else ''.

    Reference: custom_expr_functions.go:154-191 (also accepts a single
    array argument — the translator expands array literals before
    calling this).
    """
    if not args:
        return F.lit("")
    return F.coalesce(*[F.nullif(_s(a), F.lit("")) for a in args], F.lit(""))


# --------------------------------------------------------------- time


#: Go layouts tried by the reference (custom_expr_functions.go:194-217)
#: mapped to Spark datetime patterns, in the same order.
_ISO_FORMATS = [
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ssXXX",  # RFC3339
]


def parse_iso8601(s: Column) -> Column:
    """Try 4 layouts -> Unix seconds (bigint); failure/empty -> 0.

    Reference: custom_expr_functions.go:194-217. The session timezone is
    UTC, so zone-less layouts parse as UTC exactly like Go's time.Parse.
    """
    s = _s(s)
    parsed = F.coalesce(*[F.try_to_timestamp(s, F.lit(fmt)) for fmt in _ISO_FORMATS])
    return F.coalesce(F.unix_seconds(parsed), F.lit(0).cast("bigint"))


def to_date_str(v: Column) -> Column:
    """time/int/float Unix seconds -> 'YYYY-MM-DD' string.

    Reference: custom_expr_functions.go:220-237. Numeric input is
    truncated toward zero (Go int64 conversion) before timestamp_seconds.
    """
    ts = F.when(
        v.cast("string").rlike(r"^\d{4}-"), F.try_to_timestamp(v.cast("string"))
    ).otherwise(F.timestamp_seconds(v.cast("double").cast("bigint")))
    return F.date_format(ts, "yyyy-MM-dd")


# --------------------------------------------------------------- user agent


def parse_user_agent(ua: Column, field: Column) -> Column:
    """Substring-heuristic UA classifier, exact rule order ported.

    Reference: custom_expr_functions.go:239-338 —
    device: ipad|android-without-mobile -> Tablet; mobile|iphone|android
    -> Mobile; else Desktop.  browser: edg/ -> Edge; chrome|crios ->
    Chrome; firefox|fxios -> Firefox; safari-without-chrome -> Safari;
    else Unknown.  os: iphone|ipad|ipod -> iOS; android -> Android;
    windows -> Windows; 'mac os'|macintosh -> macOS; linux -> Linux;
    else Unknown.  Empty/null UA -> ''.
    """
    lua = F.lower(_s(ua))
    has = lua.contains

    device = (
        F.when(has("ipad") | (has("android") & ~has("mobile")), F.lit("Tablet"))
        .when(has("mobile") | has("iphone") | has("android"), F.lit("Mobile"))
        .otherwise(F.lit("Desktop"))
    )
    browser = (
        F.when(has("edg/"), F.lit("Edge"))
        .when(has("chrome") | has("crios"), F.lit("Chrome"))
        .when(has("firefox") | has("fxios"), F.lit("Firefox"))
        .when(has("safari") & ~has("chrome"), F.lit("Safari"))
        .otherwise(F.lit("Unknown"))
    )
    os_ = (
        F.when(has("iphone") | has("ipad") | has("ipod"), F.lit("iOS"))
        .when(has("android"), F.lit("Android"))
        .when(has("windows"), F.lit("Windows"))
        .when(has("mac os") | has("macintosh"), F.lit("macOS"))
        .when(has("linux"), F.lit("Linux"))
        .otherwise(F.lit("Unknown"))
    )

    field = F.lower(field.cast("string"))
    result = (
        F.when(field == "device", device)
        .when(field == "browser", browser)
        .when(field == "os", os_)
        .otherwise(F.lit(""))
    )
    return F.when(lua.isNull() | (lua == ""), F.lit("")).otherwise(result)


# --------------------------------------------------------------- strings


def to_string(v: Column) -> Column:
    """Reference: custom_expr_functions.go:362-372."""
    return _s(v)


def contains_str(s: Column, sub: Column) -> Column:
    """Substring test; null/empty input -> false (go:374-384)."""
    return F.coalesce(_s(s).contains(_s(sub)), F.lit(False))


def has_prefix(s: Column, pre: Column) -> Column:
    return F.coalesce(_s(s).startswith(_s(pre)), F.lit(False))


def has_suffix(s: Column, suf: Column) -> Column:
    return F.coalesce(_s(s).endswith(_s(suf)), F.lit(False))


def upper(s: Column) -> Column:
    return F.upper(_s(s))


def lower(s: Column) -> Column:
    return F.lower(_s(s))


def trim(s: Column) -> Column:
    return F.trim(_s(s))


def split(s: Column, sep: Column) -> Column:
    """String split on a literal separator -> Array(String).

    Reference: custom_expr_functions.go:449-460. The reference returns
    ``""`` (a string!) for empty input — a dynamic-type quirk a typed
    column can't express; we return ``['']`` (Spark's natural result),
    documented divergence.
    """
    # \Q...\E quotes the separator so it is literal, not regex
    return F.split(_s(s), F.concat(F.lit("\\Q"), _s(sep), F.lit("\\E")), F.lit(-1))


def join(arr: Column, sep: Column | str) -> Column:
    """Array join with element stringification (go:462-483).

    The separator is almost always a config literal; the translator
    passes it through as a plain string (array_join requires one).
    """
    if isinstance(sep, Column):
        # dynamic separator: fold with aggregate, skipping the first element
        strs = F.transform(arr, lambda x: F.coalesce(x.cast("string"), F.lit("")))
        return F.when(F.size(strs) == 0, F.lit("")).otherwise(
            F.concat(
                F.element_at(strs, 1),
                F.aggregate(
                    F.slice(strs, 2, F.greatest(F.size(strs) - 1, F.lit(0))),
                    F.lit(""),
                    lambda acc, x: F.concat(acc, sep.cast("string"), x),
                ),
            )
        )
    return F.array_join(F.transform(arr, lambda x: x.cast("string")), sep)


def replace(s: Column, old: Column, new: Column) -> Column:
    """Replace-all (go:485-498)."""
    return F.replace(_s(s), _s(old), _s(new))


# --------------------------------------------------------------- numbers


def to_int(s: Column) -> Column:
    """atoi; else parse float and truncate; fail -> 0 (go:500-522).

    Note Go does strconv.Atoi first, then ParseFloat + int64() which
    truncates toward zero — floor() would be wrong for negatives.
    """
    s = _s(s)
    return F.coalesce(
        s.try_cast("bigint"),
        s.try_cast("double").cast("bigint"),
        F.lit(0).cast("bigint"),
    )


def to_float(s: Column) -> Column:
    """Parse float; fail -> 0.0 (go:524-539)."""
    return F.coalesce(_s(s).try_cast("double"), F.lit(0.0))


#: registry consumed by the expression translator; names are the exact
#: identifiers the reference registers (transformation.go:22-47).
FUNCTIONS: dict[str, object] = {
    "parseQuery": parse_query,
    "getQueryParam": get_query_param,
    "getNestedParam": get_query_param,  # same extraction semantics (go:44-75)
    "extractPathType": extract_path_type,
    "hasKeyPrefix": has_key_prefix,
    "hasAnyKey": has_any_key,
    "waterfall": waterfall,
    "parseISO8601": parse_iso8601,
    "toDate": to_date_str,
    "parseUserAgent": parse_user_agent,
    "urlDecode": url_decode,
    "toString": to_string,
    "containsStr": contains_str,
    "hasPrefix": has_prefix,
    "hasSuffix": has_suffix,
    "upper": upper,
    "lower": lower,
    "trim": trim,
    "split": split,
    "join": join,
    "replace": replace,
    "toInt": to_int,
    "toFloat": to_float,
    "keys": keys_sorted,
    # expr-lang builtins commonly used in configs ('len' is handled by the
    # translator, which type-dispatches string length vs array/map size)
    "abs": F.abs,
    "int": to_int,
    "float": to_float,
    "string": to_string,
}
