"""Expression-translator truth tables.

Ported from the *behaviors* exercised by the reference's filter and
transform test corpora (glassflow-api/internal/filter/json/
filter_test.go:17-364 and transformer/json/transformation_test.go):
comparisons per type, and/or/parentheses, nested paths, array indexing,
and each custom scalar function's empty/missing/unparsable defaults.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from clickhouse_etl_spark.expr import ExprTranslator
from clickhouse_etl_spark.expr.parser import ExprSyntaxError, parse


def _one(spark, expr_src, schema=None, row=None):
    if row is None:
        df = spark.range(1)
    else:
        df = spark.createDataFrame([row], schema=schema)
    tr = ExprTranslator(df.schema)
    return df.select(tr.column(expr_src).alias("v")).collect()[0]["v"]


ROW_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("age", T.LongType()),
                    T.StructField("active", T.BooleanType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("container.image.name", T.StringType()),
    ]
)

ROW = Row(
    name="Alice",
    age=30,
    price=19.5,
    is_active=True,
    user=Row(name="Bob", age=17, active=False),
    tags=["audit", "system"],
    attrs={"k1": "v1", "x.y": "z"},
    **{"container.image.name": "nginx"},
)


@pytest.mark.parametrize(
    "src,expected",
    [
        ("age > 18", True),
        ("age >= 30 and price < 20", True),
        ("age < 18 or is_active", True),
        ("not is_active", False),
        ("(age > 18) and (price > 100 or name == 'Alice')", True),
        ("user.age > 18", False),
        ("user.active == false", True),
        ("tags[0] == 'audit'", True),
        ("name != 'Bob'", True),
        ("age % 7 == 2", True),
        ("age ^ 2 == 900.0", True),
        ("'x.y' in keys(attrs)", True),
        ("name matches '^A'", True),
        ("name contains 'lic'", True),
        ("name startsWith 'Al'", True),
        ("name endsWith 'ce'", True),
        ("age in [29, 30, 31]", True),
        ("age not in [1, 2]", True),
        ("len(tags) == 2", True),
        ("len(name) == 5", True),
    ],
)
def test_filter_truth_table(spark, src, expected):
    assert _one(spark, src, ROW_SCHEMA, ROW) is expected


def test_dotted_literal_key_wins(spark):
    # literal dotted top-level key resolves before nested path
    assert _one(spark, "container.image.name", ROW_SCHEMA, ROW) == "nginx"


def test_nested_path_fallback(spark):
    assert _one(spark, "user.name", ROW_SCHEMA, ROW) == "Bob"


def test_missing_field_is_null_dropped_by_filter(spark):
    df = spark.createDataFrame([ROW], schema=ROW_SCHEMA)
    tr = ExprTranslator(df.schema)
    assert df.filter(tr.predicate("nonexistent > 5")).count() == 0


def test_arithmetic_and_ternary(spark):
    assert _one(spark, "1 + 2 * 3") == 7
    assert _one(spark, "(1 + 2) * 3") == 9
    assert _one(spark, "10 / 4") == 2.5
    assert _one(spark, "age > 18 ? 'adult' : 'minor'", ROW_SCHEMA, ROW) == "adult"
    assert _one(spark, "'a' + 'b'") == "ab"
    assert _one(spark, "nil ?? 'fallback'") == "fallback"


@pytest.mark.parametrize(
    "src,expected",
    [
        # toInt: atoi, else float-truncate, else 0 (custom_expr_functions.go:500-522)
        ("toInt('42')", 42),
        ("toInt('3.9')", 3),
        ("toInt('-3.9')", -3),
        ("toInt('abc')", 0),
        ("toInt('')", 0),
        # toFloat (go:524-539)
        ("toFloat('2.5')", 2.5),
        ("toFloat('junk')", 0.0),
        # waterfall: first non-nil non-empty, stringified (go:154-191)
        ("waterfall('', 'x', 'y')", "x"),
        ("waterfall(nil, '', 42)", "42"),
        ("waterfall('', nil)", ""),
        ("waterfall(['', 'arr'])", "arr"),
        # string helpers
        ("upper('aBc')", "ABC"),
        ("lower('aBc')", "abc"),
        ("trim('  x ')", "x"),
        ("replace('a-b-c', '-', '+')", "a+b+c"),
        ("join(['a','b'], ',')", "a,b"),
        ("containsStr('hello', 'ell')", True),
        ("containsStr('', 'x')", False),
        ("hasPrefix('hello', 'he')", True),
        ("hasSuffix('hello', 'lo')", True),
        ("toString(42)", "42"),
        # extractPathType: exact-match switch (go:78-92)
        ("extractPathType('/g/collect')", "collect"),
        ("extractPathType('/_/set_cookie')", "set_cookie"),
        ("extractPathType('/other')", "unknown"),
        # urlDecode (go:340-360)
        ("urlDecode('a%20b')", "a b"),
        ("urlDecode('a+b')", "a b"),
        # parseISO8601 -> unix seconds, fail -> 0 (go:194-217)
        ("parseISO8601('2024-01-01T00:00:00Z')", 1704067200),
        ("parseISO8601('2024-01-01 00:00:00.000000')", 1704067200),
        ("parseISO8601('nope')", 0),
        ("parseISO8601('')", 0),
        # toDate (go:220-237)
        ("toDate(1704067200)", "2024-01-01"),
        # query params
        ("getQueryParam('a=1&b=two%20words', 'b')", "two words"),
        ("getQueryParam('a=1', 'zz')", ""),
    ],
)
def test_scalar_functions(spark, src, expected):
    assert _one(spark, src) == expected


def test_split(spark):
    assert _one(spark, "split('a,b,c', ',')") == ["a", "b", "c"]
    assert _one(spark, "split('a.b', '.')") == ["a", "b"]  # literal, not regex


def test_parse_query(spark):
    got = _one(spark, "parseQuery('a=1&b=x%20y')")
    assert got == {"a": "1", "b": "x y"}


def test_parse_user_agent(spark):
    cases = [
        ("Mozilla/5.0 (iPhone; CPU iPhone OS) Safari Mobile", "device", "Mobile"),
        ("Mozilla/5.0 (iPad; CPU OS) Safari", "device", "Tablet"),
        ("Mozilla/5.0 (Linux; Android 10)", "device", "Tablet"),  # android w/o mobile
        ("Mozilla/5.0 (Linux; Android 10; Mobile)", "device", "Mobile"),
        ("Mozilla/5.0 (Windows NT 10.0)", "device", "Desktop"),
        ("Mozilla/5.0 Chrome/120 Edg/120", "browser", "Edge"),
        ("Mozilla/5.0 Chrome/120 Safari/537", "browser", "Chrome"),
        ("Mozilla/5.0 Firefox/115", "browser", "Firefox"),
        ("Mozilla/5.0 Version/17 Safari/605", "browser", "Safari"),
        ("curl/8.0", "browser", "Unknown"),
        ("Mozilla/5.0 (iPhone)", "os", "iOS"),
        ("Mozilla/5.0 (Linux; Android 10)", "os", "Android"),
        ("Mozilla/5.0 (Windows NT 10.0)", "os", "Windows"),
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X)", "os", "macOS"),
        ("Mozilla/5.0 (X11; Linux x86_64)", "os", "Linux"),
        ("", "os", ""),
    ]
    for ua, field, want in cases:
        got = _one(spark, f"parseUserAgent('{ua}', '{field}')")
        assert got == want, (ua, field, got, want)


def test_syntax_errors():
    for bad in ["age >", "(a", "'unterminated", "a ==", "1 +"]:
        with pytest.raises(ExprSyntaxError):
            parse(bad)


@pytest.mark.parametrize(
    "src,expected",
    [
        # expr-lang array lambda builtins with '#' placeholder
        ("all(tags, len(#) > 3)", True),
        ("all(tags, # == 'audit')", False),
        ("any(tags, # == 'audit')", True),
        ("none(tags, # == 'zzz')", True),
        ("filter(tags, # != 'audit')", ["system"]),
        ("map(tags, upper(#))", ["AUDIT", "SYSTEM"]),
        ("count(tags, len(#) > 5)", 1),
        ("one(tags, # == 'audit')", True),
        ("len(filter(tags, hasPrefix(#, 'a')))", 1),
    ],
)
def test_lambda_builtins(spark, src, expected):
    assert _one(spark, src, ROW_SCHEMA, ROW) == expected


def test_lambda_placeholder_outside_lambda_rejected(spark):
    from clickhouse_etl_spark.expr.translate import ExprTranslationError

    with pytest.raises(ExprTranslationError, match="outside a lambda"):
        _one(spark, "# > 3", ROW_SCHEMA, ROW)


@pytest.mark.parametrize(
    "src,expected",
    [
        # expr-lang Go-style slices: 0-based, end-exclusive
        ("tags[0:1]", ["audit"]),
        ("tags[1:]", ["system"]),
        ("tags[:1]", ["audit"]),
        ("tags[:]", ["audit", "system"]),
        ("tags[1:1]", []),
        ("len(tags[0:2])", 2),
        ("join(tags[0:2], '-')", "audit-system"),
    ],
)
def test_array_slices(spark, src, expected):
    assert _one(spark, src, ROW_SCHEMA, ROW) == expected
