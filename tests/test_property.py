"""Property-based tests (hypothesis): parser totality, duration
algebra, portable-hash three-engine agreement (Python model vs Spark vs
the DuckDB fold already covered by the oracle), cast semantics.
"""

import string

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from clickhouse_etl_spark.dataops.hashing import HASH_BASE, HASH_MOD, char_fold_hash
from clickhouse_etl_spark.expr.parser import ExprSyntaxError, parse
from clickhouse_etl_spark.spec.model import Field
from clickhouse_etl_spark.spec.schema_registry import check_backward_compatible
from clickhouse_etl_spark.spec.types import parse_duration_seconds

# ---------------------------------------------------------------- parser

_expr_chars = string.ascii_letters + string.digits + " ()[]{}+-*/%^<>=!&|?:.,'\"_#"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_expr_chars, max_size=60))
def test_parser_total(src):
    """parse() is total: any input either parses or raises ExprSyntaxError
    — never an unhandled exception (the reference compiles configs at
    pipeline-create time and must reject bad input cleanly)."""
    try:
        parse(src)
    except ExprSyntaxError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(10**9), max_value=10**9))
def test_parser_int_roundtrip(n):
    node = parse(str(n))
    # unary minus folds over the literal
    from clickhouse_etl_spark.expr.parser import Lit, Unary

    if n >= 0:
        assert isinstance(node, Lit) and node.value == n
    else:
        assert isinstance(node, Unary) and node.operand.value == -n


# ---------------------------------------------------------------- durations


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_duration_seconds(n):
    assert parse_duration_seconds(f"{n}s") == float(n)
    assert parse_duration_seconds(f"{n}m") == float(n) * 60
    assert parse_duration_seconds(f"{n}h") == float(n) * 3600


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
)
def test_duration_composition(h, m, s):
    assert parse_duration_seconds(f"{h}h{m}m{s}s") == h * 3600 + m * 60 + s


# ---------------------------------------------------------------- compat


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
            st.sampled_from(["string", "int", "float", "bool", "array", "map"]),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_backward_compat_reflexive_and_additive(fields):
    fs = [Field(n, t) for n, t in fields]
    ok, _ = check_backward_compatible(fs, fs)
    assert ok  # reflexive
    wider = fs + [Field("zzz_extra_zzz", "string")]
    if not any(f.name == "zzz_extra_zzz" for f in fs):
        ok, _ = check_backward_compatible(fs, wider)
        assert ok  # additive evolution is always compatible
    if fs:
        ok, reason = check_backward_compatible(fs, fs[1:])
        assert not ok and "removed" in reason  # removal never is


# ---------------------------------------------------------------- portable hash


def _py_char_fold(s: str) -> int:
    h = 0
    for c in s:
        h = (h * HASH_BASE + ord(c)) % HASH_MOD
    return h


@pytest.mark.parametrize("n_cases", [64])
def test_char_fold_three_engine_agreement(spark, n_cases):
    """The portable hash agrees across Python, Spark (aggregate fold),
    and DuckDB (list_reduce fold) on randomized ASCII inputs — the
    property every sketch operator's oracle determinism rests on."""
    import random

    rng = random.Random(42)
    corpus = [
        "".join(rng.choice(string.ascii_letters + string.digits + " .,!?_-")
                for _ in range(rng.randint(0, 80)))
        for _ in range(n_cases)
    ]
    df = spark.createDataFrame([(s,) for s in corpus], ["s"])
    from pyspark.sql import functions as F

    got_spark = {r["s"]: r["h"] for r in df.select("s", char_fold_hash(F.col("s")).alias("h")).collect()}
    from clickhouse_etl_spark.dataops.hashing import char_fold_hash_sql

    con = duckdb.connect()
    expected_py = {s: _py_char_fold(s) for s in corpus}
    for s in corpus:
        d = con.execute(
            "SELECT " + char_fold_hash_sql("?"), [s]
        ).fetchone()[0]
        assert got_spark[s] == expected_py[s], s
        assert (d if d is not None else 0) == expected_py[s], s


@given(
    st.text(alphabet="abcdef", min_size=1, max_size=12),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_bpe_segmentation_is_lossless(word, n_merges):
    """For ANY word and ANY learned merge table, BPE segmentation is a
    partition of the word: concatenating the symbols reproduces
    word + end-marker exactly (merges can never drop or duplicate
    characters)."""
    from collections import Counter

    from clickhouse_etl_spark.dataops.bpe import EOW, bpe_segment_word

    # derive a deterministic merge-rank table from the word itself plus
    # a fixed seed corpus — content does not matter for the invariant
    pairs = []
    syms = list("abcdef") + [EOW]
    for i, a in enumerate(syms):
        for b in syms:
            pairs.append((a, b))
    ranks = {p: i for i, p in enumerate(pairs[: n_merges])}
    # grow compound merges too (merged symbols re-merge)
    for i, ((l1, r1), (l2, r2)) in enumerate(zip(pairs, pairs[1:])):
        if i < n_merges // 2:
            ranks[(l1 + r1, l2 + r2)] = 1000 + i
    seg = bpe_segment_word(word, ranks)
    assert "".join(seg) == word + EOW
    assert all(seg)  # no empty symbols


# ------------------------------------------------------------ r6 ops


def test_normalize_text_idempotent_and_collapsing(spark):
    """normalize(normalize(x)) == normalize(x), and any two texts equal
    up to case/punctuation/whitespace noise collapse to one canonical
    form — the property the canonical-dedup stage of curation_v4 rests
    on. Randomized corpus, fixed seed, one batched Spark pass."""
    import random

    from clickhouse_etl_spark.dataops.text import normalize_text

    rng = random.Random(20260814)
    bases, noisy = [], []
    for i in range(64):
        words = [
            "".join(rng.choice("abcdefghij") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 10))
        ]
        base = " ".join(words)
        # inject case flips, punctuation, and whitespace runs
        out = []
        for w in words:
            w2 = "".join(c.upper() if rng.random() < 0.4 else c for c in w)
            out.append(rng.choice(["", "(", "'"]) + w2 + rng.choice(["", "!", ",", ")"]))
        sep = lambda: " " * rng.randint(1, 3)
        bases.append((2 * i, base))
        noisy.append((2 * i + 1, sep().join([""] + out) + sep()))
    df = spark.createDataFrame(bases + noisy, ["doc_id", "text"])
    once = {r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()}
    twice_df = spark.createDataFrame(
        [(k, v) for k, v in once.items()], ["doc_id", "text"]
    )
    twice = {r["doc_id"]: r["text_norm"] for r in normalize_text(twice_df).collect()}
    assert once == twice  # idempotent
    for i in range(64):
        assert once[2 * i + 1] == once[2 * i], (once[2 * i + 1], once[2 * i])


def test_connected_components_matches_python_reference(spark):
    """The (local fast-path) closure equals a pure-Python BFS reference
    on randomized graphs — many graphs packed disjointly into ONE Spark
    call via id offsets."""
    import random

    from clickhouse_etl_spark.dataops.dedup import connected_components

    rng = random.Random(4242)
    edges, nodes, expected = [], [], {}
    for g in range(20):
        off = g * 1000
        n = rng.randint(2, 25)
        ids = [off + i for i in range(n)]
        nodes.extend(ids)
        es = [
            (rng.choice(ids), rng.choice(ids))
            for _ in range(rng.randint(0, 2 * n))
        ]
        edges.extend(es)
        # python reference: BFS components, min-id label
        adj = {i: set() for i in ids}
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        seen = set()
        for i in ids:
            if i in seen:
                continue
            comp, stack = [], [i]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                comp.append(x)
                stack.extend(adj[x])
            lab = min(comp)
            for x in comp:
                expected[x] = lab
    edf = spark.createDataFrame(
        edges or [(0, 0)], ["id_a", "id_b"]
    )
    ndf = spark.createDataFrame([(i,) for i in nodes], ["doc_id"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edf, ndf).collect()
    }
    assert got == expected


def test_cms_never_underestimates_random(spark):
    """CMS point estimates are >= true counts for EVERY key on
    randomized skewed data (the one-sided error guarantee)."""
    import random

    from clickhouse_etl_spark.dataops.sketches import cms_estimate

    rng = random.Random(777)
    rows = [(rng.randint(0, 50) ** 2,) for _ in range(5000)]  # skewed keys
    df = spark.createDataFrame(rows, ["k"])
    for r in cms_estimate(df, "k", width=64, depth=3, top_n=30).collect():
        assert r["cms_cnt"] >= r["true_cnt"], r
