"""Portable deterministic hashing as Catalyst expressions.

Engine-native hashes (xxhash64, md5 seeds, crc32) differ between
systems, which makes sketch results (MinHash, SimHash, fingerprints)
unverifiable across engines. These helpers build hashes from plain
integer arithmetic over character codes — a left fold computing a
polynomial rolling hash mod a Mersenne-ish prime — so the exact same
value is computable in any SQL engine (the DuckDB oracle uses
``list_reduce`` over ``unicode()`` codes with identical constants).

All folds stay inside Catalyst's higher-order functions (``aggregate``
over ``split``), i.e. JVM-side vectorized, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the rolling hash — fits 31*h+c in int64 comfortably
HASH_MOD = 2147483647  # 2^31 - 1
HASH_BASE = 31

#: (a, b) constants for the MinHash permutation family
#: h_i(x) = (a_i * x + b_i) mod HASH_MOD — values are arbitrary odd
#: constants fixed forever for reproducibility
MINHASH_COEFFS = [
    (1103, 12289), (12613, 56857), (65867, 987), (7589, 35869),
    (103687, 22573), (331, 77641), (15787, 41117), (9833, 3389),
    (271027, 65213), (30011, 9007), (48497, 121949), (6691, 53087),
    (175781, 2357), (83077, 19483), (257783, 100999), (3571, 88873),
]


def char_fold_hash(s: Column) -> Column:
    """Polynomial rolling hash of a string: fold (h*31 + code) mod P.

    DuckDB oracle equivalent:
    ``list_reduce([0] || list_transform(string_split(s, ''), c -> unicode(c)),
    (h, c) -> (h * 31 + c) % 2147483647)``.
    """
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda h, c: (h * HASH_BASE + c) % HASH_MOD,
    )


def affine_hash(x: Column, a: int, b: int) -> Column:
    """One member of the (a*x + b) mod P permutation family."""
    return (x * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD)


def char_fold_hash_py(s: str) -> int:
    """Python replay of :func:`char_fold_hash`, bit-identical for BMP
    strings (``ord`` == Spark ``ascii`` there). The ONE definition the
    Arrow-batched ops (classifier featurizer, bloom probe, online
    scoring) share, so the fold constants cannot silently diverge from
    the Catalyst build expressions."""
    h = 0
    for ch in s:
        h = (h * HASH_BASE + ord(ch)) % HASH_MOD
    return h


def char_fold_hash_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`char_fold_hash` exactly.

    ``string_split('', '')`` yields ``['']`` in DuckDB (vs ``[]`` in
    Spark) and ``unicode('')`` is -1 — the empty-char filter aligns the
    empty-string case; non-empty inputs are unaffected.
    """
    return (
        f"list_reduce([0::BIGINT] || list_transform("
        f"list_filter(string_split({expr}, ''), c -> c != ''), "
        f"c -> unicode(c)::BIGINT), (h, c) -> (h * {HASH_BASE} + c) % {HASH_MOD})"
    )


def affine_hash_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr}) * {a} + {b}) % {HASH_MOD}"
