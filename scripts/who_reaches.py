"""Reverse impl-hash lookup: which registry entries reach a function?

Usage: python scripts/who_reaches.py <substring> [substring ...]

For each registry entry, computes the transitive reachable set
(impl_hash._reachable) and prints the entries whose reachable-source
keys contain any of the given substrings (e.g. 'line_dedup',
'dataops.text'), annotated with the entry's newest driver signature
and staleness. Editing code reachable ONLY from r10-signed or
already-stale or r8-signed entries is rotation-budget-safe this round;
a NEW stale r9-signed entry breaks the 50-row budget
(tests/test_rotation.py::test_no_signature_older_than_two_rounds_in_budget).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_etl_spark import impl_hash, queries  # noqa: E402


def main() -> None:
    subs = sys.argv[1:]
    if not subs:
        print("usage: who_reaches.py <substring> ...")
        return
    for name, qd in queries.QUERIES.items():
        try:
            reach = impl_hash._reachable(qd.fn)
        except Exception as e:
            print(f"{name}: reachable failed: {e}")
            continue
        hits = sorted(k for k in reach if any(s in k for s in subs))
        if hits:
            sig = queries._newest_signature(name)
            stale = name in queries._STALE_SIGNED
            print(f"r{sig:<2d} stale={int(stale)} {name}: {hits}")


if __name__ == "__main__":
    main()
