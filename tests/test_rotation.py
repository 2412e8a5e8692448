"""Mechanical staleness enforcement for the registry rotation (VERDICT r5 #1/#3).

The driver's correctness budget (~50 entries/round) is spent by
registration order; ``queries._priority`` orders entries so that
changed-since-signature entries are re-signed before anything else.
These tests make the bookkeeping mechanical instead of hand-maintained:

- any registry entry whose transitive implementing source differs from
  the signed snapshot MUST be in ``_STALE_SIGNED`` (or never checked);
- the ``_R0N_CHECKED`` sets must exactly match the driver artifacts;
- the rotation front of the registry must contain the oldest-signature
  tail, so no entry's newest signature falls more than two rounds back.
"""

import json
from pathlib import Path

import pytest

from clickhouse_etl_spark import queries
from clickhouse_etl_spark.impl_hash import (
    SNAPSHOT_PATH,
    changed_entries,
    load_snapshot,
    registry_hashes,
)

REPO = Path(__file__).resolve().parents[1]


def test_snapshot_exists_and_covers_registry():
    snap = load_snapshot()
    assert snap, f"missing {SNAPSHOT_PATH}; run scripts/snapshot_impl_hashes.py"
    # every snapshotted name should still exist (renames must re-snapshot)
    missing = set(snap) - set(queries.QUERIES)
    assert not missing, f"snapshot references deleted entries: {sorted(missing)}"


def test_changed_entries_are_marked_stale():
    """Editing an implementing function without adding the entry to
    _STALE_SIGNED is the exact failure mode the judge flagged — catch it
    in the fast suite, not at judging time."""
    unmarked = [
        n
        for n in changed_entries()
        if queries._newest_signature(n) > 0 and n not in queries._STALE_SIGNED
    ]
    assert not unmarked, (
        "implementing source changed since the signed snapshot but entry is "
        f"not in _STALE_SIGNED: {unmarked}"
    )


def test_stale_set_entries_exist():
    unknown = queries._STALE_SIGNED - set(queries.QUERIES)
    assert not unknown, f"_STALE_SIGNED names unknown entries: {sorted(unknown)}"


@pytest.mark.parametrize("round_no", [3, 4, 5, 6, 7, 8, 9, 10])
def test_checked_sets_match_driver_artifacts(round_no):
    artifact = REPO / f"CORRECTNESS_r{round_no:02d}.json"
    if not artifact.exists():
        pytest.skip(f"no {artifact.name} in repo")
    driver_keys = set(json.loads(artifact.read_text()))
    declared = getattr(queries, f"_R{round_no:02d}_CHECKED")
    assert set(declared) == driver_keys, (
        f"_R{round_no:02d}_CHECKED drifted from {artifact.name}: "
        f"missing={sorted(driver_keys - set(declared))} "
        f"extra={sorted(set(declared) - driver_keys)}"
    )


def test_no_signature_older_than_two_rounds_in_budget():
    """The driver checks roughly the first 50 registry entries. Every
    entry whose newest signature would be three rounds old by the end of
    THIS round must sit inside that window so it gets re-signed now —
    the freshness invariant the judge audits (no signature older than
    two rounds after each round's re-sign)."""
    order = list(queries.QUERIES)
    budget_front = set(order[:50])
    mandatory_tail = {
        n
        for n in order
        if 0 < queries._newest_signature(n) <= queries._LATEST_ROUND - 2
    }
    outside = sorted(mandatory_tail - budget_front)
    assert not outside, (
        f"mandatory-tail entries outside the ~50-entry budget: {outside}"
    )


def test_registry_hashes_are_stable_within_process():
    h1 = registry_hashes()
    h2 = registry_hashes()
    assert h1 == h2


@pytest.mark.parametrize(
    "entry,deps",
    [
        ("emb_ivf_pq_ann_topk", {"ivf_pq_topk", "sample_centroids", "sample_codebooks"}),
        ("emb_pq_index_ann_topk", {"pq_index_build", "pq_index_query"}),
        ("docs_curation_v4", {"normalize_text", "percentile_threshold_gate"}),
    ],
)
def test_impl_hash_reaches_parenthesized_import_deps(entry, deps):
    """ADVICE r6 (high): the import walker must resolve parenthesized
    multi-line `from .x import (a, b)` statements — the r6 regex captured
    only '(' and silently dropped every dep behind such imports, so edits
    to those functions never flagged the entry stale."""
    from clickhouse_etl_spark.impl_hash import _reachable

    fn = queries.QUERIES[entry].fn
    names = {k.rsplit(".", 1)[-1] for k in _reachable(fn)}
    missing = deps - names
    assert not missing, f"{entry} misses transitive deps: {sorted(missing)}"
