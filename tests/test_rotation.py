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
    ever_checked = (
        queries._R03_CHECKED | queries._R04_CHECKED | queries._R05_CHECKED
    )
    unmarked = [
        n
        for n in changed_entries()
        if n in ever_checked and n not in queries._STALE_SIGNED
    ]
    assert not unmarked, (
        "implementing source changed since the signed snapshot but entry is "
        f"not in _STALE_SIGNED: {unmarked}"
    )


def test_stale_set_entries_exist():
    unknown = queries._STALE_SIGNED - set(queries.QUERIES)
    assert not unknown, f"_STALE_SIGNED names unknown entries: {sorted(unknown)}"


@pytest.mark.parametrize("round_no", [3, 4, 5])
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
    entry whose newest signature is r3 (three rounds old at r6) must sit
    inside that window so it gets re-signed this round."""
    order = list(queries.QUERIES)
    budget_front = set(order[:50])
    r3_tail = {
        n
        for n in queries._R03_CHECKED
        if n not in queries._R04_CHECKED and n not in queries._R05_CHECKED
    }
    outside = sorted(r3_tail - budget_front)
    assert not outside, f"r3-tail entries outside the ~50-entry budget: {outside}"


def test_registry_hashes_are_stable_within_process():
    h1 = registry_hashes()
    h2 = registry_hashes()
    assert h1 == h2
