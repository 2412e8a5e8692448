"""Precise physical-plan node counting shared by the exchange-count
snapshot (scripts/snapshot_exchange_counts.py) and the drift audit
(tests/test_plans.py).

ADVICE r7: the old substring count ``plan.count("Exchange") -
plan.count("BroadcastExchange")`` also counted ``ReusedExchange``
nodes and any inline child references as shuffles — the snapshot and
test drifted consistently (regressions were still caught) but the
recorded per-entry numbers misstated actual shuffle counts whenever a
plan contained exchange reuse. This counter matches only the LEADING
node name of each plan line, so ``Exchange`` / ``BroadcastExchange``
are counted exactly and ``ReusedExchange`` / ``AQEShuffleRead`` /
``ShuffleQueryStage`` are not.
"""

from __future__ import annotations

import re

# tree-drawing prefix before a node name: whitespace, ':', '+', '-',
# '*(n)' codegen markers
_NODE_RE = re.compile(r"^[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Za-z]\w*)")


def exchange_counts(plan: str) -> dict:
    """Count shuffle and broadcast Exchange NODES (one per plan line
    whose leading operator name is exactly that token)."""
    shuffle = 0
    bcast = 0
    for line in plan.splitlines():
        m = _NODE_RE.match(line)
        if not m:
            continue
        node = m.group(1)
        if node == "Exchange":
            shuffle += 1
        elif node == "BroadcastExchange":
            bcast += 1
    return {"shuffle": shuffle, "broadcast": bcast}
