"""Driver-contract test for bench.py: one valid JSON line on stdout with
the required fields, runnable against any SF dir."""

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        BENCH_FILTER="filter_project,q6_forecast_revenue",
        SPARK_DRIVER_MEMORY="4g",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith('{"metric"')]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    doc = json.loads(json_lines[0])
    assert doc["unit"] == "sec"
    assert doc["sf"] == 0.001
    assert set(doc["queries"]) == {"filter_project", "q6_forecast_revenue"}
    assert doc["value"] == round(sum(doc["queries"].values()), 3) or doc["value"] >= 0
    # VERDICT r4 #3: totals must be the LAST keys on the line so a
    # tail-byte capture retains them
    keys = list(doc)
    assert keys[-2:] == ["value", "total_sec"]
    assert doc["total_sec"] == doc["value"]
    # VERDICT r4 #4: same-window contamination control present
    assert doc["control_q1"] is None or doc["control_q1"] > 0
    assert isinstance(doc["contended"], bool)
    # VERDICT r4 #8: cross-SF scaling map present (empty here: sf dir
    # IS the small dir's sibling but queries_small may be empty at
    # sf0.001 only if the sf0.01 dir is missing)
    assert "scale_ratio_vs_small" in doc and "scale_flagged" in doc
    # VERDICT r5 #3: the heavy tail survives a tail-byte capture —
    # slowest sits just before the totals
    assert keys[-3] == "slowest"
    assert set(doc["slowest"]) <= set(doc["queries"])
    assert doc["slowest"] == dict(
        sorted(doc["queries"].items(), key=lambda kv: -kv[1])[:15]
    )
    # VERDICT r5 #4: per-chunk controls, individually flagged
    assert isinstance(doc["chunk_controls"], list) and doc["chunk_controls"]
    for c in doc["chunk_controls"]:
        assert {"chunk", "start", "end", "contended"} <= set(c)
    assert isinstance(doc["contended_chunks"], list)
    assert doc["contended"] == bool(doc["contended_chunks"])
    # VERDICT r9 #2: the window-health verdicts live in the TAIL ZONE —
    # after the big per-query maps, before `slowest`/totals — so the
    # driver's tail-byte capture retains them (the r9 artifact recorded
    # a hot-window total with the contention flags truncated away).
    for health in ("contended_chunks", "control_q1", "control_ratio", "contended"):
        assert keys.index(health) > keys.index("queries_compact"), keys
        assert keys.index(health) > keys.index("streaming_ingest"), keys
        assert keys.index(health) < keys.index("slowest"), keys
    # a literal truncated-tail parse (everything from `streaming_ingest`
    # onward, i.e. what survives when the head maps are cut) must still
    # expose every health verdict
    line = json_lines[0]
    tail = line[line.index('"streaming_ingest"'):]
    for health in ('"contended_chunks"', '"control_q1"', '"control_ratio"',
                   '"contended"', '"slowest"', '"total_sec"'):
        assert health in tail, tail[:500]


def test_bench_surfaces_child_crash():
    """ADVICE r3: a crashed child JVM chunk must not silently vanish —
    the JSON carries an 'errors' map and the process exits non-zero."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        BENCH_FILTER="filter_project",
        SPARK_DRIVER_MEMORY="4g",
        # poison the child: an unimportable PYTHONSTARTUP-free trick —
        # make the child die before emitting JSON by pointing it at a
        # nonexistent Java home
        JAVA_HOME="/nonexistent",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode != 0
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith('{"metric"')]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    doc = json.loads(json_lines[0])
    assert doc.get("errors"), doc
    assert doc["queries"] == {}
