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
