"""The ABBA bench-calibration harness (VERDICT r8 #2) produces its
artifact: interleaved current-vs-signed-tree runs in one window with
per-query verdicts. A 2-run AB at sf0.001 with one cheap query keeps
the test fast; the recorded artifact uses the full ABBA at sf0.1."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_abba_produces_artifact(tmp_path):
    out = str(tmp_path / "bench_abba.json")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "bench_abba.py"),
            "--ref", "HEAD",
            "--queries", "q1_pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
            "--pattern", "AB",
            "--out", out,
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    doc = json.load(open(out))
    assert doc["metric"] == "bench_abba_current_vs_signed"
    assert doc["pattern"] == "AB"
    pq = doc["per_query"]["q1_pricing_summary"]
    # HEAD vs the working tree is same code: both sides must have run
    # and produced a finite ratio (the verdict itself is window-bound)
    assert pq["current_best"] > 0 and pq["signed_best"] > 0
    assert pq["verdict"] in ("ambient", "current_slower", "current_faster")
    sides = [run["side"] for run in doc["runs"]]
    assert sides == ["current", "signed"]
    # the worktree must be cleaned up
    assert not any(
        w.startswith("/tmp/abba_signed_")
        for w in subprocess.run(
            ["git", "worktree", "list", "--porcelain"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.split()
    )
