"""The ABBA bench-calibration harness (VERDICT r8 #2) produces its
artifact: interleaved current-vs-signed-tree runs in one window with
per-query verdicts. A 2-run AB at sf0.001 with one cheap query keeps
the test fast; the recorded artifact uses the full ABBA at sf0.1."""

import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _abba_worktrees():
    return {
        w
        for w in subprocess.run(
            ["git", "worktree", "list", "--porcelain"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.split()
        if w.startswith("/tmp/abba_signed_")
    }


@pytest.mark.heavy
def test_bench_abba_produces_artifact(tmp_path):
    out = str(tmp_path / "bench_abba.json")
    pre_existing = _abba_worktrees()  # residue from OTHER (killed) runs
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
    # THIS run's worktree must be cleaned up — scoped so residue from a
    # previously KILLED run can't fail an unrelated suite (VERDICT r10
    # #1; the harness itself prunes dead-PID residue at startup, so the
    # set normally shrinks — it must never grow)
    assert not (_abba_worktrees() - pre_existing)


def test_bench_abba_prunes_crash_residue():
    """A worktree left by a KILLED run (dead-PID suffix) is removed by
    the harness's startup prune; a suffix that is a live PID (a
    concurrent run) is left alone."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_abba", os.path.join(REPO, "scripts", "bench_abba.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    dead = "/tmp/abba_signed_999999999"  # past pid_max: can't be alive
    live = f"/tmp/abba_signed_{os.getpid()}"  # our own pid IS alive
    for path in (dead, live):
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", path, "HEAD"],
            cwd=REPO, check=True, capture_output=True,
        )
    try:
        mod._prune_stale_worktrees()
        after = _abba_worktrees()
        assert dead not in after, "dead-PID residue must be pruned"
        assert live in after, "live-PID worktree must survive"
    finally:
        for path in (dead, live):
            subprocess.run(
                ["git", "worktree", "remove", "--force", path],
                cwd=REPO, capture_output=True,
            )
