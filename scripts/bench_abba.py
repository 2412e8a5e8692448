"""Interleaved A/B bench of the CURRENT tree vs a signed git ref
(VERDICT r8 #2) — makes the ambient-vs-real attribution of bench
regressions machine-checkable instead of testimonial.

The host VM has bursty CPU steal and day-scale ambient drift
(CLAUDE.md): the same code has read 51.6-69.7 s across one afternoon.
When a per-query bench number looks regressed vs the previous round,
the question is whether the CODE changed it or the WINDOW did. This
harness answers it the only way that controls for the window: check
out the signed tree in a /tmp worktree and interleave full bench.py
runs of both trees in ONE window (default pattern A B B A, A=current,
B=signed), then compare per-query BESTS, which strips one-sided steal
bursts.

Output (``bench_abba.json`` at the repo root, next to BENCH_r*.json):

- ``per_query``: current/signed best seconds + the current/signed
  ratio per query;
- ``verdict`` per query: ``"ambient"`` when the ratio sits within
  ``1/tol .. tol`` (default 1.3 — the measured same-code band), else
  ``"current_slower"`` / ``"current_faster"`` — a REAL regression
  shows up as current_slower here even in a dirty window, because the
  signed tree ran in the same window;
- the raw per-run maps and each run's bench controls, so a judge can
  re-derive everything.

Usage::

    python scripts/bench_abba.py --ref <signed-commit> \
        --queries docs_curation_v3,docs_dup_keep_best [--sf-dir ...]
        [--pattern ABBA] [--out bench_abba.json]

Queries default to the top-10 slowest of the newest BENCH_r*.json
whose tail parses (the ``slowest`` map sits before the totals).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _default_queries() -> list[str]:
    """Top-10 slowest from the newest BENCH_r*.json tail capture."""
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    for path in reversed(benches):
        # the driver may store tail-captured bytes under {"tail": ...}
        # (quotes backslash-escaped inside the JSON string) or the raw
        # line; unescape and find the LAST "slowest" map in either
        raw = open(path).read().replace('\\"', '"')
        m = None
        for m in re.finditer(r'"slowest"\s*:\s*\{([^}]*)\}', raw):
            pass
        if not m:
            continue
        pairs = re.findall(r'"([^"]+)"\s*:\s*([0-9.]+)', m.group(1))
        if pairs:
            ranked = sorted(pairs, key=lambda kv: -float(kv[1]))
            return [n for n, _ in ranked[:10]]
    raise SystemExit(
        "no BENCH_r*.json with a parseable 'slowest' tail — pass --queries"
    )


def _prune_stale_worktrees() -> None:
    """Remove /tmp/abba_signed_* worktrees left by KILLED earlier runs
    (VERDICT r10 #1: a poisoned worktree from an interrupted run made
    the fast suite fail forever until hand-removed). A worktree whose
    PID suffix is a live process belongs to a concurrent run and is
    left alone; everything else is crash residue — remove + prune."""
    listing = subprocess.run(
        ["git", "worktree", "list", "--porcelain"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout
    for line in listing.splitlines():
        if not line.startswith("worktree /tmp/abba_signed_"):
            continue
        path = line.split(" ", 1)[1]
        pid = path.rsplit("_", 1)[-1]
        try:
            os.kill(int(pid), 0)
            continue  # a live concurrent run owns it
        except (ValueError, ProcessLookupError):
            pass
        except PermissionError:
            continue  # alive under another uid
        subprocess.run(
            ["git", "worktree", "remove", "--force", path],
            cwd=REPO, capture_output=True,
        )
    subprocess.run(
        ["git", "worktree", "prune"], cwd=REPO, capture_output=True
    )


def _run_bench(tree: str, queries: list[str], sf_dir: str) -> dict:
    """One full bench.py sweep of ``queries`` from ``tree`` (its own
    chunk JVMs, warm-up and best-of-2 exactly as the recorded bench)."""
    env = dict(
        os.environ,
        BENCH_FILTER=",".join(queries),
        SPARK_GRAFT_SF_DIR=sf_dir,
        PYTHONPATH=tree,
    )
    r = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, cwd=tree, capture_output=True, text=True,
    )
    for line in reversed((r.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {"error": (r.stderr or "no output")[-500:]}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ref", required=True,
                    help="git ref of the signed tree (B side)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names (default: top-10 "
                         "slowest of the newest BENCH_r*.json)")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--pattern", default="ABBA",
                    help="run order, e.g. ABBA (A=current, B=signed)")
    ap.add_argument("--tolerance", type=float, default=1.3,
                    help="same-code ratio band for the ambient verdict")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_abba.json"))
    args = ap.parse_args()

    if not set(args.pattern) <= {"A", "B"} or not args.pattern:
        raise SystemExit(f"--pattern must be a string of A/B, got {args.pattern!r}")
    queries = (args.queries.split(",") if args.queries else _default_queries())

    _prune_stale_worktrees()
    worktree = f"/tmp/abba_signed_{os.getpid()}"
    subprocess.run(
        ["git", "worktree", "add", "--force", "--detach", worktree, args.ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        trees = {"A": REPO, "B": worktree}
        runs = []
        for i, side in enumerate(args.pattern):
            out = _run_bench(trees[side], queries, args.sf_dir)
            runs.append({
                "side": "current" if side == "A" else "signed",
                "queries": out.get("queries", {}),
                "control_q1": out.get("control_q1"),
                "contended_chunks": out.get("contended_chunks", []),
                "error": out.get("error"),
            })
            print(f"run {i + 1}/{len(args.pattern)} "
                  f"[{runs[-1]['side']}]: "
                  f"{json.dumps(runs[-1]['queries'])}", flush=True)

        per_query = {}
        for name in queries:
            cur = [r["queries"][name] for r in runs
                   if r["side"] == "current" and name in r["queries"]]
            sig = [r["queries"][name] for r in runs
                   if r["side"] == "signed" and name in r["queries"]]
            if not cur or not sig:
                per_query[name] = {"verdict": "missing"}
                continue
            ratio = round(min(cur) / min(sig), 3)
            verdict = (
                "ambient" if 1 / args.tolerance <= ratio <= args.tolerance
                else ("current_slower" if ratio > 1 else "current_faster")
            )
            per_query[name] = {
                "current_best": min(cur), "signed_best": min(sig),
                "ratio_current_over_signed": ratio, "verdict": verdict,
            }

        result = {
            "metric": "bench_abba_current_vs_signed",
            "ref": args.ref,
            "sf_dir": args.sf_dir,
            "pattern": args.pattern,
            "tolerance": args.tolerance,
            "per_query": per_query,
            "runs": runs,
            "n_ambient": sum(
                1 for v in per_query.values() if v.get("verdict") == "ambient"
            ),
            "n_current_slower": sum(
                1 for v in per_query.values()
                if v.get("verdict") == "current_slower"
            ),
        }
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({k: v for k, v in result.items() if k != "runs"}))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", worktree],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    main()
