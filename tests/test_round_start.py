"""The round-start generator must reproduce the hand-maintained r5 sets.

``scripts/round_start.py`` prints the paste-ready ``_R0N_CHECKED``
literal from a driver CORRECTNESS artifact; the r5 artifact is frozen in
the repo, so the generated set must equal ``queries._R05_CHECKED``
forever (the hand-maintained set the r5 driver actually signed).
"""

import ast
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_generator_reproduces_r05_checked():
    out = subprocess.run(
        [sys.executable, "scripts/round_start.py", "CORRECTNESS_r05.json"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    lit = re.search(r"_R05_CHECKED = frozenset\((\{.*?\})\)", out, re.S)
    assert lit, f"no _R05_CHECKED literal in output:\n{out[:500]}"
    generated = set(ast.literal_eval(lit.group(1)))

    sys.path.insert(0, str(ROOT))
    from clickhouse_etl_spark import queries

    assert generated == set(queries._R05_CHECKED)
    # every failed driver row must be excluded; r5 had none
    assert "NOT signed" not in out
