"""Freeze the registry's implementing-source hashes at signing time.

Run this ONCE per round, at the exact commit a driver CORRECTNESS run
certified (i.e. right after recording a round's artifacts / right at
round start before touching code). From then on,
``tests/test_rotation.py`` mechanically fails whenever an implementing
function changes without the entry being added to ``_STALE_SIGNED``.

Usage: python scripts/snapshot_impl_hashes.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.impl_hash import SNAPSHOT_PATH, registry_hashes  # noqa: E402


def main():
    hashes = registry_hashes()
    SNAPSHOT_PATH.write_text(json.dumps(hashes, indent=0, sort_keys=True) + "\n")
    print(f"wrote {len(hashes)} hashes -> {SNAPSHOT_PATH}")


if __name__ == "__main__":
    main()
