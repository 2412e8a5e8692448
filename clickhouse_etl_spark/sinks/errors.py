"""ClickHouse sink error classification: retryable vs permanent vs unknown.

Ports the reference's classification table semantics
(glassflow-api/internal/sink/errors/classification.go:42-160). The
code lists are public ClickHouse error codes (ClickHouse
src/Common/ErrorCodes.cpp / ch-go proto/error_codes.go):

- Retryable: transient server/network pressure — the batch is retried
  (in Spark: raise inside foreachBatch so the streaming query retries
  the epoch; checkpointing makes the replay safe).
- Permanent: data/schema/auth errors that will fail again — rows are
  diverted to the DLQ and the batch proceeds.
- Unknown: conservative default — DLQ + a needs_classification marker.
"""

from __future__ import annotations

import enum
import re
from typing import Optional


class Classification(enum.Enum):
    RETRYABLE = "retryable"
    PERMANENT = "permanent"
    UNKNOWN = "unknown"


#: transient pressure — same write may succeed later (classification.go:42-67)
RETRYABLE_CODES = frozenset(
    {159, 202, 203, 209, 210, 241, 242, 243, 244, 254, 265, 285, 286,
     279, 297, 289, 290, 364, 384, 198, 201, 236, 999, 1000}
)

#: data/schema/auth — will fail again on retry (classification.go:70-101)
PERMANENT_CODES = frozenset(
    {6, 7, 16, 18, 20, 25, 26, 27, 38, 41, 43, 44, 47, 53, 60, 72, 80,
     81, 117, 192, 193, 194, 195, 164, 291, 321, 349, 392, 516}
)

#: "Code: NNN." appears in ClickHouse exception text across clients
_CODE_RE = re.compile(r"Code:\s*(\d+)")

_NETWORK_MARKERS = (
    "connection refused", "connection reset", "broken pipe", "timed out",
    "timeout", "eof", "no route to host", "connection aborted",
)


def extract_clickhouse_code(err: Exception | str) -> Optional[int]:
    m = _CODE_RE.search(str(err))
    return int(m.group(1)) if m else None


def classify_clickhouse_error(err: Exception | str) -> Classification:
    """Classify a sink write error (classification.go:123-146 semantics):
    known CH code -> table lookup; bare network error -> retryable;
    anything else -> unknown (route to DLQ, flag for triage)."""
    code = extract_clickhouse_code(err)
    if code is not None:
        if code in RETRYABLE_CODES:
            return Classification.RETRYABLE
        if code in PERMANENT_CODES:
            return Classification.PERMANENT
        return Classification.UNKNOWN
    msg = str(err).lower()
    if any(marker in msg for marker in _NETWORK_MARKERS):
        return Classification.RETRYABLE
    return Classification.UNKNOWN
