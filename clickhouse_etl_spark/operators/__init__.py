"""operators — pure DataFrame -> DataFrame building blocks.

Every operator in the reference's inventory (SURVEY.md §2) is a pure
function over DataFrames, usable identically under the batch runner
(parquet in/out, oracle-checked) and the streaming runner
(readStream/writeStream). This mirrors the reference's processor chain
(glassflow-api/internal/processor/component.go:17-47) with the chain
replaced by ordinary function composition.
"""

from .dedup import dedup_first_wins, dedup_windowed
from .filter import apply_filter
from .join import asof_join, temporal_join_batch
from .mapper import apply_sink_mapping
from .transform import apply_transform
from .validate import dlq_schema, validate_json

__all__ = [
    "apply_filter",
    "apply_transform",
    "dedup_first_wins",
    "dedup_windowed",
    "temporal_join_batch",
    "asof_join",
    "apply_sink_mapping",
    "validate_json",
    "dlq_schema",
]
