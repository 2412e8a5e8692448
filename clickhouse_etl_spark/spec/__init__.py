"""spec — declarative pipeline configuration (v3-JSON compatible).

The pipeline spec is the engine's "query language": N sources ->
per-source transforms (filter / dedup / stateless projection) ->
optional 2-way temporal join -> mapped sink, plus a DLQ
(reference wire format: glassflow-api/internal/api/pipeline.go:199-330).
"""

from .migrate import convert_v2_to_v3
from .model import (
    DedupConfig,
    Field,
    FilterConfig,
    JoinConfig,
    JoinOutputField,
    JoinSourceConfig,
    PipelineSpec,
    SinkConfig,
    SinkMapping,
    SourceConfig,
    TransformConfig,
    TransformOutput,
    parse_pipeline_json,
)
from .types import (
    BASIC_TYPES,
    ch_type_to_spark,
    fields_to_struct,
    normalize_source_type,
    source_type_to_spark,
)

__all__ = [
    "PipelineSpec", "SourceConfig", "FilterConfig", "DedupConfig",
    "TransformConfig", "TransformOutput", "JoinConfig", "JoinSourceConfig",
    "JoinOutputField", "SinkConfig", "SinkMapping", "Field",
    "parse_pipeline_json", "convert_v2_to_v3", "normalize_source_type", "ch_type_to_spark",
    "source_type_to_spark", "fields_to_struct", "BASIC_TYPES",
]
