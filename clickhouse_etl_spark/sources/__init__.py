"""sources — batch table loaders, Kafka stream builder, OTLP flatteners."""

from .batch import TABLES, load_table, load_tables
from .filestream import IncrementalCorpusJob, read_file_stream

__all__ = ["load_table", "load_tables", "TABLES"]
