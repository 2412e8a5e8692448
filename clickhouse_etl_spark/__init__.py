"""clickhouse_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
glassflow/clickhouse-etl (Kafka -> ClickHouse streaming ETL: declared
schemas, expr-lang filter/transform, keyed windowed dedup, 2-way
temporal enrichment join, mapped+batched idempotent sink, DLQ),
re-expressed Spark-first:

- every operator is a pure ``DataFrame -> DataFrame`` function compiled
  from a declarative pipeline spec (v3-JSON compatible);
- expressions compile to Catalyst ``Column`` trees, never Python row
  loops;
- the same operator chain runs in batch (parquet in/out, used for
  oracle correctness) and in Structured Streaming (Kafka in,
  foreachBatch ClickHouse/JDBC out);
- beyond the reference surface, first-class large-scale training-data
  ops live in ``dataops`` (dedup family, similarity search, text
  analysis, multimodal plumbing).

Reference parity citations use file:line paths relative to
``/root/reference/`` (glassflow/clickhouse-etl snapshot 2026-06-30).
"""

__version__ = "0.1.0"
