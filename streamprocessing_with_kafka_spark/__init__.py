"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference stream processor (a Kafka validate/enrich/route
pipeline), re-expressed Spark-first, plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns,
event-time windows).

Layout:
  sources/    -- table loaders, raw-order message fixtures, JSON source,
                 seeded generator, Kafka readStream config
  operators/  -- validate / enrich / route (reference parity), CRUD,
                 analytics, dedup, similarity, text, multimodal, windows
  functions/  -- reusable column expressions (hashing, decimal-safe aggs)
  streaming/  -- Structured Streaming pipeline + sinks (foreachBatch split,
                 idempotent JDBC upsert)
  plans/      -- query registry binding each operator to a name and its
                 DuckDB oracle SQL

All transforms are pure DataFrame -> DataFrame functions so the same code
runs in batch tests, the DuckDB-oracle harness, and foreachBatch.
"""

from streamprocessing_with_kafka_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs"]
