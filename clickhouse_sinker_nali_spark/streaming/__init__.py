"""Structured Streaming layer: the reference's task pipeline on Spark.

- ``pipeline``  TaskConfig → streaming query (Kafka/file source → parse →
  enrich → sharded sink), reference §3.2 hot path
- ``sinks``     batched sharded writers with retry/failover (JDBC / parquet)
- ``dynamic``   dynamic-schema mode: new-key detection → ALTER → restart
"""
