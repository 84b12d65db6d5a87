"""PySpark-native analytics + streaming-ETL engine.

A from-scratch re-expression of the capabilities of
``forever765/clickhouse_sinker_nali`` (a Go Kafka->ClickHouse sinker with
GeoIP/service enrichment) on Apache Spark, plus a first-class analytics and
LLM-data-pipeline layer (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession builder tuned for the engine
- ``schema``     ClickHouse type-string -> Spark ``StructType`` mapping
- ``coerce``     lenient type-coercion expression builders (never drop a row)
- ``datetimes``  multi-layout datetime parsing cascade
- ``parsers``    JSON / CSV message parsing into typed DataFrames
- ``enrich``     GeoIP range-lookup join + protocol:port service map join
- ``sharding``   stripe / hash shard-routing expressions
- ``sinks``      batched JDBC writer with retry/failover, schema evolution
- ``streaming``  Structured Streaming task pipeline (Kafka -> parse -> sink)
- ``operators``  analytics layer: dedup, similarity, text analysis, multimodal
- ``functions``  scalar function library
"""

__version__ = "0.1.0"
