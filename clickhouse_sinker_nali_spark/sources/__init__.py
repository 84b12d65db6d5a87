"""Source-side building blocks: schema catalog scans and series preload.

- ``catalog``: auto-schema discovery from ClickHouse ``system.columns``
  (reference S5) and the Prometheus series-id preload scan (S6)

The Kafka/file message sources live in ``streaming.pipeline`` (they are
inseparable from the pipeline contract).
"""

from .catalog import fetch_catalog_jdbc, fetch_series_ids_jdbc, schema_from_catalog

__all__ = ["fetch_catalog_jdbc", "fetch_series_ids_jdbc", "schema_from_catalog"]
