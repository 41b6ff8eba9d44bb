"""enrich_spark — a PySpark-native event enrichment + data-pipeline engine.

Capability parity target: snowplow/enrich (see SURVEY.md). Architecture:
declarative DataFrame plan builders, Catalyst-optimized, broadcast joins
for every lookup, UDFs only at ingest (thrift) and the webhook long tail.
"""

__version__ = "0.1.0"
