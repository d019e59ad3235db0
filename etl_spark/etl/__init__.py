"""Reference-fidelity ETL: REST ingestion (driver-side), append-only
raw zone, and the Spark-native latest-snapshot pipeline.

The split follows the engine's design stance (SURVEY.md §7): Spark is
not an HTTP client — the connector lands bytes in the raw zone with
plain Python (ingest.py, raw_zone.py), and everything after the bytes
land is a Spark DataFrame plan (pipeline.py).
"""
