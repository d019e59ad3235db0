"""etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference ETL engine
(``alarbulu/test-etl``, surveyed in SURVEY.md) on idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns) the reference's north star mandates.

Layout:
  session.py    SparkSession factory (AQE, shuffle sizing, Arrow)
  io.py         table loading / temp-view registration for the testdata
  functions/    reusable column-expression builders (decimal-stable money
                math, text metrics, vector math)
  plans/        the query registry: every supported query as a
                (Spark builder, DuckDB oracle SQL) pair
  operators/    higher-order operators (snapshot dedup, MinHash LSH,
                ANN search, multimodal plumbing)
  etl/          reference-fidelity ETL: REST ingest connector, raw zone,
                latest-snapshot pipeline, CSV export
  streaming/    Structured Streaming variants of the event queries
"""

__version__ = "0.1.0"
