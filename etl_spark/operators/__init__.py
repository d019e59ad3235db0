"""Higher-order operators that go beyond single registered queries:
snapshot dedup (etl.pipeline), media decode plumbing (media), and
streaming variants (etl_spark.streaming)."""
