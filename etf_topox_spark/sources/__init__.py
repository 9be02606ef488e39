from etf_topox_spark.sources.tables import load_table  # noqa: F401
