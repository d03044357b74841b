from crusty_core_spark.sources.tables import TableIO  # noqa: F401
