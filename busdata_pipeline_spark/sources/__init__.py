from busdata_pipeline_spark.sources.tables import table, tables  # noqa: F401
