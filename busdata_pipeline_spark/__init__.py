"""busdata_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(`boblancer/busdata-pipeline`: collector -> subscriber -> transform ->
analytic SQL over PostgreSQL) as an idiomatic Spark engine:

- batch:   DataFrame / Spark SQL lineages, Catalyst-optimized
- stream:  Structured Streaming with event-time routing + watermarks
- storage: date-partitioned Parquet star schema (Trip dim + BreadCrumb fact)
- extras:  large-scale training-data operators (dedup, similarity search,
           text analysis, multimodal column plumbing)

Nothing here is a translation of the reference's imperative Python; every
operator is declared as a logical plan and physical strategy is left to
Catalyst/Tungsten (see SURVEY.md §4, SCALE.md).
"""

__version__ = "0.1.0"
