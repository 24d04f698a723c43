from hierarchical_to_relational_spark.streaming.driver import CdcPipeline  # noqa: F401
