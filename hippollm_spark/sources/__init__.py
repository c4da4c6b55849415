from hippollm_spark.sources import loaders  # noqa: F401
