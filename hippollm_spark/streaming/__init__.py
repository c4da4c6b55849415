from hippollm_spark.streaming import events  # noqa: F401
