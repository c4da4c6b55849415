from hippollm_spark.pipelines import annotate, backends, prompts  # noqa: F401
