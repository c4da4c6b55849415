from hippollm_spark.operators import (  # noqa: F401
    dedup,
    graph,
    knn,
    relational,
    similarity,
    textstats,
)
