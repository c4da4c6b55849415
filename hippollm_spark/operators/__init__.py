from hippollm_spark.operators import (  # noqa: F401
    dedup,
    graph,
    knn,
    multimodal,
    relational,
    sampling,
    scd,
    similarity,
    skew,
    stats,
    temporal,
    textstats,
)
