"""Scale-path proofs at test size: bucketed joins skip the shuffle,
IVF recall is high on clustered data (its honest regime), serial-parity
annotation dedups across documents."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bucketed_store_join_has_no_exchange(spark, store_tables):
    from hippollm_spark.store import HippoStore

    store = HippoStore(
        spark, entities=store_tables["entities"], facts=store_tables["facts"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        store.save_bucketed("bk", n_buckets=4)
        loaded = HippoStore.load_bucketed(spark, "bk")

        # force the non-broadcast path so bucketing (not broadcast) is
        # what eliminates the shuffle — at scale the sides are too big
        # to broadcast anyway
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = loaded.facts.select("id", "text")
        b = loaded.facts.select(F.col("id"), F.col("confidence"))
        plan = a.join(b, "id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert a.join(b, "id").count() == loaded.facts.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_facts")
        spark.sql("DROP TABLE IF EXISTS bk_entities")


def test_ivf_recall_on_clustered_data(spark):
    """IVF pruning earns its keep when vectors cluster (real embedding
    geometry); recall>=0.9 with nprobe/nlist = 1/4 on 10 well-separated
    clusters."""
    from hippollm_spark.operators.similarity import ivf_build, ivf_topk
    from hippollm_spark.operators.knn import knn

    rng = np.random.RandomState(0)
    centers = rng.randn(10, 32) * 10
    rows = []
    for i in range(4000):
        c = i % 10
        v = centers[c] + rng.randn(32) * 0.5
        rows.append((i, [float(x) for x in v]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    q = [float(x) for x in centers[3] + 0.1]
    exact = [r["vec_id"] for r in knn(vecs, q, 20, id_col="vec_id").collect()]
    assigned, cents = ivf_build(vecs, nlist=16, iters=4)
    assigned = assigned.cache()
    approx = [
        r["vec_id"]
        for r in ivf_topk(assigned, cents, q, k=20, nprobe=4, id_col="vec_id").collect()
    ]
    recall = len(set(exact) & set(approx)) / 20
    assert recall >= 0.9, recall


def test_serial_annotation_dedups_across_documents(spark):
    from hippollm_spark.pipelines.annotate import (
        AnnotateConfig,
        annotate_documents_serial,
    )
    from hippollm_spark.pipelines.backends import ScriptedLLM, ScriptedNLI
    from hippollm_spark.store import HippoStore
    from hippollm_spark.testing import hash_embedding_udf

    docs = spark.createDataFrame(
        [
            (1, "a", "u", "The sky is blue.", None),
            (2, "b", "u", "Blue is the sky's color.", None),
        ],
        "doc_id long, title string, url string, content string, date timestamp",
    )
    llm = ScriptedLLM(
        script={
            "Summarize in one sentence": "ctx.",
            "The sky is blue.": "- The sky is blue",
            "Blue is the sky's color.": "- The sky has a blue color",
            "Statement: The sky is blue": "The sky is blue",
            "Statement: The sky has a blue color": "The sky has a blue color",
            "A: The sky is blue\nB: The sky has a blue color": "Yes",
            "Fact: The sky is blue": "- Sky",
        }
    )
    nli = ScriptedNLI(table={("The sky is blue", "The sky has a blue color"): 0.9})
    store = HippoStore(spark, embed=hash_embedding_udf(16), dim=16)
    annotate_documents_serial(
        store, docs, llm, nli, hash_embedding_udf(16),
        AnnotateConfig(splitter="paragraph", embed_dim=16),
    )
    # doc 2's fact is redundant with doc 1's fact added one iteration earlier
    assert [r["text"] for r in store.facts.collect()] == ["The sky is blue"]
