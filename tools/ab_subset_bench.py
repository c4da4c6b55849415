"""Subset A/B bench: time a fixed query list from a given repo root.

Usage: python tools/ab_subset_bench.py <repo_root> [sf_dir]

Mirrors bench.py's protocol (warmup pass, clearCache + unpersist between
queries, noop sink) but over a small suspect list so an A/B of two
commits fits in a couple of minutes instead of 2x13.
"""
import json
import os
import sys
import time

repo = os.path.abspath(sys.argv[1])
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, repo)

QUERIES = [
    # inflated suspects
    "graph_hits", "corpus_curation", "golden_records", "dedup_groups",
    "dedup_jaccard", "basket_lift", "lm_perplexity", "corr_matrix",
    "ols_trend", "incremental_dedup", "graph_sssp", "contamination",
    # controls (unchanged in the diff)
    "window_topk", "tpch_q13", "rolling_revenue_7d",
]
if os.environ.get("AB_QUERIES"):
    QUERIES = [q for q in os.environ["AB_QUERIES"].split(",") if q]

import importlib.util

spec = importlib.util.spec_from_file_location(
    "entry_ab", os.path.join(repo, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

from hippollm_spark.session import get_spark  # noqa: E402  (repo on sys.path)

spark = get_spark("ab_subset_bench")

qs = entry_mod.queries()
spark.range(1000).selectExpr("sum(id)").collect()
for name in QUERIES:
    qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

import gc

timings = {}
for name in QUERIES:
    spark.catalog.clearCache()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    except Exception:
        pass
    gc.collect()
    t0 = time.time()
    qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    timings[name] = round(time.time() - t0, 3)
    print(f"  {name}: {timings[name]}", file=sys.stderr)

out = {"repo": repo, "total": round(sum(timings.values()), 3), "queries": timings}
print(json.dumps(out))
