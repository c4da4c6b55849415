"""One-off trainer for the persisted PQ codebooks / PCA components.

Round-6 oracle graduation (VERDICT r5 items 1-2): `ann_pq_topk` and
`pca_embeddings` were rows-only because their trained artifacts (float
Lloyd codebooks, eigh components) are not SQL-derivable. The fix is the
deployed-model discipline: train ONCE here, quantize to e6 integers,
persist under hippollm_spark/assets/, and have BOTH the Spark query and
the DuckDB oracle replay the exact-BIGINT scan against the same
literals. The float training paths (pq_build, pca_fit) stay covered by
pytest recall/parity tests; the *serving* scan becomes hash-checked.

Run: python tools/train_pq_pca_assets.py [sf_dir]   (default sf0.01)
Deterministic given the input parquet (seed-42 Lloyd; eigh of exact
moment sums is partition-order dependent in the last ulp, but the
persisted 6dp rounding makes the artifact stable in practice — and once
persisted, determinism of the artifact no longer matters: it is frozen).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from hippollm_spark.operators.similarity import pca_fit, pq_build

ASSET_DIR = os.path.join(
    os.path.dirname(__file__), "..", "hippollm_spark", "assets"
)


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("train-assets")
        .getOrCreate()
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    cb = pq_build(emb, m=8, ksub=32, iters=5, seed=42)  # (8, 32, 8) float64
    cb_e6 = np.round(cb * 1_000_000.0).astype(np.int64)
    os.makedirs(ASSET_DIR, exist_ok=True)
    with open(os.path.join(ASSET_DIR, "pq_codebooks_e6.json"), "w") as f:
        json.dump(
            {
                "m": 8,
                "ksub": 32,
                "dsub": 8,
                "trained_on": os.path.basename(os.path.normpath(sf_dir)),
                "seed": 42,
                "iters": 5,
                "codebooks_e6": cb_e6.tolist(),
            },
            f,
        )

    # IVF-PQ (FAISS-style IVFADC): coarse centroids over the raw
    # vectors, then per-subspace codebooks over the RESIDUALS
    # (x − coarse_centroid) — residual PQ is what keeps ADC accurate
    # once lists are pruned (Jegou et al. 2011 §IV).
    import numpy as np_  # noqa: F811 - local alias for clarity

    sample = np.array(
        [r[0] for r in emb.select("embedding").limit(100_000).collect()],
        dtype=np.float64,
    )
    from hippollm_spark.operators.similarity import _lloyd

    rng = np.random.RandomState(42)
    nlist = 16
    coarse = _lloyd(sample, nlist, iters=8, rng=rng)  # (nlist, 64)
    assign = (
        ((sample[:, None, :] - coarse[None, :, :]) ** 2).sum(-1).argmin(1)
    )
    residuals = sample - coarse[assign]
    m, ksub, dsub = 8, 32, 8
    rcb = np.stack(
        [
            _lloyd(residuals[:, j * dsub : (j + 1) * dsub], ksub, 5, rng)
            for j in range(m)
        ]
    )
    with open(os.path.join(ASSET_DIR, "ivfpq_e6.json"), "w") as f:
        json.dump(
            {
                "nlist": nlist,
                "m": m,
                "ksub": ksub,
                "dsub": dsub,
                "trained_on": os.path.basename(os.path.normpath(sf_dir)),
                "seed": 42,
                "coarse_e6": np.round(coarse * 1_000_000.0)
                .astype(np.int64)
                .tolist(),
                "codebooks_e6": np.round(rcb * 1_000_000.0)
                .astype(np.int64)
                .tolist(),
            },
            f,
        )

    model = pca_fit(emb, 8)
    mean_e6 = np.round(model["mean"] * 1_000_000.0).astype(np.int64)
    comps_e6 = np.round(model["components"] * 1_000_000.0).astype(np.int64)
    with open(os.path.join(ASSET_DIR, "pca_components_e6.json"), "w") as f:
        json.dump(
            {
                "k": 8,
                "d": int(mean_e6.shape[0]),
                "trained_on": os.path.basename(os.path.normpath(sf_dir)),
                "mean_e6": mean_e6.tolist(),
                "components_e6": comps_e6.tolist(),
            },
            f,
        )
    print("wrote", os.listdir(ASSET_DIR))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
