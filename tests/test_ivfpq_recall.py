"""IVF-PQ quality evidence: the recall@10 curve of the persisted
IVFADC artifacts over the sf0.1 embeddings, decomposed into its two
losses — (a) the coarse quantizer (a true neighbour's list may simply
not be probed: the CEILING) and (b) PQ distortion within the probed
lists (recoverable by the IVFADC-R exact re-rank, `ivfpq_topk_rerank`).

The curve is computed with a numpy replica of the exact integer math
(same e6 quantization, same (dist, id) tie-breaks) so 20 queries × 5
nprobe settings don't need 100 Spark jobs; one configuration is then
cross-checked against the production Spark path row-for-row. The
measured numbers live in COVERAGE.md next to the ann_ivfpq rows.

Note the residual ceiling gap (0.945 at nprobe=nlist/2 on the round-8
nlist=128 k-means++ artifact; the retired nlist=16 artifact capped at
0.805) is a property of the near-uniform SYNTHETIC embeddings —
neighbours of a uniform cloud scatter across Voronoi cells almost
independently of the query's own cell. Real embedding distributions
(clustered) probe far better; the assertions here pin what is
invariant: monotonicity, re-rank dominance, re-rank saturating ≥95%
of whatever the probe admits, and the ≥0.9 half-probe ceiling /
≥0.85 absolute floors of the current artifact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from hippollm_spark.operators.similarity import load_ivfpq_e6

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
QUERIES = list(range(0, 200, 10))
# probe fractions of nlist=128: 1/16, 1/8, 1/4, 1/2, full
NPROBES = (8, 16, 32, 64, 128)
NLIST = 128
HALF = NLIST // 2


@pytest.fixture(scope="module")
def fitted():
    art = load_ivfpq_e6()
    cents = np.asarray(art["coarse_e6"], dtype=np.int64)
    cb = np.asarray(art["codebooks_e6"], dtype=np.int64)
    m, _ksub, dsub = cb.shape
    tb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = np.array(tb["vec_id"].to_pylist())
    xq = np.round(
        np.array(tb["embedding"].to_pylist(), dtype=np.float64) * 1e6
    ).astype(np.int64)
    assign = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(-1).argmin(1)
    res = xq - cents[assign]
    codes = np.zeros((len(xq), m), dtype=np.int64)
    for j in range(m):
        sub = res[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1).argmin(1)
    return ids, xq, cents, cb, assign, codes


def _adc_dists(q, cents, cb, assign, codes, nprobe):
    m, _ksub, dsub = cb.shape
    nlist = cents.shape[0]
    qd = ((cents - q) ** 2).sum(1)
    probed = np.lexsort((np.arange(nlist), qd))[:nprobe]
    dist = np.full(len(assign), np.iinfo(np.int64).max)
    for l in probed:
        mask = assign == l
        if not mask.any():
            continue
        qres = q - cents[l]
        lut = np.stack(
            [((cb[j] - qres[j * dsub : (j + 1) * dsub]) ** 2).sum(1) for j in range(m)]
        )
        dist[mask] = lut[np.arange(m)[:, None], codes[mask].T].sum(0)
    return dist, set(int(x) for x in probed)


def _curves(fitted):
    ids, xq, cents, cb, assign, codes = fitted
    raw = {p: 0 for p in NPROBES}
    rer100 = {p: 0 for p in NPROBES}
    rer400 = {p: 0 for p in NPROBES}
    ceil = {p: 0 for p in NPROBES}
    for qi in QUERIES:
        q = xq[qi]
        exact = ((xq - q) ** 2).sum(1)
        exact_top = np.lexsort((ids, exact))[:K]
        exact_set = set(ids[exact_top])
        for p in NPROBES:
            dist, probed = _adc_dists(q, cents, cb, assign, codes, p)
            order = np.lexsort((ids, dist))
            raw[p] += len(exact_set & set(ids[order[:K]]))
            for depth, acc in ((100, rer100), (400, rer400)):
                short = order[:depth]
                short = short[dist[short] < np.iinfo(np.int64).max]
                rr = short[np.lexsort((ids[short], exact[short]))][:K]
                acc[p] += len(exact_set & set(ids[rr]))
            ceil[p] += sum(1 for t in exact_top if int(assign[t]) in probed)
    n = K * len(QUERIES)
    f = lambda d: {p: d[p] / n for p in NPROBES}
    return f(raw), f(rer100), f(rer400), f(ceil)


def test_recall_curve_monotone_and_rerank_saturates_ceiling(fitted):
    raw, rer100, rer400, ceil = _curves(fitted)
    for a, b in zip(NPROBES, NPROBES[1:]):
        # the CEILING is monotone by construction (probe sets nest);
        # raw ADC / fixed-depth shortlists are NOT invariant-monotone —
        # extra probed lists admit extra PQ-distorted distractors that
        # can push a true neighbour past rank K (measured wiggle ≤0.015
        # on the nlist=64 artifact) — so they only get a slack bound
        assert ceil[a] <= ceil[b] + 1e-9
        assert raw[a] <= raw[b] + 0.05, (raw, a, b)
        assert rer100[a] <= rer100[b] + 0.05
    for p in NPROBES:
        assert rer100[p] >= raw[p] - 1e-9, "re-rank must dominate raw ADC"
        assert rer400[p] >= rer100[p] - 1e-9, "deeper shortlist must dominate"
        assert rer400[p] <= ceil[p] + 1e-9, "nothing can beat the list ceiling"
    # full probe admits everything
    assert ceil[NLIST] == 1.0
    # the round-8 coarse upgrade (nlist 16 -> 128, k-means++ seeding,
    # 15 Lloyd iters on sf0.1): the half-probe CEILING clears 0.9 —
    # the round-7 artifact capped ANY re-rank at 0.805 there
    assert ceil[HALF] >= 0.9, ceil[HALF]
    # where the PROBE is the binding constraint (nprobe=nlist/2),
    # IVFADC-R recovers >=95% of whatever the probed lists admit...
    assert rer400[HALF] >= 0.95 * ceil[HALF], (rer400[HALF], ceil[HALF])
    # ...and >=0.85 ABSOLUTE recall@10 at the half-probe point
    assert rer400[HALF] >= 0.85, rer400[HALF]
    # at full probe the binding loss shifts to ADC ordering depth
    # (true neighbours pushed past the shortlist by PQ distortion on
    # this near-uniform data); the R=400 shortlist (20% of the corpus)
    # still lands >=0.85, and R -> n is exact by construction
    assert rer400[NLIST] >= 0.85, rer400[NLIST]


def test_spark_rerank_path_matches_replica(spark, fitted):
    """The production ivfpq_topk_rerank DataFrame path reproduces the
    replica's exact (id, dist) top-10 at (nprobe=HALF, rerank=100)."""
    from hippollm_spark.operators.similarity import ivfpq_topk_rerank

    ids, xq, cents, cb, assign, codes = fitted
    qi = 30
    q = xq[qi]
    dist, _ = _adc_dists(q, cents, cb, assign, codes, HALF)
    order = np.lexsort((ids, dist))[:100]
    order = order[dist[order] < np.iinfo(np.int64).max]
    exact = ((xq - q) ** 2).sum(1)
    rr = order[np.lexsort((ids[order], exact[order]))][:K]
    want = [(int(ids[t]), int(exact[t])) for t in rr]

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = [
        (r["vec_id"], r["dist_e12"])
        for r in ivfpq_topk_rerank(
            emb, cents, cb, q.tolist(), k=K, nprobe=HALF, rerank=100
        ).collect()
    ]
    assert got == want
