"""Driver-contract self-checks: the bench list, queries(), and
oracle_sql() stay mutually consistent, and every query builds a plan
at sf0.001 (no analysis errors hiding until the driver runs)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from bench import BENCH_EXCLUDED, BENCH_QUERIES

SF = "/root/testdata/sf0.001"

# rows-only by design (mmr_rerank graduated to an oracle in round 4
# via the quantized-integer twin; ann_pq_topk + pca_embeddings in
# round 6 via persisted e6 artifacts): approx_stats keeps engine-
# specific sketches (no SQL twin possible), pack_bins is a greedy
# sequential FFD the driver checks rows-only — see COVERAGE.md.
EXPECTED_NO_ORACLE = {
    "approx_stats",
    "pack_bins",
}


def test_bench_queries_all_registered():
    qs = entry.queries()
    missing = [q for q in BENCH_QUERIES if q not in qs]
    assert not missing, f"bench names not in queries(): {missing}"


def test_every_query_is_benched():
    """BENCH_QUERIES is now derived from entry.queries() (round-9
    lesson), so drift is impossible by construction — this guard now
    polices the exclusion mechanism instead: every exclusion must name
    a real query and carry a non-empty reason string."""
    qs = set(entry.queries())
    unbenched = [q for q in qs if q not in set(BENCH_QUERIES)]
    assert set(unbenched) == set(BENCH_EXCLUDED), (
        f"queries missing from bench.py without an exclusion: "
        f"{sorted(set(unbenched) - set(BENCH_EXCLUDED))}"
    )
    stale = [q for q in BENCH_EXCLUDED if q not in qs]
    assert not stale, f"BENCH_EXCLUDED names unknown queries: {stale}"
    unreasoned = [q for q, why in BENCH_EXCLUDED.items()
                  if not (isinstance(why, str) and why.strip())]
    assert not unreasoned, f"exclusions without a reason: {unreasoned}"


def test_oracle_coverage_is_exactly_the_declared_set():
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    assert os_ <= qs, f"oracle keys without a query: {sorted(os_ - qs)}"
    assert qs - os_ == EXPECTED_NO_ORACLE, (
        "rows-only set drifted: " f"{sorted(qs - os_)}"
    )


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_analyzes(spark, name):
    """Catalyst analysis (schema resolution) succeeds for every query —
    cheap (no execution) and catches column typos immediately."""
    df = entry.queries()[name](spark, SF)
    assert len(df.schema.fields) > 0
