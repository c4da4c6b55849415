"""Graph operator tests (reference G1-G3 semantics, hippoview
app.py:37-63,144-167)."""

from __future__ import annotations

import pytest

from hippollm_spark.operators import graph


@pytest.fixture(scope="module")
def edges(spark):
    # fact 0: {A,B}; fact 1: {A,B,C}; fact 2: {B,C}; fact 3: {C,D}; fact 4: {D,E}
    rows = [
        (0, "A"), (0, "B"),
        (1, "A"), (1, "B"), (1, "C"),
        (2, "B"), (2, "C"),
        (3, "C"), (3, "D"),
        (4, "D"), (4, "E"),
    ]
    return spark.createDataFrame(rows, "fact_id long, entity string").cache()


def test_neighbours(edges):
    res = {r["entity"]: (r["n_facts"], r["fact_ids"]) for r in graph.neighbours(edges, "A").collect()}
    assert res == {"B": (2, [0, 1]), "C": (1, [1])}


def test_neighbours_of_leaf(edges):
    res = {r["entity"]: r["n_facts"] for r in graph.neighbours(edges, "E").collect()}
    assert res == {"D": 1}


def test_cooccurrence(edges):
    res = {
        (r["entity_a"], r["entity_b"]): (r["weight"], r["fact_ids"])
        for r in graph.cooccurrence(edges).collect()
    }
    assert res[("A", "B")] == (2, [0, 1])
    assert res[("B", "C")] == (2, [1, 2])
    assert res[("C", "D")] == (1, [3])
    assert ("A", "C") in res and ("D", "E") in res
    assert len(res) == 5


def test_cooccurrence_restricted(edges, spark):
    ids = spark.createDataFrame([(0,)], "fact_id long")
    res = {(r["entity_a"], r["entity_b"]) for r in graph.cooccurrence(edges, ids).collect()}
    assert res == {("A", "B")}


def test_explore_depth_and_visited(edges):
    # From A, depth 1: B, C. Depth 2 adds D (via C). E only at depth 3.
    d1 = graph.explore(edges, ["A"], max_depth=1, max_relations=None)
    assert {r["dst"] for r in d1.collect()} == {"B", "C"}
    d2 = graph.explore(edges, ["A"], max_depth=2, max_relations=None)
    got = {(r["src"], r["dst"], r["depth"]) for r in d2.collect()}
    # depth-2 frontier = {B, C}; their unvisited neighbours include D
    assert ("C", "D", 2) in got
    assert {r["dst"] for r in d2.collect()} >= {"B", "C", "D"}
    # A itself never re-expanded as dst from origin set at depth 2
    d3 = graph.explore(edges, ["A"], max_depth=3, max_relations=None)
    assert ("D", "E", 3) in {(r["src"], r["dst"], r["depth"]) for r in d3.collect()}


def test_explore_max_relations_cap(edges):
    # Cap depth-1 fanout to the single strongest neighbour (B with 2 facts
    # beats C with 1 — reference app.py:47-50 keeps most-shared-facts).
    capped = graph.explore(edges, ["A"], max_depth=1, max_relations=1)
    rows = capped.collect()
    assert {(r["src"], r["dst"]) for r in rows} == {("A", "B")}


def _py_pagerank(edge_list, iterations=6, damping=85, scale=10**12):
    """Independent pure-Python replica of the scaled-integer recurrence."""
    e = sorted(set(edge_list))
    verts = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(verts)
    r0 = scale // n
    base = ((100 - damping) * r0) // 100
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: r0 for v in verts}
    for _ in range(iterations):
        s_in = {v: 0 for v in verts}
        for s, d in e:
            s_in[d] += r[s] // outdeg[s]
        r = {v: base + (damping * s_in[v]) // 100 for v in verts}
    return r


def test_pagerank_matches_pure_python(spark):
    # Directed graph with a sink (D has no out-edges) and a hub (A).
    edge_list = [
        ("A", "B"), ("A", "C"), ("B", "A"), ("C", "A"),
        ("B", "C"), ("C", "D"), ("E", "A"), ("E", "D"),
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["vertex"]: r["rank_scaled"]
        for r in graph.pagerank(df, iterations=6).collect()
    }
    assert got == _py_pagerank(edge_list)
    # the hub outranks the leaf that only feeds it
    assert got["A"] > got["E"]


def test_pagerank_cycle_uniform(spark):
    # A symmetric cycle is rank-uniform at every iteration.
    cyc = [("A", "B"), ("B", "C"), ("C", "A")]
    df = spark.createDataFrame(cyc, ["src", "dst"])
    ranks = {r["rank_scaled"] for r in graph.pagerank(df, iterations=4).collect()}
    assert len(ranks) == 1


def test_triangle_stats_hand_computed(spark):
    # K4 on {A,B,C,D} (4 triangles, 12 wedges) plus a pendant E-A
    # (adds 3 wedges at A, no triangles). Feed edges in mixed
    # orientation with a duplicate to exercise canonicalization.
    edge_list = [
        ("A", "B"), ("B", "C"), ("C", "A"), ("A", "D"), ("B", "D"),
        ("D", "C"), ("E", "A"), ("A", "E"), ("B", "A"),
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    row = graph.triangle_stats(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 15
    assert row["clustering"] == round(3.0 * 4 / 15, 6)


def test_triangle_stats_triangle_free(spark):
    star = [("HUB", x) for x in ("A", "B", "C", "D")]
    df = spark.createDataFrame(star, ["src", "dst"])
    row = graph.triangle_stats(df).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 6


def test_personalized_pagerank_matches_pure_python(spark):
    edge_list = [
        ("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"),
        ("C", "D"), ("D", "C"), ("D", "E"), ("E", "D"),
    ]
    seeds = ["A"]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["vertex"]: r["rank_scaled"]
        for r in graph.pagerank(df, iterations=6, seeds=seeds).collect()
    }
    # replica with seeded init/teleport
    scale, damping = 10**12, 85
    verts = sorted({v for e in edge_list for v in e})
    r0 = scale // len(seeds)
    outdeg = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: (r0 if v in seeds else 0) for v in verts}
    for _ in range(6):
        s_in = {v: 0 for v in verts}
        for s, d in set(edge_list):
            s_in[d] += r[s] // outdeg[s]
        r = {
            v: ((100 - damping) * r0 // 100 if v in seeds else 0)
            + (damping * s_in[v]) // 100
            for v in verts
        }
    assert got == r
    # the seed holds the most mass (even-distance parity effects make
    # finer orderings oscillate at finite iteration counts)
    assert got["A"] == max(got.values())


def test_weighted_pagerank_matches_pure_python(spark):
    edge_list = [
        ("A", "B", 3), ("B", "A", 3), ("A", "C", 1), ("C", "A", 1),
        ("B", "C", 2), ("C", "B", 2),
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst", "weight"])
    got = {
        r["vertex"]: r["rank_scaled"]
        for r in graph.pagerank(df, iterations=5, weight_col="weight").collect()
    }
    scale, damping = 10**12, 85
    verts = sorted({v for s, d, _ in edge_list for v in (s, d)})
    n = len(verts)
    r0 = scale // n
    base = ((100 - damping) * r0) // 100
    wsum = {}
    for s, _, w in edge_list:
        wsum[s] = wsum.get(s, 0) + w
    r = {v: r0 for v in verts}
    for _ in range(5):
        s_in = {v: 0 for v in verts}
        for s, d, w in edge_list:
            s_in[d] += (r[s] * w) // wsum[s]
        r = {v: base + (damping * s_in[v]) // 100 for v in verts}
    assert got == r
    # A-B carry 3x the weight of A-C: B must outrank C
    assert got["B"] > got["C"]


def _hits_python(edges, iterations=3, scale=10**12):
    verts = sorted({v for e in edges for v in e})
    hub = {v: scale for v in verts}
    auth = {v: scale for v in verts}
    eset = sorted(set(edges))
    for _ in range(iterations):
        a_raw = {v: 0 for v in verts}
        for s, d in eset:
            a_raw[d] += hub[s]
        mx = max(a_raw.values())
        auth = {v: (a_raw[v] * scale) // mx if mx > 0 else 0 for v in verts}
        h_raw = {v: 0 for v in verts}
        for s, d in eset:
            h_raw[s] += auth[d]
        mx = max(h_raw.values())
        hub = {v: (h_raw[v] * scale) // mx if mx > 0 else 0 for v in verts}
    return hub, auth


def test_hits_matches_python_replica(spark):
    from hippollm_spark.operators.graph import hits

    edges = [
        ("h1", "a1"), ("h1", "a2"), ("h1", "a3"),  # h1: strong hub
        ("h2", "a1"), ("h2", "a2"),
        ("x", "a1"),                                # a1: strong authority
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["vertex"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(df, iterations=3).collect()
    }
    hub, auth = _hits_python(edges)
    for v in hub:
        assert got[v] == (hub[v], auth[v]), v
    # structural sanity: h1 is the top hub, a1 the top authority
    assert got["h1"][0] == max(h for h, _ in got.values())
    assert got["a1"][1] == max(a for _, a in got.values())


def test_hits_partition_invariant(spark):
    from hippollm_spark.operators.graph import hits

    import random

    rng = random.Random(5)
    edges = [
        (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}") for _ in range(150)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, hits(df, 2).collect()))
    b = sorted(map(tuple, hits(df.repartition(13), 2).collect()))
    assert a == b


def test_random_walks_deterministic_and_valid(spark):
    from collections import defaultdict

    from hippollm_spark.operators.graph import random_walks

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = random_walks(df, walks_per_vertex=2, walk_length=3).collect()
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    walks = defaultdict(dict)
    for r in out:
        walks[r["walk_id"]][r["step"]] = r["vertex"]
    assert len(walks) == 8  # 4 vertices x 2 walks
    for wid, steps in walks.items():
        seq = [steps[i] for i in sorted(steps)]
        assert seq[0] == wid.split("#")[0]
        for u, v in zip(seq, seq[1:]):
            assert v in adj[u], (wid, seq)  # every hop is a real edge
        # sink 'd' has no out-edges: walks stop there
        if "d" in seq:
            assert seq.index("d") == len(seq) - 1

    # deterministic under repartition; re-salt changes the walks
    a = sorted(map(tuple, out))
    b = sorted(map(tuple, random_walks(df.repartition(5), 2, 3).collect()))
    assert a == b
    c = sorted(map(tuple, random_walks(df, 2, 3, salt="other").collect()))
    assert c != a


def test_triangle_stats_paths_agree(spark, monkeypatch):
    """The round-10 broadcast-adjacency intersect path and the general
    wedge-join path must count identically on a random-ish graph
    (deterministic congruential edges, includes hubs and duplicates) —
    and the hand-computed cases above must hold on BOTH paths."""
    import random

    rng = random.Random(42)
    edge_list = [
        (f"v{rng.randrange(40)}", f"v{rng.randrange(40)}") for _ in range(600)
    ]
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    wedge_path = graph.triangle_stats(df).collect()[0]
    # forcing the wedge-materialization gate to 0 engages the
    # broadcast-adjacency intersect path on the same graph
    monkeypatch.setattr(graph, "_WEDGE_MATERIALIZE_MAX", 0)
    intersect_path = graph.triangle_stats(df).collect()[0]
    assert (wedge_path["n_triangles"], wedge_path["n_wedges"]) == (
        intersect_path["n_triangles"],
        intersect_path["n_wedges"],
    )
    assert wedge_path["n_triangles"] > 0

    # K4 + pendant on the intersect path too (the gate monkeypatch is
    # still active): same expected values as the default-path test.
    k4 = [
        ("A", "B"), ("B", "C"), ("C", "A"), ("A", "D"), ("B", "D"),
        ("D", "C"), ("E", "A"), ("A", "E"), ("B", "A"),
    ]
    row = graph.triangle_stats(spark.createDataFrame(k4, ["src", "dst"])).collect()[0]
    assert row["n_triangles"] == 4 and row["n_wedges"] == 15


def test_triangle_stats_gate_overrides(spark):
    """Round 11 (ADVICE r10): the strategy gates are no longer
    hardcoded constants — keyword args and session conf both select
    the path, and the heap-derived default is a sane positive number."""
    k4 = [
        ("A", "B"), ("B", "C"), ("C", "A"), ("A", "D"), ("B", "D"),
        ("D", "C"), ("E", "A"),
    ]
    df = spark.createDataFrame(k4, ["src", "dst"])
    # kwarg: force the intersect path (wedge gate 0) and verify parity
    via_kwargs = graph.triangle_stats(df, wedge_materialize_max=0).collect()[0]
    assert via_kwargs["n_triangles"] == 4 and via_kwargs["n_wedges"] == 15
    # conf: same forcing through the session knob
    spark.conf.set("spark.hippollm.triangles.wedgeMaterializeMax", "0")
    try:
        via_conf = graph.triangle_stats(df).collect()[0]
    finally:
        spark.conf.unset("spark.hippollm.triangles.wedgeMaterializeMax")
    assert via_conf["n_triangles"] == 4 and via_conf["n_wedges"] == 15
    # kwarg gates below the graph size force the wedge-join fallback
    # even when wedges exceed the wedge gate: still correct
    via_fallback = graph.triangle_stats(
        df, wedge_materialize_max=0, intersect_edge_max=1
    ).collect()[0]
    assert via_fallback["n_triangles"] == 4
    # heap-derived default: positive, and conf-overridable
    assert graph._intersect_edge_gate(spark) > 0
    spark.conf.set("spark.hippollm.triangles.intersectEdgeMax", "12345")
    try:
        assert graph._intersect_edge_gate(spark) == 12345
    finally:
        spark.conf.unset("spark.hippollm.triangles.intersectEdgeMax")


def test_triangle_stats_releases_cache_pins(spark):
    """ADVICE r10: triangle_stats must not leave its internal cache
    pins (canon/deg/oriented — 3 per call) resident after returning —
    repeated library calls previously accumulated executor storage.
    Each call's SEALED one-row result legitimately holds its own
    localCheckpoint block while referenced (and the async
    ContextCleaner may lag), so the assertion bounds accumulation
    across three calls well below the 9 pins a leak would leave,
    rather than demanding an exact count."""
    def n_persistent():
        return len(
            [r for r in spark.sparkContext._jsc.getPersistentRDDs().items()]
        )

    before = n_persistent()
    df = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A")], ["src", "dst"]
    )
    for _ in range(3):
        graph.triangle_stats(df).collect()
    assert n_persistent() - before <= 4  # leak would add >= 9
