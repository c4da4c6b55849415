"""Independent correctness check for the unrolled min-label
connected-components oracle (round 10).

The contract oracle for graph_components/_star was rewritten from a
recursive-CTE transitive closure (O(V²) — OOMed DuckDB on the dense
sf1 graph) to 16 unrolled hop+jump rounds. The testdata graphs are
single-component at every sf, so the sweep never exercises
multi-component output or deep-path convergence — this test does,
on synthetic lineitem/part views: a 60-vertex path (needs ~6 doubling
rounds), several disjoint cliques, and singletons, compared against
the exact closure (fine at this size).
"""

from __future__ import annotations

import duckdb

from __spark_entry__ import _cc_minlabel_oracle

_EXACT = """
    WITH RECURSIVE base AS (
        SELECT DISTINCT l.l_orderkey AS fact_id, p.p_name AS entity
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    ee AS (
        SELECT DISTINCT a.entity AS ea, b.entity AS eb
        FROM base a JOIN base b ON a.fact_id = b.fact_id
    ),
    reach(a, b) AS (
        SELECT ea, eb FROM ee
        UNION
        SELECT r.a, e.eb FROM reach r JOIN ee e ON r.b = e.ea
    ),
    comp AS (SELECT a AS entity, min(b) AS root FROM reach GROUP BY a)
    SELECT root AS component_root, count(*) AS n_entities
    FROM comp GROUP BY root
    ORDER BY n_entities DESC, component_root
"""


def _build_views(con) -> None:
    rows = []  # (orderkey, partkey) incidences
    pk = {}

    def part_id(name: str) -> int:
        if name not in pk:
            pk[name] = len(pk) + 1
        return pk[name]

    oid = 0

    def order(names):
        nonlocal oid
        oid += 1
        for n in names:
            rows.append((oid, part_id(n)))

    # a 60-vertex path: consecutive entities share one order each —
    # component diameter 59, well past one or two label rounds
    for i in range(59):
        order([f"path{i:02d}", f"path{i + 1:02d}"])
    # three disjoint cliques of sizes 3/4/5 (one order each)
    order(["cliqA0", "cliqA1", "cliqA2"])
    order(["cliqB0", "cliqB1", "cliqB2", "cliqB3"])
    order(["cliqC0", "cliqC1", "cliqC2", "cliqC3", "cliqC4"])
    # singletons: an order touching exactly one entity
    order(["lonely1"])
    order(["lonely2"])
    con.execute("CREATE TABLE li(l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO li VALUES (?, ?)", rows)
    con.execute("CREATE TABLE pt(p_partkey BIGINT, p_name VARCHAR)")
    con.executemany(
        "INSERT INTO pt VALUES (?, ?)", [(v, k) for k, v in pk.items()]
    )
    con.execute("CREATE VIEW lineitem AS SELECT * FROM li")
    con.execute("CREATE VIEW part AS SELECT * FROM pt")


def test_minlabel_oracle_matches_exact_closure_multi_component():
    con = duckdb.connect()
    _build_views(con)
    got = con.execute(_cc_minlabel_oracle()).fetchall()
    want = con.execute(_EXACT).fetchall()
    assert got == want
    # structure sanity: path(60) + cliques 5/4/3 + two singletons
    assert [n for _, n in want] == [60, 5, 4, 3, 1, 1]


def test_minlabel_oracle_converges_at_exactly_enough_rounds():
    """6 hop+jump rounds cover radius 2^6=64 ≥ the 59-hop path; 2
    rounds must NOT converge it — proving the unroll depth is doing
    real work (guards against an accidentally-trivial oracle)."""
    con = duckdb.connect()
    _build_views(con)
    want = con.execute(_EXACT).fetchall()
    assert con.execute(_cc_minlabel_oracle(rounds=6)).fetchall() == want
    assert con.execute(_cc_minlabel_oracle(rounds=2)).fetchall() != want
