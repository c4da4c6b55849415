"""Independent losslessness check for the PassJoin banding shared by
the fuzzy_name_pairs Spark operator AND its DuckDB oracle twin.

Since round 9 the oracle uses the same pigeonhole blocking as the
Spark side (the quadratic name grid was out of budget at sf10), so a
shared blocking bug would pass the oracle silently (ADVICE r9). This
test keeps the blocking independently verified: at small sf, the full
banded oracle must be row-identical to the exact O(names²)
levenshtein grid — the ground truth the banding claims to reproduce.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

# The exact quadratic twin: every distinct-name pair scored, no
# blocking anywhere. Same output contract as the banded oracle
# (id_a < id_b part-key pairs incl. the same-name diagonal, dist<=2).
_EXACT_GRID = """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    np AS (
        SELECT p_name AS na, p_name AS nb, 0 AS dist FROM names
        UNION ALL
        SELECT a.p_name AS na, b.p_name AS nb,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM names a JOIN names b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    )
    SELECT least(pa.p_partkey, pb.p_partkey) AS id_a,
           greatest(pa.p_partkey, pb.p_partkey) AS id_b,
           np.dist AS dist
    FROM np
    JOIN part pa ON pa.p_name = np.na
    JOIN part pb ON pb.p_name = np.nb
    WHERE np.na < np.nb OR pa.p_partkey < pb.p_partkey
"""


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
])
def test_banded_oracle_equals_exact_grid(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'"
    )
    banded = con.execute(
        f"SELECT * FROM ({entry.oracle_sql()['fuzzy_name_pairs']}) t "
        "ORDER BY id_a, id_b, dist"
    ).fetchall()
    exact = con.execute(
        f"SELECT * FROM ({_EXACT_GRID}) t ORDER BY id_a, id_b, dist"
    ).fetchall()
    assert len(banded) > 0
    assert banded == exact
