"""Round-11 sampled sf3 twin for emb_dup_pairs (the one sweep row
whose FULL DuckDB twin is disk-infeasible on this box: the
a.vec_id < b.vec_id inequality join materializes 11.2B candidate rows
at sf3 — two attempts, 48GB and 90GB memory caps, both exhausted the
66GB of free disk in spill).

A deterministic 1/37 sample restricted on the LEFT side (id_a % 37 = 0,
applied INSIDE the oracle's join so DuckDB's optimizer prunes side a
before pairing — candidates drop 37× to ~300M, feasible in RAM) checks
the SAME Spark code path (the full block-matmul pair computation runs
unsampled Spark-side; only the comparison set is filtered). Compared
as exact integer tuples (id_a, id_b, round(cos*1e6)).

Usage: python tools/emb_pairs_sampled_probe.py [sf_dir] [modulus]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from hippollm_spark.session import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf3"
mod = int(sys.argv[2]) if len(sys.argv) > 2 else 37

spark = get_spark("emb_pairs_sampled_probe")

t0 = time.time()
sp = (
    entry_mod.queries()["emb_dup_pairs"](spark, sf_dir)
    .filter(F.col("id_a") % mod == 0)
    .select(
        "id_a", "id_b", F.round(F.col("cos") * 1_000_000.0, 0).cast("long").alias("c6")
    )
)
s_rows = {(r["id_a"], r["id_b"], r["c6"]) for r in sp.collect()}
print(f"spark sampled pairs: {len(s_rows):,} in {time.time()-t0:.1f}s", file=sys.stderr)

sql = entry_mod.oracle_sql()["emb_dup_pairs"]
# inject the sample INSIDE the pair join (prunes side a pre-join)
needle = "FROM n a JOIN n b ON a.vec_id < b.vec_id"
assert needle in sql, "oracle join shape changed; update the probe"
sql = sql.replace(
    needle, f"FROM n a JOIN n b ON a.vec_id < b.vec_id AND a.vec_id % {mod} = 0"
)
con = duckdb.connect()
con.execute("SET memory_limit='60GB'")
con.execute(
    "SET temp_directory='/root/repo/spark-warehouse/_duckdb_spill'"
)
p = f"{sf_dir}/embeddings.parquet"
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM '{p}"
    + ("/*.parquet" if os.path.isdir(p) else "")
    + "'"
)
t0 = time.time()
d_rows = {
    (r[0], r[1], int(round(r[2] * 1_000_000.0)))
    for r in con.execute(sql).fetchall()
}
print(f"duckdb sampled pairs: {len(d_rows):,} in {time.time()-t0:.1f}s", file=sys.stderr)

only_s = s_rows - d_rows
only_d = d_rows - s_rows
print(f"spark {len(s_rows):,} / duckdb {len(d_rows):,} / "
      f"spark-only {len(only_s)} / duckdb-only {len(only_d)}")
for r in list(only_s)[:3]:
    print("  S", r)
for r in list(only_d)[:3]:
    print("  D", r)
print("MATCH" if not only_s and not only_d else "MISMATCH")
