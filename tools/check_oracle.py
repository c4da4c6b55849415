"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf, compare row count, column names, and an order-insensitive
canonical value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[str, int, list[str]]:
    cols = sorted(df.columns)
    df = df[cols]
    cells = []
    for _, row in df.iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        cells.append("|".join(vals))
    cells.sort()
    h = hashlib.sha256("\n".join(cells).encode()).hexdigest()[:16]
    return h, len(df), cols


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from hippollm_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet"
            + ("/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "")
            + "'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s) — no oracle")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sh, sn, sc = canon(sdf)
        oh, on_, oc = canon(odf)
        ok = (sh == oh) and (sn == on_) and (sc == oc)
        status = "✓" if ok else "✗"
        print(f"{status} {name}: spark {sn} rows / oracle {on_} rows, hash "
              f"{'match' if sh == oh else f'{sh} != {oh}'}, {t_spark:.1f}s")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"   cols spark={sc} oracle={oc}")
            if sn and on_ and sh != oh:
                print("   spark head:", sdf.sort_values(sorted(sdf.columns)[0]).head(3).to_dict("records"))
                print("   oracle head:", odf.sort_values(sorted(odf.columns)[0]).head(3).to_dict("records"))
    print(f"\n{'FAIL: ' + ', '.join(failures) if failures else 'ALL MATCH'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
