"""Dump `.explain("formatted")` for a named list of contract queries
from a named repo root into plans/<round>/<query>_<tag>.txt — the
before/after plan evidence the optimization rounds commit alongside
bench numbers.

Usage:
  python tools/dump_query_plans.py <repo_root> <tag> <out_dir> q1,q2,... [sf_dir]

Example:
  python tools/dump_query_plans.py /tmp/wt_r11_base before plans/r11 \
      dedup_jaccard,corpus_curation /root/testdata/sf0.1
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

repo = os.path.abspath(sys.argv[1])
tag = sys.argv[2]
out_dir = os.path.abspath(sys.argv[3])
names = [q for q in sys.argv[4].split(",") if q]
sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"

sys.path.insert(0, repo)

import importlib.util

spec = importlib.util.spec_from_file_location(
    "entry_plans", os.path.join(repo, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

from hippollm_spark.session import get_spark  # noqa: E402

spark = get_spark("dump_query_plans")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)

qs = entry_mod.queries()
for name in names:
    buf = io.StringIO()
    try:
        df = qs[name](spark, sf_dir)
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    except Exception as e:  # pragma: no cover
        plan = f"ERROR: {type(e).__name__}: {e}\n"
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(
            f"# {name} — {tag} (repo={repo}, sf_dir={sf_dir})\n"
            f"# explain('formatted')\n\n{plan}"
        )
    print("wrote", path)
spark.stop()
