"""Prune stale scratch under spark-warehouse/ (VERDICT r10 hygiene).

The lazily-built memo artifacts are keyed on the sf_dir STRING they
were built from (md5 prefix — entry `_cooc_pairs`/`_kmeans_assigned`/
`_colocated_tables`):

- ``_cooc_cache/<md5(sf_dir)[:16]>``   — co-occurrence projection
- ``_kmeans_cache/<md5(sf_dir)[:16]>`` — shared Lloyd assignment
- ``blj_li_<md5(sf_dir)[:12]>`` / ``blj_ord_<...>`` — bucketed
  co-located fact tables
- bare 16-hex dirs at the warehouse root — the pre-r10 cooc naming
  (one leaked dir per session; 69 dirs / 17 GB found in round 10)
- ``_duckdb_spill`` — DuckDB temp spill from oracle sweeps

When an sf_dir is regenerated under a different path spelling or a
generated scale is deleted, its keyed artifacts become unreachable
garbage: nothing overwrites them (overwrite-on-rebuild only protects
artifacts whose key is still LIVE). This tool removes every keyed
artifact whose hash matches NO live sf data dir, plus spill files.

Live sf dirs = existing directories among /root/testdata/sf* and
<repo>/spark-warehouse/sf*, plus $SPARK_GRAFT_SF_DIR; each is hashed
under its absolute, repo-relative, and trailing-slash spellings (the
memos key on the caller-passed string verbatim).

SINGLE-WRITER ASSUMPTION (as for the memos themselves): run this only
when no sweep/bench/test session is concurrently writing the
warehouse — a concurrent session whose in-flight sf_dir was, e.g.,
just deleted would race. The driver and all repo tooling run
sequentially; see README.

Usage: python tools/clean_scratch.py [--dry-run] [repo_root]
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import shutil
import sys

_HEX16 = re.compile(r"^[0-9a-f]{16}$")
# every sf_dir-keyed table family: co-located fact tables and the
# persisted IVF serving index (entry `_colocated_tables`/`_ivfx_table`)
_BLJ = re.compile(r"^(?:blj_(?:li|ord)|ivx)_([0-9a-f]{12})(?:_ivf)?$")


def _live_sf_dirs(repo_root: str) -> list[str]:
    cands = sorted(glob.glob("/root/testdata/sf*")) + sorted(
        glob.glob(os.path.join(repo_root, "spark-warehouse", "sf*"))
    )
    env = os.environ.get("SPARK_GRAFT_SF_DIR")
    if env:
        cands.append(env)
    return [d for d in cands if os.path.isdir(d)]


def _live_hashes(repo_root: str) -> set[str]:
    """md5 hexdigests of every plausible spelling of every live sf
    dir (the memos hash the sf_dir string exactly as passed)."""
    hashes: set[str] = set()
    for d in _live_sf_dirs(repo_root):
        ab = os.path.abspath(d)
        spellings = {ab, ab + "/", os.path.relpath(ab, repo_root),
                     os.path.relpath(ab, repo_root) + "/", d, d.rstrip("/")}
        for s in spellings:
            hashes.add(hashlib.md5(s.encode()).hexdigest())
    return hashes


def clean(repo_root: str, *, dry_run: bool = False) -> list[str]:
    """Remove stale keyed scratch; return the removed paths."""
    wh = os.path.join(repo_root, "spark-warehouse")
    if not os.path.isdir(wh):
        return []
    live = _live_hashes(repo_root)
    live16 = {h[:16] for h in live}
    live12 = {h[:12] for h in live}
    doomed: list[str] = []

    for cache in ("_cooc_cache", "_kmeans_cache"):
        cdir = os.path.join(wh, cache)
        if os.path.isdir(cdir):
            for name in sorted(os.listdir(cdir)):
                if _HEX16.match(name) and name not in live16:
                    doomed.append(os.path.join(cdir, name))

    for name in sorted(os.listdir(wh)):
        p = os.path.join(wh, name)
        if not os.path.isdir(p):
            continue
        m = _BLJ.match(name)
        if m and m.group(1) not in live12:
            doomed.append(p)
        # pre-r10 root-level cooc leak: bare hash dirs
        elif _HEX16.match(name) and name not in live16:
            doomed.append(p)

    spill = os.path.join(wh, "_duckdb_spill")
    if os.path.isdir(spill):
        doomed.extend(
            os.path.join(spill, f) for f in sorted(os.listdir(spill))
        )

    for p in doomed:
        print(("DRY-RUN " if dry_run else "rm ") + p)
        if not dry_run:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.remove(p)
                except OSError:
                    pass
    return doomed


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    root = os.path.abspath(
        args[0]
        if args
        else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    removed = clean(root, dry_run="--dry-run" in sys.argv[1:])
    print(f"{'would remove' if '--dry-run' in sys.argv[1:] else 'removed'} "
          f"{len(removed)} entries")
