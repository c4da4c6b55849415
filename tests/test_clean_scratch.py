"""tools/clean_scratch.py: stale keyed scratch is pruned, live keyed
scratch and non-keyed tables survive (VERDICT r10 hygiene item)."""

import hashlib
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import clean_scratch  # noqa: E402


def _mk(p):
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "part-0.parquet"), "w") as f:
        f.write("x")


def test_clean_scratch_prunes_only_stale(tmp_path, monkeypatch):
    root = str(tmp_path)
    wh = os.path.join(root, "spark-warehouse")
    # a live generated scale dir
    live_sf = os.path.join(wh, "sf1")
    _mk(live_sf)
    live16 = hashlib.md5(live_sf.encode()).hexdigest()[:16]
    live12 = hashlib.md5(live_sf.encode()).hexdigest()[:12]
    stale16 = "0" * 16
    stale12 = "0" * 12

    _mk(os.path.join(wh, "_cooc_cache", live16))
    _mk(os.path.join(wh, "_cooc_cache", stale16))
    _mk(os.path.join(wh, "_kmeans_cache", stale16))
    _mk(os.path.join(wh, f"blj_li_{live12}"))
    _mk(os.path.join(wh, f"blj_li_{stale12}"))
    _mk(os.path.join(wh, f"blj_ord_{stale12}"))
    _mk(os.path.join(wh, f"ivx_{live12}_ivf"))
    _mk(os.path.join(wh, f"ivx_{stale12}_ivf"))
    _mk(os.path.join(wh, stale16))  # pre-r10 root-level leak
    _mk(os.path.join(wh, "dd_idx1_bands"))  # fixed-name table: keep
    os.makedirs(os.path.join(wh, "_duckdb_spill"), exist_ok=True)
    with open(os.path.join(wh, "_duckdb_spill", "tmpfile"), "w") as f:
        f.write("spill")
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)

    # dry run removes nothing
    planned = clean_scratch.clean(root, dry_run=True)
    assert os.path.isdir(os.path.join(wh, "_cooc_cache", stale16))
    assert len(planned) == 7

    removed = clean_scratch.clean(root)
    assert sorted(planned) == sorted(removed)
    # stale gone
    assert not os.path.exists(os.path.join(wh, "_cooc_cache", stale16))
    assert not os.path.exists(os.path.join(wh, "_kmeans_cache", stale16))
    assert not os.path.exists(os.path.join(wh, f"blj_li_{stale12}"))
    assert not os.path.exists(os.path.join(wh, f"blj_ord_{stale12}"))
    assert not os.path.exists(os.path.join(wh, f"ivx_{stale12}_ivf"))
    assert not os.path.exists(os.path.join(wh, stale16))
    assert not os.path.exists(os.path.join(wh, "_duckdb_spill", "tmpfile"))
    # live + fixed-name survive
    assert os.path.isdir(os.path.join(wh, "_cooc_cache", live16))
    assert os.path.isdir(os.path.join(wh, f"blj_li_{live12}"))
    assert os.path.isdir(os.path.join(wh, f"ivx_{live12}_ivf"))
    assert os.path.isdir(os.path.join(wh, "dd_idx1_bands"))
    assert os.path.isdir(live_sf)
