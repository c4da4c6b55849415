"""Whole-contract job-count profile (guide §1: measure first).

Runs EVERY contract query once as warmup (memo builds, JIT) and once
timed with the noop sink under bench.py's isolation discipline, then
parses the session event log and emits, per query: timed wall, number
of jobs inside the timed window, sum of job wall-clock, and the
scheduler/driver gap (wall - sum(job walls), the per-query fixed cost
that no task executes).  Sorting by n_jobs and by gap is how the r12
tail audit picks its targets.

Usage: python tools/profile_all.py [--sf /root/testdata/sf0.1] [--out FILE] [names...]
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    out_path = "/tmp/profile_all.json"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]

    import __spark_entry__ as entry_mod
    from hippollm_spark.session import get_spark

    evdir = "/tmp/spark-events-profile-all"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile_all",
        **{
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = args if args else list(qs)

    spark.range(1000).selectExpr("sum(id)").collect()
    # warmup pass: memo builds + JIT, mirrors bench.py
    for name in names:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    windows: dict[str, tuple[float, float]] = {}
    for name in names:
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.time() * 1000
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.time() * 1000
        spark.sparkContext.setJobDescription(None)
        windows[name] = (t0, t1)

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    paths = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if (app_id in f or app_id in root) and not f.startswith("appstatus"):
                paths.append(os.path.join(root, f))
    jobs = []
    job_meta = {}
    for p in sorted(paths):
        with open(p) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    job_meta[jid] = ev["Submission Time"]
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in job_meta:
                        jobs.append((job_meta[jid], ev["Completion Time"]))

    summary = {}
    for name, (t0, t1) in windows.items():
        inwin = [j for j in jobs if j[0] >= t0 - 50 and j[1] <= t1 + 50]
        tot = sum(j1 - j0 for j0, j1 in inwin)
        summary[name] = {
            "wall_s": round((t1 - t0) / 1000, 3),
            "n_jobs": len(inwin),
            "job_wall_s": round(tot / 1000, 3),
            "gap_s": round(((t1 - t0) - tot) / 1000, 3),
        }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    # console: sorted by n_jobs desc then wall desc
    for name, s in sorted(summary.items(), key=lambda kv: (-kv[1]["n_jobs"], -kv[1]["wall_s"])):
        print(
            f"{s['n_jobs']:3d} jobs  wall {s['wall_s']:7.3f}s  "
            f"jobs {s['job_wall_s']:7.3f}s  gap {s['gap_s']:7.3f}s  {name}"
        )


if __name__ == "__main__":
    main()
