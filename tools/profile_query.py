"""Per-query job/stage breakdown via the Spark event log (guide §1/§7:
find where the time goes — job count, per-job wall, stage shuffle
bytes — before changing anything).

Runs each named contract query once as warmup, then once timed with the
noop sink, then parses the event log written for the session and
reports per-job wall-clock within the timed window plus stage-level
shuffle/input metrics.

Usage: python tools/profile_query.py <query> [query ...] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    import __spark_entry__ as entry_mod
    from hippollm_spark.session import get_spark

    evdir = "/tmp/spark-events-profile"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile_query",
        **{
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    windows: dict[str, tuple[float, float]] = {}
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        fn = qs[name]
        # warmup (memo builds, JIT) — mirrors bench.py
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.time() * 1000
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.time() * 1000
        spark.sparkContext.setJobDescription(None)
        windows[name] = (t0, t1)
        print(f"=== {name}: wall {(t1 - t0) / 1000:.3f}s", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    # parse event log (plain file, or the rolling-v2 directory layout)
    paths = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if app_id in f or app_id in root:
                if not f.startswith("appstatus"):
                    paths.append(os.path.join(root, f))
    jobs = []  # (jobid, submit_ms, end_ms, desc, n_stages)
    stages = {}  # stage_id -> dict
    job_meta = {}
    import itertools

    def _lines():
        for p in sorted(paths):
            with open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                job_meta[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                m = job_meta.get(jid)
                if m:
                    jobs.append(
                        (jid, m["t0"], ev["Completion Time"], m["desc"], m["stages"])
                    )
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0s = si.get("Submission Time")
                t1s = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:80],
                    "ms": (t1s - t0s) if (t0s and t1s) else 0,
                    "tasks": si.get("Number of Tasks"),
                }

    for name, (t0, t1) in windows.items():
        inwin = [j for j in jobs if j[1] >= t0 - 50 and j[2] <= t1 + 50]
        tot = sum(j[2] - j[1] for j in inwin)
        print(f"\n=== {name}: wall {(t1 - t0) / 1000:.3f}s, "
              f"{len(inwin)} jobs, sum(job wall) {tot / 1000:.3f}s, "
              f"gaps {((t1 - t0) - tot) / 1000:.3f}s")
        for jid, j0, j1, desc, stg in inwin:
            names_s = "; ".join(
                f"s{sid}:{stages[sid]['ms']}ms/{stages[sid]['tasks']}t:{stages[sid]['name'][:48]}"
                for sid in stg
                if sid in stages
            )
            print(f"  job {jid}: {(j1 - j0) / 1000:7.3f}s  {names_s}")


if __name__ == "__main__":
    main()
