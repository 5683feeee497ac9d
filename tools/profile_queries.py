"""Per-query profiling harness (optimization round): for each (or a
subset of) ``__spark_entry__.queries()`` entries, run the same timed
action as bench.py (``.count()``) and record wall seconds plus the
number of Spark jobs, stages and tasks the query scheduled — the
"how many passes / shuffles did this really run" census the
optimization guide (§1) asks for before touching anything.

Job/stage/task counts come from the status tracker via a per-query job
group, so concurrent warm-up noise cannot leak in. Two passes like
bench.py (fixture builds land on pass 1); pass 2 numbers are the
serving-path profile.

Usage: python tools/profile_queries.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from explora_kafka_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile.json"
    names = sys.argv[2:]
    spark = get_spark(app_name="explora-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # same Arrow warm-up as bench.py
    warm = spark.createDataFrame([(i,) for i in range(256)], "i: long") \
        .repartition(sc.defaultParallelism)
    warm.mapInPandas(lambda it: it, "i: long").count()

    qs = E.queries()
    if names:
        qs = {n: qs[n] for n in names}

    def profile_one(name: str, fn, tag: str) -> dict:
        spark.catalog.clearCache()
        group = f"{tag}:{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        try:
            fn(spark, SF_DIR).count()
            sec = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} FAILED: {exc}", file=sys.stderr)
            return {"sec": -1.0}
        finally:
            sc.setJobGroup(None, None)
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        return {"sec": sec, "jobs": len(jobs), "stages": n_stages,
                "tasks": n_tasks}

    res: dict[str, dict] = {}
    for name, fn in qs.items():
        res[name] = {"p1": profile_one(name, fn, "p1")}
    for name, fn in qs.items():
        res[name]["p2"] = profile_one(name, fn, "p2")

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    rows = sorted(res.items(),
                  key=lambda kv: -kv[1]["p2"].get("sec", 0))
    for name, r in rows[:60]:
        p2 = r["p2"]
        print(f"{p2.get('sec', -1):7.3f}s jobs={p2.get('jobs', 0):3d} "
              f"stages={p2.get('stages', 0):3d} tasks={p2.get('tasks', 0):5d}  "
              f"{name}")


if __name__ == "__main__":
    main()
