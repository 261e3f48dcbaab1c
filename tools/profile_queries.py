"""Per-query micro-profiler: wall seconds + Spark job count.

For each named query, runs it to completion with the noop sink (the
bench methodology) inside a dedicated job group and reports wall
seconds alongside how many Spark jobs the query submitted. A high job
count means serial driver actions (collects, eager checkpoints, MLlib
fits) -- the per-query overhead this fixture size makes visible.

    python tools/profile_queries.py name1,name2,... [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionengineprocess_spark.queries import all_queries  # noqa: E402
from dataingestionengineprocess_spark.session import (  # noqa: E402
    get_spark,
    release_persistent_rdds,
)


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    spark = get_spark("profile", extra_confs={
        "spark.ui.enabled": "false",
        "spark.driver.memory": "8g",
    })
    registry = all_queries()
    sc = spark.sparkContext

    # warm-up identical to bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    )

    tracker = sc.statusTracker()
    print(f"{'query':42s} {'sec':>8s} {'jobs':>5s} {'stages':>7s} {'tasks':>7s}")
    for name in names:
        fn = registry[name]
        for r in range(reps):
            group = f"prof-{name}-{r}"
            sc.setJobGroup(group, name)
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - start
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(f"{name:42s} {wall:8.2f} {len(job_ids):5d} "
                  f"{n_stages:7d} {n_tasks:7d}", flush=True)
            sc.setJobGroup(None, None)
            release_persistent_rdds(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
