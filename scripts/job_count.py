#!/usr/bin/env python
"""Deterministic cost probe: run specs once (noop sink) and report the
number of Spark JOBS and STAGES each execution schedules, plus wall
time.  On a jittery box wall-clock lies; job/stage counts don't — and
they are exactly what superstep-heavy plans pay per round (guide §2:
every barrier is latency; fewer rounds/actions ⇒ fewer jobs).

Usage: python scripts/job_count.py name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_technologies_of_china_graph_database_construction_spark import get_spark
from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import spec_map


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("atcgdc-job-count")
    sc = spark.sparkContext
    sm = spec_map()
    names = sys.argv[1:]
    # warm-up (session init, store build)
    sm[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    tracker = sc.statusTracker()
    for name in names:
        spec = sm[name]
        sc.setJobDescription(f"job-count: {name}")
        jobs0 = tracker.getJobIdsForGroup(None)
        nj0 = max(jobs0) if jobs0 else -1
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs1 = tracker.getJobIdsForGroup(None)
        new_jobs = [j for j in jobs1 if j > nj0]
        n_stages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        print(
            f"{name}: jobs={len(new_jobs)} stages={n_stages} wall={dt:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
