#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed once for warm-up-free wall-clock honesty is not the
goal here — the first run includes JVM/codegen warmup, so we time the
second of two runs per query (steady-state, what a long-running cluster
session would see).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from advanced_technologies_of_china_graph_database_construction_spark import get_spark
from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import all_specs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Warm the OS page cache over the input tables before any timing.
    # The bench's contract is STEADY-STATE plan cost (2 warm-ups +
    # min-of-2 per query); a cold cache instead measures first-touch
    # disk reads — observed r5: the identical commit clocked 47.9 s
    # cold vs 24.3 s warm at sf0.1, which would read as a 2× plan
    # regression across every query.
    for entry in os.scandir(sf_dir):
        if entry.is_file():
            with open(entry.path, "rb") as f:
                while f.read(1 << 24):
                    pass
    spark = get_spark("atcgdc-bench")
    # ORDER CONTRACT: the bench runs in fixed alphabetical spec-name
    # order, every round.  all_specs() is gate-staleness-ordered and
    # reshuffles each round, which made round-over-round per-query deltas
    # unreadable (whichever spec ran first absorbed session-wide init and
    # clocked ~2× steady state in r1–r3).
    specs = sorted((s for s in all_specs() if s.bench), key=lambda s: s.name)

    # One session-wide warm-up before any timed run.  Logically the
    # first spec's own untimed warm-up should absorb session init, but
    # measured r1-r3 benches showed the first TIMED run still clocking
    # ~2x steady state (BENCH_r1-r3: leading spec inflated in all three
    # rounds despite the per-spec warm-up), so the session gets one
    # extra explicit warm-up run — cheap insurance for readable deltas.
    if specs:
        specs[0].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for spec in specs:
        # Two warm-up runs, then the min of two timed runs.  JVM JIT
        # keeps recompiling hot codegen stages well past the first
        # execution (measured on the heaviest spec at sf0.1: 9.8 →
        # 4.7 → 3.4 → 2.7 → 2.5 s over five consecutive runs), so a
        # single warm-up + single timed run reports a mix of JIT tail
        # and steady state — r3/r4 per-query deltas swung ±2× on
        # unchanged code.  min-of-2 after 2 warm-ups is the stable
        # steady-state estimate a long-running cluster session sees.
        for _ in range(2):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[spec.name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
