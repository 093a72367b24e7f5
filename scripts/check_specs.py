#!/usr/bin/env python
"""Targeted oracle check: run the named specs against their DuckDB
oracles (the gate_replica comparison) — the optimization round's fast
equivalence proof after a plan change, without a full 219-spec sweep.

Usage: python scripts/check_specs.py sf_dir name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("GATE_REPLICA_DRIVER_MEM", "4g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("check-specs")
        .config("spark.driver.memory", mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import spec_map
    from tests.oracle import compare, duckdb_conn

    con = duckdb_conn(sf)
    sm = spec_map()
    fails: list[str] = []
    for name in names:
        s = sm[name]
        t0 = time.time()
        try:
            if s.oracle:
                compare(s.fn(spark, sf), con, s.oracle)
                status = "OK"
            else:
                s.fn(spark, sf).count()
                status = "rows-only"
        except Exception as e:
            status = f"FAIL {type(e).__name__}: {str(e)[:200]}"
            fails.append(name)
        print(f"{name:36s} {status:12s} {time.time() - t0:6.2f}s", flush=True)
    print(f"fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
