"""Measure the large-star/small-star contraction's round count against
component diameter — the scale argument behind g41 / the distributed
``connected_components`` path, as a number instead of a citation.

A single chain of length L is the worst case for label propagation
(O(L) supersteps) and the motivating case for the alternating-star
algorithm (O(log² L) rounds, Kiveris et al. SoCC'14).  This probe runs
the SAME per-round building blocks the operator uses (its private
helpers — no copy) on chains of growing length and prints rounds + wall
time, so the "rounds grow logarithmically while the graph grows
exponentially" claim is a recorded measurement.

Usage: python scripts/cc_rounds_probe.py [max_exp]
  chains of length 2^k for k in 6, 10, 14, 17, ..up to max_exp (default 20).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from advanced_technologies_of_china_graph_database_construction_spark import get_spark  # noqa: E402
from advanced_technologies_of_china_graph_database_construction_spark.operators.connected_components import (  # noqa: E402
    _large_star,
    _signature,
    _small_star,
)


def rounds_to_converge(edges) -> int:
    cur = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = _signature(cur)
    for rounds in range(1, 100):
        ss = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _signature(ss)
        if sig == prev_sig and ss.exceptAll(cur).isEmpty():
            return rounds
        cur, prev_sig = ss, sig
    raise RuntimeError("did not converge in 100 rounds")


def main() -> None:
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("cc-rounds-probe")
    print(f"{'chain length':>14s} {'rounds':>7s} {'wall_s':>8s}")
    # dedupe + cap so chains up to max_exp actually run (a plain list
    # broke for max_exp in 15..19 and double-ran 6/10/14/17 — r14 ADVICE)
    for k in sorted({k for k in (6, 10, 14, 17, max_exp) if k <= max_exp}):
        n = 1 << k
        chain = spark.range(1, n).select(
            F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
        )
        t0 = time.perf_counter()
        r = rounds_to_converge(chain)
        print(f"{n:14d} {r:7d} {time.perf_counter() - t0:8.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
