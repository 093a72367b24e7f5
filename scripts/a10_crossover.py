#!/usr/bin/env python
"""Measure the a10 two-stage-vs-brute crossover (the r11 verdict's
"record a number, not a qualitative claim" item).

At the sf0.1 fixture (2,000 × 64-float vectors) the int8 two-stage
rerank (a10) floors ~2× SLOWER than exact brute force (a01): two plan
stages cannot beat one trivial scan of a corpus that fits in a page.
The design claim is that the compressed first stage wins once the float
table is too big to scan per query batch.  This script makes that claim
a measured number: replicate the fixture corpus ×k (vec_id offset per
copy; timing is the object, not recall), time the faces at each scale
with the bench discipline (noop sink, cache cleared, min of N runs),
and report the crossover scale.

Two two-stage shapes are timed.  COLD is the a10 spec verbatim: the
int8 copy is rebuilt inside the query (posexplode + stats + assembly),
charging the index build to every batch.  SERVED is the production
shape the operator docstring actually claims — the quantized copy is
built ONCE outside the timed window (`quantized=` seam, the int8
analogue of the IVF store) and each batch scans only the compressed
copy plus the candidate-row rerank.  The crossover number to cite is
SERVED vs brute.

Usage:
    python scripts/a10_crossover.py [sf_dir] [scales...]
    # default: /root/testdata/sf0.1  1 4 16 64
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_technologies_of_china_graph_database_construction_spark import get_spark  # noqa: E402
from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table  # noqa: E402
from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    two_stage_topk,
)
from advanced_technologies_of_china_graph_database_construction_spark.plans.docs_queries import (  # noqa: E402
    A10_OVERFETCH,
    ANN_QUERY_IDS,
)

RUNS = 3


def timed(spark, make_df) -> float:
    best = float("inf")
    for _ in range(RUNS):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [int(a) for a in sys.argv[2:]] or [1, 4, 16, 64]
    spark = get_spark("a10-crossover")
    base = load_table(spark, sf, "embeddings")
    n0 = base.count()
    out = {"sf_dir": sf, "n_base": n0, "overfetch": A10_OVERFETCH, "scales": {}}
    for k in scales:
        copies = spark.range(k).select(F.col("id").alias("copy"))
        emb = (
            base.crossJoin(F.broadcast(copies))
            .select(
                (F.col("vec_id") + F.col("copy") * n0).alias("vec_id"),
                "embedding",
                "label",
            )
            .repartition(32)
            .localCheckpoint(eager=True)  # scale-up outside the timed window
        )
        brute = timed(spark, lambda: brute_force_topk(emb, ANN_QUERY_IDS, k=10))
        two_cold = timed(
            spark,
            lambda: two_stage_topk(
                emb, ANN_QUERY_IDS, k=10, overfetch=A10_OVERFETCH
            ),
        )
        # served shape: index built once, outside the timed window
        from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import scalar_quantize

        qt = scalar_quantize(emb).localCheckpoint(eager=True)
        two_served = timed(
            spark,
            lambda: two_stage_topk(
                emb, ANN_QUERY_IDS, k=10, overfetch=A10_OVERFETCH, quantized=qt
            ),
        )
        out["scales"][k * n0] = {
            "brute_sec": brute,
            "two_stage_cold_sec": two_cold,
            "two_stage_served_sec": two_served,
            "served_wins": two_served < brute,
        }
        print(
            f"N={k * n0:>8d}  brute={brute:7.3f}s  cold={two_cold:7.3f}s"
            f"  served={two_served:7.3f}s",
            flush=True,
        )
        # the I/O claim, measured in bytes not seconds: local[32] keeps
        # every byte page-cached so runtimes stay CPU-bound, but on a
        # cluster where the float table exceeds memory the first-stage
        # scan cost is proportional to bytes read — report the on-disk
        # (snappy parquet) footprint of each copy at this scale
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="a10x_")
        emb.select("vec_id", "embedding").write.mode("overwrite").parquet(f"{tmp}/f")
        qt.write.mode("overwrite").parquet(f"{tmp}/q")
        du = lambda p: sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )
        fb, qb = du(f"{tmp}/f"), du(f"{tmp}/q")
        shutil.rmtree(tmp, ignore_errors=True)
        out["scales"][k * n0]["float_parquet_bytes"] = fb
        out["scales"][k * n0]["quantized_parquet_bytes"] = qb
        print(
            f"           float={fb / 1e6:8.1f}MB  quantized={qb / 1e6:8.1f}MB"
            f"  ratio={fb / max(qb, 1):.2f}x",
            flush=True,
        )
        qt.unpersist()
        emb.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
