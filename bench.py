#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"runs": {...}, "sf": ...}.

The contract is STEADY-STATE plan cost — what a long-running cluster
session sees — not first-touch/cold-JIT wall-clock.  Three mechanisms
enforce it (each added after a measured failure, not speculatively):

- OS page cache pre-warm over the inputs (r5: identical commit clocked
  47.9 s cold vs 24.3 s warm at sf0.1 — cold cache reads as a 2× plan
  regression on every query).
- Per-spec state clearing (cache + GC) so one spec's checkpoint blocks
  and cached relations don't bleed into the next spec's timings.
- ADAPTIVE warm-up: JVM JIT keeps recompiling hot codegen stages well
  past the first run (measured on the heaviest superstep spec at sf0.1:
  9.8 → 4.7 → 3.4 → 2.7 → 2.5 s over five consecutive runs), and a
  FIXED 2-warmup+min-of-2 scheme was still defeated inside the driver's
  shared 18-spec session for the deepest superstep chain (BENCH_r05
  recorded g25 at 13.29 s where four consecutive standalone runs gave
  [13.75, 5.14, 5.19, 4.88] — steady state ≈ 4.9 s).  So each spec now
  keeps running while the latest run still improves ≥10% on the best
  seen (still descending the JIT tail), minimum 4 runs, capped at
  MAX_RUNS.  ALL per-run times are recorded in the output ("runs") so a
  reader can see the decay curve instead of trusting a single scalar.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from advanced_technologies_of_china_graph_database_construction_spark import get_spark
from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import all_specs

MIN_RUNS = 4  # 2 warm-ups + min-of-2, the r4/r5 baseline scheme
MAX_RUNS = 8  # JIT-tail budget; no observed decay curve needs more


def _env_fingerprint() -> dict:
    """Machine-state snapshot recorded alongside the timings, so a
    round-over-round level shift is attributable at a glance.  Added
    after r6 moved +12–47% vs r5 UNIFORMLY across 17 unrelated plans —
    an environment change, but proving that took spot re-measures; with
    loadavg/cpu/mem in the json it's one diff instead."""
    env: dict = {"cpus_conf": os.environ.get("SPARK_GRAFT_CPUS", "")}
    try:
        env["loadavg_1m_5m_15m"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            models = [
                line.split(":", 1)[1].strip()
                for line in f
                if line.startswith("model name")
            ]
        env["cpu_model"] = models[0] if models else ""
        env["cpu_count"] = len(models)
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {
                k: v.strip()
                for k, v in (line.split(":", 1) for line in f if ":" in line)
            }
        env["mem_total"] = mem.get("MemTotal", "")
        env["mem_available"] = mem.get("MemAvailable", "")
    except OSError:
        pass
    return env


def _timed_runs(spark, make_df) -> list[float]:
    """One spec-style adaptive timing loop (same discipline as the main
    loop: state cleared between runs, keep running while still descending
    the JIT tail, min 4 / max 8 runs)."""
    runs: list[float] = []
    while len(runs) < MAX_RUNS and (
        len(runs) < MIN_RUNS or runs[-1] < 0.9 * min(runs[:-1])
    ):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 4))
    return runs


def _er_incremental_pair(spark, sf_dir: str) -> dict[str, list[float]]:
    """The O(|delta|)-vs-O(corpus) pair: fold a ~1.6% vocabulary delta
    into a PRE-BUILT standing ER state (`er.incremental_er_refresh` —
    the p03 lifecycle) vs rebuilding the whole state from scratch
    (`er.build_er_state`) on the same corpus-scaled vocabulary.  The
    standing state is materialized OUTSIDE the timed window — in
    production it is a stored table, so steady-state cost excludes it.

    The vocabulary scales with the corpus (TEN surfaces per document,
    so the rebuild side does real SymSpell work — 50k names at sf0.1):
    family = letter-mapped zero-padded surface ordinal // 2, so
    consecutive families sit at Levenshtein distance 1 (long alias
    chains — worst case for component work) and odd ordinals carry a
    distance-1 'x' variant; delta docs (doc_id % 64 == 0) contribute
    surfaces absent from the standing slice that merge into standing
    components."""
    from pyspark.sql import functions as F

    from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table
    from advanced_technologies_of_china_graph_database_construction_spark.operators.er import (
        build_er_state,
        incremental_er_refresh,
    )

    docs = load_table(spark, sf_dir, "documents")
    n = F.col("doc_id") * 10 + F.col("i")
    fam = F.translate(
        F.lpad(F.floor(n / F.lit(2)).cast("string"), 7, "0"),
        "0123456789",
        "abcdefghij",
    )
    name = F.concat(
        F.lit("w"), fam, F.when(n % 2 == 1, F.lit("x")).otherwise(F.lit(""))
    ).alias("name")
    surf = docs.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"))
    is_delta = F.col("doc_id") % 64 == 0
    standing = build_er_state(surf.filter(~is_delta).select(name)).localCheckpoint(
        eager=True
    )
    n_standing = standing.count()
    delta = surf.filter(is_delta).select(name)
    return {
        "p03_delta_refresh": _timed_runs(
            spark,
            lambda: incremental_er_refresh(
                standing, delta, standing_n_rows=n_standing
            ),
        ),
        "p03_full_rebuild": _timed_runs(
            spark, lambda: build_er_state(surf.select(name))
        ),
    }


def _dedup_incremental_pair(spark, sf_dir: str) -> dict[str, list[float]]:
    """The second O(|delta|)-vs-O(corpus) pair: near-dup detection for a
    ~1.6% document delta against a standing corpus
    (`dedup.minhash_delta_near_dups` — the d45 face) vs the full-corpus
    run (`dedup.minhash_near_dups`, the d02 face) over the same
    documents.  The standing SIGNATURE store is materialized OUTSIDE
    the timed window and passed via ``standing_sig`` — in production it
    is persisted once per batch, so steady-state cost excludes it; the
    delta path pays only the delta kernel + broadcast band probe +
    delta-sized verify."""
    from pyspark.sql import functions as F

    from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table
    from advanced_technologies_of_china_graph_database_construction_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 64 == 0
    standing, delta = docs.filter(~is_delta), docs.filter(is_delta)
    kernel = dedup._minhash_sig_udf()
    standing_sig = (
        standing.select("doc_id", "source", kernel(F.col("text")).alias("sig"))
        .filter(F.col("sig").isNotNull())
        .localCheckpoint(eager=True)
    )
    return {
        "d45_delta_dedup": _timed_runs(
            spark,
            lambda: dedup.minhash_delta_near_dups(
                standing, delta, standing_sig=standing_sig
            ),
        ),
        "d45_full_dedup": _timed_runs(
            spark, lambda: dedup.minhash_near_dups(docs)
        ),
    }


def _merge_detail(old: dict | None, new: dict) -> dict:
    """Sidecar merge-with-provenance (r16): ``BENCH_DETAIL.json`` holds
    the per-entry FLOORS across passes, so a later (possibly busier-box)
    pass must never clobber an earlier quiet-box floor — exactly the
    footgun that hit twice in r15 (one in-round near-miss, one driver
    overwrite post-commit).  Rules:

    - no/unreadable/other-shape existing file → write ``new`` as-is;
    - same ``sf``: entry-wise min of ``queries`` (union of entries),
      per-entry run lists appended, total recomputed from the merged
      floors, env/meta from the new pass, and a ``merged_passes``
      counter recording provenance;
    - DIFFERENT ``sf``: refuse to merge or overwrite — the caller keeps
      the existing file and writes the new payload to a suffixed
      sidecar instead (set ``SPARK_GRAFT_BENCH_DETAIL_OVERWRITE=1`` to
      force a plain overwrite).
    """
    if not isinstance(old, dict) or "queries" not in old:
        return new
    if old.get("sf") != new.get("sf"):
        raise ValueError(f"sidecar sf mismatch: {old.get('sf')} != {new.get('sf')}")
    queries = dict(old["queries"])
    for name, sec in new["queries"].items():
        queries[name] = min(sec, queries[name]) if name in queries else sec
    runs = {k: list(v) for k, v in (old.get("runs") or {}).items()}
    for name, r in (new.get("runs") or {}).items():
        runs[name] = runs.get(name, []) + list(r)
    return {
        "metric": new["metric"],
        "value": round(sum(queries.values()), 4),
        "unit": new["unit"],
        "queries": queries,
        "runs": runs,
        "sf": new["sf"],
        "env": new.get("env"),
        "merged_passes": int(old.get("merged_passes", 1)) + 1,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for entry in os.scandir(sf_dir):  # page-cache pre-warm (see docstring)
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

    # One session-wide warm-up before any timed run (r1-r3: the first
    # TIMED spec still clocked ~2× steady state without it).
    if specs:
        specs[0].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for spec in specs:
        runs: list[float] = []
        while len(runs) < MAX_RUNS and (
            len(runs) < MIN_RUNS or runs[-1] < 0.9 * min(runs[:-1])
        ):
            # Clear accumulated state BETWEEN RUNS, outside the timed
            # window: cached relations, then released checkpoint RDD
            # blocks (python gc drops the DataFrame refs; a JVM
            # System.gc() lets the ContextCleaner actually free the
            # blocks).  Between-specs-only clearing left each repeat of
            # a superstep spec holding every prior repeat's checkpoint
            # blocks — observed as multi-second GC-pause outliers on a
            # spec's LAST runs (g25: [8.3, 5.4, 5.2, 17.1] at sf0.1)
            # while its steady state is ~5 s.
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[spec.name] = min(runs)
        all_runs[spec.name] = runs

    # the incremental-maintenance claim, measured: delta refresh vs full
    # rebuild of the same ER state (docstring argument of er.py /
    # connected_components.py, now a recorded number per round)
    for key, runs in _er_incremental_pair(spark, sf_dir).items():
        timings[key] = min(runs)
        all_runs[key] = runs
    for key, runs in _dedup_incremental_pair(spark, sf_dir).items():
        timings[key] = min(runs)
        all_runs[key] = runs

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    # Per-run decay curves + env fingerprint go to a SIDECAR file, not
    # stdout: the driver records only the stdout tail (observed 2000
    # chars), and the runs/env payload pushed the JSON line past it —
    # BENCH_r10–r12 all recorded "parsed": null.  The contract line
    # below is ~1 kB and must stay the only thing on stdout's last line.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": all_runs,
        "sf": sf_val,
        "env": _env_fingerprint(),
    }
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        payload = detail
        out_path = sidecar
        if not os.environ.get("SPARK_GRAFT_BENCH_DETAIL_OVERWRITE"):
            old = None
            try:
                with open(sidecar) as f:
                    old = json.load(f)
            except (OSError, ValueError):
                old = None
            try:
                payload = _merge_detail(old, detail)
            except ValueError as e:
                # different-provenance sidecar (other sf): refuse to
                # touch it; park this pass next to it instead
                print(f"BENCH_DETAIL.json kept: {e}", file=sys.stderr)
                out_path = sidecar.replace(".json", f".sf{sf}.json")
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as e:
        # the sidecar is best-effort: on a read-only checkout the ~1 kB
        # stdout contract line below must still print (r13 ADVICE)
        print(f"BENCH_DETAIL.json write failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
