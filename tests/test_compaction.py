"""Small-file compaction (sources/compaction.py): fragmented partitions
converge, healthy partitions are untouched byte-for-byte, no rows move
between partitions, and an all-healthy store is a no-op."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.sources.compaction import (
    compact_partitions,
    partition_file_stats,
)


@pytest.fixture()
def store(spark):
    out = tempfile.mkdtemp(prefix="test_compact_")
    rows = [(i, f"g{i % 3}", f"payload-{i}") for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "grp", "payload"])
    # g0 healthy: one file; g1/g2 fragmented: 6-way round-robin
    df.filter(F.col("grp") == "g0").coalesce(1).write.mode("overwrite").partitionBy(
        "grp"
    ).parquet(out)
    df.filter(F.col("grp") != "g0").repartition(6).write.mode("append").partitionBy(
        "grp"
    ).parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _files(store, grp):
    d = os.path.join(store, f"grp={grp}")
    return {
        f: open(os.path.join(d, f), "rb").read()
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_compacts_fragmented_partitions_only(spark, store):
    before_g0 = _files(store, "g0")
    frag_before = {
        r["grp"]: r["n_files"]
        for r in partition_file_stats(spark, store, ["grp"]).collect()
    }
    assert frag_before["g1"] > 1 and frag_before["g2"] > 1 and frag_before["g0"] == 1

    flagged = compact_partitions(spark, store, ["grp"], rows_per_file=10_000)
    assert {r["grp"] for r in flagged} == {"g1", "g2"}

    after = {
        r["grp"]: (r["n_files"], r["n_rows"])
        for r in partition_file_stats(spark, store, ["grp"]).collect()
    }
    assert after == {"g0": (1, 100), "g1": (1, 100), "g2": (1, 100)}
    # the healthy partition's file is bit-identical — same names, same bytes
    assert _files(store, "g0") == before_g0


def test_rows_survive_compaction_exactly(spark, store):
    before = sorted(
        tuple(r) for r in spark.read.parquet(store).select("id", "grp", "payload").collect()
    )
    compact_partitions(spark, store, ["grp"], rows_per_file=10_000)
    after = sorted(
        tuple(r) for r in spark.read.parquet(store).select("id", "grp", "payload").collect()
    )
    assert after == before


def test_healthy_store_is_noop(spark, store):
    compact_partitions(spark, store, ["grp"], rows_per_file=10_000)
    listing = {g: _files(store, g) for g in ("g0", "g1", "g2")}
    assert compact_partitions(spark, store, ["grp"], rows_per_file=10_000) == []
    assert {g: _files(store, g) for g in ("g0", "g1", "g2")} == listing


def test_rows_per_file_allows_multiple_files(spark, store):
    # with a 40-rows/file budget a 100-row partition legitimately needs
    # 3 files: the flag threshold and maxRecordsPerFile use the same
    # ceiling, so a partition already at its minimum is left alone
    compact_partitions(spark, store, ["grp"], rows_per_file=40)
    stats = {
        r["grp"]: r["n_files"]
        for r in partition_file_stats(spark, store, ["grp"]).collect()
    }
    assert stats["g1"] == 3 and stats["g2"] == 3
    assert compact_partitions(spark, store, ["grp"], rows_per_file=40) == []


def test_compaction_preserves_numeric_looking_string_partitions(spark):
    """Regression: the staging re-read must pin the source schema — an
    inferring read would retype grp='01' as an int and write the
    compacted rows under grp=1, duplicating the store."""
    out = tempfile.mkdtemp(prefix="test_compact_num_")
    try:
        df = spark.createDataFrame(
            [(i, "01", f"p{i}") for i in range(40)], "id long, grp string, payload string"
        )
        df.repartition(5).write.mode("overwrite").partitionBy("grp").parquet(out)
        flagged = compact_partitions(spark, out, ["grp"], rows_per_file=10_000)
        assert [r["grp"] for r in flagged] == ["01"]
        assert sorted(os.listdir(out)) == sorted(
            [d for d in os.listdir(out) if not d.startswith("grp=")] + ["grp=01"]
        )
        # directory identity preserved: still exactly grp=01, never a
        # retyped grp=1 twin, and no rows lost or duplicated
        dirs = [d for d in os.listdir(out) if d.startswith("grp=")]
        assert dirs == ["grp=01"], dirs
        assert spark.read.parquet(out).count() == 40
        stats = partition_file_stats(spark, out, ["grp"]).collect()
        assert [(r["grp"], r["n_files"]) for r in stats] == [("01", 1)]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_compaction_handles_null_partition_values(spark):
    """Regression: NULL partition values (__HIVE_DEFAULT_PARTITION__)
    must be matched null-safely — struct(...).isin() drops them, which
    left the partition flagged forever and could stage zero files."""
    out = tempfile.mkdtemp(prefix="test_compact_null_")
    try:
        rows = [(i, None if i % 2 == 0 else "g1", f"p{i}") for i in range(40)]
        df = spark.createDataFrame(rows, "id long, grp string, payload string")
        df.repartition(5).write.mode("overwrite").partitionBy("grp").parquet(out)
        flagged = compact_partitions(spark, out, ["grp"], rows_per_file=10_000)
        assert {r["grp"] for r in flagged} == {None, "g1"}
        stats = {
            r["grp"]: r["n_files"]
            for r in partition_file_stats(spark, out, ["grp"]).collect()
        }
        assert stats == {None: 1, "g1": 1}
        # fixpoint: nothing left to compact
        assert compact_partitions(spark, out, ["grp"], rows_per_file=10_000) == []
        assert spark.read.parquet(out).count() == 40
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_many_flagged_partitions_select_via_bounded_plan(spark):
    """Hundreds of flagged partitions: selection must be a broadcast
    semi-join against a keys frame, not an OR-of-AND predicate chain
    whose Catalyst tree grows with the flagged count (plan analysis
    stalls / stack-overflows at 10^4+ partitions).  Correctness face:
    all 300 fragmented partitions converge, none are dropped, the one
    healthy partition stays byte-identical, and a re-run is a no-op."""
    out = tempfile.mkdtemp(prefix="test_compact_many_")
    try:
        n_parts = 300
        rows = [(i, f"g{i % n_parts}", f"p{i}") for i in range(n_parts * 4)]
        df = spark.createDataFrame(rows, "id long, grp string, payload string")
        # every partition fragmented (4 rows across 4 round-robin files)
        df.filter(F.col("grp") != "g0").repartition(4).write.mode(
            "overwrite"
        ).partitionBy("grp").parquet(out)
        df.filter(F.col("grp") == "g0").coalesce(1).write.mode("append").partitionBy(
            "grp"
        ).parquet(out)
        before_g0 = _files(out, "g0")

        flagged = compact_partitions(spark, out, ["grp"], rows_per_file=10_000)
        # a group whose 4 rows happen to land in ONE round-robin task is
        # already healthy, so "hundreds flagged", not exactly n_parts-1
        assert len(flagged) > 200, len(flagged)
        assert "g0" not in {r["grp"] for r in flagged}
        assert _files(out, "g0") == before_g0

        stats = partition_file_stats(spark, out, ["grp"]).collect()
        assert len(stats) == n_parts
        assert all(r["n_files"] == 1 for r in stats), [
            r for r in stats if r["n_files"] != 1
        ][:5]
        assert spark.read.parquet(out).count() == n_parts * 4
        assert compact_partitions(spark, out, ["grp"], rows_per_file=10_000) == []
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_flagged_selection_prunes_unflagged_partitions(spark):
    """The few-flagged common case must not scan the whole store: the
    coarse per-column IN pre-filter reaches the scan as a
    PartitionFilter, so selecting 2 flagged partitions out of 50 reads
    2 directories — the semi-join alone (null-safe keys) triggers no
    static pruning and would list and scan all 50."""
    from advanced_technologies_of_china_graph_database_construction_spark.sources.compaction import (
        _select_flagged,
    )

    out = tempfile.mkdtemp(prefix="test_compact_prune_")
    try:
        rows = [(i, f"g{i % 50}", f"p{i}") for i in range(500)]
        df = spark.createDataFrame(rows, "id long, grp string, payload string")
        df.write.mode("overwrite").partitionBy("grp").parquet(out)
        store = spark.read.parquet(out)
        picked = _select_flagged(spark, store, ["grp"], [("g7",), ("g31",)])
        plan = picked._jdf.queryExecution().executedPlan().toString()
        scan = next(
            l for l in plan.splitlines()
            if "FileScan parquet" in l and "_keys" not in l
        )
        pf = scan.split("PartitionFilters:")[1].split("]")[0]
        assert "grp" in pf and ("g7" in pf or "IN" in pf.upper()), scan
        # and the selection is still exact
        got = {r["grp"] for r in picked.select("grp").distinct().collect()}
        assert got == {"g7", "g31"}
        assert picked.count() == 20
    finally:
        shutil.rmtree(out, ignore_errors=True)
