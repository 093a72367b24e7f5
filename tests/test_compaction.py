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
