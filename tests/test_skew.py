"""Salted skew operators must be result-identical to their plain
equivalents on a deliberately skewed input (one hot key holding most
rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators.skew import (
    salted_count,
    salted_join,
)


def _skewed(spark, n=10_000):
    # ~90% of rows share key 0; the rest spread over 100 keys
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3 % 7).cast("double").alias("v"),
    )


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"],): (r["count"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r["k"],): (r["count"], r["total"])
        for r in salted_count(df, "k", {"total": F.col("v")}).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
    )
    plain = sorted(map(tuple, big.join(small, "k").select("k", "v", "name").collect()))
    salted = sorted(map(tuple, salted_join(big, small, "k").select("k", "v", "name").collect()))
    assert salted == plain


def test_zorder_key_known_interleave(spark):
    """Morton bits: a's bit i lands at 2i, b's at 2i+1 — a=3 (011),
    b=5 (101) under bits=3 interleave to 0b100111 = 39."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(3, 5)], "a long, b long")
    got = df.select(zorder_key(F.col("a"), F.col("b"), bits=3).alias("z")).first()["z"]
    assert got == 39

    import pytest as _pytest
    with _pytest.raises(ValueError):
        zorder_key(F.col("a"), F.col("b"), bits=0)


def test_zorder_buckets_bound_both_dims_linear_sort_does_not(spark):
    """The locality claim as numbers: over a full 16x16 grid split into
    4 buckets, every Z-bucket's envelope spans half of EACH dimension,
    while a-sorted quartiles leave b spanning its whole domain."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.layout import (
        zorder_layout_audit,
    )

    grid = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    )
    audit = zorder_layout_audit(grid, "a", "b", bits=4, bucket_bits=2).collect()
    assert len(audit) == 4
    for r in audit:
        assert r["n_rows"] == 64
        assert r["a_max"] - r["a_min"] == 7  # half of [0,15] each
        assert r["b_max"] - r["b_min"] == 7
    # bucket_bits beyond the 2*bits key width would make the shiftright
    # amount negative — Spark wraps it silently, misbucketing every row —
    # so the audit must refuse loudly (r6 review finding)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        zorder_layout_audit(grid, "a", "b", bits=4, bucket_bits=9)
    with _pytest.raises(ValueError):
        zorder_layout_audit(grid, "a", "b", bits=4, bucket_bits=0)
    # linear sort on a: each quartile covers ALL of b
    lin = (
        grid.withColumn("bucket", (F.col("a") / 4).cast("int"))
        .groupBy("bucket")
        .agg((F.max("b") - F.min("b")).alias("b_spread"))
        .collect()
    )
    assert all(r["b_spread"] == 15 for r in lin)


def test_zorder_write_clusters_files_in_both_dims(spark, tmp_path):
    """After zorder_write, every parquet file's min/max envelope (what
    a reader prunes with) is a strict sub-range of BOTH dimensions."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.layout import zorder_write

    grid = spark.createDataFrame(
        [(a, b) for a in range(32) for b in range(32)], "a long, b long"
    )
    out = str(tmp_path / "zorded")
    zorder_write(grid, "a", "b", out, n_files=4, bits=5)
    back = spark.read.parquet(out)
    assert back.count() == 32 * 32
    envelopes = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("a") - F.min("a")).alias("a_spread"),
            (F.max("b") - F.min("b")).alias("b_spread"),
        )
        .collect()
    )
    assert len(envelopes) >= 4
    assert all(r["a_spread"] <= 16 and r["b_spread"] <= 16 for r in envelopes)


def test_zorder_write_normalizes_wide_ranges(spark, tmp_path):
    """r12 review fix: raw wide-range keys fed to the bit interleave
    cluster on LOW bits only (rows 5, 261, 517 share a Z-key at
    bits=8), so no file is ever pruned.  With min/max normalization,
    each file's envelope must cover a narrow slice of the raw domain."""
    import glob

    from advanced_technologies_of_china_graph_database_construction_spark.operators.layout import zorder_write

    # 32x32 grid scaled far beyond 2^8 in both dimensions
    rows = [(i * 7919, j * 6151) for i in range(32) for j in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = str(tmp_path / "z")
    zorder_write(df, "a", "b", out, n_files=16, bits=5)
    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        pf = spark.read.parquet(f)
        mm = pf.agg({"a": "min"}).first()[0], pf.agg({"a": "max"}).first()[0]
        spans.append(mm[1] - mm[0])
    full = 31 * 7919
    # every file must cover well under the full domain in dimension a
    assert spans and all(s <= full * 0.6 for s in spans), spans
