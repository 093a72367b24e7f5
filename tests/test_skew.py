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
