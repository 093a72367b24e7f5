"""Small-file compaction for hive-partitioned parquet stores.

Beyond-reference storage maintenance: the reference's sink is a
one-shot CSV dump (`csv_extractor.py:16-241`); a 100 TB store that is
APPENDED to (streaming micro-batches — e26/e27; per-ingest deltas —
p03) accretes small files per partition until scan planning and
per-file open overhead dominate.  Compaction rewrites ONLY the
partitions whose file count exceeds what their row count warrants,
leaving every healthy partition's files byte-identical (same dynamic
partition-overwrite contract the e27 sink pins).

Scale shape:
- The audit is one metadata-cheap aggregate: files per partition via
  ``input_file_name()`` + row counts, map-side combined to one row per
  partition (the partition count, not the row count, bounds the
  result).
- Only flagged partitions are re-read, and the rewrite is a single
  ``repartition(partition_cols)`` shuffle of JUST those partitions'
  rows — each hive partition's rows converge to one task, hence one
  output file (``maxRecordsPerFile`` re-splits if a partition outgrows
  a single file).
- ``partitionOverwriteMode=dynamic`` scopes the overwrite to the
  partitions present in the rewrite frame; untouched directories are
  never listed, read, or rewritten.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_file_stats(
    spark: SparkSession, path: str, partition_cols: Sequence[str]
) -> DataFrame:
    """One row per hive partition: (partition cols…, n_files, n_rows).
    A pure aggregate over the store scan — no driver-side file listing,
    so it parallelizes with the store."""
    df = spark.read.parquet(path)
    # input_file_name() is nondeterministic, so it must be PROJECTED
    # before it can feed an aggregate (Spark rejects it inline)
    tagged = df.select(*partition_cols, F.input_file_name().alias("_file"))
    return tagged.groupBy(*partition_cols).agg(
        F.countDistinct("_file").alias("n_files"),
        F.count("*").alias("n_rows"),
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    rows_per_file: int = 1_000_000,
) -> list[dict]:
    """Rewrite every partition holding more files than
    ``ceil(n_rows / rows_per_file)``; return the flagged partitions'
    stats rows (bounded by the partition count — a driver-scalar read
    per the repo's collect discipline).  Healthy partitions keep their
    existing files bit-for-bit."""
    pcols = list(partition_cols)
    flagged = (
        partition_file_stats(spark, path, pcols)
        .filter(
            F.col("n_files")
            > F.ceil(F.col("n_rows") / F.lit(float(rows_per_file)))
        )
        .collect()
    )
    if not flagged:
        return []
    df = spark.read.parquet(path)
    keys = [tuple(r[c] for c in pcols) for r in flagged]
    pred = F.struct(*[F.col(c) for c in pcols]).isin(
        [F.struct(*[F.lit(v) for v in k]) for k in keys]
    )
    # Two-phase rewrite: stage the compacted rows OUTSIDE the store,
    # then dynamic-overwrite from the staged copy.  Spark (correctly)
    # refuses to overwrite a path it is reading from; staging also
    # means a mid-compaction failure leaves the store intact — the
    # cost is one extra write of JUST the flagged partitions' rows.
    staging = tempfile.mkdtemp(prefix="compact_staging_")
    try:
        (
            df.filter(pred)
            .repartition(*[F.col(c) for c in pcols])
            .write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*pcols)
            .parquet(staging)
        )
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            # per-write option, not session conf — the caller's session
            # must stay untouched (the s10 bare-session discipline)
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*pcols)
            .parquet(path)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return [r.asDict() for r in flagged]
