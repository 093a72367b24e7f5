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


_TYPE_INFER = "spark.sql.sources.partitionColumnTypeInference.enabled"


def _read_store(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned store with partition-type inference OFF: a
    compactor's ground truth is the DIRECTORY NAME, and inference would
    retype a numeric-looking string value ('01' → 1) so the rewrite
    lands under a DIFFERENT directory (grp=1 beside grp=01), silently
    duplicating the store.  Opaque strings preserve directory identity
    for every value; the conf is restored immediately (the reader
    resolves the partition schema at load, forced via ``.schema``)."""
    orig = spark.conf.get(_TYPE_INFER)
    try:
        spark.conf.set(_TYPE_INFER, "false")
        df = spark.read.parquet(path)
        df.schema  # force partition discovery under the pinned conf
        return df
    finally:
        spark.conf.set(_TYPE_INFER, orig)


def partition_file_stats(
    spark: SparkSession, path: str, partition_cols: Sequence[str]
) -> DataFrame:
    """One row per hive partition: (partition cols…, n_files, n_rows).
    A pure aggregate over the store scan — no driver-side file listing,
    so it parallelizes with the store.  Partition values surface as
    STRINGS (directory labels — see ``_read_store``)."""
    df = _read_store(spark, path)
    # input_file_name() is nondeterministic, so it must be PROJECTED
    # before it can feed an aggregate (Spark rejects it inline)
    tagged = df.select(*partition_cols, F.input_file_name().alias("_file"))
    return tagged.groupBy(*partition_cols).agg(
        F.countDistinct("_file").alias("n_files"),
        F.count("*").alias("n_rows"),
    )


def _select_flagged(
    spark: SparkSession,
    df: DataFrame,
    pcols: Sequence[str],
    flagged_keys: Sequence[tuple],
) -> DataFrame:
    """Rows of ``df`` belonging to exactly the ``flagged_keys``
    partitions, selected scale-correctly in both directions:

    - EXACTNESS at large flagged counts: a broadcast LEFT-SEMI join
      against a small keys frame — O(1) Catalyst nodes regardless of
      how many partitions are flagged (an OR-of-AND predicate chain
      grows the plan tree linearly and stalls analysis at 10^4+ flagged
      partitions, the realistic streaming-store backlog).  eqNullSafe
      join keys keep NULL partition values (__HIVE_DEFAULT_PARTITION__)
      matchable — a plain equi-join would silently drop them and the
      partition would stay flagged-but-never-rewritten forever.
    - PRUNING at small flagged counts: a null-safe join predicate does
      not trigger static partition pruning, so the semi-join alone
      would LIST AND SCAN the whole store to compact a handful of
      partitions.  A coarse PUSHABLE pre-filter per partition column —
      one IN node over the flagged non-null values (plus isNull when a
      flagged key carries NULL) — stays O(1) plan depth, reaches the
      scan as a PartitionFilter, and prunes the read to the flagged
      values' cross product; the semi-join then narrows that superset
      to the exact flagged tuples."""
    keys_df = spark.createDataFrame(
        list(flagged_keys), df.select(*pcols).schema
    ).alias("_keys")
    store = df.alias("_store")
    for i, c in enumerate(pcols):
        vals = sorted({k[i] for k in flagged_keys if k[i] is not None})
        pred = F.col(c).isin(vals) if vals else F.lit(False)
        if any(k[i] is None for k in flagged_keys):
            pred = pred | F.col(c).isNull()
        store = store.filter(pred)
    match = None
    for c in pcols:
        term = F.col(f"_store.{c}").eqNullSafe(F.col(f"_keys.{c}"))
        match = term if match is None else (match & term)
    return store.join(F.broadcast(keys_df), match, "leftsemi")


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
    df = _read_store(spark, path)
    picked = _select_flagged(spark, df, pcols, [tuple(r[c] for c in pcols) for r in flagged])
    # Two-phase rewrite: stage the compacted rows OUTSIDE the store,
    # then dynamic-overwrite from the staged copy.  Spark (correctly)
    # refuses to overwrite a path it is reading from; staging also
    # means a mid-compaction failure leaves the store intact — the
    # cost is one extra write of JUST the flagged partitions' rows.
    staging = tempfile.mkdtemp(prefix="compact_staging_")
    try:
        (
            picked
            .repartition(*[F.col(c) for c in pcols])
            .write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*pcols)
            .parquet(staging)
        )
        (
            # pin the source schema: an inferring re-read would retype a
            # numeric-looking string partition value ('01' → 1) and
            # write it back under a DIFFERENT partition directory
            spark.read.schema(df.schema).parquet(staging)
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
