"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB target: AQE on (runtime coalescing + skew-join
splitting), broadcast threshold sized for dimension tables, Arrow enabled
for the pandas-UDF seams, UTC session timezone so results are comparable
with external engines (the DuckDB oracle included).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "atcgdc-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    On a real cluster the ``master`` is supplied by spark-submit and the
    ``local[...]`` setting is ignored.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ~cores locally; on a cluster AQE coalesces from this initial value.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (nation/region/entity dims, alias maps) broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic cross-engine timestamp semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # TXT-record parsing: duplicated {Field} keeps the last value,
        # matching the reference's dict-assignment semantics
        # (cleaner.py:7-26; sources/txt_records.py).
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.ui.enabled", "false")
        # local[N] puts all executor threads in the driver JVM, so the
        # heap must hold every live broadcast + block-manager state for
        # the whole workload: at 16g a 14-query bench run degrades ~3.5x
        # (GC thrash: er02 19.1s->2.0s, i01 24.2s->1.4s at 48g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # With a large heap, minor GCs are rare and the ContextCleaner's
        # weak-ref queue (stale broadcasts/shuffles) drains too slowly;
        # force a periodic sweep well under the workload's lifetime.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
