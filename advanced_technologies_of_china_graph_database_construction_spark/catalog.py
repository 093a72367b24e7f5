"""Table catalog: load the driver-provided parquet tables and register
SQL views.

The reference delegates storage to Neo4j; this engine's store is columnar
parquet read through the DataFrame reader, which gives Catalyst filter
pushdown, column pruning and partition pruning for free (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime-settable SQL confs every query plan assumes.  The correctness
# driver supplies its OWN SparkSession (not session.get_spark), so these
# must not live only in the session factory: a default session renders
# timestamps in local time (breaking oracle comparison), uses 200 shuffle
# partitions (pure overhead at test scale), and leaves AQE's skew/coalesce
# features off.  All of these are runtime-settable SQL confs — static
# confs like driver memory stay in session.py where they belong.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
        if os.environ.get("SPARK_GRAFT_CPUS", "32").isdigit()
        else "32"
    ),
}
_CONF_SENTINEL = "spark.atcgdc.runtimeConfsApplied"


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the engine's runtime SQL confs once per session (idempotent)."""
    if spark.conf.get(_CONF_SENTINEL, None) == "true":
        return
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this deployment — keep going
    spark.conf.set(_CONF_SENTINEL, "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_confs(spark)
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = _nanos_timestamp_cols(path)
    if not nanos_cols:
        return spark.read.parquet(path)
    # Spark's parquet reader rejects TIMESTAMP(NANOS) (PARQUET_TYPE_ILLEGAL);
    # read them as raw nanos longs and truncate to micros — the same
    # truncation DuckDB applies, so oracle comparisons stay exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (unreadable by Spark)."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def parquet_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet footer metadata — no Spark job, no
    data scan.  ``pyarrow.dataset.count_rows()`` with no filter sums the
    per-row-group counts recorded in each file footer, so the cost is
    O(#files) driver-side footer reads (milliseconds), not O(rows).

    Used by the similarity-join `auto` dispatcher so strategy selection
    doesn't pay a full extra pass over the embeddings (the er02 +18%
    regression in round 3).  At cluster scale the same number comes from
    catalog statistics; this is the path-based-table fallback.  Returns
    None when the footeronly count isn't available (callers then fall
    back to a Spark count)."""
    try:
        import pyarrow.dataset as ds

        return int(ds.dataset(f"{sf_dir}/{name}.parquet", format="parquet").count_rows())
    except Exception:
        return None


