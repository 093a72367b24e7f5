"""Skew-mitigation operators inside the correctness gate.

`operators.skew` exists for the hot-key shapes AQE doesn't rescue at
100 TB (a single dominant groupBy key; a known-skewed join key against a
non-broadcastable build side).  Both operators are result-identical to
their plain equivalents by construction — these specs prove it against
the *plain* SQL on the DuckDB side: the oracle never mentions salts, so
any salting artifact (lost rows, double counts, salt-column leakage)
fails the hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.skew import salted_count, salted_join
from .spec import QuerySpec


def s01_salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the hottest key in the fixture
    (a handful of event_type values carry the whole table)."""
    events = load_table(spark, sf_dir, "events")
    # salt on event_id: unique, so exact-duplicate hot-key rows still
    # spread (and the salt is retry-stable — see operators/skew.py)
    out = salted_count(
        events, "event_type", {"total_value": F.col("value")}, salt_cols=["event_id"]
    )
    return out.select(
        "event_type", "count", F.round("total_value", 2).alias("total_value")
    )


S01_SQL = """
SELECT event_type, count(*) AS count, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type
"""


def s02_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: every event joined to its user's total event
    count (the small side replicated per salt, the big side salted)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    totals = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_user_events"))
    )
    return salted_join(events, totals, "user_id", salt_cols=["event_id"])


S02_SQL = """
WITH tot AS (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, e.event_type, t.n_user_events
FROM events e JOIN tot t USING (user_id)
"""

ZO_BITS = 8
ZO_BUCKET_BITS = 4


def s08_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit over lineitem's
    (l_partkey, l_suppkey): each of the 16 contiguous Z-ranges — the
    stand-ins for files under a `zorder_write` layout — reports its
    row count and min/max envelope in BOTH dimensions.  The envelopes
    ARE the parquet file statistics a reader would prune with, so the
    gate proves the bit-interleave arithmetic AND ships the locality
    evidence: under Z-order every 1/16th-of-keyspace bucket spans only
    a quarter of each dimension (vs. all of dimension 2 under a plain
    sort on dimension 1)."""
    from ..operators.layout import zorder_layout_audit

    li = load_table(spark, sf_dir, "lineitem")
    return zorder_layout_audit(
        li, "l_partkey", "l_suppkey", bits=ZO_BITS, bucket_bits=ZO_BUCKET_BITS
    )


def _zo_sql_key(a: str, b: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


S08_SQL = f"""
WITH d AS (
  SELECT l_partkey & {2**ZO_BITS - 1} AS a, l_suppkey & {2**ZO_BITS - 1} AS b
  FROM lineitem),
z AS (
  SELECT a, b, ({_zo_sql_key('a', 'b', ZO_BITS)}) >> {2 * ZO_BITS - ZO_BUCKET_BITS}
           AS z_bucket
  FROM d)
SELECT z_bucket, count(*) AS n_rows,
       min(a) AS a_min, max(a) AS a_max,
       min(b) AS b_min, max(b) AS b_max
FROM z GROUP BY z_bucket
"""


SPECS = [
    QuerySpec(
        name="s08_zorder_layout_audit",
        fn=s08_zorder_layout_audit,
        oracle=S08_SQL,
        category="skew",
        description="Z-order (Morton) clustering: JVM bit-interleave key + "
        "per-Z-range min/max envelopes in both dimensions — the file-"
        "statistics locality a ZORDER BY layout gives multi-dim pruning.",
    ),
    QuerySpec(
        name="s01_salted_event_type_stats",
        fn=s01_salted_event_type_stats,
        oracle=S01_SQL,
        category="skew",
        description="Hot-key groupBy through salted two-phase aggregation; "
        "oracle is the plain GROUP BY — salting must be invisible in the result.",
    ),
    QuerySpec(
        name="s02_salted_user_join",
        fn=s02_salted_user_join,
        oracle=S02_SQL,
        category="skew",
        description="Skewed-key join through salt-and-replicate; oracle is the "
        "plain join.",
    ),
]
