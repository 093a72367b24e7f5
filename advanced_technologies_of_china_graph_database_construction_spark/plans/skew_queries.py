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
    out = salted_count(events, "event_type", {"total_value": F.col("value")})
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
    return salted_join(events, totals, "user_id")


S02_SQL = """
WITH tot AS (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, e.event_type, t.n_user_events
FROM events e JOIN tot t USING (user_id)
"""

SPECS = [
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
