"""Events workload: event-time windowed aggregations, session windows,
JSON payload extraction, and stateful running aggregates — the batch
face of the unified operators in ``streaming/`` (the streaming face is
exercised in ``tests/test_streaming.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..streaming import stateful, windows
from .spec import QuerySpec


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ------------------------------------------------------------ e01 tumbling --

def e01_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling_stats(_events(spark, sf_dir), "1 day")


E01_SQL = """
SELECT date_trunc('day', ts) AS window_start,
       date_trunc('day', ts) + INTERVAL '1 day' AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------- e02 sliding --

def e02_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.sliding_stats(_events(spark, sf_dir), "1 hour", "30 minutes")


# Each event belongs to exactly 2 overlapping 60-min windows aligned on
# 30-min slots: its own slot start and the previous one.
E02_SQL = """
WITH slotted AS (
  SELECT event_type, value,
         date_trunc('hour', ts)
           + CASE WHEN extract('minute' FROM ts) >= 30
                  THEN INTERVAL '30 minutes' ELSE INTERVAL '0 minutes' END AS slot
  FROM events),
expanded AS (
  SELECT event_type, value, slot - j * INTERVAL '30 minutes' AS window_start
  FROM slotted CROSS JOIN (VALUES (0), (1)) AS t(j))
SELECT window_start, window_start + INTERVAL '60 minutes' AS window_end,
       event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM expanded GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------ e03 sessions --

def e03_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.session_stats(_events(spark, sf_dir), "30 minutes")


# Gaps-and-islands: a new session starts when the gap from the previous
# event exceeds 30 minutes; Spark's session end = last event + gap.
E03_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM numbered GROUP BY user_id, session_id
"""


# -------------------------------------------------------------- e04 props ---

def e04_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = windows.props_extracted(_events(spark, sf_dir))
    return ev.groupBy((F.col("k") % 10).alias("k_bucket")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


E04_SQL = """
WITH ex AS (SELECT CAST(props->>'$.k' AS INT) AS k, value FROM events)
SELECT k % 10 AS k_bucket, count(*) AS n_events,
       round(sum(value), 6) AS sum_value, min(k) AS min_k, max(k) AS max_k
FROM ex GROUP BY 1
"""


# ----------------------------------------------------- e05 top users / day --

def e05_top_users_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 6).alias("day_value"))
        .select(F.col("w.start").alias("day"), "user_id", "day_value")
    )
    w = Window.partitionBy("day").orderBy(F.desc("day_value"), "user_id")
    return daily.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


E05_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, user_id, round(sum(value), 6) AS day_value
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY day ORDER BY day_value DESC, user_id) AS rank
  FROM daily)
SELECT day, user_id, day_value, rank FROM ranked WHERE rank <= 3
"""


# ----------------------------------------------------- e06 running totals ---

def e06_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful.running_totals_batch(_events(spark, sf_dir))


E06_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY user_id
"""


# -------------------------------------------------- e07 cumulative stream ---

def e07_cumulative_by_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful.cumulative_by_event(_events(spark, sf_dir))


E07_SQL = """
SELECT user_id, event_id,
       count(*) OVER w AS n_events,
       round(sum(value) OVER w, 6) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
"""


def e08_click_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: purchases by the same user within 30
    minutes after a click — the stream-stream join shape (watermarked on
    both sides in streaming mode; see streaming/windows.interval_join)."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = windows.interval_join(clicks, purchases)
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.sum("r_value"), 6).alias("purchase_value"),
    )


E08_SQL = """
SELECT l.user_id, count(*) AS n_pairs, round(sum(r.value), 6) AS purchase_value
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'purchase'
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'
GROUP BY l.user_id
"""


def e09_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag analytics: per-user value delta vs. the previous event
    and the next event's type (deterministic order: ts, event_id)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


E09_SQL = """
SELECT user_id, event_id,
       round(value - lag(value) OVER w, 6) AS delta,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def e10_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the user's latest click at
    or before the purchase (left outer; ties broken by max click id).
    Composition route — union + single key shuffle + running-window
    forward fill; see operators/asof.py for why not an inequality join."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.round("value", 6).alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        tiebreak="click_id",
    ).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        "click_id",
        "click_ts",
    )


E10_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
         round(value, 6) AS purchase_value
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'),
ranked AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
         c.click_id, c.click_ts,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts)
SELECT purchase_id, user_id, purchase_ts, purchase_value, click_id, click_ts
FROM ranked WHERE rn = 1
"""


def _bump_mtimes(d: str, seen: set[str], tick: int) -> set[str]:
    """Stamp every not-yet-seen data file in ``d`` with a synthetic,
    strictly increasing mtime (epoch + tick seconds).  The file
    streaming source replays in mtime order with path as the
    tie-break; explicit stamps make the order deterministic on ANY
    filesystem — a sleep between writes only works down to the mount's
    mtime granularity (1 s on some network filesystems), and a tie
    hands the order to random part-file UUIDs."""
    import os

    now = set()
    for f in os.listdir(d):
        if not f.startswith(("_", ".")):
            now.add(f)
            if f not in seen:
                os.utime(os.path.join(d, f), (1_000_000 + tick, 1_000_000 + tick))
    return now


def _write_ts_slices(ev: DataFrame, d: str, n: int = 4):
    """Write ``ev`` into ``n`` time-ranged parquet files whose
    MODIFICATION times strictly increase with event time, and return
    the max ts.  Replay order cannot ride on commit order — with a
    watermark in append mode whichever later slice happens to land
    first advances the watermark and silently drops the earlier slices
    (measured on e15: 4777–7319 of 9549 sessions, run-dependent) — so
    the order is made explicit: ONE ``repartitionByRange(n, ts)`` write
    (the range partitioner keeps part-file INDEX = time order, and
    equal keys never straddle a boundary), then synthetic mtimes
    stamped in part-filename order.  One scan + one shuffle replaces
    the previous n filtered scans with single-task writes (measured on
    e15 at sf0.1: 5.8 → 5.2 s end-to-end — the streaming query itself,
    not the slice write, is the dominant cost)."""
    import os

    hi = ev.agg(F.max("ts").alias("hi")).first()["hi"]
    ev.repartitionByRange(n, "ts").write.mode("append").parquet(d)
    seen: set[str] = set()
    files = sorted(f for f in os.listdir(d) if not f.startswith(("_", ".")))
    for i, f in enumerate(files):
        os.utime(os.path.join(d, f), (1_000_000 + i, 1_000_000 + i))
        seen.add(f)
    return hi, seen


def e11_streaming_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/S4 streaming face, driver-gated: the SAME tumbling_stats plan
    as e01 executed as a REAL Structured Streaming query — the events
    table split into 4 ts-ranged parquet files streamed with
    ``maxFilesPerTrigger=1`` (4 micro-batches), watermarked, aggregated
    incrementally, complete-mode into the in-memory sink — then returned
    as the sink table so the batch oracle (E01_SQL) hash-gates the
    streaming execution path end-to-end.  Unified-API contract: batch
    and stream faces of one declarative plan must produce identical
    results (`streaming/windows.py` module docstring)."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="e11_events_")
    try:
        _write_ts_slices(ev, d)
        stream = windows.streaming_source(spark, d, watermark="1 hour")
        name = f"e11_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                windows.tumbling_stats(stream, "1 day")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name)


# ------------------------------------------------------------ e12 funnel --

def e12_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view → click → purchase: a user
    advances a stage only with an event strictly after their previous
    stage's first event.  Three conditional min-aggregations chained by
    equi-joins on user_id (each join key-partitioned; no window over
    the whole event stream, no ordering shuffle of raw events)."""
    ev = _events(spark, sf_dir)
    mv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("tv"))
    )
    mc = (
        ev.filter(F.col("event_type") == "click")
        .join(mv, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id").agg(F.min("ts").alias("tc"))
    )
    mp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(mc, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id").agg(F.min("ts").alias("tp"))
    )
    return (
        mv.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("1_view").alias("stage"), "n_users")
        .unionByName(mc.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("2_click").alias("stage"), "n_users"))
        .unionByName(mp.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("3_purchase").alias("stage"), "n_users"))
    )


E12_SQL = """
WITH mv AS (SELECT user_id, min(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY 1),
mc AS (
  SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN mv ON e.user_id = mv.user_id
  WHERE e.event_type = 'click' AND e.ts > mv.tv GROUP BY 1),
mp AS (
  SELECT e.user_id, min(e.ts) AS tp FROM events e JOIN mc ON e.user_id = mc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > mc.tc GROUP BY 1)
SELECT '1_view' AS stage, count(*) AS n_users FROM mv
UNION ALL SELECT '2_click', count(*) FROM mc
UNION ALL SELECT '3_purchase', count(*) FROM mp
"""


# ----------------------------------------------------------- e13 cohorts --

def e13_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the week of their
    first event; one row per (cohort_week, week_offset) with the count
    of distinct users active that week.  First-touch is one min-agg;
    activity weeks are a map-side date_trunc; the rollup is a single
    count-distinct shuffle — integer/date arithmetic only."""
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    acts = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
    )
    return acts.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )


E13_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY 1)
SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users FROM (
  SELECT e.user_id, f.cohort_week,
         CAST(floor(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7.0) AS INT) AS week_offset
  FROM events e JOIN first f ON e.user_id = f.user_id)
GROUP BY 1, 2
"""


# ------------------------------------------------- e14 transitions ------

def e14_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count of (prev_type → next_type) steps and the
    conditional probability P(next | prev) — the path-analysis /
    next-event-prediction primitive.  One lag window per user (sorted
    within user partitions), one count shuffle, one per-prev window for
    the normalizer; raw events are never globally sorted."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_steps")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_steps",
        F.round(F.col("n_steps") / F.sum("n_steps").over(wp), 6).alias("prob"),
    )


E14_SQL = """
WITH steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events),
counts AS (
  SELECT prev_type, next_type, count(*) AS n_steps
  FROM steps WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n_steps,
       round(n_steps / sum(n_steps) OVER (PARTITION BY prev_type), 6) AS prob
FROM counts
"""


# ------------------------------------ e28 binned interval overlap --------

# window length = value minutes, floored and clamped to [1, 30]; the bin
# width equals the 30-min cap so most windows cover ≤ 2 bins
E28_CAP_MIN = 30
E28_BIN_US = E28_CAP_MIN * 60_000_000


def e28_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global wall-clock concurrency pairs: every click window × every
    purchase window that overlap in time, ACROSS users (load/contention
    analytics — e08's per-user attribution join has user_id as an
    equi-key; this face has none, the exact shape where a naive
    inequality join plans as a nested loop).  Windows are half-open
    [ts, ts + clamp(floor(value), 1, 30) minutes) in integer epoch
    micros; `operators/intervals.interval_overlap_join` bins the time
    axis so candidates meet through an equi-join on the bin id and each
    pair is counted once at its first shared bin.  Output is integer
    microseconds end to end — no float boundary class."""
    from ..operators.intervals import interval_overlap_join

    ev = _events(spark, sf_dir)
    dur_us = (
        F.least(
            F.greatest(F.floor(F.col("value")), F.lit(1).cast("long")),
            F.lit(E28_CAP_MIN).cast("long"),
        )
        * F.lit(60_000_000)
    )

    # tz-free epoch micros: ts is TIMESTAMP_NTZ, and unix_micros(cast)
    # would reinterpret the wall-clock in the SESSION timezone — a
    # silent conf dependency the bare-session gate exists to catch.
    # timestampdiff against the NTZ epoch literal is pure calendar
    # arithmetic, bit-identical to DuckDB's epoch_us.
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")

    def win(event_type: str) -> DataFrame:
        return ev.filter(F.col("event_type") == event_type).select(
            "event_id",
            us.alias("start"),
            (us + dur_us).alias("end"),
        )

    pairs = interval_overlap_join(
        win("click"), win("purchase"), bin_width=E28_BIN_US
    )
    return pairs.select(
        F.col("event_id_l").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("overlap").alias("overlap_us"),
    )


E28_SQL = f"""
WITH w AS (
  SELECT event_id, event_type,
         epoch_us(ts) AS s,
         epoch_us(ts)
           + least(greatest(CAST(floor(value) AS BIGINT), 1), {E28_CAP_MIN})
             * 60000000 AS e
  FROM events WHERE event_type IN ('click', 'purchase'))
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       least(c.e, p.e) - greatest(c.s, p.s) AS overlap_us
FROM w c JOIN w p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.s < p.e AND p.s < c.e
"""


# ------------------------------------- e15 streaming session face --------

def _append_sentinels(ev: DataFrame, d: str, seen: set, max_ts, base_tick: int = 4) -> None:
    """Two far-future sentinel micro-batches (reserved user_id −1) on a
    slice directory: the first advances the watermark past every real
    window/join bound, the second triggers the flush (watermark state
    applies on the NEXT batch).  Shared by every append-mode face whose
    results only finalize under the watermark (e15 session windows, e19
    outer join).  ``seen`` is rebound only BETWEEN the two sentinel
    writes (so the second bump skips the first sentinel's file); the
    directory is complete after this call, so nothing is returned."""
    for i, days in enumerate((30, 31)):
        (
            ev.limit(1)
            .select(
                F.lit(-1 - i).cast("long").alias("event_id"),
                (F.lit(max_ts) + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit("sentinel").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
        seen = _bump_mtimes(d, seen, base_tick + i)


def e15_streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window streaming face, driver-gated: the SAME
    session_stats plan as e03 executed as a REAL Structured Streaming
    query in APPEND mode — the strictest output mode, where a session
    row may only be emitted once its window is finalized by the
    watermark.  Finite input means the last sessions would never
    finalize, so two far-future sentinel events (a reserved user id)
    are appended as their own micro-batches: the first advances the
    watermark past every real session end, the second triggers the
    flush (watermark state applies on the NEXT batch).  Sentinel rows
    are filtered from the sink, so the batch oracle (E03_SQL) hash-
    gates the streamed sessions exactly."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="e15_events_")
    try:
        max_ts, seen = _write_ts_slices(ev, d)
        _append_sentinels(ev, d, seen, max_ts)
        stream = windows.streaming_source(spark, d, watermark="1 hour")
        name = f"e15_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                windows.session_stats(stream, "30 minutes")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).filter(F.col("user_id") >= 0)


# --------------------------------- e16 stateful streaming face ------------

def e16_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-stateful-operator face (W2's applyInPandasWithState),
    driver-gated: per-user running totals held in GroupState across 4
    real micro-batches, update-mode into the memory sink.  Every batch
    emits each seen user's cumulative state, so the sink holds one row
    per (user, batch-they-appeared-in); the FINAL state per user is the
    row with the highest n_events (counts strictly increase per
    emission).  That final state must equal the batch aggregate (E06) —
    the unified-API contract for the stateful seam."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="e16_events_")
    try:
        _write_ts_slices(ev, d)
        stream = windows.streaming_source(spark, d, watermark=None)
        name = f"e16_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                stateful.running_totals_stream(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    final = F.max(F.struct("n_events", "total_value")).alias("s")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final)
        .select("user_id", F.col("s.n_events").alias("n_events"),
                F.col("s.total_value").alias("total_value"))
    )


# --------------------------------- e17 streaming dedup face --------------

def e17_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once-ish ingest face (W2's
    ``dropDuplicatesWithinWatermark``), driver-gated: the base events
    stream as time-ordered micro-batches, then every 10th event is
    RE-DELIVERED verbatim as its own FINAL micro-batch — so the dedup
    must happen across batches out of the operator's key state, not
    within one batch's shuffle (a generous watermark keeps early keys'
    state alive; with a tight one the replays would instead be dropped
    as late data, which passes the same gate for the wrong reason).
    Append mode emits each first-seen event_id immediately — no
    finalization wait, unlike e15's windows.  The sink must equal the
    batch distinct projection exactly: one replay slipping through
    doubles a row and fails the hash."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    # the distinct-by-row oracle is only equivalent to dedup-by-id when
    # base event_ids are unique — assert it so a fixture change fails
    # loudly here rather than as a mystery hash mismatch
    u = ev.agg(
        F.count("event_id").alias("n"), F.countDistinct("event_id").alias("d")
    ).first()
    assert u["n"] == u["d"], f"events.event_id not unique: {u}"
    d = tempfile.mkdtemp(prefix="e17_events_")
    try:
        _, seen = _write_ts_slices(ev, d)
        ev.filter(F.col("event_id") % 10 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _bump_mtimes(d, seen, 10)
        stream = windows.streaming_source(spark, d, watermark=None)
        deduped = windows.dedup_events(stream, within="30 days").select(
            "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
        )
        name = f"e17_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                deduped.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name)


# --------------------------------- e18 stream-stream join face -----------

def e18_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream JOIN face (the last core Structured Streaming
    shape without a driver-gated run — e11 covered aggregation, e15
    session windows, e16 arbitrary state, e17 dedup): E08's
    click↔purchase event-time interval join executed as a REAL
    readStream ⋈ readStream with watermarks on BOTH sides — the dual
    watermark is what bounds each side's join state at scale (buffered
    clicks are evicted once the global watermark passes click.ts + the
    30-minute join upper bound; without it a 100 TB stream buffers
    forever).

    Each side is written as its own ts-range-sliced directory (the
    `_write_ts_slices` pattern), so the two sources advance roughly in
    event-time lockstep: 4 micro-batches, one file per side per
    trigger.  The 1-hour watermark delay dominates the inter-side
    slice-boundary skew (both sides sample the same underlying ts
    distribution, so their range-partition boundaries sit within
    minutes of each other at any sf) — a matching purchase always
    arrives before the click's state is evicted, and no input row
    falls below the global watermark.  Inner joins emit eagerly on
    match (no finalization wait, so no sentinel batches needed —
    unlike e15's append-mode windows).  The joined pairs land in the
    memory sink; the per-user aggregate runs batch-side on the sink so
    the E08 oracle hash-gates the streamed join exactly."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    d_clicks = tempfile.mkdtemp(prefix="e18_clicks_")
    d_purchases = tempfile.mkdtemp(prefix="e18_purchases_")
    try:
        _write_ts_slices(ev.filter(F.col("event_type") == "click"), d_clicks)
        _write_ts_slices(ev.filter(F.col("event_type") == "purchase"), d_purchases)
        clicks = windows.streaming_source(spark, d_clicks, watermark=None)
        purchases = windows.streaming_source(spark, d_purchases, watermark=None)
        # interval_join watermarks each streaming side itself (dual wm)
        joined = windows.interval_join(clicks, purchases, watermark="1 hour")
        name = f"e18_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d_clicks, ignore_errors=True)
        shutil.rmtree(d_purchases, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum("r_value"), 6).alias("purchase_value"),
        )
    )


# ------------------------------ e19 LEFT OUTER stream-stream join --------

def e19_streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HARDEST stream-stream state-cleanup case: the click↔purchase
    interval join as LEFT OUTER — unlike e18's inner join (matches emit
    eagerly), an outer-null row ("click with no purchase within 30
    minutes") can only be emitted once the WATERMARK proves no match
    can still arrive, so the results trail the watermark and a finite
    stream needs sentinel batches on BOTH sources to flush the tail
    (global watermark = min across sources; advancing only one side
    would pin it).  This is exactly the state-eviction path that breaks
    at 100 TB if watermarks are wrong: evict too early → matched clicks
    emit spurious null rows, too late → unbounded buffers.  The gate
    catches both: a spurious null doubles a click's row count and an
    unemitted tail drops rows — either fails the hash against the
    batch LEFT JOIN oracle."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    d_clicks = tempfile.mkdtemp(prefix="e19_clicks_")
    d_purchases = tempfile.mkdtemp(prefix="e19_purchases_")
    try:
        hi_c, seen_c = _write_ts_slices(
            ev.filter(F.col("event_type") == "click"), d_clicks
        )
        hi_p, seen_p = _write_ts_slices(
            ev.filter(F.col("event_type") == "purchase"), d_purchases
        )
        hi = max(hi_c, hi_p)
        _append_sentinels(ev, d_clicks, seen_c, hi)
        _append_sentinels(ev, d_purchases, seen_p, hi)
        clicks = windows.streaming_source(spark, d_clicks, watermark=None)
        purchases = windows.streaming_source(spark, d_purchases, watermark=None)
        joined = windows.interval_join(
            clicks, purchases, watermark="1 hour", how="left_outer"
        )
        name = f"e19_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d_clicks, ignore_errors=True)
        shutil.rmtree(d_purchases, ignore_errors=True)
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)  # drop sentinel-user rows
        .groupBy("user_id")
        .agg(
            F.count("r_event_id").alias("n_pairs"),
            F.sum(F.when(F.col("r_event_id").isNull(), 1).otherwise(0)).alias(
                "n_unmatched"
            ),
            F.round(F.sum("r_value"), 6).alias("purchase_value"),
        )
    )


E19_SQL = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT l.user_id,
       count(r.value) AS n_pairs,
       (count(*) - count(r.value))::BIGINT AS n_unmatched,
       round(sum(r.value), 6) AS purchase_value
FROM l LEFT JOIN r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'
GROUP BY l.user_id
"""


# Base event_ids are unique and the injected duplicates are verbatim
# copies, so distinct-by-row == dedup-by-event_id.
E17_SQL = """
SELECT DISTINCT event_id, user_id, event_type, round(value, 6) AS value
FROM (SELECT * FROM events
      UNION ALL SELECT * FROM events WHERE event_id % 10 = 0)
"""


# --------------------------------- e20 stream-STATIC broadcast join ------

def e20_streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-STATIC join face — the remaining core Structured
    Streaming join shape after e18/e19's stream-stream pair: a
    readStream of events enriched against a static dimension table
    (customer) and aggregated per day × market segment.  Unlike
    stream-stream, a static side needs NO watermark and buffers NO
    state — Spark re-plans it per micro-batch as an ordinary broadcast
    hash join, which is exactly the 100 TB topology for enriching an
    event firehose with a small dimension: the dim broadcasts to every
    executor once per batch and the stream side never shuffles for the
    join.  The broadcast decision is left SIZE-BASED (no hint):
    per-micro-batch planning reads the static side's real statistics,
    so a dim that outgrows executor memory degrades to a shuffled join
    instead of OOMing — customer SCALES with SF, unlike the fixed
    nation/region dims the relational family hints; the batch/stream
    agreement test still witnesses BroadcastHashJoin at test scale.
    Gated end-to-end: 4 ts-ranged micro-batches through the join +
    complete-mode windowed aggregation into the memory sink,
    hash-compared to the batch join oracle."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    d = tempfile.mkdtemp(prefix="e20_events_")
    try:
        _write_ts_slices(ev, d)
        stream = windows.streaming_source(spark, d, watermark="1 hour")
        joined = stream.join(cust, stream.user_id == cust.c_custkey)
        agg = (
            joined.groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "c_mktsegment",
                "n_events",
                "sum_value",
            )
        )
        name = f"e20_sink_{uuid.uuid4().hex[:8]}"
        with windows.state_partitions(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name)


E20_SQL = """
SELECT date_trunc('day', ts) AS window_start,
       c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


# ----------------------- e23 calendar gap-fill + LOCF (hypertable op) ---

def e23_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable gap-fill: each user's daily mean value re-gridded
    onto a dense calendar (every day between that user's first and last
    event) with gaps filled by last-observation-carried-forward — the
    time-series normalization every downstream join/window assumes
    ("one row per entity per bucket").  Two pieces, both
    shuffle-minimal: the calendar is a per-user ``sequence`` explode
    (the m03 metadata-explode pattern — the blow-up is bounded by the
    span, never |events|), and LOCF is one ``last(ignorenulls)``
    running window per user — no self-join against prior days, which
    is the O(gap²) trap.  The daily mean is rounded BEFORE the fill,
    so carried values are bit-identical on both engines and the only
    float op the fill copies is already pinned."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("v", ignorenulls=True).over(w).alias("filled_value"),
            F.col("v").isNull().alias("was_gap"),
        )
    )


E23_SQL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, round(avg(value), 6) AS v
  FROM events GROUP BY 1, 2),
cal AS (
  SELECT user_id,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily GROUP BY user_id)
SELECT c.user_id, c.day,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY c.user_id ORDER BY c.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       d.v IS NULL AS was_gap
FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
"""


# --------------------- e22 foreachBatch idempotent sink (exactly-once) --

def e22_streaming_idempotent_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SINK side of exactly-once streaming: ``foreachBatch`` writing
    per-day partial aggregates with the canonical idempotence recipe —
    each micro-batch OVERWRITES its own ``batch_id=N`` directory, so the
    write is a pure function of (batch data, batch id) and re-delivery
    is a no-op.  At 100 TB this is what makes micro-batch retries and
    job restarts safe against non-transactional stores: Spark re-runs a
    failed batch with the SAME id, and an append-mode sink would
    double-count while the overwrite converges.

    The gate PROVES the idempotence, not just asserts it: the same
    4-slice source is streamed TWICE into the same store (a fresh query
    with no checkpoint replays every batch with the same ids in the
    same mtime order — the simulated at-least-once re-delivery).  The
    second run rewrites each directory with identical content; with an
    append sink every count would double and the hash against the
    single-pass batch oracle would fail.  Final read merges the
    batch partials (disjoint ts slices) into day totals."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="e22_events_")
    store = tempfile.mkdtemp(prefix="e22_store_")
    try:
        _write_ts_slices(ev, d)

        def upsert(bdf: DataFrame, bid: int) -> None:
            (
                bdf.groupBy(
                    F.date_trunc("day", F.col("ts")).alias("window_start"),
                    "event_type",
                )
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum("value").alias("sum_value"),
                )
                .write.mode("overwrite")
                .parquet(f"{store}/batch_id={bid}")
            )

        for _ in range(2):  # second pass = simulated duplicate delivery
            stream = windows.streaming_source(spark, d, watermark=None)
            q = stream.writeStream.foreachBatch(upsert).start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        # materialize BEFORE the finally rmtree (the s07 pattern): the
        # returned frame must not lazily re-scan a deleted directory
        return (
            spark.read.parquet(store)
            .groupBy("window_start", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.round(F.sum("sum_value"), 6).alias("sum_value"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)


E22_SQL = """
SELECT date_trunc('day', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


# ------------------------- e21 incremental aggregate maintenance --------

def e21_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a daily per-type
    aggregate kept current by MERGING a delta partition's partial
    aggregate into the materialized state — never recomputing the
    base.  At 100 TB this is the difference between O(delta) and
    O(corpus) per refresh: the base aggregate is a few thousand rows
    regardless of corpus size, so the refresh cost is the delta scan
    plus a merge keyed on the (much smaller) aggregate key space.

    The algebra is Spark's own partial-aggregation contract surfaced
    as an operator: (count, sum) are mergeable (full-outer on the
    group keys + coalesced addition), while avg is NOT — it is derived
    from the merged (sum, count) AFTER the merge, the standard
    algebraic-aggregate decomposition.  The cutoff is the median ts
    (one tiny percentile job, a literal like pagerank's count); base
    and delta are disjoint ts ranges, exactly the shape of a
    date-partitioned table receiving a late partition.  The gate
    compares the MERGED state to a from-scratch aggregate over the
    union (the DuckDB oracle) — any drift between the incremental and
    the recompute path fails the hash."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        F.percentile_approx("ts", 0.5, 10_000).alias("m")
    ).first()["m"]

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", F.col("ts")).alias("window_start"), "event_type"
        ).agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))

    base = partial(ev.filter(F.col("ts") < F.lit(cutoff)))
    delta = partial(ev.filter(F.col("ts") >= F.lit(cutoff)))
    merged = (
        base.alias("b")
        .join(delta.alias("d"), ["window_start", "event_type"], "full_outer")
        .select(
            "window_start",
            "event_type",
            (
                F.coalesce(F.col("b.n_events"), F.lit(0))
                + F.coalesce(F.col("d.n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("b.sum_value"), F.lit(0.0))
                + F.coalesce(F.col("d.sum_value"), F.lit(0.0))
            ).alias("sum_value"),
        )
    )
    return merged.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )


E21_SQL = """
SELECT date_trunc('day', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events GROUP BY 1, 2
"""


# ------------------------------ e25 VARIANT semi-structured props -------

def e25_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e04's JSON-props analysis re-expressed on the VARIANT type —
    parse ONCE into the binary semi-structured encoding, then every
    field access is a cheap typed path step instead of a re-parse
    (``get_json_object`` re-tokenizes the string per extraction; at
    100 TB with several extractions per row that multiplies scan CPU
    by the extraction count, which is the entire reason the open
    formats grew a variant encoding).

    The aggregate ships a schema-drift audit alongside the numbers:
    min/max of ``schema_of_variant`` over the feed — the oracle pins
    the expected uniform shape as a literal, so a producer silently
    adding or retyping a field fails the gate rather than a downstream
    extraction going NULL."""
    ev = _events(spark, sf_dir)
    v = ev.select(F.parse_json("props").alias("v"), "value")
    typed = v.select(
        F.variant_get("v", "$.k", "int").alias("k"),
        F.schema_of_variant(F.col("v")).alias("sch"),
        "value",
    )
    return typed.groupBy((F.col("k") % 10).alias("k_bucket")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("sch").alias("schema_lo"),
        F.max("sch").alias("schema_hi"),
    )


E25_SQL = """
WITH ex AS (SELECT CAST(props->>'$.k' AS INT) AS k, value FROM events)
SELECT k % 10 AS k_bucket, count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       'OBJECT<k: BIGINT>' AS schema_lo, 'OBJECT<k: BIGINT>' AS schema_hi
FROM ex GROUP BY 1
"""


# --------------------------- e24 streaming observed metrics (REAL run) --

E24_SLICES = 4


def e24_streaming_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming half of d41's one-pass audit: ``observe`` metrics
    on a REAL readStream run, collected per micro-batch from the
    query's progress events — how a 24/7 ingest pipeline watches its
    own feed (row counts, out-of-range counters, value envelopes)
    without a second subscription to the source.

    The events table replays as 4 ts-ranged slices (one micro-batch
    each); every batch's ``observedMetrics`` row is summed/folded on
    the driver (counts add, min/max fold exactly — no float sums, so
    the result is order-independent), and ``n_batches`` counts the
    non-empty batches, pinning that delivery really was incremental
    (a single-batch run would report 1).  The closed-form oracle
    recomputes the totals from the table; the 4 is the construction's
    slice count."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="e24_events_")
    try:
        _write_ts_slices(ev, d, E24_SLICES)
        stream = windows.streaming_source(spark, d, watermark=None)
        observed = stream.observe(
            "audit",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("value") < 1.0).cast("long")).alias("n_sub_unit"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        q = observed.writeStream.format("noop").start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = [
            p["observedMetrics"]["audit"]
            for p in q.recentProgress
            if p.get("observedMetrics", {}).get("audit") is not None
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    nonempty = [m for m in rows if m["n_rows"] > 0]
    # an all-empty replay degrades to a zero row with NULL envelopes,
    # matching what d41's batch observe reports on an empty input
    # (min()/max() over an empty list would raise instead)
    fold = (
        (
            len(nonempty),
            sum(m["n_rows"] for m in nonempty),
            sum(m["n_sub_unit"] for m in nonempty),
            min(m["min_value"] for m in nonempty),
            max(m["max_value"] for m in nonempty),
        )
        if nonempty
        else (0, 0, 0, None, None)
    )
    return spark.createDataFrame(
        [fold],
        "n_batches long, n_rows long, n_sub_unit long, min_value double, max_value double",
    )


E24_SQL = f"""
SELECT {E24_SLICES}::BIGINT AS n_batches,
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN value < 1.0 THEN 1 ELSE 0 END)::BIGINT AS n_sub_unit,
       min(value) AS min_value, max(value) AS max_value
FROM events
"""


SPECS = [
    QuerySpec("e24_streaming_observed_metrics", e24_streaming_observed_metrics,
              E24_SQL, "events",
              "REAL streaming observe run: per-micro-batch audit metrics from "
              "progress events, folded exactly; n_batches pins incremental "
              "delivery (8th driver-gated streaming face)"),
    QuerySpec("e25_props_variant_stats", e25_props_variant_stats, E25_SQL,
              "events",
              "VARIANT semi-structured props: parse once, typed path access, "
              "schema_of_variant drift audit pinned to the expected shape"),
    QuerySpec("e23_gap_fill_locf", e23_gap_fill_locf, E23_SQL, "events",
              "hypertable gap-fill: per-user dense calendar via sequence "
              "explode + last-observation-carried-forward running window "
              "(no O(gap^2) self-join)"),
    QuerySpec("e22_streaming_idempotent_sink", e22_streaming_idempotent_sink,
              E22_SQL, "events", "foreachBatch exactly-once sink: per-batch-id "
              "directory overwrite proven idempotent by streaming the same "
              "source twice into one store, gated vs the single-pass oracle"),
    QuerySpec("e21_incremental_agg_maintenance", e21_incremental_agg_maintenance,
              E21_SQL, "events", "incremental materialized-view maintenance: "
              "delta partial-agg merged into the base state (O(delta) refresh), "
              "avg derived post-merge, gated vs the from-scratch oracle"),
    QuerySpec("e20_streaming_static_join", e20_streaming_static_join, E20_SQL,
              "events", "REAL stream-static broadcast join: readStream events "
              "enriched vs the static customer dim (stateless per-batch "
              "broadcast hash join), windowed agg gated vs the batch oracle"),
    QuerySpec("e19_streaming_left_outer_join", e19_streaming_left_outer_join, E19_SQL,
              "events", "REAL LEFT OUTER stream-stream interval join: outer-null "
              "rows finalized by the dual watermark (sentinel-flushed on both "
              "sources), gated vs the batch LEFT JOIN oracle"),
    QuerySpec("e18_streaming_interval_join", e18_streaming_interval_join, E08_SQL,
              "events", "REAL readStream-to-readStream interval join with dual "
              "watermarks (stream-stream join state cleanup), gated vs the "
              "batch E08 oracle"),
    QuerySpec("e17_streaming_dedup", e17_streaming_dedup, E17_SQL, "events",
              "REAL streaming dropDuplicatesWithinWatermark run over a "
              "duplicate-injected corpus, gated vs the batch distinct oracle"),
    QuerySpec("e01_tumbling_daily", e01_tumbling_daily, E01_SQL, "events",
              "tumbling 1-day window stats per event_type", bench=True),
    QuerySpec("e02_sliding_hourly", e02_sliding_hourly, E02_SQL, "events",
              "sliding 1h/30m overlapping window stats"),
    QuerySpec("e03_user_sessions", e03_user_sessions, E03_SQL, "events",
              "session windows (30-min gap) per user"),
    QuerySpec("e04_props_stats", e04_props_stats, E04_SQL, "events",
              "JSON props extraction (get_json_object, JVM-side)"),
    QuerySpec("e05_top_users_per_day", e05_top_users_per_day, E05_SQL, "events",
              "windowed agg + rank: top-3 users per day"),
    QuerySpec("e06_running_totals", e06_running_totals, E06_SQL, "events",
              "per-user totals (stateful operator batch face)"),
    QuerySpec("e07_cumulative_by_event", e07_cumulative_by_event, E07_SQL, "events",
              "per-user cumulative totals (window spec)"),
    QuerySpec("e08_click_purchase_interval_join", e08_click_purchase_interval_join, E08_SQL,
              "events", "event-time interval join (stream-stream join shape)"),
    QuerySpec("e09_value_deltas", e09_value_deltas, E09_SQL, "events",
              "lead/lag window analytics per user"),
    QuerySpec("e10_asof_click_attribution", e10_asof_click_attribution, E10_SQL, "events",
              "as-of join (union + single shuffle + window fill, no inequality join)"),
    QuerySpec("e11_streaming_tumbling_daily", e11_streaming_tumbling_daily, E01_SQL,
              "events", "REAL readStream micro-batch run of the e01 plan (W2/S4 "
              "streaming face, batch-oracle-gated)"),
    QuerySpec("e12_conversion_funnel", e12_conversion_funnel, E12_SQL, "events",
              "strict-order view→click→purchase funnel (chained conditional min-aggs)"),
    QuerySpec("e13_retention_cohorts", e13_retention_cohorts, E13_SQL, "events",
              "weekly retention cohorts (first-touch week × activity-week offset)"),
    QuerySpec("e14_event_transitions", e14_event_transitions, E14_SQL, "events",
              "Markov next-event transition counts + conditional probabilities"),
    QuerySpec("e15_streaming_user_sessions", e15_streaming_user_sessions, E03_SQL,
              "events", "REAL readStream append-mode session windows (watermark-"
              "finalized, sentinel-flushed), batch-oracle-gated",
              bench=True),  # end-to-end streaming run: micro-batch + state-store cost
    QuerySpec("e16_streaming_running_totals", e16_streaming_running_totals, E06_SQL,
              "events", "REAL applyInPandasWithState run: GroupState running "
              "totals across micro-batches, final state batch-oracle-gated"),
    QuerySpec("e28_interval_overlap_join", e28_interval_overlap_join, E28_SQL,
              "events", "binned batch range join: global click×purchase window "
              "overlaps with no equi-key, bin equi-join replaces the nested loop"),
]
