"""Unit tests for the as-of join operator (operators/asof.py):
backward-inclusive match, tie-breaking, left-outer nulls, tolerance,
and the single-shuffle physical plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _build(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),   # after two quotes
            (2, "k1", _ts("2024-01-01 09:00:00")),   # exactly at a quote (inclusive)
            (3, "k1", _ts("2024-01-01 08:00:00")),   # before every quote -> null
            (4, "k2", _ts("2024-01-01 10:00:00")),   # other key
            (5, "k3", _ts("2024-01-01 10:00:00")),   # key with no right rows
        ],
        "trade_id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", 100, _ts("2024-01-01 09:00:00"), 1.0),
            ("k1", 101, _ts("2024-01-01 09:30:00"), 2.0),
            ("k1", 102, _ts("2024-01-01 11:00:00"), 3.0),  # in the future of every trade
            ("k2", 200, _ts("2024-01-01 09:59:00"), 4.0),
            ("k2", 201, _ts("2024-01-01 09:59:00"), 5.0),  # same ts: max quote_id wins
        ],
        "key string, quote_id long, quote_ts timestamp, price double",
    )
    return left, right


def _join(left, right, **kw):
    out = asof_join(
        left,
        right,
        on=["key"],
        left_ts="ts",
        right_ts="quote_ts",
        right_cols=["quote_id", "price"],
        tiebreak="quote_id",
        **kw,
    )
    return {r["trade_id"]: (r["quote_id"], r["price"]) for r in out.collect()}


def test_backward_inclusive_and_ties(spark):
    left, right = _build(spark)
    got = _join(left, right)
    assert got[1] == (101, 2.0)      # latest quote <= 10:00 is 09:30
    assert got[2] == (100, 1.0)      # equal timestamp matches (inclusive)
    assert got[3] == (None, None)    # nothing at or before 08:00
    assert got[4] == (201, 5.0)      # tie on ts -> max quote_id
    assert got[5] == (None, None)    # key never quoted (left outer)


def test_tolerance_rejects_stale_matches(spark):
    left, right = _build(spark)
    got = _join(left, right, tolerance="45 minutes")
    assert got[1] == (101, 2.0)      # 30 min old: within tolerance
    assert got[2] == (100, 1.0)      # 0 min old
    assert got[4] == (201, 5.0)      # 1 min old
    # trade 2's quote is 0 old; shrink tolerance below trade 1's 30-min gap
    got = _join(left, right, tolerance="15 minutes")
    assert got[1] == (None, None)
    assert got[2] == (100, 1.0)


def test_single_shuffle_plan(spark):
    left, right = _build(spark)
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="quote_ts",
        right_cols=["quote_id", "price"], tiebreak="quote_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window (plus AQE reuse), no join node at all
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_default_tiebreak_is_deterministic_on_exact_ts_ties(spark):
    """r12 review fix: with tiebreak=None two right rows sharing
    (key, ts) used to tie completely in the window order (constant
    _TB), so the surviving payload was partitioning-dependent.  The
    payload struct is now the tiebreak — largest field-wise wins,
    identically on every run and partitioning."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 5.0), (1, 100, 7.0)], "k long, rts long, price double"
    )
    for parts in (1, 7):
        out = asof_join(
            left.repartition(parts),
            right.repartition(parts),
            on=["k"],
            left_ts="ts",
            right_ts="rts",
            right_cols=["price"],
        ).collect()
        assert len(out) == 1 and out[0]["price"] == 7.0, out
