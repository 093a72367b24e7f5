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


def test_asof_join_matches_pandas_merge_asof_on_random_data(spark):
    """r13 hardening: the backward as-of join vs pandas merge_asof on
    random keyed series — with and without tolerance.  Right-side
    (key, ts) pairs are unique so both engines' tie rules are moot and
    the comparison is pure as-of semantics (ties have their own pins
    above)."""
    import numpy as np
    import pandas as pd

    from advanced_technologies_of_china_graph_database_construction_spark.operators.asof import (
        asof_join,
    )

    base = pd.Timestamp("2026-01-01")
    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        keys = ["a", "b", "c"]
        right_rows = []
        for k in keys:
            for t in rng.choice(10_000, size=25, replace=False):
                right_rows.append(
                    (
                        k,
                        (base + pd.Timedelta(seconds=int(t))).to_pydatetime(),
                        float(round(rng.rand(), 6)),
                    )
                )
        left_rows = [
            (
                int(i),
                keys[rng.randint(len(keys))],
                (base + pd.Timedelta(seconds=int(rng.randint(-100, 10_500)))).to_pydatetime(),
            )
            for i in range(120)
        ]
        rdf = spark.createDataFrame(right_rows, "k string, rts timestamp, val double")
        ldf = spark.createDataFrame(left_rows, "rid long, k string, lts timestamp")

        rpd = pd.DataFrame(right_rows, columns=["k", "rts", "val"]).sort_values("rts")
        lpd = pd.DataFrame(left_rows, columns=["rid", "k", "lts"]).sort_values("lts")

        for tol_spark, tol_pd in ((None, None), ("60 seconds", pd.Timedelta("60s"))):
            got = {
                r["rid"]: r["val"]
                for r in asof_join(
                    ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
                    right_cols=["val"], tolerance=tol_spark,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd, rpd, left_on="lts", right_on="rts", by="k",
                direction="backward", allow_exact_matches=True,
                **({"tolerance": tol_pd} if tol_pd is not None else {}),
            )
            exp = {
                int(r.rid): (None if pd.isna(r.val) else float(r.val))
                for r in exp_df.itertuples(index=False)
            }
            assert got == exp, (seed, tol_spark)
