"""Binned interval-overlap join vs a python brute force — adversarial
shapes the e28 fixture can't guarantee: bin-edge-touching endpoints,
intervals spanning many bins, duplicate coordinates."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from advanced_technologies_of_china_graph_database_construction_spark.operators.intervals import (
    interval_overlap_join,
)

B = 100  # bin width for every synthetic case


def _brute(left, right):
    out = {}
    for lid, ls, le in left:
        for rid, rs, re in right:
            if ls < re and rs < le and ls < le and rs < re:
                out[(lid, rid)] = min(le, re) - max(ls, rs)
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, start long, end long")


def _run(spark, left, right, bin_width=B):
    got = interval_overlap_join(
        _df(spark, left), _df(spark, right), bin_width=bin_width
    ).collect()
    return {(r["id_l"], r["id_r"]): r["overlap"] for r in got}


def test_known_overlaps(spark):
    left = [(1, 0, 50), (2, 90, 210), (3, 400, 401)]
    right = [(10, 40, 60), (11, 200, 300), (12, 401, 500)]
    got = _run(spark, left, right)
    # 1×10 overlap 10; 2×11 overlap 10 (meets across the bin edge at
    # 200); 3×12 touch at 401 → half-open, NOT a pair
    assert got == {(1, 10): 10, (2, 11): 10}


def test_touching_endpoints_do_not_pair(spark):
    # end == start, including exactly on a bin edge
    assert _run(spark, [(1, 0, 100)], [(2, 100, 200)]) == {}
    assert _run(spark, [(1, 50, 150)], [(2, 150, 250)]) == {}


def test_long_interval_counted_once(spark):
    # left spans 12 bins and shares many of them with right; the
    # first-shared-bin rule must emit the pair exactly once
    got = _run(spark, [(1, 0, 1200)], [(2, 350, 900)])
    assert got == {(1, 2): 550}


def test_identical_intervals(spark):
    got = _run(spark, [(1, 10, 90)], [(2, 10, 90)])
    assert got == {(1, 2): 80}


def test_degenerate_and_validation(spark):
    # zero-length intervals never pair (filtered before the explode)
    assert _run(spark, [(1, 5, 5)], [(2, 0, 10)]) == {}
    with pytest.raises(ValueError):
        interval_overlap_join(
            _df(spark, []), _df(spark, []), bin_width=0
        )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2000), st.integers(1, 450)
        ),  # (start, length) — lengths beyond B to force multi-bin spans
        min_size=0,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 2000), st.integers(1, 450)),
        min_size=0,
        max_size=25,
    ),
)
def test_matches_brute_force(spark, lraw, rraw):
    left = [(i, s, s + n) for i, (s, n) in enumerate(lraw)]
    right = [(1000 + i, s, s + n) for i, (s, n) in enumerate(rraw)]
    assert _run(spark, left, right) == _brute(left, right)


def test_plan_has_no_nested_loop(spark):
    """The whole point: candidates meet through a bin equi-join, never
    a BroadcastNestedLoopJoin or CartesianProduct."""
    from .conftest import SF_CORRECT
    from advanced_technologies_of_china_graph_database_construction_spark.plans.events_queries import (
        e28_interval_overlap_join,
    )

    plan = e28_interval_overlap_join(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_extreme_int64_coordinates_bin_exactly(spark):
    """r12 regression (found in review): a double division on the bin
    arithmetic misrounds once |coordinate| >= 2^53 and silently re-bins
    intervals; the integer `div` form must pair these correctly."""
    base = 2_600_000_000_000_000_123  # >> 2^53
    left = [(1, base, base + 100), (2, -base, -base + 100)]
    right = [(10, base + 50, base + 150), (20, -base + 50, -base + 150)]
    got = _run(spark, left, right, bin_width=7)
    assert got == {(1, 10): 50, (2, 20): 50}
