"""Grid-blocked radius join vs a python brute force on adversarial
geometry — points straddling cell boundaries and pairs at exactly the
radius (the gate's fixture can't guarantee either case exists)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from advanced_technologies_of_china_graph_database_construction_spark.plans.spatial_queries import (
    CELL_DEG,
    LAT_KM,
    LON_KM,
    R_KM,
    radius_pairs,
    x01_spatial_radius_join,
)


def _brute(pts):
    out = set()
    for i, (ida, la, lo) in enumerate(pts):
        for idb, lb, lob in pts[i + 1 :]:
            d2 = ((la - lb) * LAT_KM) ** 2 + ((lo - lob) * LON_KM) ** 2
            if d2 <= R_KM * R_KM:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_radius_pairs_matches_brute_force_on_boundary_points(spark):
    # points placed on and around cell borders: exact multiples of
    # CELL_DEG, epsilon either side (cross-cell true pairs the 3x3
    # neighborhood must recover), and a pair at exactly R_KM
    eps = 1e-9
    base_lat, base_lon = 30.0, 100.0
    pts = [
        (1, base_lat, base_lon),
        (2, base_lat + CELL_DEG, base_lon),              # adjacent cell, 12.2 km (out)
        (3, base_lat + CELL_DEG - eps, base_lon),        # just inside the next cell's border
        (4, base_lat + R_KM / LAT_KM, base_lon),         # exactly R away (<= keeps it)
        (5, base_lat - eps, base_lon - eps),             # diagonal lower neighbor
        (6, base_lat + 5 * CELL_DEG, base_lon + 5 * CELL_DEG),  # far away (no pair)
        (7, base_lat + R_KM / LAT_KM + 1e-4, base_lon),  # just past R (out)
        # straddling pairs the grid must recover across cell borders:
        # lat boundary at 273*CELL_DEG=30.03, lon boundary at 910*CELL_DEG=100.1
        (8, 30.03 - 0.001, base_lon),                    # 0.22 km apart, adjacent
        (9, 30.03 + 0.001, base_lon),                    #   lat cells
        (10, 30.03 - 0.001, 100.1 - 0.001),              # diagonal-cell true pair
        (11, 30.03 + 0.001, 100.1 + 0.001),
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r.src, r.dst) for r in radius_pairs(df).collect()}
    want = _brute(pts)
    assert got == want
    # NOTE: point 4 sits at R_KM/LAT_KM degrees, which multiplied back
    # is a hair ABOVE R_KM in IEEE double — both sides must agree on
    # that exclusion too (covered by got == want); don't assert it in.
    assert len(want) >= 3  # non-vacuous
    import math

    cells = {
        pid: (math.floor(la / CELL_DEG), math.floor(lo / CELL_DEG))
        for pid, la, lo in pts
    }
    # the case the grid could get wrong: at least one true pair must
    # cross a cell boundary, or this test proves nothing about blocking
    assert any(cells[a] != cells[b] for a, b in want), (want, cells)
    assert all(6 not in p for p in want)  # the far point pairs with nobody


def test_radius_pairs_rejects_undersized_cells(spark):
    df = spark.createDataFrame([(1, 30.0, 100.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError):
        radius_pairs(df, r_km=50.0, cell_deg=0.11)


def test_x01_plan_has_no_cartesian(spark):
    plan = (
        x01_spatial_radius_join(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


# random point clouds dense enough that pairs exist and sparse enough
# that brute force stays tiny; coordinates quantized to 1e-4° so no
# pair sits within float-noise of the radius boundary (0.0001° ≈ 11 m)
_POINT = st.tuples(
    st.integers(0, 10_000),  # lat offset in 1e-4 degrees (0..1°)
    st.integers(0, 10_000),  # lon offset
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_POINT, min_size=2, max_size=40, unique=True))
def test_radius_pairs_matches_brute_force_on_random_clouds(spark, offsets):
    pts = [
        (i, 30.0 + dlat / 10_000.0, 100.0 + dlon / 10_000.0)
        for i, (dlat, dlon) in enumerate(offsets)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r.src, r.dst) for r in radius_pairs(df).collect()}
    assert got == _brute(pts)


# ------------------------------- bounded kNN (x02, staged) ---------------


def _brute_knn(pts, k):
    import math

    out = []
    for ida, la, lo in pts:
        cand = []
        for idb, lb, lob in pts:
            if idb == ida:
                continue
            d2 = ((la - lb) * LAT_KM) ** 2 + ((lo - lob) * LON_KM) ** 2
            if d2 <= R_KM * R_KM:
                cand.append((round(math.sqrt(d2), 6), idb))
        cand.sort()
        out.extend(
            (ida, idb, d, r + 1) for r, (d, idb) in enumerate(cand[:k])
        )
    return sorted(out)


def test_knn_within_radius_matches_brute_force(spark):
    """A cluster straddling cell boundaries plus a far-away point: the
    grid must find every in-radius neighbor rank-for-rank, and the
    isolated point contributes no rows at all."""
    from advanced_technologies_of_china_graph_database_construction_spark.plans.spatial_queries import (
        knn_within_radius,
    )

    base_lat, base_lon = 30.0, 100.0
    pts = [
        (1, base_lat, base_lon),
        (2, base_lat + 0.02, base_lon),          # ~2.2 km north
        (3, base_lat, base_lon + 0.05),          # ~4.8 km east
        (4, base_lat + 0.109, base_lon),         # ~12.1 km: outside R of 1
        (5, base_lat + 0.13, base_lon + 0.01),   # near 4
        (9, base_lat + 1.5, base_lon + 1.5),     # isolated
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = sorted(
        (r["id"], r["neighbor_id"], r["dist_km"], r["rank"])
        for r in knn_within_radius(df, k=3).collect()
    )
    assert got == _brute_knn(pts, 3)
    assert all(i != 9 for i, *_ in got)


def test_knn_within_radius_caps_at_k(spark):
    """Seven co-clustered points at k=2: every point returns exactly 2
    neighbors, ranked 1..2 by rounded distance then id."""
    from advanced_technologies_of_china_graph_database_construction_spark.plans.spatial_queries import (
        knn_within_radius,
    )

    pts = [(i, 30.0 + i * 0.001, 100.0) for i in range(7)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    rows = knn_within_radius(df, k=2).collect()
    per = {}
    for r in rows:
        per.setdefault(r["id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2] for v in per.values()), per
    got_all = sorted(
        (r["id"], r["neighbor_id"], r["dist_km"], r["rank"]) for r in rows
    )
    assert got_all == _brute_knn(pts, 2)


def test_coordinate_exprs_stay_ieee_double(spark):
    """r12 sf0.1 replica finding, pinned: without the explicit CAST TO
    DOUBLE, Spark reads the fractional literals as DECIMALs and
    computes the coordinates in exact decimal arithmetic (DuckDB stays
    in binary double), and the (5509, 10000) pair rounds a half-ulp
    apart (6.218963 vs 6.218964).  Pins: the derived columns ARE
    doubles, and the incident pair's distance is the double-arithmetic
    value."""
    from advanced_technologies_of_china_graph_database_construction_spark.plans.spatial_queries import (
        _LAT,
        _LON,
        radius_pairs,
    )

    df = spark.createDataFrame([(5509,), (10000,)], "c_custkey long")
    pts = df.selectExpr("c_custkey AS id", f"{_LAT} AS lat", f"{_LON} AS lon")
    assert dict(pts.dtypes) == {"id": "bigint", "lat": "double", "lon": "double"}
    [row] = radius_pairs(pts).collect()
    assert (row["src"], row["dst"], row["dist_km"]) == (5509, 10000, 6.218964)
