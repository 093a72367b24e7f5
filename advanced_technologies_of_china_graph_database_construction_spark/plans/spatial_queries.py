"""Spatial workload: radius join via grid-cell blocking.

The one join shape none of the other families cover: "all pairs of
points within R km".  At 100 TB the naive form is a cross join; the
scale pattern is the same banding philosophy as MinHash/LSH applied to
geometry — bucket points into grid cells of side ≥ R, explode each
point into its 3×3 cell neighborhood on ONE side only, equi-join on the
cell key, then verify the exact distance.  Every true pair lands in
exactly one (cell, neighbor-cell) combination (the right side keeps its
single home cell), so no dedup pass is needed, and the shuffle carries
(cell, id, lat, lon) — never a quadratic candidate set.

Coordinates are derived from ``c_custkey`` by pure integer arithmetic
(multiplicative hash mod 10^5 → a 2°×2° box) with an EXPLICIT
``CAST(… AS DOUBLE)`` before the first division, so both engines
compute bit-identical IEEE doubles; the distance is the planar
equirectangular approximation with FIXED km-per-degree constants (pure
*,+,- in IEEE double — deterministic cross-engine, unlike libm trig;
adequate at city-scale radii, which is what a 10 km join is).  The
cast is load-bearing (r12 sf0.1 replica finding): without it Spark
parses ``100000.0`` as a DECIMAL literal and evaluates the whole
coordinate in exact decimal arithmetic while DuckDB evaluates binary
doubles — identical after round(…, 6) on every sf0.01 pair, but one
sf0.1 pair (5509, 10000) landed a half-ulp apart across the rounding
boundary (6.218963 vs 6.218964) and failed the value hash.  The oracle
is the brute-force O(n²) self-join over the same points — at the gate
sf that is ~2.25 M candidate pairs for DuckDB, trivially exact — so a
grid bug that DROPS a boundary-straddling pair fails the hash, not
just a unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .spec import QuerySpec

R_KM = 10.0
CELL_DEG = 0.11  # ≥ R in both axes: 0.11° lat = 12.2 km, 0.11° lon = 10.5 km
LAT_KM = 111.32  # km per degree latitude
LON_KM = 95.4    # km per degree longitude at the box's ~31° reference latitude

# identical expression TEXT on both engines, with the integer residue
# cast to DOUBLE before any fractional arithmetic — evaluation then
# stays in IEEE binary double end to end on BOTH engines (Spark would
# otherwise read the fractional literals as DECIMALs and compute the
# coordinate in exact decimal — see module docstring), so the doubles
# are bit-identical
_LAT = "30.0 + CAST((c_custkey * 2654435761) % 100000 AS DOUBLE) / 100000.0 * 2.0"
_LON = "100.0 + CAST((c_custkey * 40503) % 100000 AS DOUBLE) / 100000.0 * 2.0"
_D2 = (
    f"((lat_a - lat_b) * {LAT_KM}) * ((lat_a - lat_b) * {LAT_KM})"
    f" + ((lon_a - lon_b) * {LON_KM}) * ((lon_a - lon_b) * {LON_KM})"
)


def _grid_candidates(
    pts: DataFrame, r_km: float, cell_deg: float, id_pred
) -> DataFrame:
    """The shared grid-blocking core (module docstring): (id_a, lat_a,
    lon_a, id_b, lat_b, lon_b) pairs that pass ``id_pred`` and the
    exact distance verify.  Every true pair lands exactly once — the
    right side keeps its single home cell.  ONE implementation so the
    cell arithmetic, the 3×3 neighborhood, and the verify expression
    cannot diverge between the radius-join and kNN faces."""
    if cell_deg * LAT_KM < r_km or cell_deg * LON_KM < r_km:
        raise ValueError("cell_deg must cover r_km in both axes")
    cells = pts.selectExpr(
        "id", "lat", "lon",
        f"cast(floor(lat / {cell_deg!r}) as bigint) AS cx",
        f"cast(floor(lon / {cell_deg!r}) as bigint) AS cy",
    )
    neighborhood = cells.selectExpr(
        "id AS id_a", "lat AS lat_a", "lon AS lon_a",
        "explode(array(-1, 0, 1)) AS dx", "cx", "cy",
    ).selectExpr(
        "id_a", "lat_a", "lon_a",
        "cx + dx AS cx", "explode(array(cy - 1, cy, cy + 1)) AS cy",
    )
    right = cells.selectExpr("id AS id_b", "lat AS lat_b", "lon AS lon_b", "cx", "cy")
    return (
        neighborhood.join(right, ["cx", "cy"])
        .filter(id_pred)
        .filter(F.expr(f"{_D2} <= {r_km * r_km!r}"))
    )


def radius_pairs(
    pts: DataFrame, r_km: float = R_KM, cell_deg: float = CELL_DEG
) -> DataFrame:
    """(src, dst, dist_km): all unordered pairs of ``pts`` (id, lat,
    lon) within ``r_km``, grid-blocked (module docstring).  Requires
    ``cell_deg`` ≥ r_km in BOTH axes' degree equivalents, or the 3×3
    neighborhood misses true pairs.

    Scale shape: one narrow projection to (id, lat, lon, cell), a 9×
    explode of the LEFT side's neighborhood keys (constant fan-out —
    not data-dependent), one equi-join shuffle on the cell key, exact
    verify as a pure-JVM filter.  Cell population is bounded by point
    density × cell area, so no single key explodes; the quadratic work
    is confined within cells exactly like SemDeDup confines it within
    centroids."""
    return _grid_candidates(
        pts, r_km, cell_deg, F.col("id_a") < F.col("id_b")
    ).selectExpr(
        "id_a AS src", "id_b AS dst",
        f"round(sqrt({_D2}), 6) AS dist_km",
    )


def knn_within_radius(
    pts: DataFrame, k: int = 5, r_km: float = R_KM, cell_deg: float = CELL_DEG
) -> DataFrame:
    """(id, neighbor_id, dist_km, rank): each point's k nearest
    neighbors WITHIN ``r_km`` — the bounded-kNN join (geo feature
    engineering: nearest-stores, nearest-stations), directed so every
    point gets its own list.  Same grid blocking as
    :func:`radius_pairs` (every true candidate lands exactly once: the
    right side keeps its single home cell), then ONE per-point window
    over the radius-bounded candidates — never a global sort, never a
    cross join.  Points with fewer than k in-radius neighbors return
    fewer rows (the radius bound is the contract that makes kNN
    grid-expressible at all: an unbounded kNN can need neighbors from
    arbitrarily far cells).  Ordering is on the ROUNDED distance
    (ties → neighbor id), the engine-portable total order."""
    cand = _grid_candidates(
        pts, r_km, cell_deg, F.col("id_a") != F.col("id_b")
    ).selectExpr(
        "id_a AS id", "id_b AS neighbor_id",
        f"round(sqrt({_D2}), 6) AS dist_km",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.asc("dist_km"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def x01_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within R_KM over the hash-derived coordinate
    box (module docstring), through :func:`radius_pairs`."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.selectExpr("c_custkey AS id", f"{_LAT} AS lat", f"{_LON} AS lon")
    return radius_pairs(pts)


X01_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon FROM customer)
SELECT a.id AS src, b.id AS dst,
       round(sqrt({_D2.replace('lat_a', 'a.lat').replace('lat_b', 'b.lat')
                      .replace('lon_a', 'a.lon').replace('lon_b', 'b.lon')}), 6) AS dist_km
FROM pts a JOIN pts b ON a.id < b.id
WHERE {_D2.replace('lat_a', 'a.lat').replace('lat_b', 'b.lat')
          .replace('lon_a', 'a.lon').replace('lon_b', 'b.lon')} <= {R_KM * R_KM}
"""


X02_K = 5


def x02_spatial_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer point's 5 nearest neighbors within 10 km via
    :func:`knn_within_radius` — the bounded-kNN complement of x01's
    radius join, gated vs the brute-force ranked oracle."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.selectExpr("c_custkey AS id", f"{_LAT} AS lat", f"{_LON} AS lon")
    return knn_within_radius(pts, k=X02_K)


_D2_AB = (
    _D2.replace("lat_a", "a.lat").replace("lat_b", "b.lat")
    .replace("lon_a", "a.lon").replace("lon_b", "b.lon")
)

X02_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS id, {_LAT} AS lat, {_LON} AS lon FROM customer),
cand AS (
  SELECT a.id AS id, b.id AS neighbor_id,
         round(sqrt({_D2_AB}), 6) AS dist_km
  FROM pts a JOIN pts b ON a.id <> b.id
  WHERE {_D2_AB} <= {R_KM * R_KM})
SELECT id, neighbor_id, dist_km, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY id
                               ORDER BY dist_km, neighbor_id) AS rank
  FROM cand) WHERE rank <= {X02_K}
"""


SPECS = [
    QuerySpec(
        "x01_spatial_radius_join",
        x01_spatial_radius_join,
        X01_SQL,
        "spatial",
        "all point pairs within 10 km via grid-cell blocking (3×3 "
        "neighborhood explode + cell equi-join + exact verify) vs the "
        "brute-force oracle — LSH banding applied to geometry",
    ),
    # Registered r11 (staged through r10 while the 50-slot gate was
    # exactly consumed by the r6 re-gate cohort + nine new specs).
    QuerySpec(
        "x02_spatial_knn_join",
        x02_spatial_knn_join,
        X02_SQL,
        "spatial",
        "bounded kNN join: each point's 5 nearest within 10 km via the "
        "x01 grid, per-point window top-k vs the brute-force ranked oracle",
    ),
]

