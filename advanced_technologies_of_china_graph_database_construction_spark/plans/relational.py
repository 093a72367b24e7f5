"""Relational core workload — the generic scan/filter/join/agg/window/
set-op surface of SURVEY.md §2 (P1-P10, J1-J10 equi-join shapes, A1-A5,
L1-L4, U1-U3), expressed as TPC-H-style queries over the driver tables.

Design rules:
- declarative DataFrame plans only; Catalyst handles pushdown/pruning/
  join selection (broadcast for the small dims).
- every double aggregate is rounded to 2 decimals on BOTH engine and
  oracle side so cross-engine float summation order can't flip the hash.
- every LIMIT is paired with a total deterministic ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .spec import QuerySpec


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# --- q01: TPC-H Q1-style pricing summary (wide agg, map-side partials) ---
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    # disc_price / charge sums use exact decimals: at sf0.01 their true
    # group totals land within 0.0006 of a half-cent rounding boundary,
    # inside double-summation noise for 60k-row groups, so the rounded
    # cent would otherwise depend on partial-agg merge order (flaky vs
    # the oracle).  2-decimal-exact columns (qty, base price) stay
    # double: their sums are exact at the rounding precision.
    ext_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = ext_d * (1 - F.col("l_discount").cast("decimal(18,2)"))
    charge = disc_price * (1 + F.col("l_tax").cast("decimal(18,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- q02: TPC-H Q3-style top unshipped orders (3-way join, top-k) ---
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue is pre-aggregated to one row per order before any join
    (o_orderkey is the orders key, so grouping the joined rows by it is
    equivalent), and the segment filter is applied as a semi-join on
    orders rather than dragging customer columns through.  Measured
    1.4s -> 0.8s at sf0.1: the orderkey shuffle moves ~4x fewer, narrow
    rows, and the top-k sort input is per-order not per-lineitem.
    """
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    filt_orders = orders.filter(F.col("o_orderdate") < F.lit("1999-01-01")).join(
        cust.filter(F.col("c_mktsegment") == "MACHINERY"),
        orders.o_custkey == cust.c_custkey,
        "left_semi",
    )
    return (
        per_order.join(filt_orders, per_order.l_orderkey == filt_orders.o_orderkey)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            F.round("rev", 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q02_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'MACHINERY' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- q03: TPC-H Q5-style regional volume (5-way join through dims) ---
def q03_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nat, reg = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q03_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --- q04: TPC-H Q4-style priority count with EXISTS (left-semi join) ---
def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q04_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --- q05: simple dim aggregate ---
def q05_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.count("*").alias("n_customers"),
    )


Q05_SQL = """
SELECT c_mktsegment, round(avg(c_acctbal), 2) AS avg_bal,
       round(sum(c_acctbal), 2) AS sum_bal, count(*) AS n_customers
FROM customer GROUP BY c_mktsegment
"""


# --- q06: brand stats (count / distinct / min / max) ---
def q06_brand_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_name").alias("n_names"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.max("p_size").alias("max_size"),
        F.min("p_size").alias("min_size"),
    )


Q06_SQL = """
SELECT p_brand, count(*) AS n_parts, count(DISTINCT p_name) AS n_names,
       round(avg(p_retailprice), 2) AS avg_price,
       max(p_size) AS max_size, min(p_size) AS min_size
FROM part GROUP BY p_brand
"""


# --- q07: top supplier per nation (window / top-k per group) ---
def q07_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, nat = _t(spark, sf_dir, "supplier", "nation")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


Q07_SQL = """
SELECT n_name, s_name, round(s_acctbal, 2) AS acctbal
FROM (
  SELECT *, row_number() OVER (PARTITION BY s_nationkey
                               ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
  FROM supplier) s
JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
"""


# --- q08: monthly revenue time series ---
def q08_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation pushed below the join: lineitem revenue is reduced to
    one row per order BEFORE joining orders, so (a) the join input
    shrinks ~4x and (b) the per-month countDistinct(o_orderkey) becomes
    a plain count(*) — no distinct-expand over the joined fact rows.
    Measured 2.3s -> 1.2s at sf0.1; the gap widens with fact-table size.
    """
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    # Exact decimal arithmetic: this month-level sum has half-cent
    # boundary months (e.g. a true total of x.395), where double
    # summation order decides the final cent and the two-level sum
    # associates differently than the oracle's one-level sum.  Decimals
    # make the sum order-independent; cast back to double at the end.
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("rev"))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


Q08_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY month
"""


# --- q09: customers without orders (anti join) ---
def q09_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )


Q09_SQL = """
SELECT c_mktsegment, count(*) AS n_without_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --- q10: distinct-parts-per-order histogram (two-level aggregate) ---
def q10_parts_per_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.countDistinct("l_partkey").alias("n_parts"))
    return per_order.groupBy("n_parts").agg(F.count("*").alias("n_orders"))


Q10_SQL = """
SELECT n_parts, count(*) AS n_orders
FROM (SELECT l_orderkey, count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_orderkey) t
GROUP BY n_parts
"""


# --- q11: rollup (hierarchical aggregate) ---
def q11_status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


Q11_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --- q12: set ops (intersect) ---
def q12_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp, nat = _t(spark, sf_dir, "customer", "supplier", "nation")
    cust_nations = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select("n_name")
    supp_nations = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select("n_name")
    return cust_nations.intersect(supp_nations)


Q12_SQL = """
SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
INTERSECT
SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


# --- q22: statistical aggregates (corr / covariance / stddev) ---
def q22_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group — corr, sample covariance,
    sample stddev — the data-profiling aggregates a feature pipeline
    runs before normalizing anything.  All three are single-pass
    map-side-combinable aggregates (Welford-style merge states), so at
    100 TB the shuffle carries one small state per group exactly like
    a sum; covariance rounds at 4 decimals and the unit-free ratios at
    6, absorbing partial-aggregation order noise (the repo's standard
    float-agg discipline)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
    )


Q22_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(stddev_samp(l_extendedprice), 4) AS sd_price
FROM lineitem GROUP BY l_returnflag
"""


# --- q21: UNPIVOT (the q16 PIVOT inverse) ---
def q21_status_revenue_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16's wide pivot melted back to long form through the native
    ``unpivot`` (Catalyst Expand — one pass, rows × |value columns|,
    no join or union of self-scans).  Round-tripping pivot→unpivot
    proves the two faces are inverses up to the NULL cells pivot
    manufactures for absent (year, status) combos; unpivot RETAINS
    those nulls by design, so the round-trip filters them — exactly
    the rows the plain GROUP BY oracle never had."""
    wide = q16_status_revenue_pivot(spark, sf_dir)
    return wide.unpivot(
        "order_year",
        ["rev_f", "rev_o", "rev_p"],
        "status_col",
        "revenue",
    ).filter(F.col("revenue").isNotNull())


Q21_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       'rev_' || lower(o_orderstatus) AS status_col,
       round(sum(o_totalprice), 2) AS revenue
FROM orders WHERE o_orderstatus IN ('F', 'O', 'P')
GROUP BY order_year, o_orderstatus
"""


# --- q20: EXCEPT set op (the q12 INTERSECT complement) ---
def q20_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXCEPT DISTINCT face, completing the set-op family (q12
    INTERSECT, U1/U2 unions): ordering customers missing from a
    residue-filtered replica of the same feed.  Natural predicates
    (ordered-in-1994-not-1995, urgent-only) are all EMPTY on the
    fixtures at every sf — the g31/q19 vacuity trap — so the second
    input drops a deterministic residue class (custkey ≡ 0 mod 5),
    which guarantees a difference that scales with the data while
    duplicate custkeys on both sides still exercise the DISTINCT
    collapse.  ``subtract`` compiles to the same left-anti join +
    aggregate Catalyst would build for a hand-written anti-join (q09),
    so the declarative set-op costs nothing over the explicit form;
    both inputs prune to the single join column before any exchange."""
    (orders,) = _t(spark, sf_dir, "orders")
    everyone = orders.select(F.col("o_custkey").alias("custkey"))
    replica = orders.filter(F.col("o_custkey") % 5 != 0).select(
        F.col("o_custkey").alias("custkey")
    )
    return everyone.subtract(replica)


Q20_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_custkey % 5 <> 0
"""


# --- q13: correlated scalar subquery (TPC-H Q17-style) ---
def q13_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders stopped:
    lineitems below 20% of their part's average quantity.

    The correlated subquery is expressed decorrelated — per-part
    averages via groupBy then a join — which is exactly the rewrite
    Catalyst (and every optimizer since Kim's algorithm) applies to the
    correlated form; the oracle states it correlated to prove the
    equivalence.
    """
    part, li = _t(spark, sf_dir, "part", "lineitem")
    brand = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    avg_qty = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_limit"))
    # no broadcast hint: the brand slice is 1/|brands| of part, which
    # SCALES with SF (at sf100k it is hundreds of millions of keys) —
    # AQE sees the filtered size and broadcasts only while it fits
    return (
        li.join(brand, li.l_partkey == brand.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q13_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


# --- q14: exact percentiles per group (sort-based distributed agg) ---
def q14_segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per market segment.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both compute
    the linearly-interpolated quantile at p*(n-1), so the engines agree
    exactly.  (``percentile_approx`` is the 100 TB path when 2-decimal
    fidelity isn't contractual; it can't be oracle-hash-checked.)
    """
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99_price"),
            F.count("*").alias("n_orders"),
        )
    )


Q14_SQL = """
SELECT c_mktsegment,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price,
       count(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# --- q15: CUBE (all grouping-set combinations; complements q11's ROLLUP) ---
def q15_status_year_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .cube("o_orderstatus", "order_year")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


Q15_SQL = """
SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders GROUP BY CUBE (o_orderstatus, order_year)
"""


# --- q16: PIVOT (wide aggregate; fixed pivot values keep the plan 1-pass) ---
def q16_status_revenue_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue pivoted by order status.  Pivot values are given
    explicitly — with an unknown value set Spark needs an extra job to
    collect them, which is a driver round-trip worth avoiding at scale.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .withColumnsRenamed({"F": "rev_f", "O": "rev_o", "P": "rev_p"})
    )


Q16_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS rev_f,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS rev_o,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS rev_p
FROM orders GROUP BY order_year
"""


# --- q17: approx aggregate with an exact accuracy contract ---
def q17_approx_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per return flag, gated by an
    exact-count contract: the oracle-checked output carries the exact
    distinct count plus a boolean asserting the sketch landed within 5%.
    At 100 TB the sketch is the right default (fixed memory, one pass,
    mergeable partials); this query pins its accuracy so swapping it in
    for countDistinct is a measured decision, not a guess.  rsd=0.01 →
    5% tolerance is 5 sigma.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    # Dedup (flag, key) FIRST, then aggregate.  Fusing countDistinct with
    # approx_count_distinct in one groupBy makes Spark carry the HLL
    # buffer (2^14 registers at rsd=0.01) through the per-(flag, key)
    # partial dedup aggregation — one 16 KB sketch per distinct key, not
    # per group (measured 4 s vs 0.4 s at sf0.01).  HLL is a set sketch,
    # so feeding it deduped keys is value-identical, and the plan drops
    # to one dedup shuffle plus a 3-group final agg with 3 sketches.
    return (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(
            F.count("l_orderkey").alias("n_exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("n_approx"),
        )
        .select(
            "l_returnflag",
            "n_exact",
            (F.abs(F.col("n_approx") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
                "approx_ok"
            ),
        )
    )


Q17_SQL = """
SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact, TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


def q18_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/quantity/size
    conjunctions — the classic disjunctive-predicate join.  The load-
    bearing plan property: Catalyst extracts the COMMON parts of the
    disjunction and pushes them below the join (the brand IN-list onto
    the part scan, the quantity range onto the lineitem scan), so the
    join builds on pre-filtered inputs instead of evaluating the full
    OR against the raw cross product — at 100 TB the difference
    between scanning three brands and scanning the corpus.  Per-brand
    grouping keeps the result multi-row and hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 15)
         & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 25)
           & F.col("p_size").between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 35)
           & F.col("p_size").between(1, 30))
    )
    # NO broadcast hint: part scales with SF (unlike the nation/region
    # dims q03 broadcasts), so the join strategy belongs to AQE, which
    # sees the brand/size-filtered build side's actual post-pushdown size
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


Q18_SQL = """
SELECT p_brand, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 30)
GROUP BY p_brand
"""


# --- q19: TPC-H Q22 shape through the literal SQL API ------------------
def q19_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — above-average-balance customers with no
    URGENT orders — stated as LITERAL SQL with both subquery forms
    Catalyst must rewrite: an uncorrelated scalar subquery (the global
    average, executed once and reused as a literal — never per row) and
    a correlated NOT EXISTS (compiled to a left-anti join on o_custkey
    — never a per-row probe).  The subquery carries its own priority
    predicate because every customer HAS orders at every fixture sf (a
    bare NOT EXISTS is provably empty — the g31 vacuity trap); the
    filter also has to be pushed below the anti-join's right side.
    q13 already pins the hand-decorrelated DataFrame form; this is the
    SQL-API face of the same optimizer obligation, pinned in
    test_plan_quality.  Tables bind as DataFrame references
    (`spark.sql(..., c=df)`), so the driver's shared session is never
    polluted with temp views."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment AS c_mktsegment,
               count(*) AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM {c} c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM {c} c2)
          AND NOT EXISTS (SELECT 1 FROM {o} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_mktsegment
        """,
        c=cust,
        o=orders,
    )


Q19_SQL = """
SELECT c.c_mktsegment AS c_mktsegment,
       count(*) AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
"""


SPECS = [
    QuerySpec("q01_pricing_summary", q01_pricing_summary, Q01_SQL, "relational",
              "TPC-H Q1-style wide aggregate (map-side partial agg)", bench=True),
    QuerySpec("q02_top_revenue_orders", q02_top_revenue_orders, Q02_SQL, "relational",
              "TPC-H Q3-style join + top-k", bench=True),
    QuerySpec("q03_regional_volume", q03_regional_volume, Q03_SQL, "relational",
              "TPC-H Q5-style 5-way join with broadcast dims", bench=True),
    QuerySpec("q04_priority_exists", q04_priority_exists, Q04_SQL, "relational",
              "EXISTS via left-semi join (J6)"),
    QuerySpec("q05_acctbal_by_segment", q05_acctbal_by_segment, Q05_SQL, "relational",
              "simple dim aggregate (A3)"),
    QuerySpec("q06_brand_part_stats", q06_brand_part_stats, Q06_SQL, "relational",
              "count/distinct/min/max per group"),
    QuerySpec("q07_top_supplier_per_nation", q07_top_supplier_per_nation, Q07_SQL, "relational",
              "window top-1 per group (D1 keep-first shape)"),
    QuerySpec("q08_monthly_revenue", q08_monthly_revenue, Q08_SQL, "relational",
              "time-bucketed aggregate", bench=True),
    QuerySpec("q09_customers_without_orders", q09_customers_without_orders, Q09_SQL, "relational",
              "NOT EXISTS via left-anti join"),
    QuerySpec("q10_parts_per_order_histogram", q10_parts_per_order_histogram, Q10_SQL, "relational",
              "two-level aggregate"),
    QuerySpec("q11_status_priority_rollup", q11_status_priority_rollup, Q11_SQL, "relational",
              "ROLLUP hierarchical aggregate"),
    QuerySpec("q12_nations_with_both", q12_nations_with_both, Q12_SQL, "relational",
              "INTERSECT set op (U-family)"),
    QuerySpec("q13_small_quantity_revenue", q13_small_quantity_revenue, Q13_SQL, "relational",
              "correlated scalar subquery, expressed decorrelated"),
    QuerySpec("q14_segment_price_quantiles", q14_segment_price_quantiles, Q14_SQL, "relational",
              "exact interpolated percentiles per group"),
    QuerySpec("q15_status_year_cube", q15_status_year_cube, Q15_SQL, "relational",
              "CUBE grouping sets (complements q11 ROLLUP)"),
    QuerySpec("q16_status_revenue_pivot", q16_status_revenue_pivot, Q16_SQL, "relational",
              "PIVOT with explicit values (single-pass wide aggregate)"),
    QuerySpec("q18_disjunctive_predicate_revenue", q18_disjunctive_predicate_revenue,
              Q18_SQL, "relational",
              "TPC-H Q19 shape: OR-of-conjunctions join predicate with "
              "common-term pushdown onto both scans"),
    QuerySpec("q17_approx_distinct_contract", q17_approx_distinct_contract, Q17_SQL, "relational",
              "HLL++ approx distinct pinned to an exact accuracy contract"),
    QuerySpec("q19_rich_inactive_customers", q19_rich_inactive_customers, Q19_SQL,
              "relational",
              "TPC-H Q22 shape via literal SQL: uncorrelated scalar subquery "
              "+ NOT EXISTS, both Catalyst-rewritten (pinned)"),
    QuerySpec("q20_lapsed_customers", q20_lapsed_customers, Q20_SQL, "relational",
              "EXCEPT DISTINCT set op (completes the set-op family with q12)"),
    QuerySpec("q21_status_revenue_unpivot", q21_status_revenue_unpivot, Q21_SQL,
              "relational",
              "UNPIVOT via native melt (Expand node): the q16 pivot inverse, "
              "round-trip proves the faces invert up to manufactured nulls"),
    QuerySpec("q22_stat_aggregates", q22_stat_aggregates, Q22_SQL, "relational",
              "second-moment profiling aggregates (corr/covar_samp/stddev) — "
              "single-pass mergeable states, shuffled like a sum"),
]
