"""Graph-analytics invariants (the oracle gate covers exact values;
these pin the mathematical properties that hold at any scale)."""

from __future__ import annotations

from advanced_technologies_of_china_graph_database_construction_spark.operators.analytics import symmetric_edges
from advanced_technologies_of_china_graph_database_construction_spark.plans.analytics_queries import (
    _copub_pairs,
    g21_copub_pagerank,
    g22_copub_triangles,
)

from .conftest import SF_CORRECT


def test_pagerank_mass_is_conserved(spark):
    # symmetric graph → no dangling mass: ranks sum to 1
    total = sum(r["pagerank"] for r in g21_copub_pagerank(spark, SF_CORRECT).collect())
    assert abs(total - 1.0) < 1e-4, total


def test_pagerank_rewards_degree(spark):
    from pyspark.sql import functions as F

    pairs = _copub_pairs(spark, SF_CORRECT)
    deg = (
        symmetric_edges(pairs)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .collect()
    )
    degs = {r["src"]: r["deg"] for r in deg}
    ranks = {r["org_id"]: r["pagerank"] for r in g21_copub_pagerank(spark, SF_CORRECT).collect()}
    top_rank = max(ranks, key=ranks.get)
    # the top-ranked node sits in the top decile by degree
    threshold = sorted(degs.values())[int(len(degs) * 0.9) - 1]
    assert degs[top_rank] >= threshold, (degs[top_rank], threshold)


def test_triangles_positive_and_bounded(spark):
    n_pairs = _copub_pairs(spark, SF_CORRECT).count()
    n_tri = g22_copub_triangles(spark, SF_CORRECT).collect()[0]["n_triangles"]
    assert 0 < n_tri <= n_pairs * (n_pairs - 1) // 2


def test_label_propagation_separates_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: after 3 rounds every
    clique converges to its smallest member's label, and the bridge
    does not merge them (majority within each clique wins)."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.analytics import (
        label_propagation,
        symmetric_edges,
    )

    clique_a = [(i, j) for i in range(4) for j in range(4) if i < j]
    clique_b = [(i, j) for i in range(10, 14) for j in range(10, 14) if i < j]
    pairs = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], ["src", "dst"]
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(symmetric_edges(pairs), 3).collect()
    }
    assert {labels[n] for n in range(4)} == {0}
    assert {labels[n] for n in range(10, 14)} == {10}


def test_label_propagation_no_inbound_keeps_own_label(spark):
    """A source-only node receives no messages; the left-join coalesce
    must keep its own label instead of dropping the row."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.analytics import label_propagation

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    labels = {r["node"]: r["label"] for r in label_propagation(edges, 2).collect()}
    assert labels == {1: 1, 2: 1}
