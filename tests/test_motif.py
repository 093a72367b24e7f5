"""Motif find() must reproduce the hand-written traversal joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators import motif
from advanced_technologies_of_china_graph_database_construction_spark.operators.graph import (
    REL_AUTHORED,
    REL_HAS_KEYWORD,
    build_graph,
)

SF = "/root/testdata/sf0.001"


def test_cooccurrence_motif_matches_manual_self_join(spark):
    # the g13 shape: keywords co-occurring on a document
    g = build_graph(spark, SF)
    got = sorted(
        map(
            tuple,
            motif.find(g, "(d)-[:HAS_KEYWORD]->(k1); (d)-[:HAS_KEYWORD]->(k2)", attrs=False)
            .filter(F.col("k1_id") < F.col("k2_id"))
            .select("d_id", "k1_id", "k2_id")
            .collect(),
        )
    )
    e = g.edges_of(REL_HAS_KEYWORD)
    e1 = e.select(F.col("src").alias("d_id"), F.col("dst").alias("k1_id"))
    e2 = e.select(F.col("src").alias("d_id"), F.col("dst").alias("k2_id"))
    want = sorted(
        map(
            tuple,
            e1.join(e2, "d_id")
            .filter(F.col("k1_id") < F.col("k2_id"))
            .select("d_id", "k1_id", "k2_id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_two_hop_motif_with_attrs(spark):
    g = build_graph(spark, SF)
    df = motif.find(g, "(a)-[:AUTHORED]->(d); (d)-[:HAS_KEYWORD]->(k)")
    # every variable carries its id and family attributes
    for col in ("a_id", "d_id", "k_id", "a_name", "k_name", "d_title", "d_year"):
        assert col in df.columns, col
    n = df.count()
    e_auth = g.edges_of(REL_AUTHORED).select(
        F.col("src").alias("a_id"), F.col("dst").alias("d_id")
    )
    e_kw = g.edges_of(REL_HAS_KEYWORD).select(
        F.col("src").alias("d_id"), F.col("dst").alias("k_id")
    )
    assert n == e_auth.join(e_kw, "d_id").count() and n > 0


def test_bad_patterns_raise(spark):
    g = build_graph(spark, SF)
    with pytest.raises(ValueError, match="unparseable"):
        motif.find(g, "(a)-->(b)")
    with pytest.raises(ValueError, match="unknown rel type"):
        motif.find(g, "(a)-[:NOPE]->(b)")
    with pytest.raises(ValueError, match="cartesian"):
        motif.find(g, "(a)-[:AUTHORED]->(d); (x)-[:AUTHORED]->(y)")
    with pytest.raises(ValueError, match="bound to both"):
        motif.find(g, "(a)-[:AUTHORED]->(d); (d)-[:AUTHORED]->(k)")


def test_motif_self_loop_and_order_independent_connectivity(spark):
    """r12 review fixes: a repeated variable matches self-loops (the
    GraphFrames equality rule) instead of crashing on duplicate
    columns, and a connected pattern is accepted in ANY term order."""
    import pytest as _pytest

    from advanced_technologies_of_china_graph_database_construction_spark.operators.motif import find
    from advanced_technologies_of_china_graph_database_construction_spark.operators.graph import build_graph

    from .conftest import SF_CORRECT

    g = build_graph(spark, SF_CORRECT)
    # self-typed relationship: (k)-[:ALIAS_OF]->(k) = self-loop aliases
    df = find(g, "(k)-[:ALIAS_OF]->(k)", attrs=False)
    assert df.columns == ["k_id"]
    df.count()  # executes without ambiguous-reference errors
    # connected pattern whose SECOND term shares nothing with the first
    out_of_order = find(
        g,
        "(a)-[:AUTHORED]->(d); (d2)-[:HAS_KEYWORD]->(k); (a)-[:AUTHORED]->(d2)",
        attrs=False,
    )
    assert set(out_of_order.columns) >= {"a_id", "d_id", "d2_id", "k_id"}
    # truly disconnected still raises
    with _pytest.raises(ValueError, match="cartesian"):
        find(g, "(a)-[:AUTHORED]->(d); (x)-[:HAS_KEYWORD]->(y)", attrs=False)
