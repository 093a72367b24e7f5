"""CSV sinks: neo4j-admin header format, tuple dedup, alias filter,
list-literal rendering round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators.graph import build_graph
from advanced_technologies_of_china_graph_database_construction_spark.sources import csv_export

SF = "/root/testdata/sf0.001"


def test_node_and_rel_csvs(spark, tmp_path):
    g = build_graph(spark, SF)
    nodes = csv_export.write_node_csvs(g, str(tmp_path))
    rels = csv_export.write_relationship_csvs(g, str(tmp_path))

    kw = spark.read.option("header", True).csv(nodes["keywords"])
    assert kw.columns == [":ID", ":LABEL", "name"]
    assert kw.count() == g.keywords.count()
    assert kw.select(":LABEL").distinct().collect()[0][0] == "Keyword"

    hk = spark.read.option("header", True).csv(rels["HAS_KEYWORD"])
    assert hk.columns == [":START_ID(Document)", ":END_ID(Keyword)", ":TYPE"]
    # deduped tuples
    assert hk.count() == hk.distinct().count()
    assert hk.count() == g.edges_of("HAS_KEYWORD").distinct().count()


def test_alias_csv_excludes_identity(spark, tmp_path):
    g = build_graph(spark, SF)
    mapping = g.kw_alias.select(
        F.col("keyword_id").alias("id"), F.col("canonical_id").alias("canonical")
    )
    path = csv_export.write_alias_csv(mapping, str(tmp_path), "Keyword")
    back = spark.read.option("header", True).csv(path)
    assert back.columns == [":START_ID(Keyword)", ":END_ID(Keyword)", ":TYPE"]
    n_alias = mapping.filter(F.col("id") != F.col("canonical")).count()
    assert back.count() == n_alias
    assert back.filter(
        F.col(":START_ID(Keyword)") == F.col(":END_ID(Keyword)")
    ).count() == 0


def test_list_literal_rendering(spark):
    df = spark.createDataFrame([(["a", 'b"x', "c d"],)], ["xs"])
    got = df.select(csv_export.render_list_literal("xs").alias("s")).collect()[0]["s"]
    assert got == '[a,b""x,c d]'


def test_topic_rels_csv(spark, tmp_path):
    g = build_graph(spark, SF)
    classified = g.docs.select(
        "title", "label", F.lit("lithography (patterning)").alias("topic_name")
    ).limit(20)
    path = csv_export.write_topic_rels_csv(classified, str(tmp_path))
    back = spark.read.option("header", True).csv(path)
    assert back.columns == ["paperTitle", "paperLabel", "topicName"]
    # F12: parenthetical gloss stripped
    assert back.select("topicName").distinct().collect()[0][0] == "lithography"


def test_quoted_values_roundtrip_rfc4180(spark, tmp_path):
    """r12 review fix: Spark's default backslash escape wrote fields
    neo4j-admin (RFC4180) misparses and corrupted quoted values when
    reading the reference's own exports.  A value containing '\"' and a
    comma must round-trip byte-exact, and the on-disk bytes must use
    RFC4180 '\"\"' doubling, never a backslash."""
    from advanced_technologies_of_china_graph_database_construction_spark.sources.csv_export import (
        _write,
        read_node_csv,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 'say "hi", ok'), (2, "plain")], 'id long, v string'
    ).select(F.col("id").alias(":ID"), F.lit("K").alias(":LABEL"), "v")
    path = str(tmp_path / "nodes")
    _write(df, path)
    import glob

    raw = "".join(open(f).read() for f in glob.glob(f"{path}/*.csv"))
    assert '"say ""hi"", ok"' in raw and "\\" not in raw
    back = {r["id"]: r["v"] for r in read_node_csv(spark, path).collect()}
    assert back["1"] == 'say "hi", ok' and back["2"] == "plain"
