"""The full graph workload must be reachable from spark.sql over the
registered views — pure-SQL traversals agree with the DataFrame plans."""

from __future__ import annotations

from advanced_technologies_of_china_graph_database_construction_spark.operators.graph import (
    build_graph,
    register_graph_views,
)
from advanced_technologies_of_china_graph_database_construction_spark.plans.graph_queries import (
    KEYWORD,
    g10_docs_per_year_for_keyword,
)

SF = "/root/testdata/sf0.001"


def test_sql_traversal_matches_dataframe_plan(spark):
    g = build_graph(spark, SF)
    register_graph_views(g, spark)
    sql = spark.sql(
        f"""
        SELECT d.year, count(DISTINCT d.doc_id) AS n_docs
        FROM g_edges e
        JOIN g_keywords k ON e.rel_type = 'HAS_KEYWORD' AND e.dst = k.keyword_id
        JOIN g_docs d ON e.src = d.doc_id
        WHERE k.name = '{KEYWORD}'
        GROUP BY d.year
        ORDER BY d.year
        """
    )
    got = [(r["year"], r["n_docs"]) for r in sql.collect()]
    want = sorted(
        (r["year"], r["n_docs"])
        for r in g10_docs_per_year_for_keyword(spark, SF).collect()
    )
    assert got == want and len(got) > 0


def test_sql_catalog_describes_views(spark):
    g = build_graph(spark, SF)
    register_graph_views(g, spark)
    cols = {r["col_name"] for r in spark.sql("DESCRIBE g_docs").collect()}
    assert {"doc_id", "title", "label", "year"} <= cols
    rels = {
        r["rel_type"]
        for r in spark.sql("SELECT DISTINCT rel_type FROM g_edges").collect()
    }
    assert {"AUTHORED", "HAS_KEYWORD", "PUBLISHED_BY", "AUTHOR_ADDRESS", "HAS_TOPIC"} <= rels
