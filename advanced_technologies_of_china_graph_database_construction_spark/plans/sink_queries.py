"""CSV-sink round-trip queries — the S5/S6 bulk export surface
(`csv_extractor.py:16-241`) proven through the gate instead of
pytest-only: each spec WRITES the neo4j-admin-format CSV with the real
sink code, reads the files back with a plain ``spark.read.csv``, and the
DuckDB oracle recomputes what the files must contain.  F10's list
rendering (``[a,b]`` with ``"`` doubling, `utils.py:90-97`) is exercised
with elements that actually contain quotes.

Everything round-trips as VARCHAR (a header CSV read without schema
inference is all-string on any engine), with doubles pinned to
DECIMAL(14,2) before rendering so both engines print identical digits.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import GRAPH_ORACLE_CTES, build_graph
from ..sources.csv_export import render_list_literal, write_relationship_csvs
from .spec import QuerySpec


def s03_node_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + F10: document node CSV (``:ID,:LABEL,props…``) with a
    rendered keyword-name list property, written then read back.  The
    list elements are wrapped in literal ``"`` so the LOAD-CSV doubling
    has real work, and the CSV writer's own field quoting (the value
    contains commas and quotes) must round-trip cleanly through the
    reader."""
    g = build_graph(spark, sf_dir)
    kw = (
        g.edges.filter(F.col("rel_type") == "HAS_KEYWORD")
        .join(g.keywords, F.col("dst") == F.col("keyword_id"))
        .groupBy(F.col("src").alias("doc_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.concat(F.lit('"'), F.col("name"), F.lit('"')))
            ).alias("kws")
        )
    )
    nodes = g.docs.join(kw, "doc_id", "left").select(
        F.col("doc_id").cast("string").alias(":ID"),
        F.col("label").alias(":LABEL"),
        "title",
        F.col("year").cast("string").alias("year"),
        F.col("totalprice").cast("decimal(14,2)").cast("string").alias("totalprice"),
        "status",
        render_list_literal(
            F.coalesce(F.col("kws"), F.array().cast("array<string>"))
        ).alias("keywords"),
    )
    out = tempfile.mkdtemp(prefix="sink_nodes_")
    nodes.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.option("header", True).csv(out)


S03_SQL = GRAPH_ORACLE_CTES + """,
kwl AS (
  SELECT e.src AS doc_id,
         '[' || string_agg('""' || k.name || '""', ',' ORDER BY k.name) || ']' AS kws
  FROM e_has_keyword e JOIN keywords k ON e.dst = k.keyword_id
  GROUP BY e.src)
SELECT CAST(d.doc_id AS VARCHAR) AS ":ID",
       d.label AS ":LABEL",
       d.title,
       CAST(d.year AS VARCHAR) AS year,
       CAST(CAST(d.totalprice AS DECIMAL(14,2)) AS VARCHAR) AS totalprice,
       d.status,
       coalesce(k.kws, '[]') AS keywords
FROM docs d LEFT JOIN kwl k ON d.doc_id = k.doc_id
"""


def s04_rel_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the per-type relationship sinks (deduped tuples, scoped
    ``:START_ID(Label)`` headers) written with the real export code;
    the AUTHORED dataset is read back for comparison."""
    g = build_graph(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="sink_rels_")
    paths = write_relationship_csvs(g, out)
    return spark.read.option("header", True).csv(paths["AUTHORED"])


S04_SQL = GRAPH_ORACLE_CTES + """
SELECT DISTINCT CAST(src AS VARCHAR) AS ":START_ID(Author)",
       CAST(dst AS VARCHAR) AS ":END_ID(Document)",
       'AUTHORED' AS ":TYPE"
FROM e_authored
"""


SPECS = [
    QuerySpec(
        name="s03_node_csv_roundtrip",
        fn=s03_node_csv_roundtrip,
        oracle=S03_SQL,
        category="sink",
        description="S5 node CSV sink + F10 list literal with quote doubling, "
        "write/read round-trip oracle-checked",
    ),
    QuerySpec(
        name="s04_rel_csv_roundtrip",
        fn=s04_rel_csv_roundtrip,
        oracle=S04_SQL,
        category="sink",
        description="S6 relationship CSV sink (AUTHORED), write/read "
        "round-trip oracle-checked",
    ),
]
