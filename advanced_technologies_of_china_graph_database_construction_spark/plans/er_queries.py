"""Entity-resolution workload over the `embeddings` fixture — the
reference's distinctive core (SURVEY.md §2.9 M1-M5) re-expressed as:
exact/LSH cosine similarity self-join → connected components (Pregel-
style star contraction) → min-id canonical mapping → alias edges.

The DuckDB oracle mirrors the similarity join with double-precision
list arithmetic and the component closure with a recursive min-label
propagation CTE.  Cosine values are rounded to 6 digits on BOTH sides
before the threshold comparison; the 0.44 threshold sits in a wide gap
of the pair-sim distribution at the correctness SF, so boundary
decisions are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.er import canonical_mapping, exact_similarity_pairs, lsh_similarity_pairs
from .spec import QuerySpec

ER_THRESHOLD = 0.44

_COS = (
    "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
)

_PAIRS_CTE = f"""
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_COS} AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_COS} >= {ER_THRESHOLD})
"""

_COMPONENTS_CTE = f"""
WITH RECURSIVE
{_PAIRS_CTE},
edges2 AS (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs),
reach(id, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges2 e ON r.id = e.src WHERE r.lab < e.dst),
components AS (SELECT id AS vec_id, min(lab) AS canonical FROM reach GROUP BY id)
"""


def er01_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return exact_similarity_pairs(emb, ER_THRESHOLD)


ER01_SQL = f"WITH {_PAIRS_CTE} SELECT src, dst, sim FROM pairs"


def er02_canonical_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = exact_similarity_pairs(emb, ER_THRESHOLD)
    return canonical_mapping(emb, pairs).select(F.col("id").alias("vec_id"), "canonical")


ER02_SQL = _COMPONENTS_CTE + "SELECT vec_id, canonical FROM components"


def er03_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = er02_canonical_mapping(spark, sf_dir)
    return (
        m.groupBy("canonical")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


ER03_SQL = _COMPONENTS_CTE + """
SELECT canonical, count(*) AS n_members FROM components
GROUP BY canonical HAVING count(*) >= 2
"""


def er04_alias_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Alias-edge emission (S7): surface → representative where distinct
    # (`csv_extractor.py:246-295`, filter at :269-273).
    m = er02_canonical_mapping(spark, sf_dir)
    return m.filter(F.col("vec_id") != F.col("canonical")).select(
        F.col("vec_id").alias("src"),
        F.col("canonical").alias("dst"),
        F.lit("ALIAS_OF").alias("rel_type"),
    )


ER04_SQL = _COMPONENTS_CTE + """
SELECT vec_id AS src, canonical AS dst, 'ALIAS_OF' AS rel_type
FROM components WHERE vec_id <> canonical
"""


def er05_lsh_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Approximate path (no SQL oracle — recall is probabilistic; its
    # precision/recall contract is pytest-checked against the exact join
    # on clustered fixtures, tests/test_er.py).
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_similarity_pairs(emb, ER_THRESHOLD, n_planes=32, bands=16)


SPECS = [
    QuerySpec("er01_similarity_pairs", er01_similarity_pairs, ER01_SQL, "er",
              "exact cosine ε-ball self-join (M2 similarity graph)", bench=True),
    QuerySpec("er02_canonical_mapping", er02_canonical_mapping, ER02_SQL, "er",
              "connected components → min-id canonical map (M2/M4)", bench=True),
    QuerySpec("er03_cluster_sizes", er03_cluster_sizes, ER03_SQL, "er",
              "cluster regroup (J2/A1/A2)"),
    QuerySpec("er04_alias_edges", er04_alias_edges, ER04_SQL, "er",
              "ALIAS_OF edge emission (S7)"),
    QuerySpec("er05_lsh_similarity_pairs", er05_lsh_similarity_pairs, None, "er",
              "sign-LSH banded approximate similarity join (scale path)"),
]
