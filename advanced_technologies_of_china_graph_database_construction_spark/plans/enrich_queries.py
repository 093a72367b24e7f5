"""Enrichment workload: topic classification with taxonomy validation
and dead-letter split (M7), and ER cluster correction with the
total-mapping guarantee (M6) — deterministic model seams so the DuckDB
oracle can mirror every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import enrich
from ..operators.er import canonical_mapping, exact_similarity_pairs
from .er_queries import _COMPONENTS_CTE, ER_THRESHOLD
from .spec import QuerySpec

_TAXONOMY_VALUES = ", ".join(
    f"({tid}, '{cat}', '{name}')" for tid, cat, name, _ in enrich.TAXONOMY
)

_TAXONOMY_CTE = f"taxonomy(topic_id, category, topic_name) AS (VALUES {_TAXONOMY_VALUES})"

_N_TOPICS = len(enrich.TAXONOMY)


# ------------------------------------------------------------ t01 classify --

def t01_topic_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return enrich.classify_topics(docs, enrich.taxonomy_df(spark))


T01_SQL = f"""
WITH {_TAXONOMY_CTE},
cls AS (SELECT doc_id, (length(text) % {_N_TOPICS} + 1)::INT AS topic_id FROM documents)
SELECT c.doc_id, c.topic_id, t.topic_name, t.category, NULL::VARCHAR AS error
FROM cls c JOIN taxonomy t USING (topic_id)
"""


# -------------------------------------------------------- t02 distribution --

def t02_topic_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    valid, _ = enrich.split_dead_letter(t01_topic_assignment(spark, sf_dir))
    return valid.groupBy("category", "topic_name").agg(F.count("*").alias("n_docs"))


T02_SQL = f"""
WITH {_TAXONOMY_CTE},
cls AS (SELECT doc_id, (length(text) % {_N_TOPICS} + 1)::INT AS topic_id FROM documents)
SELECT t.category, t.topic_name, count(*) AS n_docs
FROM cls c JOIN taxonomy t USING (topic_id)
GROUP BY t.category, t.topic_name
"""


# ---------------------------------------------------------- t03 dead letter --

FAIL_MOD, FAIL_REM = 17, 3


def t03_dead_letter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    classified = enrich.classify_topics(
        docs, enrich.taxonomy_df(spark), enrich.failing_classifier(FAIL_MOD, FAIL_REM)
    )
    valid, errors = enrich.split_dead_letter(classified)
    return (
        valid.select(F.lit("valid").alias("channel"), "doc_id")
        .unionByName(errors.select(F.lit("error").alias("channel"), "doc_id"))
        .groupBy("channel")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


T03_SQL = f"""
SELECT CASE WHEN doc_id % {FAIL_MOD} = {FAIL_REM} THEN 'error' ELSE 'valid' END AS channel,
       count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents GROUP BY 1
"""


# ----------------------------------------------------------- t04 corrected --

def t04_corrected_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = exact_similarity_pairs(emb, ER_THRESHOLD)
    mapping = canonical_mapping(emb, pairs)  # (id, canonical), rep = min id
    corrected = enrich.correct_mapping(mapping)  # rep re-elected to max id
    return corrected.select(F.col("id").alias("vec_id"), "canonical")


T04_SQL = _COMPONENTS_CTE + """
, sizes AS (SELECT canonical, count(*) AS n FROM components GROUP BY canonical)
SELECT c.vec_id,
       CASE WHEN s.n >= 2
            THEN (SELECT max(c2.vec_id) FROM components c2 WHERE c2.canonical = c.canonical)
            ELSE c.canonical END AS canonical
FROM components c JOIN sizes s USING (canonical)
"""


SPECS = [
    QuerySpec("t01_topic_assignment", t01_topic_assignment, T01_SQL, "enrich",
              "M7 topic classification via mapInPandas + taxonomy join"),
    QuerySpec("t02_topic_distribution", t02_topic_distribution, T02_SQL, "enrich",
              "topic distribution over the valid channel"),
    QuerySpec("t03_dead_letter_stats", t03_dead_letter_stats, T03_SQL, "enrich",
              "dead-letter valid/error split (S10-style export shape)"),
    QuerySpec("t04_corrected_mapping", t04_corrected_mapping, T04_SQL, "enrich",
              "M6 cluster correction with total-mapping guarantee (U3)"),
]
