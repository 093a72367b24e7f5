"""Enrichment operators: topic classification (M7) and cluster
correction (M6) with pluggable model seams.

The reference enriches records with an LLM topic label from a fixed
22-topic / 9-category in-code taxonomy (`TopicClassfication.py:29-52`),
validating ids against the taxonomy and repairing names from ids
(`TopicClassfication.py:174-191`), with failures routed to an error
side-file (`TopicClassfication.py:263-269`); it also re-elects entity-
resolution cluster representatives via an LLM with a total-mapping
guarantee (`recorrect_mapping.py:61-66,70-213`).

Spark-first design: the model call is a pluggable callable hosted in
``mapInPandas`` / ``applyInPandas`` (Arrow batches — the same seam an
embedding model or LLM client would use), while everything around it is
JVM-side: taxonomy validation and name repair are a broadcast join, the
dead-letter channel is a filter on an ``error`` column (two filtered
outputs, no side-files), and the total-mapping guarantee is a
left-anti-join + identity union (U3).  The default classifier/corrector
are deterministic pure functions so correctness tests never touch a
network (the reference's memoization-file idea, `keyword_merger.py:
134-144`, done properly).

Scale notes: classification is a narrow Arrow-batched map (no shuffle);
validation joins broadcast the 22-row taxonomy; correction groups by
cluster id — the only shuffle, keyed by canonical id whose fan-in is
cluster size (bounded, no skew at 1000 executors).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Generic 22-topic / 9-category taxonomy dim (same shape as the
# reference's in-code list; ids 1-22).
TAXONOMY: list[tuple[int, str, str, str]] = [
    (1, "compute", "processors", "CPU/GPU/accelerator design"),
    (2, "compute", "memory_systems", "memory and storage hierarchies"),
    (3, "compute", "quantum_computing", "quantum hardware and algorithms"),
    (4, "networks", "wireless_systems", "cellular and wireless links"),
    (5, "networks", "optical_transport", "fiber and photonic transport"),
    (6, "materials", "semiconductor_materials", "wafers, substrates, films"),
    (7, "materials", "composites", "structural composite materials"),
    (8, "materials", "battery_chemistry", "electrochemical storage"),
    (9, "software", "operating_systems", "kernels and runtimes"),
    (10, "software", "databases", "data management engines"),
    (11, "software", "machine_learning", "models and training systems"),
    (12, "manufacturing", "lithography", "patterning and exposure"),
    (13, "manufacturing", "additive", "3d printing processes"),
    (14, "manufacturing", "robotics", "industrial automation"),
    (15, "energy", "photovoltaics", "solar energy conversion"),
    (16, "energy", "nuclear", "fission and fusion systems"),
    (17, "aerospace", "propulsion", "engines and thrusters"),
    (18, "aerospace", "satellites", "orbital platforms"),
    (19, "biotech", "genomics", "sequencing and editing"),
    (20, "biotech", "pharmaceuticals", "drug discovery"),
    (21, "marine", "shipbuilding", "vessel design"),
    (22, "marine", "deep_sea", "submersibles and sensing"),
]

CLASSIFY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("topic_id", IntegerType()),
        StructField("error", StringType()),
    ]
)

# classifier: pdf(doc_id, text) -> pdf(doc_id, topic_id, error)
Classifier = Callable[[pd.DataFrame], pd.DataFrame]


def taxonomy_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TAXONOMY, "topic_id int, category string, topic_name string, description string"
    )


def default_classifier(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the LLM call: topic from text length.
    A real deployment swaps in an async LLM client with the same
    signature (per-partition concurrency, tenacity-style retries).
    NULL text routes to the dead-letter channel (error column) — the
    naive str.len() % path raised inside mapInPandas on the NaN and
    killed the stage, defeating the dead-letter design (r12 review)."""
    lens = pdf["text"].str.len()
    null_mask = lens.isna()
    topic = (lens.fillna(0) % len(TAXONOMY) + 1).astype("int32")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "topic_id": topic.where(~null_mask, other=-1),
            "error": pd.Series(
                ["null text" if m else None for m in null_mask], dtype="object"
            ),
        }
    )


def failing_classifier(fail_mod: int, fail_rem: int) -> Classifier:
    """Deterministic partial-failure classifier for dead-letter tests:
    rows with doc_id % fail_mod == fail_rem error out."""

    def _cls(pdf: pd.DataFrame) -> pd.DataFrame:
        out = default_classifier(pdf)
        bad = (pdf["doc_id"] % fail_mod == fail_rem).to_numpy()
        out.loc[bad, "topic_id"] = None
        out.loc[bad, "error"] = "model_error: simulated failure"
        out["topic_id"] = out["topic_id"].astype("Int32")
        return out

    return _cls


def classify_topics(
    docs: DataFrame, taxonomy: DataFrame, classifier: Classifier | None = None
) -> DataFrame:
    """M7: per-document topic classification with taxonomy validation,
    name repair from id, and an error column (dead-letter channel).

    Output: doc_id, topic_id, topic_name, category, error.
    """
    cls = classifier or default_classifier

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield cls(pdf)

    raw = docs.select("doc_id", "text").mapInPandas(run, CLASSIFY_SCHEMA)
    # Validation + name repair: broadcast join against the 22-row dim.
    joined = raw.join(F.broadcast(taxonomy), "topic_id", "left")
    return joined.select(
        "doc_id",
        F.when(F.col("topic_name").isNotNull(), F.col("topic_id")).alias("topic_id"),
        "topic_name",
        "category",
        F.coalesce(
            F.col("error"),
            F.when(F.col("topic_name").isNull(), F.lit("invalid topic_id")),
        ).alias("error"),
    )


def split_dead_letter(classified: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid/error split — the Spark-native dead-letter pattern."""
    return (
        classified.filter(F.col("error").isNull()).drop("error"),
        classified.filter(F.col("error").isNotNull()),
    )


# ----------------------------------------------------------- M6 correction --

CORRECT_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("canonical", LongType())]
)

# corrector: pdf(id, canonical) for ONE cluster -> same shape, re-elected
Corrector = Callable[[pd.DataFrame], pd.DataFrame]


def default_corrector(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the LLM cluster review: re-elect the
    representative as the LARGEST member id (vs the builder's min), the
    shape of "the model picked a different canonical form"."""
    rep = int(pdf["id"].max())
    return pd.DataFrame({"id": pdf["id"], "canonical": rep})


def correct_mapping(
    mapping: DataFrame,
    corrector: Corrector | None = None,
    min_cluster_size: int = 2,
    id_col: str = "id",
) -> DataFrame:
    """M6: run the corrector over every cluster of size >= 2, with the
    reference's total-mapping guarantee (`recorrect_mapping.py:61-66`):
    every input id appears in the output; ids the corrector dropped (or
    singleton clusters it never saw) fall back to identity/original.
    """
    corr = corrector or default_corrector
    sizes = mapping.groupBy("canonical").agg(F.count("*").alias("__n"))
    big = (
        mapping.join(sizes.filter(F.col("__n") >= min_cluster_size), "canonical")
        .select(F.col(id_col).alias("id"), "canonical")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return corr(pdf)

    corrected = big.groupBy("canonical").applyInPandas(run, CORRECT_SCHEMA)
    # U3 reconciliation: anti-join finds ids the corrector lost; they
    # keep their original mapping.
    kept = mapping.select(F.col(id_col).alias("id"), "canonical")
    missing = kept.join(corrected.select("id"), "id", "left_anti")
    return corrected.unionByName(missing).withColumnsRenamed({"id": id_col})
