"""S3/S4: JSON record + mapping persistence.

The reference checkpoints its pipeline stages as JSON files on disk —
cleaned/merged record lists (`Hype.py:71-72,85-86`) and the
surface→canonical mapping dicts (`keyword_merger.py:134-144,235-247`,
memoized with a `force_recompute` flag) — and stream-parses large JSON
with ijson to bound memory (`TopicClassfication.py:232,245`).

The Spark equivalents: `df.write.json` (line-delimited, splittable, so
the S4 memory concern disappears — every executor reads its own split)
and schema-preserving reload.  Parquet is the engine's primary store;
the JSON face exists for interop parity with the reference's artifacts.

Scale notes: JSON round-trips lose type nuance (int vs long, no
timestamps without options), so `load_records_json` re-applies the
writer's schema instead of re-inferring — reload is bit-stable and
schema drift in the files fails loudly instead of silently widening.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA_FILE = "_schema.json"


def save_records_json(df: DataFrame, path: str) -> None:
    """Persist records as line-delimited JSON plus a sidecar schema file
    (the reload contract)."""
    df.write.mode("overwrite").json(path)
    with open(os.path.join(path, _SCHEMA_FILE), "w") as fh:
        fh.write(df.schema.json())


def load_records_json(spark: SparkSession, path: str) -> DataFrame:
    """Reload with the persisted schema — no inference pass over the
    data (one less full scan, deterministic types).  FAILFAST: a file
    whose contents no longer match the sidecar schema raises instead of
    PERMISSIVE-nulling the drifted column — the loud failure the module
    contract promises (r12 review)."""
    with open(os.path.join(path, _SCHEMA_FILE)) as fh:
        schema = T.StructType.fromJson(json.load(fh))
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def save_mapping_json(mapping: DataFrame, path: str,
                      surface_col: str = "surface", canonical_col: str = "canonical") -> None:
    """Persist a surface→canonical mapping table (J1 sidecar,
    `keyword_merger.py:235-247`) as line-delimited JSON."""
    mapping.select(
        F.col(surface_col).alias("surface"), F.col(canonical_col).alias("canonical")
    ).write.mode("overwrite").json(path)


def load_mapping_json(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType(
        [T.StructField("surface", T.StringType()), T.StructField("canonical", T.StringType())]
    )
    return spark.read.schema(schema).json(path)


def load_dict_mapping_json(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's mapping-artifact form — ONE json object
    ``{surface: canonical}`` per file (`keyword_merger.py:235-247`; the
    hand-curated `data/merged_publisher.json` is this shape) — into the
    engine's (surface, canonical) mapping table.

    Driver-side parse is deliberate: these artifacts are vocabulary-
    sized (the reference's largest is 88k entries, ~a few MB), not
    corpus-sized, so a single-file dict parse + parallelize is cheaper
    than spinning a JSON scan, and the dict form isn't line-delimited so
    executors couldn't split it anyway.  Corpus-scale mappings use the
    line-delimited `save_mapping_json`/`load_mapping_json` face."""
    with open(path, encoding="utf-8") as fh:
        d = json.load(fh)
    if not isinstance(d, dict):
        raise ValueError(f"expected a JSON object mapping at {path}")
    schema = T.StructType(
        [T.StructField("surface", T.StringType()), T.StructField("canonical", T.StringType())]
    )
    return spark.createDataFrame(list(d.items()), schema)


def memoized_mapping(
    spark: SparkSession, path: str, compute, force_recompute: bool = False
) -> DataFrame:
    """The reference's mapping memoization (`keyword_merger.py:134-144`):
    reuse the persisted artifact unless absent or ``force_recompute`` —
    hand-curated mappings (e.g. the reference's `merged_publisher.json`,
    README.md:14) survive pipeline re-runs."""
    marker = os.path.join(path, "_SUCCESS")
    if not force_recompute and os.path.exists(marker):
        return load_mapping_json(spark, path)
    mapping = compute()
    save_mapping_json(mapping, path)
    return load_mapping_json(spark, path)
