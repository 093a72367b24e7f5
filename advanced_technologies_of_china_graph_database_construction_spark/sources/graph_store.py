"""Parquet graph store — the production layout that replaces the
reference's Neo4j native store (SURVEY.md §1.2: "Columnar Parquet
storage replaces Neo4j's native store").

Layout:

```
<root>/nodes/docs/            one dataset per node family, docs
<root>/nodes/authors/           partitioned by `label` so label-union
<root>/nodes/...                predicates (P10) become partition pruning
<root>/edges/                 single dataset partitioned by `rel_type`:
                                `edges_of(rel)` reads exactly one
                                partition directory — the Spark analogue
                                of Neo4j's per-type relationship chains
```

Scale notes (100 TB): edge files within a `rel_type=` partition are
written pre-repartitioned on `src`, so downstream doc↔edge joins start
from a co-partitioned layout; node dims stay broadcast-size per label.
Writes are idempotent overwrites (the reference's MERGE-for-idempotency
and error-log retry loop, S8/S9, are subsumed by deterministic output +
task retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import GraphModel

_NODE_FAMILIES = ("docs", "authors", "keywords", "orgs", "addresses", "topics")


def write_graph(g: GraphModel, root: str, edge_files_per_type: int = 4) -> None:
    """Persist the graph model: node datasets (docs partitioned by label)
    plus one edges dataset partitioned by ``rel_type``."""
    g.docs.write.mode("overwrite").partitionBy("label").parquet(f"{root}/nodes/docs")
    for fam in _NODE_FAMILIES[1:]:
        getattr(g, fam).write.mode("overwrite").parquet(f"{root}/nodes/{fam}")
    (
        g.edges.repartition(edge_files_per_type, "rel_type", "src")
        .write.mode("overwrite")
        .partitionBy("rel_type")
        .parquet(f"{root}/edges")
    )
    g.kw_alias.write.mode("overwrite").parquet(f"{root}/nodes/kw_alias")


def read_graph(spark: SparkSession, root: str) -> GraphModel:
    """Reload a persisted graph; rel-type filters prune edge partitions
    (verify with `.explain`: `PartitionFilters: [isnotnull(rel_type), ...]`)."""
    nodes = {fam: spark.read.parquet(f"{root}/nodes/{fam}") for fam in _NODE_FAMILIES}
    edges = spark.read.parquet(f"{root}/edges").select(
        "src", "dst", F.col("rel_type").cast("string").alias("rel_type")
    )
    kw_alias = spark.read.parquet(f"{root}/nodes/kw_alias")
    return GraphModel(edges=edges, kw_alias=kw_alias, **nodes)
