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

Scale notes (100 TB): rel-type filters prune edge partitions at read
time (the load-bearing layout property, `.explain`-verified in tests);
edge files are clustered by `src` WITHIN a partition, which helps
row-group locality but is NOT a join co-partitioning — plain parquet
carries no bucketing metadata, so joins re-shuffle the edge side
(co-location at rest is the s09 `bucketBy` table face).  Node dims
stay broadcast-size per label.
Writes are idempotent overwrites (the reference's MERGE-for-idempotency
and error-log retry loop, S8/S9, are subsumed by deterministic output +
task retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import GraphModel

_NODE_FAMILIES = ("docs", "authors", "keywords", "orgs", "addresses", "topics")


def write_graph(g: GraphModel, root: str, edge_partitions: int = 24) -> None:
    """Persist the graph model: node datasets (docs partitioned by label)
    plus one edges dataset partitioned by ``rel_type``.

    ``edge_partitions`` is TOTAL writer parallelism across all rel
    types (r12 review: the old name ``edge_files_per_type`` claimed a
    per-type count the repartition never delivered — a hash over
    (rel_type, src) into N partitions is N tasks total).  The read
    layout contract is partition PRUNING on rel_type only; a plain
    parquet round-trip carries no bucketing metadata, so downstream
    joins re-shuffle the edge side regardless — co-location at rest
    needs the s09 ``bucketBy`` table face, not this store."""
    g.docs.write.mode("overwrite").partitionBy("label").parquet(f"{root}/nodes/docs")
    for fam in _NODE_FAMILIES[1:]:
        getattr(g, fam).write.mode("overwrite").parquet(f"{root}/nodes/{fam}")
    (
        g.edges.repartition(edge_partitions, "rel_type", "src")
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
