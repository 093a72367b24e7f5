"""Similarity search over an embedding column (`array<float>`):
brute-force cosine top-k (the exact baseline) and an IVF-style
bucketed variant (the scale path).

Brute force is one broadcast-join + window top-k: exact, O(n·q), right
whenever q (queries) is small or n fits a partition sweep.  IVF assigns
every vector to its nearest of C coarse centroids (one broadcast join),
then probes only the nprobe closest buckets per query — the classic
inverted-file trade: recall vs. the fraction of buckets scanned.  Both
are deterministic (ties broken by id) and oracle-checkable.

At 100 TB the IVF list table is the partitioning: cluster the vectors
by centroid id on write (`partitionBy("centroid_id")`), so a probe
reads only nprobe partitions — partition pruning does the bucket
selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import arrow_cosine_rounded, cosine_rounded


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): exact top-k cosine neighbors
    for each query id; ties broken by neighbor id."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .join(cand, F.col("query_id") != F.col("neighbor_id"))
        # bulk pair scoring: Arrow einsum kernel (same arithmetic and
        # rounding as the JVM expression; measured ~30% faster at sf0.1)
        .select("query_id", "neighbor_id", arrow_cosine_rounded(F.col("qv"), F.col("nv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, centroid_id): nearest coarse centroid.

    ``centroids`` (centroid_id, cv) plugs in a trained quantizer —
    ``operators/kmeans.kmeans_centroids`` produces exactly this shape;
    the default is the training-free first-``n_centroids`` seed."""
    cent = centroids if centroids is not None else emb.filter(
        F.col(id_col) < n_centroids
    ).select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    scored = (
        emb.select(F.col(id_col), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            "centroid_id",
            arrow_cosine_rounded(F.col("v"), F.col("cv")).alias("sim"),
        )
    )
    # argmax as an aggregation (max_by over (sim, -centroid_id): best
    # sim, ties to the smallest centroid) — partial aggregation runs
    # map-side over the crossJoin output, so the n×C row set never
    # shuffles the way the old row_number window forced it to.
    return scored.groupBy(id_col).agg(
        F.expr("max_by(centroid_id, struct(sim, -centroid_id))").alias("centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): IVF search probing the
    ``nprobe`` nearest centroid buckets per query.  ``centroids``
    swaps in a trained quantizer (see ``ivf_assign``)."""
    cent = centroids if centroids is not None else emb.filter(
        F.col(id_col) < n_centroids
    ).select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    assign = ivf_assign(emb, n_centroids, id_col, vec_col, centroids=cent)
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc(cosine_rounded(F.col("qv"), F.col("cv"))), F.asc("centroid_id")
    )
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    cands = (
        probes.join(assign, "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .join(emb.select(F.col(id_col), F.col(vec_col).alias("nv")), id_col)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            arrow_cosine_rounded(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
