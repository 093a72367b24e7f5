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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import arrow_cosine_rounded, as_double, cosine_rounded
from .er import _round_half_up, replicate_block_pairs

def _rank_topk(scored: DataFrame, k: int, score_col: str = "sim") -> DataFrame:
    """The ONE ranking contract every ANN face shares (r12 reuse fix —
    previously five hand-maintained copies): per query, rank by
    (rounded score desc, neighbor id asc) — the engine-portable total
    order — and cut to the top k."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


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
    return _rank_topk(scored, k)


def filtered_topk(
    emb: DataFrame,
    query_ids: list[int],
    predicate: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): metadata-filtered exact ANN —
    top-k cosine neighbors among the vectors satisfying ``predicate``
    (the production "filtered vector search" shape: retrieve only
    documents with lang='en', label=L, date>cutoff, …).

    This is PRE-filtering: the predicate lands on the candidate scan
    (plan-pinned — a simple column predicate reaches the parquet reader
    as a PushedFilter, so only the qualifying fraction is read and
    scored).  Post-filtering an unfiltered top-k is the classic
    vector-store bug this operator avoids: with a selective filter the
    surviving neighbors under-fill k and recall collapses.  Queries are
    looked up by id and need NOT satisfy the predicate themselves.

    Scale shape: identical to :func:`brute_force_topk` with the corpus
    side shrunk by the filter's selectivity BEFORE any scoring — the
    query frame broadcasts, the filtered candidates are scanned
    map-side (never shuffled), and the per-query window sees only
    filtered-candidate rows.  Composes with the quantized/IVF stages
    the same way (filter the compressed copy, then rerank)."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = emb.filter(predicate).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = (
        F.broadcast(q)
        .join(cand, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            arrow_cosine_rounded(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    return _rank_topk(scored, k)


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
    the default is the training-free first-``n_centroids`` seed.

    Degenerate-vector contract: a vector whose similarity to EVERY
    centroid is NULL (zero-norm, NULL, or length-mismatched — cosine
    returns NULL in-contract) produces **no output row**: NULL sims
    are filtered before the argmax.  Callers needing every vec_id in
    the output must LEFT-join back to the id set; the drop is visible
    (fewer rows), never a fabricated assignment."""
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
    # argmax as an aggregation (min_by over (-sim, centroid_id): best
    # sim, ties to the smallest centroid) — partial aggregation runs
    # map-side over the crossJoin output, so the n×C row set never
    # shuffles the way the old row_number window forced it to.
    # NULL sims (degenerate centroid: zero-norm/NULL/ragged vector —
    # cosine returns NULL in-contract) are FILTERED, not ranked: a NULL
    # first struct field sorts FIRST ascending, so an unfiltered NULL-sim
    # centroid would win the argmax for every vector (r12 ADVICE).
    return scored.filter(F.col("sim").isNotNull()).groupBy(id_col).agg(
        F.expr("min_by(centroid_id, struct(-sim, centroid_id))").alias("centroid_id")
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
    return _rank_topk(cands, k)


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """(vec_id, neighbor_id, sim, rank): every vector's exact top-k
    cosine neighbors — the all-pairs kNN graph behind SemDeDup-style
    pruning, graph-based ANN index builds, and embedding-space audits.

    Same distributed block-pair GEMM as `er.exact_similarity_pairs`
    (rows hashed into B blocks, one BLAS matmul per unordered block
    pair, per-task memory ≤ 2·block_rows·d doubles), but instead of a
    similarity threshold each task emits, for every row it holds, only
    that row's k best counterparts *within the block pair* under the
    global comparator (sim desc, neighbor id asc).  Because the global
    top-k of a node is a subset of the union of its per-block-pair
    top-k's under the same total order, one window pass over n·B·k
    candidate rows — not n² scores — finalizes the graph.  That makes
    the shuffle collision-free at 100 TB: candidate volume grows
    linearly in n·B while the quadratic arithmetic stays inside BLAS.

    ``n_rows`` (e.g. from parquet footer metadata) skips the count job
    that otherwise sizes the block grid.
    """
    replicated, _ = replicate_block_pairs(
        emb, id_col, vec_col, block_rows, n_rows, partition_by=None
    )

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def _row_topk(ids_q, ids_c, sims):
        """Per query row: k best candidate columns by (sim desc, id asc)."""
        order = np.lexsort((ids_c[None, :].repeat(len(ids_q), 0), -sims), axis=1)
        take = order[:, : min(k, sims.shape[1])]
        rows = np.repeat(ids_q, take.shape[1])
        cols = ids_c[take.ravel()]
        vals = np.take_along_axis(sims, take, axis=1).ravel()
        keep = vals > -np.inf
        return rows[keep], cols[keep], vals[keep]

    def topk_block_pair(key, pdf):
        empty = pd.DataFrame({"id": [], "neighbor_id": [], "sim": []}).astype(
            {"id": np.int64, "neighbor_id": np.int64, "sim": np.float64}
        )
        bi, bj = int(key[0]), int(key[1])
        a = pdf[pdf["blk"] == bi]
        if a.empty:
            return empty
        ids_a = a["id"].to_numpy(dtype=np.int64)
        ma = np.stack(a["v"].to_numpy()).astype(np.float64)
        ma /= np.linalg.norm(ma, axis=1, keepdims=True)
        if bi == bj:
            sims = _round_half_up(ma @ ma.T)
            np.fill_diagonal(sims, -np.inf)
            if sims.shape[1] == 1:
                return empty
            r, c, v = _row_topk(ids_a, ids_a, sims)
            return pd.DataFrame({"id": r, "neighbor_id": c, "sim": v})
        b = pdf[pdf["blk"] == bj]
        if b.empty:
            return empty
        ids_b = b["id"].to_numpy(dtype=np.int64)
        mb = np.stack(b["v"].to_numpy()).astype(np.float64)
        mb /= np.linalg.norm(mb, axis=1, keepdims=True)
        sims = _round_half_up(ma @ mb.T)
        r1, c1, v1 = _row_topk(ids_a, ids_b, sims)
        r2, c2, v2 = _row_topk(ids_b, ids_a, sims.T)
        return pd.DataFrame(
            {
                "id": np.concatenate([r1, r2]),
                "neighbor_id": np.concatenate([c1, c2]),
                "sim": np.concatenate([v1, v2]),
            }
        )

    cands = replicated.groupBy("bi", "bj").applyInPandas(topk_block_pair, out_schema)
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "neighbor_id", "sim", "rank")
    )


def scalar_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """(vec_id, qvec array<int>): per-dimension min-max scalar
    quantization to signed ints in [−levels/2, levels/2 − 1] — the
    memory-side half of quantized ANN (4× smaller than float32 at 256
    levels; at 100 TB the quantized copy is what stays hot while the
    float vectors stay in cold storage for reranking).

    Per-dimension stats come from one posexplode + groupBy(pos) pass
    (map-side combine; the stats table is dim-sized, broadcast back);
    a constant dimension (max = min) quantizes to 0.
    """
    vals = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "val"),
    )
    stats = vals.groupBy("pos").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    q = vals.join(F.broadcast(stats), "pos").select(
        "id",
        "pos",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.round(
                (F.col("val") - F.col("mn")) / (F.col("mx") - F.col("mn")) * (levels - 1.0),
                0,
            ).cast("int")
            - levels // 2
        )
        .alias("q"),
    )
    return (
        q.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "q"))), lambda s: s["q"]
            ).alias("qvec")
        )
        .select(F.col("id").alias(id_col), "qvec")
    )


def quantized_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
    quantized: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, score, rank): top-k by integer dot
    product over the scalar-quantized vectors — quantized ANN search.
    All scoring is int64 arithmetic (zip_with multiply + fold), so the
    ranking is bit-exact across engines and partitionings; ties break
    on neighbor id.  One broadcast of the quantized queries, one JVM
    scan over candidates, one window top-k.  The quantized table feeds
    both the query and candidate branches, so it is materialized once
    (localCheckpoint) instead of re-running the posexplode + stats +
    re-assembly pipeline per branch.

    ``quantized`` is the served-index seam: pass a pre-built
    ``scalar_quantize`` output (``id``/``qvec``; in production a
    persisted table, built once like the IVF store) and the query
    touches only it — no per-query rebuild of the compressed copy.
    Default ``None`` keeps the self-contained build-and-query shape."""
    qt = (
        quantized
        if quantized is not None
        else scalar_quantize(emb, id_col, vec_col, levels).localCheckpoint(eager=True)
    )
    q = qt.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qv")
    )
    cand = qt.select(F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("nv"))
    score = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q)
        .join(cand, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    return _rank_topk(scored, k, score_col="score")


def two_stage_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
    quantized: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): production two-stage ANN —
    a cheap int8 first stage overfetches ``k·overfetch`` candidates
    (:func:`quantized_topk`: 4× smaller vectors, bit-exact integer
    ranking), then ONLY those candidates are re-scored with exact float
    cosine and cut to the final top-k.  The standard recall/cost knob of
    every production vector store: raise ``overfetch`` to trade first-
    stage work for recall; at ``k·overfetch ≥ N`` the result equals
    :func:`brute_force_topk` exactly (the identity the test pins).

    Scale shape: the quantized stage scans the compressed copy (the
    float vectors stay cold); the rerank touches ``|Q|·k·overfetch``
    rows — the candidate frame (with its query vectors) is BROADCAST
    into one join against the float table, so the corpus-sized side is
    scanned map-side, never shuffled, and fetches only candidate rows'
    vectors.  Final top-k is one per-query window over ``k·overfetch``
    rows.  Both rankings order by (rounded score, neighbor id) — the
    engine-portable total order every ANN face here uses.

    ``quantized`` (pre-built ``scalar_quantize`` output) is the served
    shape: the index is built once offline, each query batch scans only
    the compressed copy plus the candidate-row rerank — see
    :func:`quantized_topk`."""
    cands = quantized_topk(
        emb,
        query_ids,
        k=k * overfetch,
        id_col=id_col,
        vec_col=vec_col,
        levels=levels,
        quantized=quantized,
    ).select("query_id", "neighbor_id")
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    rescored = (
        n.join(F.broadcast(cands.join(q, "query_id")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            arrow_cosine_rounded(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    return _rank_topk(rescored, k)
