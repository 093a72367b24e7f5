"""Entity resolution: similarity self-join → connected components →
canonical mapping → mapping application.

Mirrors the reference's keyword-merging pipeline (SURVEY.md §2.9):
embed unique surface forms (`keyword_merger.py:183`), cluster with
cosine DBSCAN min_samples=2 (`:186-201`), canonical = min of cluster
(`:222`), identity for noise (`:231-232`), then apply the mapping to
records via broadcast join (`:249-265`).

Spark-first decomposition:
- the ε-ball cosine graph is a **similarity self-join**;
- DBSCAN(min_samples=2) closure is **connected components** of that
  graph (operators/connected_components.py);
- mapping application is a **broadcast left join + coalesce** (J1).

Two similarity-join strategies:
- ``exact_similarity_pairs``: blocked O(n²) join, fine to a few 10⁵
  vectors per attribute (the reference's real scale is 88k keywords) —
  and the correctness oracle for the approximate path.
- ``lsh_similarity_pairs``: random-hyperplane (sign) LSH — signatures
  via an Arrow-batched pandas UDF, candidates from banded signature
  equality, then exact cosine on candidates only.  This is the 100 TB
  path: candidate generation is an equi-join on (band, band_signature),
  so the shuffle is proportional to collisions, not n².
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import as_double, cosine_rounded, dot, norm
from .connected_components import connected_components


def exact_similarity_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All pairs (src < dst, sim) with cosine similarity ≥ threshold.

    Block-matrix execution: the unit-normalized (n, d) matrix is
    broadcast once; each Arrow batch of rows computes its full block of
    cosines as ONE BLAS matmul (`block @ all.T`) inside `mapInPandas`,
    emitting only pairs at/above the threshold.  That keeps the O(n²)
    arithmetic in vectorized native code instead of 12M+ interpreted
    per-pair expressions, and the shuffle carries only surviving pairs.

    Scale bound: the broadcast side is the whole vector set (~3 GB at
    1M × 768 float32) — fine for the reference's real workload (88k
    surface forms, `keyword_merger.py:183`) and for any per-attribute ER
    vocabulary; beyond that use `lsh_similarity_pairs`, which never
    materializes a dense matrix.

    The comparison uses cosine rounded to 6 digits so the decision at
    the threshold boundary is reproducible across engines/hardware.
    """
    spark = emb.sparkSession
    src = emb.select(F.col(id_col).cast("long").alias("id"), as_double(F.col(vec_col)).alias("v"))
    ids_and_vecs = src.collect()
    all_ids = np.array([r["id"] for r in ids_and_vecs], dtype=np.int64)
    mat = np.array([r["v"] for r in ids_and_vecs], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(all_ids)
    bc = spark.sparkContext.broadcast((all_ids[order], mat[order]))

    out_schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def block_pairs(batches):
        ids_all, m_all = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["id"].to_numpy(dtype=np.int64)
            block = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ m_all.T, 6)  # (batch, n)
            keep = sims >= threshold
            # strict upper triangle in id space: src < dst
            keep &= bids[:, None] < ids_all[None, :]
            bi, aj = np.nonzero(keep)
            yield pd.DataFrame(
                {"src": bids[bi], "dst": ids_all[aj], "sim": sims[bi, aj]}
            )

    return src.mapInPandas(block_pairs, out_schema)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def lsh_similarity_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate ε-ball cosine self-join via sign-LSH banding.

    Recall is tunable with (n_planes, bands); precision is exact because
    candidates are re-scored with the true cosine. Deterministic given
    the seed.
    """
    rows_per_band = n_planes // bands
    spark = emb.sparkSession
    sample = emb.select(vec_col).first()
    dim = len(sample[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ bc.value.T) >= 0  # (batch, n_planes)
        # Pack each band's bit-chunk into an int, fully vectorized:
        # (batch, bands, rows_per_band) · (2^{r-1} … 2^0) → (batch, bands),
        # then tag the band index into the high bits of the key space.
        chunks = bits.reshape(len(mat), bands, rows_per_band).astype(np.int64)
        weights = 1 << np.arange(rows_per_band - 1, -1, -1, dtype=np.int64)
        keys = chunks @ weights  # (batch, bands)
        keys |= np.arange(bands, dtype=np.int64) << 48
        return pd.Series(list(keys))

    # Candidate generation shuffles only (id, band_key) — vectors join
    # back in AFTER the distinct, so the bands× blow-up and the dedup
    # shuffle never carry the embedding payload.
    exploded = emb.select(
        F.col(id_col).alias("id"), F.explode(band_keys(F.col(vec_col))).alias("band_key")
    )
    left = exploded.select(F.col("id").alias("src"), "band_key")
    right = exploded.select(F.col("id").alias("dst"), "band_key")
    cands = (
        left.join(right, ["band_key"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
    scored = cands.join(va, "src").join(vb, "dst")
    sim = cosine_rounded(F.col("va"), F.col("vb"))
    return scored.select("src", "dst", sim.alias("sim")).filter(F.col("sim") >= threshold)


def canonical_mapping(emb: DataFrame, pairs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, canonical): min-id of the similarity component; noise → self.

    Matches `keyword_merger.py:222` (min representative) + `:231-232`
    (noise identity).
    """
    comp = connected_components(pairs.select("src", "dst"))
    ids = emb.select(F.col(id_col).alias("id")).distinct()
    return ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("canonical")
    )


def apply_mapping(df: DataFrame, mapping: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Replace surface values by canonical via broadcast left join (J1:
    `mapping.get(item, item)` semantics, `keyword_merger.py:249-265`)."""
    out_col = out_col or col
    m = mapping.select(F.col("id").alias("__surface"), F.col("canonical").alias("__canonical"))
    return (
        df.join(F.broadcast(m), df[col] == F.col("__surface"), "left")
        .withColumn(out_col, F.coalesce("__canonical", F.col(col)))
        .drop("__surface", "__canonical")
    )
