"""Product quantization (PQ) — the billion-vector ANN compression path.

Completes the index-family story (`similarity.py` brute force / IVF,
`kmeans.py` trained coarse quantizer, int8 scalar quantization): PQ
splits each D-dim vector into ``m`` subvectors, trains an independent
k-codeword L2 codebook per subspace, and stores each vector as ``m``
small codes — 64 float32 dims become 2 bytes at m=2/k≤256, the ~128×
compression that lets a 10⁹-vector index live in cluster memory.
Search is ADC (asymmetric distance computation): the query stays
full-precision, a per-subspace lookup table of query↔codeword distances
is built once (m·k entries), and each candidate's distance is the SUM
of ``m`` table lookups — no candidate vector is ever decoded.

Spark shapes (the scale story):

- ALL ``m`` codebooks train in ONE distributed Lloyd loop: the subspace
  id is a payload column in the (vec_id, sub, v) frame, so each
  iteration is one broadcast-join assignment + one mean-update
  aggregation regardless of ``m`` — the `multi_source_bfs` trick
  applied to training.
- Codebooks are m·k rows — always broadcast; the vector table never
  shuffles during training or encoding (partial aggregation collapses
  the update's posexplode before its exchange, as in `kmeans.py`).
- ADC scoring touches only the CODES table (m small ints per vector)
  plus a broadcast LUT: the full-precision corpus is read once at
  encode time and never again.

Determinism contract (shared with the a08 DuckDB oracle): init =
subvectors of the k smallest vec_ids; squared-L2 distances rounded
HALF_UP at 1e-6 before every argmin, ties to the smallest centroid id;
fixed iteration count.  Only rounded distances ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot


def l2sq_rounded(a, b, digits: int = 6):
    """Rounded squared L2 via dots: ||a-b||² = a·a − 2a·b + b·b."""
    return F.round(dot(a, a) - 2 * dot(a, b) + dot(b, b), digits)


def subvectors(emb: DataFrame, m: int, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, sub, v): each vector split into ``m`` equal slices — one
    narrow JVM pass (sequence-explode + slice), no shuffle.  D must be
    divisible by ``m`` (standard PQ precondition; enforced so a
    mis-sized corpus fails loudly, not with silently ragged tails)."""
    if m < 1:
        raise ValueError(f"m={m}; must be >= 1")
    dlen = (F.size("__v") / m).cast("int")
    # The divisibility check rides the slice-start expression so Catalyst
    # cannot prune it away: a D % m != 0 row raises at execution instead
    # of silently truncating its tail dims out of every codebook.
    start = F.when(
        F.size("__v") % m == 0, F.col("sub") * dlen + 1
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"subvectors: vector length not divisible by m={m}: "),
                F.size("__v").cast("string"),
            )
        )
    )
    out = (
        emb.select(
            F.col(id_col),
            as_double(F.col(vec_col)).alias("__v"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        )
        .select(
            id_col,
            "sub",
            F.slice("__v", start, dlen).alias("v"),
        )
    )
    return out


def pq_train(emb: DataFrame, m: int = 2, k: int = 4, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(sub, centroid_id, cv): ``m`` L2 codebooks after ``iters`` Lloyd
    steps, trained jointly in one loop (sub rides as a key column).

    Init honours the module contract literally: the k SMALLEST distinct
    vec_ids seed the codebooks (one tiny sort-limit job, |ids| rows),
    re-labelled 0..k-1 by rank so downstream code/LUT ids are dense even
    on a sparse or non-contiguous id space; fewer than k vectors raises
    instead of silently training a short codebook with empty ADC output.
    """
    sv = subvectors(emb, m, id_col, vec_col)
    seed_ids = [
        r[0]
        for r in emb.select(id_col).distinct().orderBy(id_col).limit(k).collect()
    ]
    if len(seed_ids) < k:
        raise ValueError(
            f"pq_train: k={k} codewords need >= k distinct {id_col}s, "
            f"got {len(seed_ids)}"
        )
    rank = F.array_position(
        F.array(*[F.lit(i) for i in seed_ids]), F.col(id_col)
    )
    cent = (
        sv.filter(F.col(id_col).isin(seed_ids))
        .select("sub", (rank - 1).cast("int").alias("centroid_id"),
                F.col("v").alias("cv"))
    )
    for _ in range(iters):
        assign = _pq_assign(sv, cent, id_col)
        cent = (
            assign.join(sv, [id_col, "sub"])
            .select("sub", "centroid_id", F.posexplode("v").alias("dim", "x"))
            .groupBy("sub", "centroid_id", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, mu))), s -> s.mu)"
                ).alias("cv")
            )
            .localCheckpoint(eager=True)  # m·k rows; pins the iterated lineage
        )
    return cent


def _pq_assign(sv: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """(id, sub, centroid_id, dist): nearest codeword per subspace by
    rounded squared L2; codebooks broadcast (m·k rows)."""
    return (
        sv.join(F.broadcast(cent), "sub")
        .select(
            id_col,
            "sub",
            "centroid_id",
            l2sq_rounded(F.col("v"), F.col("cv")).alias("dist"),
        )
        .groupBy(id_col, "sub")
        .agg(
            F.expr("min_by(centroid_id, struct(dist, centroid_id))").alias(
                "centroid_id"
            ),
            F.min("dist").alias("dist"),
        )
    )


def pq_encode(emb: DataFrame, codebooks: DataFrame, m: int,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, sub, code): the compressed representation — m small ints
    per vector, the only thing ADC search ever reads."""
    sv = subvectors(emb, m, id_col, vec_col)
    return _pq_assign(sv, codebooks, id_col).select(
        id_col, "sub", F.col("centroid_id").alias("code")
    )


def pq_adc_topk(emb: DataFrame, query_id, m: int = 2, k: int = 4,
                iters: int = 2, topk: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, adc_dist): ``topk`` nearest neighbors of ``query_id`` by
    ADC — the query's m·k lookup table is built full-precision and
    broadcast; every candidate's distance is a sum of m lookups joined
    against its codes.  Deterministic serve order (rounded dist asc,
    id asc); the query row itself is excluded.  PQ distances are
    approximations BY DESIGN (quantization error), so the gate pins
    engine-agreement on the exact same quantized math, not recall."""
    # Materialize the m·k-row codebooks once: both the encode join and
    # the LUT read them, and an unmaterialized frame would re-run the
    # whole Lloyd training lineage for each consumer (the iterated-frame
    # convention from operators/analytics.py).
    codebooks = pq_train(emb, m, k, iters, id_col, vec_col).localCheckpoint(
        eager=True
    )
    codes = pq_encode(emb, codebooks, m, id_col, vec_col)
    qsv = subvectors(emb.filter(F.col(id_col) == query_id), m, id_col, vec_col)
    lut = (
        codebooks.join(F.broadcast(qsv.select("sub", F.col("v").alias("qv"))), "sub")
        .select(
            "sub",
            F.col("centroid_id").alias("code"),
            l2sq_rounded(F.col("qv"), F.col("cv")).alias("d"),
        )
    )
    return (
        codes.filter(F.col(id_col) != query_id)
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )
