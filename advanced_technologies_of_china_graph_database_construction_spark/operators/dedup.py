"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):
- exact dedup is a hash-groupBy on a digest column — one shuffle on the
  digest, map-side partial aggregation;
- MinHash candidates come from an equi-join on (permutation, minhash)
  within a blocking key, so shuffle volume tracks collisions, not n²;
- SimHash pairs equi-join on the signature band, then verify Hamming
  distance JVM-side (xor + bit_count);
- n-gram Jaccard joins on exploded shingles within a block and never
  materializes the full pair matrix.

All hash arithmetic is integer-only and defined character-wise (ascii
polynomials + Knuth multiplicative spreading), so an external ANSI-SQL
engine (the DuckDB oracle) reproduces every signature bit-for-bit —
no reliance on engine-internal hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- shared shingle / hash primitives -------------------------------------

MINHASH_PRIME = 1_048_573  # < 2^20; a*h+b stays well inside int64
N_PERMS = 16
# deterministic permutation parameters (k, a, b)
PERMS = [(k, 2 * k + 3, 7 * k + 11) for k in range(N_PERMS)]

KNUTH = 2_654_435_761  # multiplicative spreading for simhash bits
SIMHASH_BITS = 24


def char_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle_hash) — distinct character n-gram hashes.

    The shingle hash is a base-256 ascii polynomial of the n characters:
    portable integer arithmetic, no engine hash function involved.
    """
    shingle_expr = f"""
      CASE WHEN length({text_col}) >= {n}
           THEN transform(sequence(1, length({text_col}) - {n - 1}),
                          i -> substr({text_col}, i, {n}))
           ELSE array() END
    """
    hash_expr = " + ".join(f"ascii(substr(sh, {i + 1}, 1)) * {256 ** (n - 1 - i)}" for i in range(n))
    return (
        df.select("doc_id", F.expr(shingle_expr).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("sh"))
        .select("doc_id", F.expr(hash_expr).alias("shingle_hash"))
        .distinct()
    )


# --- exact dedup (hash-groupBy) -------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_docs,
    min_doc_id) for groups with ≥ 2 members (D1-family, distributed)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") >= 2)
    )


# --- MinHash --------------------------------------------------------------

def minhash_signatures(shingles: DataFrame, spark=None) -> DataFrame:
    """(doc_id, k, minhash): min over shingles of (a_k*h + b_k) mod P."""
    session = spark or shingles.sparkSession
    perms = session.createDataFrame(PERMS, "k int, a long, b long")
    return (
        shingles.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "k")
        .agg(F.min((F.col("a") * F.col("shingle_hash") + F.col("b")) % MINHASH_PRIME).alias("minhash"))
    )


def minhash_near_dups(
    df: DataFrame, text_col: str = "text", block_col: str = "source", min_matching: int = 8
) -> DataFrame:
    """Near-duplicate pairs: docs in the same block agreeing on ≥
    ``min_matching`` of the 16 minhashes (integer threshold — no float
    boundary).  Returns (src, dst, n_matching)."""
    sh = char_shingles(df, text_col)
    sig = minhash_signatures(sh).join(df.select("doc_id", block_col), "doc_id")
    a = sig.select(
        F.col("doc_id").alias("src"), "k", "minhash", F.col(block_col).alias("blk")
    )
    b = sig.select(
        F.col("doc_id").alias("dst"), F.col("k").alias("k2"), F.col("minhash").alias("mh2"),
        F.col(block_col).alias("blk2"),
    )
    matches = a.join(
        b,
        (F.col("k") == F.col("k2"))
        & (F.col("minhash") == F.col("mh2"))
        & (F.col("blk") == F.col("blk2"))
        & (F.col("src") < F.col("dst")),
    )
    return (
        matches.groupBy("src", "dst")
        .agg(F.count("*").alias("n_matching"))
        .filter(F.col("n_matching") >= min_matching)
    )


# --- SimHash --------------------------------------------------------------

def _token_hash_expr(tok: str = "tok") -> str:
    """31-polynomial over the first 4 chars (space-padded) + length,
    spread with the Knuth multiplier, truncated to SIMHASH_BITS."""
    padded = f"rpad({tok}, 4, ' ')"
    poly = f"((ascii(substr({padded},1,1)) * 31 + ascii(substr({padded},2,1))) * 31 + ascii(substr({padded},3,1))) * 31 + ascii(substr({padded},4,1))"
    # reduce mod 2^16 BEFORE the Knuth multiply so the product stays far
    # inside int64 on every engine (no silent overflow divergence)
    return f"(({poly}) * 31 + length({tok})) % 65536 * {KNUTH} % {2 ** SIMHASH_BITS}"


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): classic bit-voting simhash over whitespace
    tokens; SIMHASH_BITS bits; tie (sum == 0) votes 0."""
    session = df.sparkSession
    bits = session.createDataFrame([(j,) for j in range(SIMHASH_BITS)], "j int")
    toks = df.select(
        "doc_id", F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn("th", F.expr(_token_hash_expr()))
    votes = (
        toks.crossJoin(F.broadcast(bits))
        .withColumn("bit", F.expr("shiftright(th, j) & 1"))
        .groupBy("doc_id", "j")
        .agg(F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1)).alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN v > 0 THEN shiftleft(1L, j) ELSE 0L END")).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", block_col: str = "source", max_hamming: int = 3
) -> DataFrame:
    """(src, dst, hamming) pairs within a block with Hamming distance ≤
    ``max_hamming`` on the simhash."""
    sig = simhash_signatures(df, text_col).join(df.select("doc_id", block_col), "doc_id")
    a = sig.select(F.col("doc_id").alias("src"), F.col("simhash").alias("h1"), F.col(block_col).alias("blk"))
    b = sig.select(F.col("doc_id").alias("dst"), F.col("simhash").alias("h2"), F.col(block_col).alias("blk2"))
    pairs = a.join(b, (F.col("blk") == F.col("blk2")) & (F.col("src") < F.col("dst")))
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return pairs.select("src", "dst", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- n-gram Jaccard -------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", block_col: str = "source", threshold: float = 0.5
) -> DataFrame:
    """(src, dst, jaccard) for same-block pairs with true 3-gram-set
    Jaccard ≥ threshold.  Intersections come from a shingle equi-join —
    the full pair matrix is never built."""
    sh = char_shingles(df, text_col).join(df.select("doc_id", block_col), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("src"), "shingle_hash", F.col(block_col).alias("blk"))
    b = sh.select(F.col("doc_id").alias("dst"), F.col("shingle_hash").alias("h2"), F.col(block_col).alias("blk2"))
    inter = (
        a.join(
            b,
            (F.col("shingle_hash") == F.col("h2"))
            & (F.col("blk") == F.col("blk2"))
            & (F.col("src") < F.col("dst")),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("src"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("dst"), F.col("sz").alias("sz_b"))
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        6,
    )
    return (
        inter.join(sa, "src")
        .join(sb, "dst")
        .select("src", "dst", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
