"""Data-selection operators — importance-resampling weights for
training-data curation (DSIR: Xie et al., "Data Selection for Language
Models via Importance Resampling", NeurIPS 2023).

Beyond-reference surface: the reference curates its corpus by manual
domain export (one TXT dump per 技术 domain, `Hype.py:64-70`); at
100 TB the equivalent is *scored* selection — rank raw documents by how
target-like their hashed n-gram distribution is and keep the top mass.

Scale shape (the whole point of the hashed-feature trick):
- The feature space is a FIXED number of buckets (``n_buckets``), so
  both distribution estimates collapse to one tiny aggregate each
  (map-side combined; the shuffle carries ≤ n_buckets rows).
- The per-bucket log-ratio table is broadcast; scoring a document is a
  map-side explode → broadcast-join → per-doc sum (one shuffle keyed by
  doc_id, partial-aggregated).  Nothing quadratic, nothing collected.
- All hashing is the repo's portable char-polynomial (dedup.py:13-16
  convention): integer-only, engine-independent, oracle-reproducible —
  no reliance on Spark's xxhash64 or DuckDB's hash().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Char-polynomial modulus / multiplier (same constants family as
# dedup.py's shingle hash; MOD is a Mersenne prime so the residue is
# well-spread) and the bigram mixing multiplier (Knuth's 2^32/phi).
HASH_MOD = 2_147_483_647
HASH_MULT = 31
KNUTH = 2_654_435_761


def charpoly_hash(word: Column) -> Column:
    """Portable per-word hash: base-31 codepoint polynomial mod
    2^31-1, identical arithmetic in Spark and ANSI SQL (DuckDB:
    ``list_reduce(list_transform(string_split(w, ''), c -> ord(c)),
    (a, b) -> (a*31+b) % 2147483647)``).  Pure JVM expression —
    whole-stage codegen, no UDF."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_MULT + F.ascii(c)) % HASH_MOD,
    )


def _doc_features(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, bucket) with one row PER OCCURRENCE of a hashed
    unigram or bigram feature — DSIR counts occurrences, not distinct
    features.  The explode and hash are map-side; no shuffle here."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != F.lit(""))
    d = docs.select("doc_id", toks.alias("toks"))
    uni = d.select("doc_id", F.explode("toks").alias("w")).select(
        "doc_id", (charpoly_hash(F.col("w")) % n_buckets).alias("bucket")
    )
    # bigram bucket = (h(a)*KNUTH + h(b)) % n_buckets: mixes the pair
    # without hashing the concatenated string (h < 2^31 so the product
    # stays inside int64)
    bi = (
        d.select(
            "doc_id",
            F.transform("toks", charpoly_hash).alias("hs"),
        )
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("hs", 1, F.greatest(F.size("hs") - 1, F.lit(0))),
                    F.slice("hs", 2, F.greatest(F.size("hs") - 1, F.lit(0))),
                    lambda a, b: (a * KNUTH + b) % n_buckets,
                )
            ).alias("bucket"),
        )
    )
    return uni.unionByName(bi)


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    n_buckets: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, n_feats, weight): per-document DSIR importance weight
    ``sum over feature occurrences of ln(p_target(b) / p_raw(b))``,
    with add-one-smoothed bucket distributions (target = rows where
    ``is_target``; raw = every row).  Higher weight = more target-like;
    callers keep the top mass (the d43 spec takes top-50).

    Plan: two ≤n_buckets-row aggregates (map-side combined), a
    broadcast of the joint log-ratio table, then explode → broadcast
    join → one doc_id-keyed sum.  The weight is rounded AFTER the sum
    (single rounding point, d25/d26 convention).
    """
    feats = _doc_features(docs, text_col, n_buckets).localCheckpoint(eager=True)
    target_ids = docs.filter(is_target).select("doc_id")
    raw_counts = feats.groupBy("bucket").agg(F.count("*").alias("c_raw"))
    tgt_counts = (
        feats.join(F.broadcast(target_ids), "doc_id")
        .groupBy("bucket")
        .agg(F.count("*").alias("c_tgt"))
    )
    # add-one smoothing over the FULL bucket range so absent buckets
    # still carry probability mass; totals are driver scalars (bounded:
    # two counts)
    tot_raw = feats.count()
    tot_tgt = feats.join(F.broadcast(target_ids), "doc_id").count()
    ratios = (
        raw_counts.join(tgt_counts, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("c_tgt", F.lit(0)) + F.lit(1.0))
                    / F.lit(float(tot_tgt + n_buckets))
                )
                - F.log((F.col("c_raw") + F.lit(1.0)) / F.lit(float(tot_raw + n_buckets)))
            ).alias("log_ratio"),
        )
    )
    return (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("log_ratio"), round_digits).alias("weight"),
        )
    )
