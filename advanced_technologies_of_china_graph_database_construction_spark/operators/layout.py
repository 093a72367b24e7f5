"""Data-layout operators: space-filling-curve clustering for
multi-dimensional scan locality.

The reference stores everything in Neo4j and has no columnar layout
problem; at 100 TB on parquet, LAYOUT is a first-class operator: a
table range-partitioned on one column prunes beautifully on that
column and not at all on any other.  Interleaving the bits of two
columns into one Z-order (Morton) key and range-partitioning on THAT
gives every file a small min/max envelope in BOTH dimensions, so the
engine's ordinary file-statistics pruning (min/max per row group)
serves range predicates on either column — the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain column
expressions.

Everything is JVM bit arithmetic (`shiftright`/`shiftleft`/bitwise
and/or folded over a fixed bit count) — no UDF, fully codegen-able,
and exactly reproducible in ANSI SQL, which is what makes the layout
audit gate-able against DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: result bit 2i is a's bit i, bit 2i+1 is b's bit i.
    Callers bucket their values into [0, 2^bits) first (the audit does
    ``% 2**bits``); 8 bits per dimension — 256×256 cells — is plenty to
    steer file-level clustering, since files are far coarser than
    cells.  The fold emits 2·bits constant-shift terms OR-ed together:
    pure JVM, whole-stage-codegen-friendly, no shuffle of its own.

    Operands are cast to long HERE, not left to callers: Spark's
    ``shiftleft`` on an INT column wraps the shift amount mod 32
    (measured on this build: ``shiftleft(intCol, 33) == intCol << 1``),
    so an un-cast int input with bits > 16 would silently fold high
    interleave bits onto low ones — wrong keys, wrong files, no
    error."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits={bits}; must be in [1, 31]")
    a, b = a.cast("long"), b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_write(df: DataFrame, a: str, b: str, path: str, n_files: int = 32,
                 bits: int = 8) -> None:
    """The layout application: cluster ``df`` into ``n_files`` parquet
    files by Z-key range.  ``repartitionByRange`` on the key gives each
    file a contiguous Z-range, hence a bounded min/max envelope in both
    dimensions; readers then prune files on either column's statistics.
    One shuffle — the same cost as any sorted write (plus one tiny
    min/max aggregate for the normalization below).

    Values are NORMALIZED into [0, 2^bits) from each column's observed
    min/max before interleaving (r12 review): feeding raw wide-range
    keys to ``zorder_key`` clusters on the LOW bits only — rows 5, 261,
    517 share a Z-key at bits=8 — so every file spans nearly the full
    raw domain and pruning never skips anything, the operator's entire
    purpose.  The scale division runs in float64: exactness is not a
    contract here (any monotone bucketing clusters correctly), only
    monotonicity is, and that holds for ranges within float64's 2^53
    integer window."""
    lo_a, hi_a, lo_b, hi_b = (
        df.agg(
            F.min(F.col(a).cast("long")),
            F.max(F.col(a).cast("long")),
            F.min(F.col(b).cast("long")),
            F.max(F.col(b).cast("long")),
        ).first()
    )

    def scaled(col: str, lo: int, hi: int):
        rng = max((hi or 0) - (lo or 0), 0) + 1
        return F.least(
            F.lit(2**bits - 1),
            F.floor(
                (F.col(col).cast("long") - F.lit(lo or 0))
                * F.lit(float(2**bits))
                / F.lit(float(rng))
            ),
        )

    z = zorder_key(scaled(a, lo_a, hi_a), scaled(b, lo_b, hi_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_layout_audit(df: DataFrame, a: str, b: str, bits: int = 8,
                        bucket_bits: int = 4) -> DataFrame:
    """Measure the locality a Z-order layout would give: assign each
    row its Z-key over (a % 2^bits, b % 2^bits), split the key space
    into 2^bucket_bits contiguous Z-ranges (stand-ins for files), and
    report each range's row count and min/max envelope in BOTH
    dimensions.  Under Z-order a bucket holding 1/2^k of the key space
    spans ~1/2^(k/2) of EACH dimension — the audit's min/max spreads
    are the file-statistics envelopes pruning would use, so shipping
    them makes the locality claim checkable numbers instead of prose.
    One aggregation; the key arithmetic is pure JVM expression."""
    # shiftright(z, 2*bits - bucket_bits) needs a non-negative shift:
    # Spark wraps negative shift amounts silently (same hazard as the
    # zorder_key bits guard), which would misbucket every row.
    if not 0 < bucket_bits <= 2 * bits:
        raise ValueError(
            f"bucket_bits={bucket_bits}; must be in [1, 2*bits={2 * bits}]"
        )
    mask = F.lit(2**bits - 1)
    av = F.col(a).cast("long").bitwiseAND(mask)
    bv = F.col(b).cast("long").bitwiseAND(mask)
    z = zorder_key(av, bv, bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits)
    return (
        df.select(
            bucket.alias("z_bucket"), av.alias("__a"), bv.alias("__b")
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__a").alias("a_min"),
            F.max("__a").alias("a_max"),
            F.min("__b").alias("b_min"),
            F.max("__b").alias("b_max"),
        )
    )
