"""Binned interval-overlap join — the batch range-join primitive.

Spark has no native inequality-join strategy: a raw
``l.start < r.end AND r.start < l.end`` join plans as a
BroadcastNestedLoopJoin (or a CartesianProduct once both sides outgrow
the broadcast threshold) and dies quadratically at scale.  The classic
fix — the same one commercial engines implement as "range join
optimization", and the 1-D analogue of the x01 spatial grid — is to
bin the coordinate axis: every interval lands in each bin it covers,
candidates meet through a plain equi-join on the bin id, and each
surviving pair is counted exactly once at a canonical bin.  Shuffle
volume tracks interval density per bin instead of |L|·|R|.

Reference parity: the reference has no interval analytics at all (its
event queries delegate to Neo4j 1-hop lookups); this face exists for
the north-star pipeline — concurrency/attribution analytics over event
windows (`e28`), resource-overlap audits, ad-impression × session
alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_width: int,
    start_col: str = "start",
    end_col: str = "end",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All pairs of HALF-OPEN intervals [start, end) that truly overlap:
    ``l.start < r.end AND r.start < l.end`` — touching endpoints
    (``l.end == r.start``) do NOT pair.  Output = every left column
    suffixed, every right column suffixed, plus ``overlap`` =
    ``least(ends) − greatest(starts)`` (always > 0, same integer unit
    as the inputs).

    Coordinates must be integers (epoch micros, epoch seconds, token
    positions — caller's choice of unit); integer arithmetic keeps the
    bin ids, the canonical-bin dedup, and the overlap length exact on
    any engine, with no float boundary class (the x01 lesson).

    Scale shape: each interval explodes to the bins it covers —
    ``floor(start/B) .. floor((end−1)/B)`` (half-open: an interval
    ending exactly on a bin edge does not enter the next bin), so an
    interval costs ``ceil(len/B)+1`` rows and a bin-sized equi-join
    replaces the nested loop.  A candidate pair meets in EVERY shared
    bin; it is kept only where ``bin == floor(greatest(starts)/B)`` —
    the first bin both cover, which exists for every overlapping pair
    and is unique — so no distinct-shuffle is spent on dedup.  Pick
    ``bin_width`` ≈ the typical interval length: most intervals then
    cover ≤ 2 bins while long outliers still join correctly (they just
    emit more candidate rows).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    ls, rs = suffixes

    def floordiv(x, b: int):
        # integer-exact floor division over the FULL int64 range:
        # (x − pmod(x, b)) is an exact multiple of b, so integer `div`
        # is exact, and pmod makes it floor (not truncate-toward-zero)
        # for negative coordinates too.  A double `/` here — even on
        # the exact multiple — misrounds once |x| ≥ 2^53 (the cast to
        # double can shift the quotient across an integer boundary and
        # silently re-bin an interval, dropping true pairs).
        return F.call_function("div", x - F.pmod(x, F.lit(b)), F.lit(b))

    def binned(df: DataFrame, suffix: str) -> DataFrame:
        cols = [F.col(c).alias(f"{c}{suffix}") for c in df.columns]
        s, e = F.col(start_col), F.col(end_col)
        bins = F.sequence(
            floordiv(s, bin_width), floordiv(e - F.lit(1), bin_width)
        )
        return df.filter(s < e).select(
            F.explode(bins).alias("__bin"), *cols
        )

    l = binned(left, ls)
    r = binned(right, rs)
    sl, el = F.col(f"{start_col}{ls}"), F.col(f"{end_col}{ls}")
    sr, er = F.col(f"{start_col}{rs}"), F.col(f"{end_col}{rs}")
    first_shared = floordiv(F.greatest(sl, sr), bin_width)
    return (
        l.join(r, "__bin")
        .filter((sl < er) & (sr < el) & (F.col("__bin") == first_shared))
        .select(
            *[f"{c}{ls}" for c in left.columns],
            *[f"{c}{rs}" for c in right.columns],
            (F.least(el, er) - F.greatest(sl, sr)).alias("overlap"),
        )
    )
