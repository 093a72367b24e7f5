"""As-of join: enrich each left row with the most recent right row.

The reference has no as-of operator (SURVEY.md §2.5 — its joins are all
equi-joins), but a time-series engine needs one, and Spark lacks it as a
built-in.  This is the classic composition route (SURVEY §2.11 custom-
operator rule (a)): express it with existing DataFrame ops rather than a
Python UDF.

Why not an inequality join?  ``l JOIN r ON key AND r.ts <= l.ts`` then
keep-latest materializes |L_k| x |R_k| rows per key before pruning — at
100 TB with hot keys that intermediate is the whole job.  Instead:

1. tag left and right rows and union them (narrow, no shuffle),
2. ONE hash shuffle on the join key,
3. per-key sort by (ts, side, tiebreak); ``last(payload, ignorenulls)``
   over an unbounded-preceding running window forward-fills the latest
   right payload into every left row,
4. filter back to left rows.

Cost is the same single shuffle + sort a regular sort-merge join would
pay, output never exceeds |L| + |R| rows at any point, and Spark's
external sort spills per partition, so a skewed key degrades to disk
sort instead of a row explosion.  This is how stream processors
(Flink's temporal join) evaluate the operator.

Determinism: right rows sort before left rows at equal timestamps (the
match is inclusive), and ties among right rows are broken by ``tiebreak``
ascending, so the surviving payload is the max-(ts, tiebreak) right row
— a total order both engines can agree on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_TB = "__asof_tb"
_PAYLOAD = "__asof_payload"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance: str | Column | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the ``right_cols`` of the
    latest right row with ``right_ts <= left_ts`` on the same ``on`` keys
    (left outer — unmatched left rows keep nulls).

    ``right_cols`` must not collide with left column names (pre-alias the
    right side).  ``tiebreak`` orders right rows that share a timestamp
    (largest wins).  With ``tiebreak=None`` the payload struct itself is
    the tiebreak (field-wise comparison, largest wins) — a constant
    would leave two right rows sharing (key, ts) in a nondeterministic
    order, so the surviving payload could differ per run/partitioning
    (the r12 review find); payloads containing unorderable types (maps)
    need an explicit ``tiebreak``.  ``tolerance`` (an INTERVAL literal
    string, e.g. ``"30 minutes"``) rejects matches older than
    ``left_ts - tolerance``.
    """
    on = list(on)
    right_cols = list(right_cols)
    payload_cols = right_cols if right_ts in right_cols else [right_ts, *right_cols]
    tb = (
        F.col(tiebreak)
        if tiebreak
        else F.struct(*[F.col(c) for c in payload_cols])
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tb.alias(_TB),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    l = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(_TB, F.lit(None).cast(r.schema[_TB].dataType))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(_MATCH, F.last(_PAYLOAD, ignorenulls=True).over(w)).filter(
        F.col(_SIDE) == 1
    )
    if tolerance is not None:
        interval = F.expr(f"INTERVAL {tolerance}") if isinstance(tolerance, str) else tolerance
        out = out.withColumn(
            _MATCH,
            F.when(
                F.col(f"{_MATCH}.{right_ts}") >= F.col(left_ts) - interval, F.col(_MATCH)
            ),
        )
    for c in right_cols:
        out = out.withColumn(c, F.col(f"{_MATCH}.{c}"))
    return out.drop(_TS, _SIDE, _TB, _PAYLOAD, _MATCH)
