"""Vector column functions — JVM-side (whole-stage-codegen'd) dense
vector math over ``array<float>``/``array<double>`` columns.

The reference's only vector compute is SentenceTransformer embeddings fed
to cosine-metric clustering (`keyword_merger.py:183-197`).  Here cosine /
dot / norm are built from ``zip_with`` + ``aggregate`` — right for
few-row paths (no Python round-trip) but interpreted per element, so
bulk pair scoring uses :func:`arrow_cosine_rounded` (one einsum per
Arrow batch, same arithmetic and rounding).

All math is done in double (arrays cast first): float accumulation is
not associative enough to compare across engines, and the DuckDB oracle
computes in double as well.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL instead of crashing the
    # job under ANSI mode (Spark 4 default) — the same convention as the
    # Arrow kernel, so degenerate rows are filtered, not ranked or fatal.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded before any threshold comparison — makes boundary
    decisions reproducible across engines (double differences live at
    ~1e-15; rounding at 1e-6 is 9 orders of magnitude of margin)."""
    return F.round(cosine(a, b), digits)


def arrow_cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Arrow-batched cosine with HALF_UP rounding — the bulk-scoring
    twin of :func:`cosine_rounded`.

    Spark's higher-order functions are interpreted (no whole-stage
    codegen), so scoring many pairs through the `aggregate` fold costs
    an interpreted O(d) loop per pair; this kernel does the same
    double-precision dot/(‖a‖·‖b‖) arithmetic as one vectorized einsum
    per Arrow batch.  Same rounding rule as the exact GEMM and the SQL
    oracle, so threshold/ranking decisions agree.  Use the JVM
    expression for a handful of rows (no Python round-trip); use this
    when the pair count is the workload.
    """
    scale = 10.0 ** digits

    @F.pandas_udf(T.DoubleType())
    def cos_batch(av: pd.Series, bv: pd.Series) -> pd.Series:
        # Degenerate inputs must match the JVM expression: a NULL array
        # or zero-norm vector yields NULL (Spark's divide-by-zero →
        # NULL), never NaN — NaN sorts ABOVE every double in descending
        # windows, which would rank garbage neighbors first.
        a_list, b_list = av.tolist(), bv.tolist()
        valid = [
            i for i, (x, y) in enumerate(zip(a_list, b_list))
            if x is not None and y is not None and len(x) == len(y)
        ]
        # length-mismatched pairs are NULL, matching the JVM twin
        # (zip_with null-pads the shorter side, the fold yields NULL) —
        # np.stack on a ragged batch would otherwise kill the task
        # (r12 review)
        out = np.full(len(a_list), np.nan)
        from itertools import groupby

        # one vectorized pass per distinct pair length (normally one):
        # a batch mixing vector widths must not crash np.stack
        for _, grp in groupby(
            sorted(valid, key=lambda i: len(a_list[i])), key=lambda i: len(a_list[i])
        ):
            idx = list(grp)
            ma = np.stack([a_list[i] for i in idx]).astype(np.float64)
            mb = np.stack([b_list[i] for i in idx]).astype(np.float64)
            num = np.einsum("ij,ij->i", ma, mb)
            den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                scaled = num / den * scale
            out[idx] = (
                np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5))
                / scale
            )
        res = pd.Series(out, dtype="Float64")
        res[~np.isfinite(out)] = pd.NA
        return res

    return cos_batch(a, b)
