"""Vector column functions — JVM-side (whole-stage-codegen'd) dense
vector math over ``array<float>``/``array<double>`` columns.

The reference's only vector compute is SentenceTransformer embeddings fed
to cosine-metric clustering (`keyword_merger.py:183-197`).  Here cosine /
dot / norm are built from ``zip_with`` + ``aggregate`` so the hot path
never leaves the JVM; the pandas-UDF path is reserved for model inference
(see operators/er.py LSH signatures).

All math is done in double (arrays cast first): float accumulation is
not associative enough to compare across engines, and the DuckDB oracle
computes in double as well.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded before any threshold comparison — makes boundary
    decisions reproducible across engines (double differences live at
    ~1e-15; rounding at 1e-6 is 9 orders of magnitude of margin)."""
    return F.round(cosine(a, b), digits)
