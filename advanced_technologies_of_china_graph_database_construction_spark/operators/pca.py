"""Distributed PCA: one-pass Gram accumulation, driver eigensolve.

The whitening/decorrelation prep step of an embedding pipeline (and the
textbook reduction for IVF/PQ preconditioning).  The distributed part
is the only part that touches data: each partition folds its rows into
(count, column-sum, X^T X) with vectorized numpy — a d×d partial per
PARTITION, independent of row count — and the driver sums the ≤
num-partitions partials and eigensolves the d×d covariance (d is the
embedding width: tiny).  This is the standard scale shape for second
moments: shipping d² doubles per partition beats both a d²-expression
codegen aggregate (2 080 exprs at d=64 — compiles, but each row pays
interpreted-expression dispatch) and any per-row shuffle.

Sign convention: the returned eigenvector's first nonzero component is
positive, so results are deterministic (eigh returns ±v arbitrarily).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def gram_stats(vecs: DataFrame, vec_col: str = "embedding"):
    """(n, mean, cov): row count, mean vector, population covariance of
    an array column, via per-partition numpy partials (module
    docstring).  The ``collect`` is bounded by the partition count —
    one (1 + d + d²)-double row each — not by |rows|."""
    # NULL vectors are in-contract degenerate inputs (the cosine paths
    # treat them as expected) — filter them here rather than letting a
    # mixed batch crash np.asarray or an all-NULL batch smear NaN into
    # the Gram fold (r12 review); the probe also must not give up just
    # because the FIRST row happens to be NULL.
    vecs = vecs.filter(F.col(vec_col).isNotNull())
    head = vecs.select(vec_col).first()
    if head is None:
        raise ValueError("gram_stats needs at least one non-null vector")
    d = len(head[0])

    def part(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = vecs.select(vec_col).mapInPandas(
        part, "n long, s array<double>, g array<double>"
    ).collect()
    n = sum(r["n"] for r in rows)  # ≥ 1: the head probe above proved a row exists
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def pca_top_component(vecs: DataFrame, vec_col: str = "embedding"):
    """(n, cov, eigval, eigvec): covariance facts plus the top principal
    component, sign-fixed for determinism."""
    n, _mean, cov = gram_stats(vecs, vec_col)
    vals, vecs_ = np.linalg.eigh(cov)
    lam, v = float(vals[-1]), vecs_[:, -1]
    nz = np.nonzero(v)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return n, cov, lam, v


def project_scores(vecs: DataFrame, v: np.ndarray, vec_col: str = "embedding"):
    """x·v per row, JVM-side (deterministic fold — no Python in the
    projection path; variance of the score is shift-invariant, so the
    raw dot equals the centered projection's variance)."""
    from pyspark.sql import functions as F

    lit_v = F.array(*[F.lit(float(c)) for c in v])
    return vecs.select(V.dot(F.col(vec_col), lit_v).alias("score"))
