"""operators/pca vs a direct numpy reference on small exact data."""

from __future__ import annotations

import numpy as np
import pytest

from advanced_technologies_of_china_graph_database_construction_spark.operators.pca import (
    gram_stats,
    pca_top_component,
    project_scores,
)

RNG_ROWS = [
    [1.0, 0.0, 0.0],
    [2.0, 1.0, -1.0],
    [3.0, 4.0, 0.5],
    [0.0, 2.0, 2.0],
    [-1.0, -2.0, 1.5],
    [4.0, 0.5, -0.5],
]


def _df(spark, rows=RNG_ROWS):
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "vec_id long, embedding array<double>"
    ).repartition(3)  # force multiple per-partition partials


def test_gram_stats_matches_numpy(spark):
    n, mean, cov = gram_stats(_df(spark))
    x = np.asarray(RNG_ROWS)
    assert n == len(RNG_ROWS)
    assert np.allclose(mean, x.mean(axis=0))
    assert np.allclose(cov, np.cov(x, rowvar=False, bias=True))


def test_top_component_matches_numpy_and_sign_fixed(spark):
    n, cov, lam, v = pca_top_component(_df(spark))
    x = np.asarray(RNG_ROWS)
    ref = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(ref)
    assert lam == pytest.approx(vals[-1])
    ref_v = vecs[:, -1]
    if ref_v[np.nonzero(ref_v)[0][0]] < 0:
        ref_v = -ref_v
    assert np.allclose(v, ref_v)
    assert v[np.nonzero(v)[0][0]] > 0  # deterministic sign convention


def test_projection_variance_is_lambda1(spark):
    df = _df(spark)
    _n, _cov, lam, v = pca_top_component(df)
    scores = np.array([r.score for r in project_scores(df, v).collect()])
    assert scores.var() == pytest.approx(lam, rel=1e-9)


def test_gram_stats_rejects_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least one non-null vector"):
        gram_stats(empty)


def test_gram_stats_tolerates_null_vectors(spark):
    """r12 review fix: a NULL embedding row crashed np.asarray (or an
    all-NULL batch smeared NaN into the Gram fold), and a NULL FIRST
    row failed the probe even with data behind it.  NULLs are filtered;
    stats must equal the null-free computation."""
    import numpy as np

    from advanced_technologies_of_china_graph_database_construction_spark.operators.pca import gram_stats

    rows = [(None,), ([1.0, 2.0],), ([3.0, 4.0],), (None,), ([5.0, 6.0],)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    n, mean, cov = gram_stats(df)
    assert n == 3
    x = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    assert np.allclose(mean, x.mean(axis=0))
    assert np.allclose(cov, (x.T @ x) / 3 - np.outer(x.mean(axis=0), x.mean(axis=0)))
    import pytest as _pytest

    empty = spark.createDataFrame([(None,)], "embedding array<double>")
    with _pytest.raises(ValueError, match="non-null"):
        gram_stats(empty)
