"""Product quantization: subvector split, joint-subspace training,
encoding, and the ADC identity (ADC distance == exact distance to the
reconstructed vector, up to the per-subspace rounding)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators import pq

from .conftest import SF_CORRECT


def _toy(spark, n=40, d=8, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.rand(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_subvectors_partition_the_vector(spark):
    emb = _toy(spark, n=3, d=8)
    sv = pq.subvectors(emb, m=4).collect()
    by_id = {}
    for r in sv:
        by_id.setdefault(r["vec_id"], {})[r["sub"]] = r["v"]
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, subs in by_id.items():
        assert sorted(subs) == [0, 1, 2, 3]
        flat = [x for s in sorted(subs) for x in subs[s]]
        assert flat == orig[vid]
    with pytest.raises(ValueError):
        pq.subvectors(emb, m=0)


def test_pq_codes_are_valid_and_deterministic(spark):
    emb = _toy(spark)
    books = pq.pq_train(emb, m=2, k=4, iters=2)
    codes1 = sorted(map(tuple, pq.pq_encode(emb, books, m=2).collect()))
    codes2 = sorted(map(tuple, pq.pq_encode(emb, books, m=2).collect()))
    assert codes1 == codes2
    valid = {(r["sub"], r["centroid_id"]) for r in books.collect()}
    assert all((s, c) in valid for _, s, c in codes1)
    assert len(codes1) == 40 * 2  # one code per (vector, subspace)


def test_pq_train_seeds_from_k_smallest_ids_on_sparse_id_space(spark):
    """The init contract is the k SMALLEST vec_ids, not ids < k: a
    non-contiguous id space (here 100, 107, ...) must still yield k full
    codebooks per subspace — and identical codebooks to the same data
    relabelled 0..n-1 — instead of silently training zero codewords
    (r6 review finding)."""
    rng = np.random.RandomState(7)
    vecs = [[float(x) for x in rng.rand(8)] for _ in range(20)]
    dense = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    sparse = spark.createDataFrame(
        [(100 + 7 * i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    books_d = sorted(
        (r["sub"], r["centroid_id"], tuple(r["cv"]))
        for r in pq.pq_train(dense, m=2, k=4, iters=2).collect()
    )
    books_s = sorted(
        (r["sub"], r["centroid_id"], tuple(r["cv"]))
        for r in pq.pq_train(sparse, m=2, k=4, iters=2).collect()
    )
    assert books_s == books_d
    assert len({(s, c) for s, c, _ in books_s}) == 2 * 4  # m*k full codebooks


def test_pq_train_raises_on_fewer_than_k_vectors(spark):
    emb = _toy(spark, n=3, d=8)
    with pytest.raises(ValueError, match="distinct"):
        pq.pq_train(emb, m=2, k=4, iters=1)


def test_adc_distance_equals_distance_to_reconstruction(spark):
    """The ADC identity: summed per-subspace lookup distances equal the
    exact squared L2 between the query and each candidate's RECONSTRUCTED
    (decoded) vector — subspaces are an orthogonal decomposition."""
    emb = _toy(spark, n=30, d=8)
    m, k, iters = 2, 4, 2
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq.pq_adc_topk(emb, 0, m, k, iters, topk=29).collect()
    }
    books = {(r["sub"], r["centroid_id"]): np.array(r["cv"])
             for r in pq.pq_train(emb, m, k, iters).collect()}
    codes = {}
    for r in pq.pq_encode(emb, pq.pq_train(emb, m, k, iters), m).collect():
        codes.setdefault(r["vec_id"], {})[r["sub"]] = r["code"]
    q = np.array(emb.filter("vec_id = 0").first()["embedding"])
    sub_len = len(q) // m
    for vid, dist in got.items():
        recon = np.concatenate([books[(s, codes[vid][s])] for s in range(m)])
        want = sum(
            round(float(np.sum((q[s * sub_len:(s + 1) * sub_len]
                                - recon[s * sub_len:(s + 1) * sub_len]) ** 2)), 6)
            for s in range(m)
        )
        assert abs(dist - round(want, 6)) < 2e-6, (vid, dist, want)


def test_pq_topk_excludes_query_and_orders_by_distance(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table

    emb = load_table(spark, SF_CORRECT, "embeddings")
    top = pq.pq_adc_topk(emb, 0, m=2, k=4, iters=1, topk=5).collect()
    assert len(top) == 5
    assert all(r["vec_id"] != 0 for r in top)
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)
