"""Unit tests for the ER operators: connected components against a
brute-force closure, LSH recall/precision against the exact join on a
clustered synthetic fixture, and mapping application semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators.connected_components import (
    connected_components,
)
from advanced_technologies_of_china_graph_database_construction_spark.operators.er import (
    apply_mapping,
    canonical_mapping,
    exact_similarity_pairs,
    lsh_similarity_pairs,
)


def _cc_bruteforce(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_chain_and_clusters(spark):
    # chain 0-1-2-3-4 (tests multi-round convergence), triangle, isolated pair
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    nodes = {n for e in edges for n in e}
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _cc_bruteforce(edges, nodes)


def test_connected_components_random(spark):
    rng = np.random.RandomState(3)
    edges = [(int(rng.randint(0, 200)), int(rng.randint(0, 200))) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = {n for e in edges for n in e}
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _cc_bruteforce(edges, nodes)


@pytest.fixture(scope="module")
def clustered_emb(spark):
    # 40 clusters of 5 near-duplicate unit vectors (cos >= ~0.99 within)
    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for _ in range(40):
        center = rng.randn(32)
        center /= np.linalg.norm(center)
        for _ in range(5):
            v = center + 0.03 * rng.randn(32)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_vs_exact(clustered_emb):
    exact = {(r.src, r.dst) for r in exact_similarity_pairs(clustered_emb, 0.95).collect()}
    approx = {
        (r.src, r.dst)
        for r in lsh_similarity_pairs(clustered_emb, 0.95, n_planes=64, bands=16).collect()
    }
    assert approx <= exact, "LSH must have exact precision (candidates re-scored)"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_canonical_mapping_and_apply(spark, clustered_emb):
    pairs = exact_similarity_pairs(clustered_emb, 0.95)
    mapping = canonical_mapping(clustered_emb, pairs)
    # every id mapped; canonical is <= id (min representative)
    rows = mapping.collect()
    assert len(rows) == clustered_emb.count()
    assert all(r.canonical <= r.id for r in rows)
    # apply to a records table
    recs = spark.createDataFrame([(i, i) for i in range(0, 200, 7)], "rec long, kw long")
    out = apply_mapping(recs, mapping, "kw", "kw_canonical")
    m = {r.id: r.canonical for r in rows}
    for r in out.collect():
        assert r.kw_canonical == m.get(r.kw, r.kw)
