"""Deterministic walk generation vs a python step-by-step reference —
divergence, truncation, and determinism cases the g40 fixture graph
can't isolate."""

from __future__ import annotations

import pytest

from advanced_technologies_of_china_graph_database_construction_spark.operators.walks import (
    HASH_MOD,
    KNUTH,
    STEP_PRIME,
    deterministic_walks,
)


def _py_hash(walk_id: int, node: int, cand: int, step: int) -> int:
    folded = (
        (walk_id % HASH_MOD) * 31
        + (node % HASH_MOD) * 17
        + (cand % HASH_MOD)
        + step * STEP_PRIME
    ) % HASH_MOD
    return folded * KNUTH % HASH_MOD


def _py_walks(edges, starts, n_steps):
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    rows = set()
    for w in starts:
        node = w
        rows.add((w, 0, node))
        for t in range(1, n_steps + 1):
            nbrs = adj.get(node)
            if not nbrs:
                break
            node = min(nbrs, key=lambda c: (_py_hash(w, node, c, t), c))
            rows.add((w, t, node))
    return rows


def _run(spark, edges, starts, n_steps):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in starts], "node long")
    got = deterministic_walks(e, s, n_steps=n_steps).collect()
    return {(r["walk_id"], r["step"], r["node"]) for r in got}


def test_matches_python_reference(spark):
    # dense-ish digraph incl. a cycle, a hub, and parallel choices
    edges = [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 1), (3, 4), (4, 1), (4, 5),
        (5, 2), (5, 3), (5, 4), (6, 1),
    ]
    starts = [1, 2, 5, 6]
    assert _run(spark, edges, starts, 5) == _py_walks(edges, starts, 5)


def test_walks_through_same_node_diverge(spark):
    """walk_id is part of the step hash: two walks standing on the same
    node at the same step must be ABLE to choose differently (here they
    do), otherwise the corpus collapses into one path per node."""
    edges = [(1, 10), (2, 10), (10, 20), (10, 21), (10, 22), (10, 23),
             (20, 1), (21, 1), (22, 1), (23, 1)]
    got = _run(spark, edges, [1, 2], 2)
    step2 = {w: n for w, t, n in got if t == 2}
    assert step2 == {w: n for w, t, n in _py_walks(edges, [1, 2], 2) if t == 2}
    assert step2[1] != step2[2]


def test_dead_end_truncates_visibly(spark):
    edges = [(1, 2), (2, 3)]  # 3 has no out-edge
    got = _run(spark, edges, [1, 3], 5)
    assert got == {(1, 0, 1), (1, 1, 2), (1, 2, 3), (3, 0, 3)}


def test_rerun_and_partitioning_identical(spark):
    edges = [(i, (i * 7) % 50) for i in range(50)] + [(i, (i * 11) % 50) for i in range(50)]
    edges = [(s, d) for s, d in edges if s != d]
    starts = list(range(0, 50, 5))
    a = _run(spark, edges, starts, 4)
    e = spark.createDataFrame(edges, "src long, dst long").repartition(13, "dst")
    s = spark.createDataFrame([(x,) for x in starts], "node long").repartition(3)
    b = {
        (r["walk_id"], r["step"], r["node"])
        for r in deterministic_walks(e, s, n_steps=4).collect()
    }
    assert a == b


def test_validation(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        deterministic_walks(e, s, n_steps=0)
