"""DSIR importance weights (operators/selection.py) — hash parity with
a pure-Python reference, exact weight recomputation on a small corpus,
and the selection-direction sanity the method exists for."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
    HASH_MOD,
    HASH_MULT,
    KNUTH,
    charpoly_hash,
    dsir_importance_weights,
)


def py_charpoly(word: str) -> int:
    acc = 0
    for ch in word:
        acc = (acc * HASH_MULT + ord(ch)) % HASH_MOD
    return acc


def py_features(text: str, n_buckets: int) -> list[int]:
    toks = [t for t in text.lower().strip().split() if t]
    hs = [py_charpoly(t) for t in toks]
    uni = [h % n_buckets for h in hs]
    bi = [(a * KNUTH + b) % n_buckets for a, b in zip(hs, hs[1:])]
    return uni + bi


def py_weights(rows: list[tuple[int, str, bool]], n_buckets: int) -> dict[int, float]:
    feats = {d: py_features(t, n_buckets) for d, t, _ in rows}
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for d, _, is_t in rows:
        for b in feats[d]:
            raw[b] = raw.get(b, 0) + 1
            if is_t:
                tgt[b] = tgt.get(b, 0) + 1
    tot_raw = sum(raw.values())
    tot_tgt = sum(tgt.values())
    out = {}
    for d, _, _ in rows:
        if not feats[d]:
            continue
        out[d] = round(
            sum(
                math.log((tgt.get(b, 0) + 1.0) / (tot_tgt + n_buckets))
                - math.log((raw[b] + 1.0) / (tot_raw + n_buckets))
                for b in feats[d]
            ),
            6,
        )
    return out


def test_charpoly_hash_matches_python(spark):
    words = ["a", "abc", "spark", "deduplication", "x" * 40, "Mixed", "中文"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r["w"]: r["h"] for r in df.select("w", charpoly_hash(F.col("w")).alias("h")).collect()}
    assert got == {w: py_charpoly(w) for w in words}


ROWS = [
    (1, "alpha beta alpha gamma", True),
    (2, "alpha beta delta", True),
    (3, "omega psi chi omega omega", False),
    (4, "beta omega alpha psi", False),
    (5, "alpha beta alpha beta", False),
    (6, "", False),
]


def test_weights_match_python_reference(spark):
    docs = spark.createDataFrame(
        [(d, t, l) for d, t, l in ROWS], ["doc_id", "text", "is_t"]
    )
    out = dsir_importance_weights(docs, F.col("is_t"), n_buckets=64)
    got = {r["doc_id"]: (r["n_feats"], r["weight"]) for r in out.collect()}
    exp = py_weights(ROWS, 64)
    assert set(got) == set(exp)  # the empty doc yields no features, no row
    for d, w in exp.items():
        n = len(py_features(dict((r[0], r[1]) for r in ROWS)[d], 64))
        assert got[d] == (n, w), (d, got[d], (n, w))


def test_target_like_scores_above_raw_like(spark):
    docs = spark.createDataFrame(
        [(d, t, l) for d, t, l in ROWS], ["doc_id", "text", "is_t"]
    )
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance_weights(docs, F.col("is_t"), n_buckets=64).collect()
    }
    # doc 5 shares the target docs' vocabulary, doc 3 shares none: the
    # importance weight must rank 5 above 3 (the resampling direction)
    assert got[5] > got[3]
