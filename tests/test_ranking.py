"""Unit tests for ranked retrieval (BM25 / tf-idf) and the kNN graph.

BM25 and tf-idf are checked against an independent pure-Python
reference over a tiny corpus; `knn_graph` is checked blocked-vs-
single-block (the blocking must be invisible in the result) and
against `brute_force_topk` on the fixture embeddings.
"""

from __future__ import annotations

import math

import pytest

from advanced_technologies_of_china_graph_database_construction_spark.operators.ranking import (
    bm25_topk,
    tfidf_top_terms,
)
from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (
    brute_force_topk,
    knn_graph,
)

from .conftest import SF_CORRECT

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "sparse vector retrieval with bm25 scoring"),
    (3, "dense vector retrieval with embeddings"),
    (4, "the dog sleeps"),
    (5, "retrieval retrieval retrieval vector"),
]


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _py_bm25(query: list[str], k1: float = 1.2, b: float = 0.75) -> dict[int, float]:
    toks = {d: _tokens(t) for d, t in DOCS}
    n = float(len(DOCS))
    avgdl = sum(len(ts) for ts in toks.values()) / n
    dfs = {q: float(sum(1 for ts in toks.values() if q in ts)) for q in query}
    out = {}
    for d, ts in toks.items():
        score = 0.0
        for q in query:
            tf = float(ts.count(q))
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl)
            )
        if score > 0:
            out[d] = round(score, 6)
    return out


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["vector", "dog"], k=10).collect()}
    assert got == pytest.approx(_py_bm25(["vector", "dog"]))


def test_bm25_rarer_term_outranks_common_term(spark):
    # "bm25" appears in one doc, "the" in three: the unique-term doc
    # must outrank every doc matched only via the common term.
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ["bm25", "the"], k=10).collect()
    assert rows[0]["doc_id"] == 2


def test_bm25_k_truncates_by_score(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    all_rows = bm25_topk(df, ["vector"], k=10).collect()
    top1 = bm25_topk(df, ["vector"], k=1).collect()
    assert len(top1) == 1
    assert top1[0] == all_rows[0]


def test_tfidf_matches_python_reference(spark):
    toks = {d: _tokens(t) for d, t in DOCS}
    n = float(len(DOCS))
    df_of = {}
    for ts in toks.values():
        for t in set(ts):
            df_of[t] = df_of.get(t, 0.0) + 1.0
    expect = {}
    for d, ts in toks.items():
        scored = sorted(
            ((round(ts.count(t) * math.log(n / df_of[t]), 6), t) for t in set(ts)),
            key=lambda p: (-p[0], p[1]),
        )
        expect[d] = [
            (t, s, i + 1) for i, (s, t) in enumerate(scored[:2]) if s > 0
        ]
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got: dict[int, list] = {d: [] for d, _ in DOCS}
    for r in tfidf_top_terms(df, top_n=2).collect():
        got[r["doc_id"]].append((r["term"], r["tfidf"], r["rank"]))
    for d in got:
        got[d].sort(key=lambda p: p[2])
        assert [t for t, _, _ in got[d]] == [t for t, _, _ in expect[d]], d
        assert [s for _, s, _ in got[d]] == pytest.approx([s for _, s, _ in expect[d]])


def test_knn_blocking_is_invisible(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").limit(120)
    one = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in knn_graph(emb, k=3, block_rows=4096, n_rows=120).collect()
    }
    many = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in knn_graph(emb, k=3, block_rows=17, n_rows=120).collect()
    }
    assert one == many
    assert len(one) == 120 * 3


def test_knn_agrees_with_brute_force(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    qids = [3, 77, 250]
    brute = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in brute_force_topk(emb, qids, k=5).collect()
    }
    graph = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in knn_graph(emb, k=5, block_rows=64).collect()
        if r["vec_id"] in qids
    }
    assert graph == brute


def test_bm25_empty_query_raises(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="query term"):
        bm25_topk(df, [], k=10)


def test_scalar_quantize_bounds_and_constant_dim(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (
        scalar_quantize,
    )

    rows = [
        (0, [0.0, 5.0, -1.0]),
        (1, [1.0, 5.0, 0.0]),
        (2, [2.0, 5.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["qvec"] for r in scalar_quantize(df).collect()}
    # min maps to -128, max to 127, constant dim (index 1) to 0
    assert got[0] == [-128, 0, -128]
    assert got[2] == [127, 0, 127]
    assert got[1] == [0, 0, 0]  # midpoint → round(0.5*255)=128 → 0


def test_quantized_ann_recall_against_exact(spark):
    """Quantized ranking is an approximation: at 256 levels over the
    64-dim fixture it must keep most of the exact top-10 (pinned at a
    conservative ≥6/10 per query) and be internally deterministic."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (
        quantized_topk,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = {
        q: {r["neighbor_id"] for r in brute_force_topk(emb, [q], k=10).collect()}
        for q in qids
    }
    quant = quantized_topk(emb, qids, k=10)
    got: dict[int, set] = {q: set() for q in qids}
    for r in quant.collect():
        got[r["query_id"]].add(r["neighbor_id"])
    for q in qids:
        assert len(got[q] & exact[q]) >= 6, (q, got[q], exact[q])
    again = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in quant.collect()}
    once = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in quantized_topk(emb, qids, k=10).collect()}
    assert again == once


def test_two_stage_full_overfetch_equals_brute_force(spark):
    """With k·overfetch ≥ N the first stage cannot drop a true
    neighbor, so the two-stage result must equal brute_force_topk
    exactly — rank for rank."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (
        brute_force_topk,
        two_stage_topk,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").limit(80)
    exact = sorted(map(tuple, brute_force_topk(emb, [0, 1, 2], k=5).collect()))
    two = sorted(map(tuple, two_stage_topk(emb, [0, 1, 2], k=5, overfetch=20).collect()))
    assert two == exact


def test_two_stage_rerank_orders_by_exact_cosine(spark):
    """The final ordering must come from the EXACT float score, not the
    quantized one: candidates the int8 stage ranks in one order must be
    re-sorted by rounded cosine in the output (rank strictly follows
    sim desc, neighbor_id asc within every query)."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (
        two_stage_topk,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    rows = two_stage_topk(emb, [0, 1], k=10, overfetch=4).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert rs == sorted(rs, key=lambda r: (-r["sim"], r["neighbor_id"])), q


def test_two_stage_served_index_equals_inline_build(spark):
    """The `quantized=` served-index seam (index built once offline,
    the production vector-store shape) must return EXACTLY the inline
    build-and-query result — same ranks, same rounded sims — since the
    pre-built frame is the same scalar_quantize output the inline path
    materializes per call."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import (
        scalar_quantize,
        two_stage_topk,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    qt = scalar_quantize(emb).localCheckpoint(eager=True)
    inline = sorted(map(tuple, two_stage_topk(emb, [0, 1, 2], k=10, overfetch=4).collect()))
    served = sorted(
        map(
            tuple,
            two_stage_topk(emb, [0, 1, 2], k=10, overfetch=4, quantized=qt).collect(),
        )
    )
    assert served == inline


def test_bm25_case_insensitive_terms_and_null_text_excluded(spark):
    """r12 review fixes: an uppercase query term must match the
    lowercased corpus (was a silent zero-match), and NULL-text rows are
    consistently excluded from both ranking and corpus stats."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.ranking import bm25_topk

    docs = spark.createDataFrame(
        [(1, "vector search engine"), (2, "graph engine"), (3, None)],
        "doc_id long, text string",
    )
    upper = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["Vector"], k=10).collect()}
    lower = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["vector"], k=10).collect()}
    assert upper == lower and set(upper) == {1}
    assert 3 not in upper
