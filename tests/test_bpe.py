"""BPE merge induction vs a pure-Python reference implementation.

The operator's gate is rows-only (iterative argmax is not
SQL-expressible), so THIS file is its hard verification: the
distributed induction must reproduce the classic single-process BPE
algorithm merge-for-merge (including frequency ties broken
lexicographically), and the encode face must replay the merges
identically.
"""

from __future__ import annotations

from collections import Counter

import pytest

from advanced_technologies_of_china_graph_database_construction_spark.operators.bpe import (
    bpe_encode,
    bpe_merges,
)

from .conftest import SF_CORRECT

DOCS = [
    (0, "low low low lower lower newest newest newest newest widest"),
    (1, "widest widest newest low lowest"),
    (2, "new new newer newer widest"),
]


def _py_bpe(texts: list[str], n_merges: int):
    """Reference BPE: word-frequency table, most-frequent adjacent pair,
    ties lexicographic, greedy left-to-right merge."""
    words = Counter(t for text in texts for t in text.lower().split() if t)
    syms = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, freq in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        (l, r), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, freq))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_bpe_merges_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_merges(df, n_merges=6).orderBy("rank").collect()
    ]
    want, _ = _py_bpe([t for _, t in DOCS], 6)
    assert got == want


def test_bpe_merges_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    one = bpe_merges(df.coalesce(1), n_merges=4).collect()
    many = bpe_merges(df.repartition(7), n_merges=4).collect()
    assert sorted(one) == sorted(many)


def test_bpe_exhausts_and_stops_early(spark):
    df = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    rows = bpe_merges(df, n_merges=10).collect()
    # "ab" has exactly one mergeable pair; after (a,b) nothing remains
    assert [(r["left"], r["right"]) for r in rows] == [("a", "b")]


def test_bpe_encode_replays_merges(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    merges, syms = _py_bpe([t for _, t in DOCS], 6)
    rules = [(l, r) for _, l, r, _ in merges]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, rules).select("doc_id", "bpe_tokens").collect()
    }
    for doc_id, text in DOCS:
        want = [s for w in text.lower().split() if w for s in syms[w]]
        assert enc[doc_id] == want, doc_id


def test_bpe_incremental_counts_match_reference_deep(spark):
    """12 rounds on real fixture text: the incrementally-maintained pair
    counts must track the from-scratch reference count table exactly —
    every round's winner AND its frequency (a single stale delta would
    surface as a wrong pair_freq even when the argmax survives)."""
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(40)
    texts = [r["text"] for r in docs.select("text").collect()]
    want, _ = _py_bpe(texts, 12)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_merges(docs, n_merges=12).orderBy("rank").collect()
    ]
    assert got == want


def test_bpe_on_fixture_corpus_smoke(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(50)
    rows = bpe_merges(docs, n_merges=3).collect()
    assert len(rows) == 3
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert all(r["pair_freq"] > 0 for r in rows)


def test_bpe_handles_quotes_and_backslashes(spark):
    """Merge-pair literals ride in as Column parameters, so corpora
    whose winning pairs contain SQL-hostile characters (backslashes,
    single quotes) must induce and encode cleanly."""
    docs = [(0, r"a\b a\b a\b it's it's")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges, syms = _py_bpe([docs[0][1]], 4)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_merges(df, n_merges=4).orderBy("rank").collect()
    ]
    assert got == merges
    rules = [(l, r) for _, l, r, _ in merges]
    enc = bpe_encode(df, rules).select("bpe_tokens").collect()[0][0]
    assert enc == [s for w in docs[0][1].lower().split() for s in syms[w]]
