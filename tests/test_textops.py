"""Unit coverage for the n-gram surface in operators/textops — the edge
cases (empty, whitespace-only, null, short text) are exactly where the
array expressions are subtle, and word_bigrams must stay a strict alias
of word_ngrams(text, 2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from advanced_technologies_of_china_graph_database_construction_spark.operators import textops

CASES = [
    ("a b c d", ["a b", "b c", "c d"]),
    ("one", []),  # fewer tokens than n
    ("", []),  # split('') returns [''] — must not leak a phantom gram
    ("   ", []),  # whitespace-only
    (None, []),  # null text: same convention as empty
    ("  spaced   out  text ", ["spaced out", "out text"]),  # multi-space separators
]


def _run(spark, col_expr, texts):
    schema = T.StructType([T.StructField("text", T.StringType(), True)])
    df = spark.createDataFrame([Row(text=t) for t in texts], schema)
    return [r.g for r in df.select(col_expr.alias("g")).collect()]


@pytest.mark.parametrize("text,expected", CASES, ids=[repr(t) for t, _ in CASES])
def test_word_bigrams_edge_cases(spark, text, expected):
    assert _run(spark, textops.word_bigrams(F.col("text")), [text]) == [expected]


def test_word_ngrams_trigram_and_degenerate(spark):
    got = _run(spark, textops.word_ngrams(F.col("text"), 3), ["a b c d", "a b", "", None])
    assert got == [["a b c", "b c d"], [], [], []]


def test_word_ngrams_n1_is_token_list_without_phantoms(spark):
    got = _run(spark, textops.word_ngrams(F.col("text"), 1), ["x  y", "", "   ", None])
    assert got == [["x", "y"], [], [], []]


def test_bigrams_equal_ngrams_2(spark):
    texts = ["a b c", "", None, "single", "w1 w2 w3 w4 w5"]
    assert _run(spark, textops.word_bigrams(F.col("text")), texts) == _run(
        spark, textops.word_ngrams(F.col("text"), 2), texts
    )


# ------------------------------------------------------ property check ----

def test_word_ngrams_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    texts_strategy = st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab \t\né中")), max_size=24
        ),
        min_size=1,
        max_size=6,
    )

    def ref(text, n):
        toks = [t for t in (text or "").split() if t]
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    @given(texts_strategy, st.integers(1, 4))
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def check(texts, n):
        got = _run(spark, textops.word_ngrams(F.col("text"), n), texts)
        assert got == [ref(t, n) for t in texts]

    check()


# ---------------------------------------------- duplicated-span audit -----

def _span_reference(texts, n, min_count):
    """Pure-python reference: corpus-wide duplicated n-gram positions,
    merged per doc into maximal islands."""
    toks = {i: t.split() for i, t in texts.items()}
    grams: dict[str, int] = {}
    pos: dict[int, list[int]] = {i: [] for i in texts}
    for i, ws in toks.items():
        for p in range(max(len(ws) - n + 1, 0)):
            grams[" ".join(ws[p : p + n])] = grams.get(" ".join(ws[p : p + n]), 0) + 1
    for i, ws in toks.items():
        for p in range(max(len(ws) - n + 1, 0)):
            if grams[" ".join(ws[p : p + n])] >= min_count:
                pos[i].append(p)
    out = {}
    for i, ps in pos.items():
        spans = []
        for p in ps:
            if spans and p <= spans[-1][1] + n:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        dup = sum(last + n - first for first, last in spans)
        nt = len(toks[i])
        out[i] = (nt, len(spans), dup, round(dup / nt, 6) if nt else 0.0)
    return out


def test_duplicated_span_stats_matches_reference(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.dedup import duplicated_span_stats

    texts = {
        # docs 1 and 2 share the 4-token run "a b c d"; doc 3 is clean;
        # doc 4 repeats the run internally (self-repeat counts); doc 5
        # has two separate duplicated runs that must NOT merge
        1: "a b c d x y z w",
        2: "p q a b c d r s",
        3: "unique tokens only here none repeat ever once",
        4: "a b c d m n a b c d",
        5: "a b c d gap1 gap2 gap3 gap4 gap5 p q a b c d",  # second hit of both runs
        6: "short",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens, r.dup_frac)
        for r in duplicated_span_stats(df, n=4, min_count=2).collect()
    }
    assert got == _span_reference(texts, 4, 2)
    assert got[3] == (8, 0, 0, 0.0)           # clean doc reported with zeros
    assert got[1][1] == 1 and got[1][2] == 4  # exactly the shared 4-token run


def test_duplicated_span_island_merge_overlap(spark):
    """Overlapping gram hits chain into ONE island covering the union."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.dedup import duplicated_span_stats

    # the whole 6-token run "a b c d e f" duplicates: grams at pos 0,1,2
    # overlap and must merge to a single [0, 6) span
    texts = {1: "a b c d e f tail1 tail2", 2: "x a b c d e f y"}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in duplicated_span_stats(df, n=4, min_count=2).collect()
    }
    assert got == {1: (1, 6), 2: (1, 6)}


def test_chunk_documents_windows_and_overlap(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    rows = [
        (1, " ".join(toks)),       # 10 tokens, chunk=4/overlap=1 -> stride 3
        (2, "a b"),                # within budget -> one chunk
        (3, "   "),                # whitespace-only -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    }
    # starts: 1,4,7 while start <= 10-1=9 -> chunks [0:4],[3:7],[6:10]
    assert got == {
        (1, 0): (4, "t0 t1 t2 t3"),
        (1, 1): (4, "t3 t4 t5 t6"),
        (1, 2): (4, "t6 t7 t8 t9"),
        (2, 0): (2, "a b"),
    }


def test_chunk_documents_covers_every_token(spark):
    """Reassembling chunks minus their overlaps reproduces the exact
    token stream, for real fixture docs at several window sizes."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    originals = {
        r["doc_id"]: r["text"].split() for r in docs.collect() if r["text"].split()
    }
    for chunk_tokens, overlap in ((16, 4), (64, 8), (500, 0)):
        out = {}
        for r in chunk_documents(docs, chunk_tokens, overlap).collect():
            out.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
        assert set(out) == set(originals)
        for doc_id, chunks in out.items():
            chunks.sort()
            rebuilt = chunks[0][1].split()
            for _, text in chunks[1:]:
                rebuilt += text.split()[overlap:]
            assert rebuilt == originals[doc_id], (doc_id, chunk_tokens)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def _boiler_rows(rows):
    """rows: (doc_id, source, pos, line)."""
    return [
        {"doc_id": d, "source": s, "pos": p, "line": ln} for d, s, p, ln in rows
    ]


def test_remove_boilerplate_threshold_and_order(spark):
    """srcA has 4 docs: 'NAV' in all 4 (100% → dropped), 'SUB' in 2
    (exactly 50% → dropped, the threshold is ≥), 'rare' in 1 (kept);
    reassembly is pos-ordered with newline joins."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    rows = []
    for d in range(4):
        rows.append((d, "srcA", 0, "NAV"))
        rows.append((d, "srcA", 5, f"body {d}"))
    rows += [(0, "srcA", 9, "SUB"), (1, "srcA", 1, "SUB"), (2, "srcA", 2, "rare")]
    df = spark.createDataFrame(
        _boiler_rows(rows), "doc_id long, source string, pos long, line string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in remove_boilerplate_lines(df).collect()
    }
    assert got == {
        0: ("body 0", 1, 2),
        1: ("body 1", 1, 2),
        2: ("rare\nbody 2", 2, 1),
        3: ("body 3", 1, 1),
    }


def test_remove_boilerplate_min_docs_protects_small_sources(spark):
    """A single-document source makes every line 100%-frequent; the
    min_docs floor must keep it intact.  A doc whose every line drops
    still ships (empty text, n_kept=0)."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    rows = [(1, "solo", 0, "only line"), (1, "solo", 1, "second line")]
    rows += [(d, "srcB", 0, "NAV") for d in (10, 11)]
    rows += [(10, "srcB", 1, "content")]
    df = spark.createDataFrame(
        _boiler_rows(rows), "doc_id long, source string, pos long, line string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in remove_boilerplate_lines(df).collect()
    }
    assert got[1] == ("only line\nsecond line", 2, 0)
    assert got[10] == ("content", 1, 1)
    assert got[11] == ("", 0, 1)  # every line dropped: row survives, empty


def test_remove_boilerplate_frequency_is_per_source(spark):
    """The same line text in different sources is counted separately —
    50% of srcC must not pull srcD's single occurrence over threshold."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    rows = [(d, "srcC", 0, "shared") for d in (1, 2)]
    rows += [(d, "srcC", 1, f"c{d}") for d in (1, 2)]
    rows += [(d, "srcD", 0, f"d{d}") for d in (20, 21, 22)]
    rows += [(20, "srcD", 1, "shared")]
    df = spark.createDataFrame(
        _boiler_rows(rows), "doc_id long, source string, pos long, line string"
    )
    got = {
        r["doc_id"]: r["clean_text"] for r in remove_boilerplate_lines(df).collect()
    }
    assert got[1] == "c1" and got[2] == "c2"  # dropped in srcC
    assert got[20] == "d20\nshared"  # kept in srcD (1/3 < 50%)


def test_remove_boilerplate_rejects_bad_frac(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    df = spark.createDataFrame(
        _boiler_rows([(1, "s", 0, "x")]),
        "doc_id long, source string, pos long, line string",
    )
    with pytest.raises(ValueError, match="max_doc_frac"):
        remove_boilerplate_lines(df, max_doc_frac=0.0)


def test_nfc_audit_fuses_decomposed_sequences(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.textops import nfc_audit

    rows = [
        (1, "cafe\u0301"),   # decomposed (explicit escape) -> fused, changed
        (2, "café"),          # precomposed -> unchanged
        (3, "plain ascii"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in nfc_audit(df).collect()}
    assert got[1]["changed"] is True and got[1]["n_chars"] == 4
    assert got[2]["changed"] is False and got[2]["n_chars"] == 4
    # decomposed and precomposed normalize to the SAME bytes
    assert got[1]["norm_md5"] == got[2]["norm_md5"]
    assert got[3]["changed"] is False
    assert got[4]["changed"] is None and got[4]["norm_md5"] is None


def test_d35_contract_hot_word_exercises_sketch_guarantee(spark, tmp_path):
    """On a skewed corpus the hot word sits far ABOVE the support line,
    so its sketch_ok comes from the freqItems no-false-negative
    guarantee — the real branch, not the <=support vacuous one."""
    import pandas as pd

    from advanced_technologies_of_china_graph_database_construction_spark.plans.docs_queries import (
        D35_SUPPORT,
        d35_heavy_hitters_contract,
    )

    pd.DataFrame(
        {"doc_id": range(30), "text": [f"hot hot hot unique{i}" for i in range(30)]}
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {r["word"]: r for r in d35_heavy_hitters_contract(spark, str(tmp_path)).collect()}
    total_words = 120  # 30 docs x (3 hot + 1 unique)
    assert rows["hot"]["n"] == 90
    assert rows["hot"]["n"] > D35_SUPPORT * total_words  # guarantee regime
    assert rows["hot"]["sketch_ok"]
    assert all(r["sketch_ok"] for r in rows.values())


def test_naive_bayes_matches_python_reference(spark):
    """Train+predict vs a closed-form python NB on a corpus with a
    clearly-separable vocabulary, plus an exact-tie document (identical
    class-symmetric counts) that must break to the smallest label."""
    import math
    from collections import Counter

    from advanced_technologies_of_china_graph_database_construction_spark.operators.classify import (
        nb_predict,
        nb_train,
    )

    rows = [
        (1, "apple apple banana", "fruit"),
        (2, "apple banana banana", "fruit"),
        (3, "bolt nut bolt", "tool"),
        (4, "nut nut bolt", "tool"),
        (5, "apple bolt", "mixed?"),  # scored, not a training anomaly
    ]
    docs = spark.createDataFrame(
        [(i, t, l) for i, t, l in rows], "doc_id long, text string, lang string"
    )
    train = docs.filter("doc_id <= 4")
    model = nb_train(train, "lang")
    test = spark.createDataFrame(
        [
            (10, "apple banana apple"),
            (11, "bolt nut"),
            # exact tie: one word from each class's vocabulary, and the
            # two classes have symmetric counts -> scores are EXACTLY
            # equal; the tie must go to 'fruit' < 'tool'
            (12, "apple bolt"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["predicted"] for r in nb_predict(test, model).collect()}

    # python reference
    def ref_predict(words):
        langs = ["fruit", "tool"]
        wc = {l: Counter() for l in langs}
        nd = Counter()
        for _i, t, l in [r for r in rows if r[0] <= 4]:
            wc[l].update(t.split())
            nd[l] += 1
        vocab = {w for c in wc.values() for w in c}
        best = None
        for l in sorted(langs):
            total = sum(wc[l].values())
            s = math.log(nd[l] / sum(nd.values()))
            for w in words:
                s += math.log((wc[l][w] + 1.0) / (total + len(vocab)))
            if best is None or s > best[1] + 1e-12:
                best = (l, s)
        return best[0]

    assert got[10] == ref_predict(["apple", "banana", "apple"]) == "fruit"
    assert got[11] == ref_predict(["bolt", "nut"]) == "tool"
    assert got[12] == "fruit"  # exact tie -> smallest label


def test_bigram_lm_perplexity_matches_python_reference(spark):
    """Train/score vs closed-form python math: seen bigrams, an unseen
    bigram with a SEEN start (per-start floor), an unseen start
    (uniform floor), and a <2-token doc (NULL perplexity)."""
    import math
    from collections import Counter

    from advanced_technologies_of_china_graph_database_construction_spark.operators.lm import (
        bigram_lm_train,
        bigram_perplexity,
    )

    train_texts = ["a b a b c", "a b c a"]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (10, "a b c"),    # all bigrams seen
            (11, "a c b"),    # 'a c'/'c b': unseen with seen starts
            (12, "z q"),      # unseen start -> uniform floor
            (13, "solo"),     # <2 tokens -> NULL ppl
        ],
        "doc_id long, text string",
    )
    model = bigram_lm_train(train)
    got = {r["id"]: r for r in bigram_perplexity(test, model).collect()}

    c2, c1, vocab = Counter(), Counter(), set()
    for t in train_texts:
        ws = t.split()
        vocab.update(ws)
        for x, y in zip(ws, ws[1:]):
            c2[(x, y)] += 1
            c1[x] += 1
    V = len(vocab)

    def ref(text):
        ws = text.split()
        if len(ws) < 2:
            return (0, 0, None)
        lps, unseen = [], 0
        for x, y in zip(ws, ws[1:]):
            if (x, y) in c2:
                lps.append(math.log((c2[(x, y)] + 1.0) / (c1[x] + V)))
            else:
                unseen += 1
                lps.append(
                    math.log(1.0 / (c1[x] + V)) if x in c1 else math.log(1.0 / V)
                )
        return (len(lps), unseen, math.floor(math.exp(-sum(lps) / len(lps))))

    for doc_id, text in ((10, "a b c"), (11, "a c b"), (12, "z q"), (13, "solo")):
        n, u, p = ref(text)
        r = got[doc_id]
        assert (r["n_bigrams"], r["n_unseen"], r["ppl_floor"]) == (n, u, p), (doc_id, r)
    assert got[11]["n_unseen"] == 2 and got[12]["n_unseen"] == 1  # non-vacuous


def test_seeded_epoch_shuffle_is_reproducible_permutation(spark):
    """d42 contract: per epoch, (shard, pos) is a total order covering
    every doc exactly once (pos = 1..n within each shard, no gaps);
    epochs produce genuinely different orders over the same multiset;
    and a re-run returns the identical frame (pure function of the id —
    the property rand()-based shuffles break)."""
    from advanced_technologies_of_china_graph_database_construction_spark.plans.docs_queries import (
        SHUFFLE_SHARDS,
        d42_seeded_epoch_shuffle,
    )

    from .conftest import SF_CORRECT

    rows = d42_seeded_epoch_shuffle(spark, SF_CORRECT).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {1, 2}
    n_docs = len({r.doc_id for r in rows})
    orders = {}
    for epoch, rs in by_epoch.items():
        assert len(rs) == n_docs  # every doc exactly once per epoch
        shards = {}
        for r in rs:
            assert 0 <= r.shard < SHUFFLE_SHARDS
            shards.setdefault(r.shard, []).append(r.pos)
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks
        orders[epoch] = [
            r.doc_id for r in sorted(rs, key=lambda r: (r.shard, r.pos))
        ]
    assert orders[1] != orders[2]
    assert sorted(orders[1]) == sorted(orders[2])
    rerun = d42_seeded_epoch_shuffle(spark, SF_CORRECT).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, rows))


# ---------------------------- NPMI collocations --------------------------


def _npmi_reference(rows, min_word_docs, min_pair_docs, top_k):
    import itertools
    import math

    docsets = {d: set(t.lower().split()) for d, t in rows}
    n = float(len(rows))
    df = {}
    for s in docsets.values():
        for w in s:
            df[w] = df.get(w, 0) + 1
    vocab = {w for w, c in df.items() if c >= min_word_docs}
    pair_df = {}
    for s in docsets.values():
        for a, b in itertools.combinations(sorted(s & vocab), 2):
            pair_df[(a, b)] = pair_df.get((a, b), 0) + 1
    out = []
    for (a, b), dab in pair_df.items():
        if dab < min_pair_docs:
            continue
        npmi = (
            1.0
            if dab == n
            else math.log(n * dab / (df[a] * df[b])) / math.log(n / dab)
        )
        out.append((a, b, dab, round(npmi, 6)))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_k]


def test_npmi_collocations_matches_reference(spark):
    rows = [
        (1, "red blue red green"),
        (2, "red blue yellow"),
        (3, "red blue"),
        (4, "green yellow red"),
        (5, "blue green purple"),
        (6, "red blue green"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r["word_a"], r["word_b"], r["df_ab"], r["npmi"])
        for r in textops.npmi_collocations(
            docs, min_word_docs=2, min_pair_docs=2, top_k=10
        ).collect()
    ]
    assert got == _npmi_reference(rows, 2, 2, 10)


def test_npmi_per_doc_cap_bounds_pathological_doc(spark):
    """One 40-distinct-word document under max_words_per_doc=5 must
    contribute only C(5,2)=10 pairs — the first 5 qualifying words in
    lexicographic order — and the audit face must report exactly what
    was dropped (no silent caps)."""
    monster = " ".join(f"w{i:02d}" for i in range(40))
    rows = [(1, monster), (2, monster), (3, "w00 w01 w02")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textops.npmi_collocations(
        docs, min_word_docs=2, min_pair_docs=2, top_k=100, max_words_per_doc=5
    ).collect()
    # every w00..w39 qualifies (df>=2 via docs 1+2); cap keeps w00..w04
    got_pairs = {(r["word_a"], r["word_b"]) for r in out}
    expect = {
        (f"w{a:02d}", f"w{b:02d}") for a in range(5) for b in range(a + 1, 5)
    }
    assert got_pairs == expect
    # uncapped reference on the TRUNCATED docsets agrees value-for-value
    capped_rows = [
        (1, " ".join(f"w{i:02d}" for i in range(5))),
        (2, " ".join(f"w{i:02d}" for i in range(5))),
        (3, "w00 w01 w02"),
    ]
    got = [(r["word_a"], r["word_b"], r["df_ab"], r["npmi"]) for r in out]
    assert got == _npmi_reference(capped_rows, 2, 2, 100)
    audit = {
        r["doc_id"]: (r["n_qualifying"], r["n_kept"], r["n_dropped"])
        for r in textops.npmi_dropped_words(
            docs, min_word_docs=2, max_words_per_doc=5
        ).collect()
    }
    assert audit == {1: (40, 5, 35), 2: (40, 5, 35), 3: (3, 3, 0)}
    # the aggregation INPUT is capped, not just the output array: the
    # shared front end's collect_list sees ≤ cap rows per doc (row_number
    # window filter upstream), so no uncapped per-doc array is ever
    # buffered — probe the capped frame directly
    _, capped = textops._npmi_capped_words(
        docs, "text", min_word_docs=2, max_words_per_doc=5
    )
    sizes = {r["doc_id"]: r["n_ws"] for r in
             capped.select("doc_id", F.size("ws").alias("n_ws")).collect()}
    assert sizes == {1: 5, 2: 5, 3: 3}
    cap_plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" in cap_plan and "<= 5" in cap_plan, cap_plan


def test_npmi_cap_not_binding_is_identity(spark):
    rows = [
        (1, "red blue red green"),
        (2, "red blue yellow"),
        (3, "red blue"),
        (4, "green yellow red"),
        (5, "blue green purple"),
        (6, "red blue green"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    loose = textops.npmi_collocations(
        docs, min_word_docs=2, min_pair_docs=2, top_k=10, max_words_per_doc=1000
    ).collect()
    assert [tuple(r) for r in loose] == _npmi_reference(rows, 2, 2, 10)


def test_npmi_all_docs_pair_pins_to_one(spark):
    rows = [(1, "a b x"), (2, "a b y"), (3, "a b z")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textops.npmi_collocations(docs, min_word_docs=1, min_pair_docs=1, top_k=5)
    got = {(r["word_a"], r["word_b"]): r["npmi"] for r in out.collect()}
    # (a, b) co-occurs in EVERY document: ln(N/df_ab) = 0, the npmi
    # degenerate case must pin to exactly 1.0, not NaN/inf
    assert got[("a", "b")] == 1.0
