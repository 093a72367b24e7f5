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


# ---------------- temperature mixture (d46 machinery) ---------------------


def _mix_docs(spark, counts: dict[str, int], id_start: int = 0, stride: int = 1):
    rows, i = [], id_start
    for src, n in counts.items():
        for _ in range(n):
            rows.append((i, src))
            i += stride
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_mixture_plan_integer_arithmetic(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        temperature_mixture_plan,
    )

    docs = _mix_docs(spark, {"a": 100, "b": 25, "c": 4})
    got = {
        r["source"]: (r["n_docs"], r["w_isqrt"], r["target_docs"], r["rate_ppm"])
        for r in temperature_mixture_plan(docs, budget_den=4).collect()
    }
    # budget = 129 div 4 = 32; weights = isqrt: 10, 5, 2 (sum 17)
    # targets = (32*w) div 17 capped at n_docs; rate = target*1e6 div n
    assert got == {
        "a": (100, 10, 18, 180_000),
        "b": (25, 5, 9, 360_000),
        "c": (4, 2, 3, 750_000),
    }
    # τ=0.5 up-weights small sources: c keeps 75% of its docs, a 18%
    assert got["c"][3] > got["b"][3] > got["a"][3]


def test_mixture_plan_target_capped_at_n_docs(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        temperature_mixture_plan,
    )

    # one source so tiny its isqrt share exceeds its own doc count:
    # target must be least(n_docs, share) and rate_ppm exactly 1e6
    docs = _mix_docs(spark, {"big": 10_000, "tiny": 1})
    got = {
        r["source"]: (r["target_docs"], r["rate_ppm"])
        for r in temperature_mixture_plan(docs, budget_den=1).collect()
    }
    assert got["tiny"] == (1, 1_000_000)  # keep everything, never > 1e6
    assert got["big"][0] <= 10_000


def test_apply_mixture_matches_python_and_survives_large_ids(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        apply_mixture,
        temperature_mixture_plan,
    )

    # ids far above 3.47e9: id*KNUTH overflows int64, the reduced form
    # pmod(pmod(id, mod)*KNUTH, mod) must not (the r11 ADVICE fix)
    docs = _mix_docs(spark, {"a": 200, "b": 50}, id_start=5_000_000_000, stride=7)
    plan = temperature_mixture_plan(docs, budget_den=2)
    kept = apply_mixture(docs, plan)
    rates = {r["source"]: r["rate_ppm"] for r in plan.collect()}
    got = sorted(r["doc_id"] for r in kept.collect())
    exp = sorted(
        r["doc_id"]
        for r in docs.collect()
        if ((r["doc_id"] % 1_000_000) * KNUTH) % 1_000_000 < rates[r["source"]]
    )
    assert got == exp and len(got) > 0
    # kept fraction lands near the planned rate (hash-uniformity sanity)
    a_kept = sum(1 for r in kept.collect() if r["source"] == "a")
    assert abs(a_kept / 200 - rates["a"] / 1_000_000) < 0.2


# ---------------- non-ASCII boundary (r12: documented → executable) -------


def test_charpoly_non_ascii_boundary(spark):
    """The charpoly_hash / d28-tokenizer cross-engine contract, pinned
    on exactly the inputs the prose used to exclude: a combining
    sequence (NFD e+U+0301), a non-BMP char (U+1F600, a surrogate pair
    in UTF-16), and BMP CJK.  Verified behavior on the engines in use:
    BOTH Spark's split(w,'') and DuckDB's string_split(w,'') yield
    per-CODEPOINT pieces (surrogate pairs whole, combining marks their
    own piece), and Spark's ascii() returns the full codepoint — so the
    hash and the symbol tokenization agree cross-engine beyond ASCII.
    If either engine moves to UTF-16 code units or grapheme clusters,
    this is the test that flags it.  The residual divergence is
    normalization FORM: NFC vs NFD of the same text hash differently
    (also pinned)."""
    import duckdb

    nfd = "é"          # combining sequence, 2 codepoints
    nfc = "é"           # same text NFC, 1 codepoint
    emoji = "\U0001F600"     # non-BMP, surrogate pair in UTF-16
    mixed = "caf" + emoji + nfd
    words = [nfd, nfc, emoji, mixed, "中文"]

    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r["w"]: (r["h"], r["syms"])
        for r in df.select(
            "w",
            charpoly_hash(F.col("w")).alias("h"),
            F.expr("filter(split(w, ''), s -> s <> '')").alias("syms"),
        ).collect()
    }
    con = duckdb.connect()
    for w in words:
        # per-codepoint python fold is the shared ground truth
        assert got[w][0] == py_charpoly(w), (w, got[w][0], py_charpoly(w))
        oracle_h = con.execute(
            "SELECT list_reduce(list_transform(string_split(?, ''),"
            " c -> ord(c)::BIGINT), (a, b) -> (a*31 + b) % 2147483647)",
            [w],
        ).fetchone()[0]
        assert got[w][0] == oracle_h, (w, got[w][0], oracle_h)
        # d28 symbol tokenization: per-codepoint on both engines
        assert got[w][1] == list(w), (w, got[w][1])
        oracle_syms = con.execute(
            "SELECT list_filter(string_split(?, ''), s -> s <> '')", [w]
        ).fetchone()[0]
        assert oracle_syms == list(w), (w, oracle_syms)
    # the REAL boundary: canonically-equivalent text in different
    # normalization forms does NOT collide — NFC-normalize upstream
    assert got[nfd][0] != got[nfc][0]


# ---------------- weighted sample (d47: ES exponential race) --------------

def _py_arrival(doc_id: int, w: float, mod: int = 2_147_483_647) -> float:
    import math

    u = ((doc_id % mod) * 2_654_435_761 % mod + 1) / (mod + 1.0)
    return round(-math.log(u) / max(w, 1.0), 9)


def test_weighted_sample_matches_python_reference(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
    )

    rows = [(i, (i * 37) % 500 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["arrival"])
        for r in weighted_sample(df, n=25, weight_col="w").collect()
    ]
    expect = sorted(
        ((i, _py_arrival(i, w)) for i, w in rows),
        key=lambda t: (t[1], t[0]),
    )[:25]
    assert got == expect


def test_weighted_sample_is_partitioning_invariant(spark):
    """The d42 discipline: the cut is a pure function of the ids, so a
    different partitioning must select the identical sample in the
    identical order."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
    )

    rows = [(i, i % 97 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = weighted_sample(df.repartition(1), n=50, weight_col="w").collect()
    b = weighted_sample(df.repartition(17, "w"), n=50, weight_col="w").collect()
    assert a == b


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """Statistical sanity, deterministic given the fixed hash: rows with
    1000x the weight must dominate a small sample over a large corpus."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
    )

    heavy = [(i, 100_000) for i in range(100)]
    light = [(i, 100) for i in range(100, 2000)]
    df = spark.createDataFrame(heavy + light, "doc_id long, w long")
    got = {r["doc_id"] for r in weighted_sample(df, n=40, weight_col="w").collect()}
    n_heavy = sum(1 for d in got if d < 100)
    assert n_heavy >= 30, n_heavy


def test_weighted_sample_edge_cases(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1, 5), (2, 0), (3, -7)], "doc_id long, w long")
    # n beyond the corpus returns everything; zero/negative weights are
    # floored to 1, not dropped and not a divide-by-zero
    got = weighted_sample(df, n=10, weight_col="w").collect()
    assert {r["doc_id"] for r in got} == {1, 2, 3}
    assert all(r["arrival"] is not None and r["arrival"] >= 0 for r in got)
    with _pytest.raises(ValueError):
        weighted_sample(df, n=0, weight_col="w")


def test_weighted_sample_plans_as_take_ordered(spark):
    """The cut must be TakeOrderedAndProject (per-partition top-n +
    driver merge), never a global sort or a single-partition window."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 31 + 1).alias("w")
    )
    plan = (
        weighted_sample(df, n=20, weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_weighted_sample_per_group_exact_counts_and_reference(spark):
    """Every group keeps exactly min(target, group size) rows, and the
    kept set is the python-computed race winner set."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample_per_group,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = spark.createDataFrame(
        [("a", 10), ("b", 0), ("c", 500)], "source string, target_docs long"
    )
    got = weighted_sample_per_group(df, targets, group_col="source").collect()
    by_g: dict = {}
    for r in got:
        by_g.setdefault(r["source"], set()).add(r["doc_id"])
    # exact target for a, zero for b, whole group when target > size
    assert len(by_g.get("a", set())) == 10
    assert "b" not in by_g
    assert len(by_g["c"]) == 100
    # python reference for group a (uniform race = smallest -ln(u))
    import math

    def arr(i):
        mod = 2_147_483_647
        u = ((i % mod) * 2_654_435_761 % mod + 1) / (mod + 1.0)
        return (round(-math.log(u), 9), i)

    a_ids = [i for i, s in rows if s == "a"]
    expect_a = {i for _, i in sorted(arr(i) for i in a_ids)[:10]}
    assert by_g["a"] == expect_a


def test_weighted_sample_per_group_weighted_mode_biases(spark):
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample_per_group,
    )

    heavy = [(i, "s", 100_000) for i in range(50)]
    light = [(i, "s", 100) for i in range(50, 1000)]
    df = spark.createDataFrame(heavy + light, "doc_id long, source string, w long")
    targets = spark.createDataFrame([("s", 20)], "source string, target_docs long")
    got = {
        r["doc_id"]
        for r in weighted_sample_per_group(
            df, targets, group_col="source", weight_col="w"
        ).collect()
    }
    assert len(got) == 20
    assert sum(1 for d in got if d < 50) >= 15


def test_weighted_sample_per_group_unplanned_group_has_target_zero(spark):
    """A group absent from the targets frame keeps ZERO rows by defined
    contract (r12 review: previously an accident of the inner join),
    identical to an explicit target_docs = 0 row."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample_per_group,
    )

    df = spark.createDataFrame(
        [(1, "planned"), (2, "planned"), (3, "unplanned")],
        "doc_id long, source string",
    )
    targets = spark.createDataFrame([("planned", 1)], "source string, target_docs long")
    got = weighted_sample_per_group(df, targets, group_col="source").collect()
    assert len(got) == 1 and got[0]["source"] == "planned"


def test_weighted_sample_preserves_fractional_weights(spark):
    """r12 review fix: greatest(w, 1) erased every weight in (0,1),
    silently degrading fractional-weight draws (e.g. DSIR-scaled) to
    uniform.  Scale invariance is the witness: weights {0.5, 1.0, ...}
    must select exactly like {5, 10, ...} (the race depends only on
    relative weights), and NOT like the uniform draw."""
    import math

    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
    )

    rows = [(i, ((i * 13) % 10 + 1) / 10.0) for i in range(300)]
    small = spark.createDataFrame(rows, "doc_id long, w double")
    big = spark.createDataFrame([(i, w * 10) for i, w in rows], "doc_id long, w double")
    sel_small = [r["doc_id"] for r in weighted_sample(small, 30, "w").collect()]
    sel_big = [r["doc_id"] for r in weighted_sample(big, 30, "w").collect()]
    assert sel_small == sel_big
    # and it differs from the uniform (weight-ignoring) draw
    uni = spark.createDataFrame([(i, 1.0) for i, _ in rows], "doc_id long, w double")
    sel_uni = [r["doc_id"] for r in weighted_sample(uni, 30, "w").collect()]
    assert sel_small != sel_uni
    # python reference with the corrected rule (w <= 0 or NULL -> 1.0)
    mod = 2_147_483_647

    def arr(i, w):
        u = ((i % mod) * 2_654_435_761 % mod + 1) / (mod + 1.0)
        return round(-math.log(u) / (w if w > 0 else 1.0), 9)

    expect = [i for _, i in sorted((arr(i, w), i) for i, w in rows)[:30]]
    assert sel_small == sorted(sel_small, key=lambda d: (arr(d, dict(rows)[d]), d))
    assert set(sel_small) == set(expect)


def test_weighted_sample_null_id_never_outranks_real_rows(spark):
    """r12 ADVICE: Spark asc is NULLS FIRST, so a NULL id (NULL u ->
    NULL arrival) used to enter EVERY sample unconditionally and diverge
    from the oracle's NULLS-LAST default.  NULL-id rows must now lose to
    every real arrival, in both the global and the per-group face."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        weighted_sample,
        weighted_sample_per_group,
    )

    rows = [(i, 1) for i in range(50)] + [(None, 1)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, n=10, weight_col="w").collect()
    assert len(got) == 10 and all(r["doc_id"] is not None for r in got)

    grows = [(i, "s") for i in range(50)] + [(None, "s")]
    gdf = spark.createDataFrame(grows, "doc_id long, source string")
    targets = spark.createDataFrame([("s", 5)], "source string, target_docs long")
    gg = weighted_sample_per_group(gdf, targets, group_col="source").collect()
    assert len(gg) == 5 and all(r["doc_id"] is not None for r in gg)


def test_selection_negative_id_parity(spark):
    """Negative ids are in-contract (r13): Spark pmod and the oracles'
    ``(id % m + m) % m`` form agree for ALL ids — plain SQL ``%`` is
    negative for negative operands and would silently diverge.  Replays
    the registered D47 arithmetic in DuckDB over a negative-id corpus
    and checks apply_mixture's residue against the pmod ground truth."""
    import duckdb

    from advanced_technologies_of_china_graph_database_construction_spark.operators.selection import (
        apply_mixture,
        temperature_mixture_plan,
        weighted_sample,
    )

    rows = [(i, abs(i) % 50 + 1) for i in range(-200, 200, 3)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["arrival"])
        for r in weighted_sample(df, n=30, weight_col="w").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = con.execute(
        """
        SELECT doc_id,
               round(-ln((((doc_id % 2147483647 + 2147483647) % 2147483647)
                          * 2654435761 % 2147483647 + 1) / 2147483648.0)
                     / greatest(w::DOUBLE, 1.0), 9) AS arrival
        FROM t ORDER BY arrival, doc_id LIMIT 30
        """
    ).fetchall()
    assert got == [(d, a) for d, a in exp]
    assert any(d < 0 for d, _ in got)  # negative ids actually exercised

    # apply_mixture's keep residue vs the pmod ground truth
    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(-300, 300)],
        "doc_id long, source string",
    )
    plan = temperature_mixture_plan(docs, budget_den=2)
    rates = {r["source"]: r["rate_ppm"] for r in plan.collect()}
    kept = sorted(r["doc_id"] for r in apply_mixture(docs, plan).collect())
    m = 1_000_000
    expect = sorted(
        i
        for i in range(-300, 300)
        if (((i % m) + m) % m) * KNUTH % m < rates["a" if i % 2 else "b"]
    )
    assert kept == expect and any(i < 0 for i in kept)
