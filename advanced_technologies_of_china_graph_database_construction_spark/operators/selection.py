"""Data-selection operators — importance-resampling weights for
training-data curation (DSIR: Xie et al., "Data Selection for Language
Models via Importance Resampling", NeurIPS 2023).

Beyond-reference surface: the reference curates its corpus by manual
domain export (one TXT dump per 技术 domain, `Hype.py:64-70`); at
100 TB the equivalent is *scored* selection — rank raw documents by how
target-like their hashed n-gram distribution is and keep the top mass.

Scale shape (the whole point of the hashed-feature trick):
- The feature space is a FIXED number of buckets (``n_buckets``), so
  both distribution estimates collapse to one tiny aggregate each
  (map-side combined; the shuffle carries ≤ n_buckets rows).
- The per-bucket log-ratio table is broadcast; scoring a document is a
  map-side explode → broadcast-join → per-doc sum (one shuffle keyed by
  doc_id, partial-aggregated).  Nothing quadratic, nothing collected.
- All hashing is the repo's portable char-polynomial (dedup.py:13-16
  convention): integer-only, engine-independent, oracle-reproducible —
  no reliance on Spark's xxhash64 or DuckDB's hash().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Char-polynomial modulus / multiplier (same constants family as
# dedup.py's shingle hash; MOD is a Mersenne prime so the residue is
# well-spread) and the bigram mixing multiplier (Knuth's 2^32/phi).
HASH_MOD = 2_147_483_647
HASH_MULT = 31
KNUTH = 2_654_435_761


def charpoly_hash(word: Column) -> Column:
    """Portable per-word hash: base-31 codepoint polynomial mod
    2^31-1, identical arithmetic in Spark and ANSI SQL (DuckDB:
    ``list_reduce(list_transform(string_split(w, ''), c -> ord(c)),
    (a, b) -> (a*31+b) % 2147483647)``).  Pure JVM expression —
    whole-stage codegen, no UDF.

    Unicode boundary (cross-engine parity, VERIFIED r12 — pinned by
    ``test_charpoly_non_ascii_boundary``): on the engines in use
    (Spark 4.x, current DuckDB) BOTH sides split per CODEPOINT —
    Spark's ``split(w, '')`` does not cut surrogate pairs and
    ``ascii()`` returns the full codepoint; DuckDB's
    ``string_split(w, '')`` yields codepoints too (a combining mark is
    its own piece, not folded into a grapheme cluster).  So the hash
    agrees cross-engine on combining sequences AND non-BMP characters,
    not just ASCII.  The REAL residual boundary is normalization:
    canonically-equivalent strings in different forms (NFC "é" vs NFD
    "e"+U+0301) hash differently — NFC-normalize upstream (d33) when
    logically-equal text must collide."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_MULT + F.ascii(c)) % HASH_MOD,
    )


def _doc_features(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, is_t, bucket) with one row PER OCCURRENCE of a hashed
    unigram or bigram feature — DSIR counts occurrences, not distinct
    features.  The per-doc target flag rides along so the distribution
    aggregate needs no join back to the corpus.  Unigram and bigram
    buckets are concatenated per document and exploded ONCE, so each
    consumer of this frame costs exactly one corpus scan (the r10
    verdict's scale fix: the frame is corpus-token-sized, so it is
    recomputed per consumer — two cheap narrow codegen scans — rather
    than eagerly materialized to executor storage).  The explode and
    hash are map-side; no shuffle here."""
    from .textops import nonempty_tokens

    # THE token convention (textops.nonempty_tokens), lowercased — the
    # same defining site NPMI and the gram family use (r12 review)
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    d = docs.select(
        "doc_id", "is_t", F.transform(toks, charpoly_hash).alias("hs")
    )
    # bigram bucket = (h(a)*KNUTH + h(b)) % n_buckets: mixes the pair
    # without hashing the concatenated string (h < 2^31 so the product
    # stays inside int64)
    buckets = F.concat(
        F.transform("hs", lambda h: h % n_buckets),
        F.zip_with(
            F.slice("hs", 1, F.greatest(F.size("hs") - 1, F.lit(0))),
            F.slice("hs", 2, F.greatest(F.size("hs") - 1, F.lit(0))),
            lambda a, b: (a * KNUTH + b) % n_buckets,
        ),
    )
    return d.select("doc_id", "is_t", F.explode(buckets).alias("bucket"))


def temperature_mixture_plan(
    docs: DataFrame,
    source_col: str = "source",
    budget_den: int = 4,
    mod: int = 1_000_000,
) -> DataFrame:
    """(source, n_docs, w_isqrt, target_docs, rate_ppm): the mixing plan
    for temperature-scaled source sampling — the multilingual/multi-
    domain data-mixing step (exponential smoothing per XLM-R/mT5:
    sample source s proportionally to c_s^τ instead of c_s, so small
    domains are up-weighted relative to their raw share).

    τ is fixed at 0.5 and computed as ``floor(sqrt(c_s))`` — INTEGER
    square root, not ``pow(c, 0.5)`` — so every downstream number
    (targets, rates) is integer arithmetic and bit-identical across
    engines (general τ needs float pow, whose cross-engine rounding is
    not contractual; correctly-rounded sqrt + floor is).  The output
    budget is ``total_docs div budget_den``; per source,
    ``target_docs = least(c_s, (budget · w_s) div Σw)`` and the keep
    threshold ``rate_ppm = (target · mod) div c_s``.

    Scale shape: one tiny per-source aggregate (map-side combined), a
    1-row totals fold cross-joined back (both frames are
    |sources|-sized).  The plan NEVER touches document payloads."""
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.withColumn(
        "w_isqrt", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
    )
    tot = w.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("w_isqrt").alias("tot_w")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_docs",
            F.least(
                F.col("n_docs"),
                F.expr(f"((tot_docs div {budget_den}) * w_isqrt) div tot_w"),
            ),
        )
        .withColumn("rate_ppm", F.expr(f"(target_docs * {mod}) div n_docs"))
        .select(source_col, "n_docs", "w_isqrt", "target_docs", "rate_ppm")
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    mod: int = 1_000_000,
) -> DataFrame:
    """Filter ``docs`` to the temperature-mixture sample: keep a doc iff
    its portable id-hash residue falls under its source's ``rate_ppm``
    threshold from :func:`temperature_mixture_plan`.  The keep decision
    is the d12/d15 leakage-free integer hash (follows the id through
    any repartition, never ``rand()``), so applying the plan is a
    broadcast join + a pure map-side filter — no shuffle of the corpus;
    realized counts are rate·c_s in expectation, not exact (the
    documented trade for a shuffle-free apply; the d46 spec ships
    target AND realized side by side so the gap is visible).

    The residue is ``pmod(pmod(id, mod) · KNUTH, mod)`` — reducing the
    id mod ``mod`` FIRST keeps the product under 2^52 for every int64
    id, where ``id · KNUTH`` alone overflows int64 (silent wrap in
    Spark, error in DuckDB) for ids above ~3.47e9, breaking the
    cross-engine bit-identical contract exactly at web-scale id
    ranges.  The two forms agree wherever both are defined:
    (id mod m)·K ≡ id·K (mod m).

    NEGATIVE ids are in-contract since r13: Spark ``pmod`` is
    non-negative for all ids, and the registered oracles mirror it as
    ``(id % m + m) % m`` — plain SQL ``%`` (negative for negative
    operands) would silently diverge; keep the pmod form in any new
    oracle (pinned by ``test_selection_negative_id_parity``)."""
    residue = F.pmod(
        F.pmod(F.col(id_col), F.lit(mod)) * F.lit(KNUTH), F.lit(mod)
    )
    return docs.join(F.broadcast(plan), source_col).filter(
        residue < F.col("rate_ppm")
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    n_buckets: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, n_feats, weight): per-document DSIR importance weight
    ``sum over feature occurrences of ln(p_target(b) / p_raw(b))``,
    with add-one-smoothed bucket distributions (target = rows where
    ``is_target``; raw = every row).  Higher weight = more target-like;
    callers keep the top mass (the d43 spec takes top-50).

    Documents with ZERO tokens produce no feature rows and therefore NO
    output row — a stated exclusion (r12 review), not an accident: a
    zero-feature doc has no evidence either way, and emitting weight 0
    would rank it above every genuinely negative-scored document.
    Callers joining weights back to the corpus should left-join and
    decide the no-evidence policy explicitly.

    Plan: ONE ≤n_buckets-row flagged aggregate (map-side combined —
    the target flag rides the feature rows, so there is no target-id
    join and nothing corpus-fraction-sized is ever broadcast), totals
    folded from that same tiny frame (a block scan of ≤n_buckets rows,
    not a corpus re-scan), then the broadcast log-ratio table joins the
    features for one doc_id-keyed sum.  The feature frame is
    corpus-token-sized and therefore NEVER materialized: each of its
    two consumers recomputes the narrow explode+hash from the source
    scan (one scan each — pinned in test_plan_quality), instead of the
    r10 eager localCheckpoint that wrote a corpus-sized frame to
    executor storage.  The weight is rounded AFTER the sum (single
    rounding point, d25/d26 convention).
    """
    flagged = docs.select("doc_id", F.col(text_col), is_target.alias("is_t"))
    feats = _doc_features(flagged, text_col, n_buckets)
    counts = (
        feats.groupBy("bucket")
        .agg(
            F.count("*").alias("c_raw"),
            F.count_if(F.col("is_t")).alias("c_tgt"),
        )
        .localCheckpoint(eager=True)  # ≤n_buckets rows; totals + ratios read it
    )
    tots = counts.agg(
        F.sum("c_raw").alias("tr"), F.sum("c_tgt").alias("tt")
    ).first()
    tot_raw, tot_tgt = int(tots["tr"] or 0), int(tots["tt"] or 0)
    # add-one smoothing over the FULL bucket range so absent buckets
    # still carry probability mass
    ratios = counts.select(
        "bucket",
        (
            F.log((F.col("c_tgt") + F.lit(1.0)) / F.lit(float(tot_tgt + n_buckets)))
            - F.log((F.col("c_raw") + F.lit(1.0)) / F.lit(float(tot_raw + n_buckets)))
        ).alias("log_ratio"),
    )
    return (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("log_ratio"), round_digits).alias("weight"),
        )
    )


def _effective_weight(weight_col: str):
    """NULL/non-positive → 1.0 (visible substitution, never a silent
    drop or a NULL arrival that sorts first); positive weights —
    fractional included — pass through unchanged."""
    w = F.col(weight_col).cast("double")
    return F.when(w.isNull() | (w <= 0), F.lit(1.0)).otherwise(w)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    mod: int = HASH_MOD,
) -> DataFrame:
    """(id, arrival): a deterministic weighted sample WITHOUT
    replacement of ``n`` rows — the selection step that consumes
    importance weights like :func:`dsir_importance_weights`'s (DSIR's
    own pipeline resamples by weight after scoring; Efraimidis &
    Spirakis 2006 is the one-pass distributed formulation).

    The exponential race: each row gets arrival = −ln(u)/w with u
    uniform on (0, 1]; the n SMALLEST arrivals are a weighted sample
    without replacement (row i beats row j with probability
    w_i/(w_i+w_j), applied inductively).  Randomness is the repo's
    seeded-shuffle discipline (d42) — never ``rand()``: u derives from
    the Knuth-mixed id, ``(pmod(pmod(id, mod)·KNUTH, mod) + 1) /
    (mod+1)`` ∈ (0, 1], a pure function of the id, so re-runs, retries
    and repartitionings select the identical sample and the oracle can
    replay the arithmetic.  The inner pmod keeps the product in int64
    for every id (the d46 overflow rule).

    Scale shape: one narrow projection, then ``orderBy(...).limit(n)``
    — Spark plans that as TakeOrderedAndProject (per-partition top-n,
    driver merges ≤ n·n_partitions rows); no global sort, no window
    over a single partition.  Arrivals are rounded (ties broken by id)
    so the cut is engine-portable; ``ln`` is the d37 precedent for
    cross-engine transcendentals.  NULL and non-positive weights are
    replaced by 1 (a zero-weight doc must not divide by zero; callers
    wanting hard exclusion should filter first — a substitution is
    visible in the output, a silent drop is not); POSITIVE fractional
    weights pass through untouched — clamping them (the r12 review
    find: ``greatest(w, 1)``) would erase every weight in (0, 1) and
    silently degrade e.g. DSIR-scaled draws to uniform.  Negative ids
    are in-contract: ``pmod`` is non-negative for all ids and the
    oracle mirrors it as ``(id % m + m) % m`` (see
    :func:`apply_mixture`).
    """
    if n <= 0:
        raise ValueError("weighted_sample needs n >= 1")
    u = (
        F.pmod(F.pmod(F.col(id_col), F.lit(mod)) * F.lit(KNUTH), F.lit(mod))
        + F.lit(1)
    ) / F.lit(float(mod + 1))
    w = _effective_weight(weight_col)
    arrival = F.round(-F.log(u) / w, 9)
    return (
        df.select(F.col(id_col), arrival.alias("arrival"))
        # asc_nulls_last: Spark asc is NULLS FIRST, so a NULL id (NULL u
        # → NULL arrival) would unconditionally enter EVERY sample and
        # diverge from the oracle, whose ORDER BY defaults NULLS LAST
        # (r12 ADVICE) — NULL-id rows now lose to every real arrival
        .orderBy(F.asc_nulls_last("arrival"), F.asc_nulls_last(id_col))
        .limit(n)
    )


def weighted_sample_per_group(
    df: DataFrame,
    targets: DataFrame,
    group_col: str,
    target_col: str = "target_docs",
    weight_col: str | None = None,
    id_col: str = "doc_id",
    mod: int = HASH_MOD,
) -> DataFrame:
    """The grouped face of :func:`weighted_sample`: for every group,
    keep exactly ``target_col`` rows (or all of them when the group is
    smaller), drawn by the same deterministic exponential race.  This
    is the EXACT realization of a mixing plan —
    :func:`apply_mixture`'s shuffle-free rate filter hits its targets
    only in expectation (its own output ships the target/realized gap
    precisely because it is nonzero); ranking the race within each
    group hits them exactly, at the cost of one per-group shuffle.

    ``weight_col=None`` runs the race uniformly (u alone decides — a
    deterministic per-group simple random sample); otherwise rows win
    proportionally to their weight, as in :func:`weighted_sample`.

    Scale shape: one hash shuffle on ``group_col`` and a rank window
    per group — the same layout every per-group top-k face here uses
    (e05, d16); the targets frame is group-sized and broadcast.  Skewed
    giant groups bound the window sort; at 100 TB a two-pass threshold
    refinement could replace the rank, but the window form is the
    engine-portable contract the oracle replays.

    A group absent from ``targets`` has target 0 — DEFINED, not an
    accident of join type (the left join + coalesce(0) below): a
    mixing plan that doesn't budget a source keeps none of it, the
    same contract a plan row with ``target_docs = 0`` states
    explicitly.  Callers who consider an unplanned group an ERROR
    (e.g. a stale plan racing new sources) should validate coverage
    upstream — this operator's job is to realize the plan it is
    given.  Negative ids: same pmod contract as
    :func:`weighted_sample`."""
    u = (
        F.pmod(F.pmod(F.col(id_col), F.lit(mod)) * F.lit(KNUTH), F.lit(mod))
        + F.lit(1)
    ) / F.lit(float(mod + 1))
    if weight_col is None:
        arrival = F.round(-F.log(u), 9)
    else:
        arrival = F.round(-F.log(u) / _effective_weight(weight_col), 9)
    from pyspark.sql.window import Window

    # NULLS LAST for the same reason as weighted_sample's orderBy: a
    # NULL-id arrival must never outrank a real one (oracle parity)
    rank_w = Window.partitionBy(group_col).orderBy(
        F.asc_nulls_last("arrival"), F.asc_nulls_last(id_col)
    )
    return (
        df.select(group_col, F.col(id_col), arrival.alias("arrival"))
        .withColumn("rk", F.row_number().over(rank_w))
        .join(F.broadcast(targets.select(group_col, target_col)), group_col, "left")
        .filter(F.col("rk") <= F.coalesce(F.col(target_col), F.lit(0)))
        .select(group_col, id_col, "arrival")
    )


def token_budget_prefix(
    df: DataFrame,
    budget: DataFrame,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> DataFrame:
    """Greedy token-budget selection: walk the corpus in descending
    ``score_col`` order (ties broken ascending by ``id_col``) and keep
    the longest prefix whose running token total stays ≤ the budget —
    "give me the best B tokens", the selection every pre-training run
    starts with (the reference's analogue is its manual per-domain TXT
    export, `Hype.py:64-70`; at 100 TB the export is a scored prefix).
    Returns the input rows plus ``cum`` (the running total INCLUDING
    the row) for every selected row.  ``budget`` is a 1-row frame with
    a ``budget`` column, so a budget derived from the data (e.g.
    sum/3) flows through the plan without a driver round-trip.

    The prefix semantics are deliberately strict: once the running
    total would exceed the budget, NOTHING further is taken, even a
    later tiny document that would still fit — first-fit packing would
    make the selected set depend on every earlier document's size
    (unstable under corpus edits) where the prefix depends only on the
    cut point.

    Scale shape — the naive form is a window over ONE partition (an
    empty ``partitionBy`` with ``ORDER BY score``), the classic
    driver-sized bottleneck this repo bans.  Instead the global
    running sum is decomposed exactly, the pca.py bounded-fold idiom
    applied to a prefix sum:

    1. ``percentile_approx`` yields ``n_buckets-1`` score boundaries
       (one tiny aggregate; deterministic — the GK sketch has no
       randomness).
    2. Each row's bucket = count of boundaries strictly above its
       score — a pure function of the score, so a tie-class never
       straddles buckets and bucket order extends score order.
    3. Per-bucket token totals (≤ ``n_buckets`` rows) get exclusive
       prefix offsets via a window over that TINY frame (bounded by
       ``n_buckets``, the constant that makes the "global" window
       legal), broadcast back.
    4. The running sum within each bucket is a window PARTITIONED by
       bucket — parallel across buckets — plus the bucket's offset.

    Because buckets are score-monotone and the within-bucket order is
    the global order's restriction, offset + within-bucket sum IS the
    global running sum, exactly — the bucketing is an execution
    layout, invisible in the result, so the oracle can replay the
    selection as a plain window cumsum and a bucketing-invariance
    property (``n_buckets=1`` ≡ ``n_buckets=8``) pins the
    decomposition.  At 100 TB ``n_buckets`` scales to ~thousands
    (executor-count-sized, still a bounded offsets frame) — skew is
    impossible by construction since quantile boundaries equalize
    bucket mass.  Scores may carry NULLs in principle; they sort last
    (desc_nulls_last) so a NULL-scored document can only enter after
    every scored one.
    """
    from pyspark.sql.window import Window

    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # percentile_approx returns NULL (not []) for an empty fraction list
    # (n_buckets=1) and for an empty/all-NULL input — either would
    # NULL the bucket and silently drop every row at the inner join
    # below (caught by the hypothesis replay's n_buckets=1 case)
    bounds = df.agg(
        F.coalesce(
            F.percentile_approx(F.col(score_col), fracs, 10_000),
            F.array().cast("array<double>"),
        ).alias("bs")
    )
    # NULL scores go to the LAST bucket explicitly ("score < x" is NULL
    # for them, which F.filter drops — size() would say bucket 0, the
    # BEST bucket); together with desc_nulls_last below this makes the
    # NULLS-sort-globally-last claim structural, not fixture luck
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.when(F.col(score_col).isNull(), F.lit(n_buckets - 1)).otherwise(
            F.size(F.filter("bs", lambda x: F.col(score_col) < x))
        ),
    )
    # exclusive prefix offsets over the ≤ n_buckets bucket totals;
    # bucket index DESCENDS in score, so "earlier" = smaller bucket
    off_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum(tokens_col).alias("_btoks"))
        .withColumn("_boff", F.coalesce(F.sum("_btoks").over(off_w), F.lit(0)))
        .select("bucket", "_boff")
    )
    run_w = (
        Window.partitionBy("bucket")
        .orderBy(F.desc_nulls_last(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", (F.col("_boff") + F.sum(tokens_col).over(run_w)).cast("long"))
        .crossJoin(F.broadcast(budget))
        .filter(F.col("cum") <= F.col("budget"))
        .drop("bs", "bucket", "_boff")
    )
