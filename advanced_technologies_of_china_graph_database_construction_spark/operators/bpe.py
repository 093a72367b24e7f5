"""Distributed BPE merge induction — tokenizer-vocabulary training as
a Spark workload.

Classic byte-pair encoding (Sennrich et al. 2016, the subword scheme
behind GPT/Llama tokenizers) learns a merge table from a corpus: start
from characters, repeatedly merge the most frequent adjacent symbol
pair.  The induction is inherently iterative-argmax (each round's merge
decision depends on the previous round's re-tokenization), so it is a
driver-coordinated loop like k-means — NOT SQL-expressible, which is
why its gate is rows-only and its hard verification is the
pure-Python-reference equality test in ``tests/test_bpe.py``.

Scale design (100 TB story):
- BPE operates on the **word frequency table**, not the corpus: one
  wordcount shuffle compresses 100 TB of text to |vocab| rows (Zipf:
  millions, not billions), and every merge round runs over that small
  table.
- **Pair counts are maintained incrementally** (the classic
  Sennrich-style delta update, distributed): the full explode+aggregate
  over every word's adjacent pairs runs ONCE at entry; each round then
  re-counts pairs only over the words that actually CONTAIN the winning
  pair (one filtered scan emitting −old/+new contributions), and folds
  the delta into the running counts table.  The per-round shuffle is
  proportional to the affected words — under Zipf a vanishing fraction
  after the first few merges — not to the whole vocabulary, so a 32-50k
  vocab run is n_merges small delta-aggregations, not n_merges full
  passes.
- The argmax reads the maintained counts table directly (orderBy+limit
  over |distinct pairs| rows); only the single winning pair is
  collected.
- The symbol rewrite is a lazy per-row conditional (`when(has_pair,
  fold)`), so the JVM fold executes only on affected rows; each round's
  word table and counts table are `localCheckpoint`ed to truncate the
  growing lineage (round k costs O(1) rounds of work, not O(k)
  recompute).

All symbol literals enter plans through ``F.lit`` Column parameters —
never interpolated into SQL strings — so arbitrary corpus characters
(quotes, backslashes) cannot break or inject into the merge expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import ws_tokens


# adjacent symbol pairs; the greatest() guard makes the single-symbol
# (and empty) case an empty slice — same struct type, no CASE branch
def _pairs_expr(col: str) -> str:
    return f"""
transform(slice({col}, 1, greatest(size({col}) - 1, 0)),
          (s, i) -> struct(s AS l, element_at({col}, i + 2) AS r))
"""


_PAIRS_EXPR = _pairs_expr("syms")


def _merge_fold(col, left: str, right: str):
    """Greedy left-to-right merge of ONE (left, right) pair inside a
    symbol-array column, as a JVM ``aggregate`` fold: walk the symbols,
    and whenever the accumulator's tail equals ``left`` and the current
    symbol equals ``right``, replace the tail with the concatenation.
    Matches reference BPE on overlaps ("aaa" under (a,a) merges once,
    left to right).  Shared by the induction loop and the encode face;
    literals ride in as ``F.lit`` so any corpus character is safe."""
    l, r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.when(F.size(col) <= 1, col).otherwise(
        F.aggregate(
            F.slice(col, F.lit(2), F.size(col) - 1),
            F.slice(col, F.lit(1), F.lit(1)),
            lambda acc, s: F.when(
                (F.element_at(acc, -1) == l) & (s == r),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
            ).otherwise(F.concat(acc, F.array(s))),
        )
    )


def bpe_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """(rank, left, right, pair_freq): the first ``n_merges`` BPE merge
    rules learned from the corpus's whitespace-word frequency table.

    Ties on pair frequency break lexicographically on (left, right) so
    the merge table is deterministic across partitionings and engines.
    Stops early (fewer rows) if the corpus runs out of adjacent pairs.
    The result is merge-table-sized — small by construction, the same
    contract as ``kmeans_centroids``.
    """
    toks = F.filter(ws_tokens(F.lower(F.col(text_col))), lambda t: t != F.lit(""))
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = words.select(
        "freq", F.expr("filter(split(word, ''), s -> s <> '')").alias("syms")
    ).localCheckpoint(eager=True)

    # Full pair count ONCE; each round below maintains it with a delta
    # aggregated over only the words containing the winning pair.
    counts = (
        syms.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("pair_freq"))
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            counts.orderBy(F.desc("pair_freq"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        left, right = row["l"], row["r"]
        merges.append((rank, left, right, int(row["pair_freq"])))
        has_pair = F.exists(
            F.expr(_PAIRS_EXPR),
            lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
        )
        # Delta over affected words only: −freq for every old adjacent
        # pair, +freq for every pair of the merged form.  Unaffected
        # words contribute identical ± terms and are skipped entirely.
        folded = _merge_fold(F.col("syms"), left, right)
        delta = (
            syms.filter(has_pair)
            .select("freq", F.col("syms").alias("old"), folded.alias("new"))
            .select(
                F.explode(
                    F.concat(
                        F.transform(
                            F.expr(_pairs_expr("old")),
                            lambda p: F.struct(
                                p["l"].alias("l"),
                                p["r"].alias("r"),
                                (-F.col("freq")).alias("d"),
                            ),
                        ),
                        F.transform(
                            F.expr(_pairs_expr("new")),
                            lambda p: F.struct(
                                p["l"].alias("l"),
                                p["r"].alias("r"),
                                F.col("freq").alias("d"),
                            ),
                        ),
                    )
                ).alias("x")
            )
            .groupBy(F.col("x.l").alias("l"), F.col("x.r").alias("r"))
            .agg(F.sum("x.d").alias("pair_freq"))
        )
        counts = (
            counts.unionByName(delta)
            .groupBy("l", "r")
            .agg(F.sum("pair_freq").alias("pair_freq"))
            .filter(F.col("pair_freq") > 0)
            .localCheckpoint(eager=True)
        )
        # Lazy conditional rewrite: the JVM fold runs only on rows that
        # contain the pair; everything else passes through untouched.
        syms = syms.select(
            "freq", F.when(has_pair, folded).otherwise(F.col("syms")).alias("syms")
        ).localCheckpoint(eager=True)

    return docs.sparkSession.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long"
    )


def bpe_encode(
    docs: DataFrame,
    merge_rules: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: re-tokenize every document's words
    by replaying the merges in rank order — the inference face of
    ``bpe_merges``, a pure narrow map over each row (one JVM fold per
    rule, no shuffle, no Python evaluation).

    Each rule is its own projection over an ``array<array<string>>``
    column — NOT one composed Column: ``_merge_fold`` references its
    input ~5 times, so nesting k rules into a single expression grows
    the tree ~5^k and OOMs the analyzer around k=8.  A linear chain of
    projections keeps analysis O(k)."""
    toks = F.filter(ws_tokens(F.lower(F.col(text_col))), lambda t: t != F.lit(""))
    out = docs.withColumn(
        out_col,
        F.transform(toks, lambda w: F.filter(F.split(w, ""), lambda s: s != F.lit(""))),
    )
    for left, right in merge_rules:
        out = out.withColumn(
            out_col,
            F.transform(F.col(out_col), lambda syms: _merge_fold(syms, left, right)),
        )
    return out.withColumn(out_col, F.flatten(F.col(out_col)))


def bpe_encode_words(
    words: DataFrame,
    merge_rules: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode one word per row — the vocabulary face of ``bpe_encode``
    (tokenizer tables are built per distinct word, then joined back to
    the corpus; at 100 TB that turns a per-token fold over every
    document into a |vocab|-sized computation).  Same one-projection-
    per-rule structure as ``bpe_encode`` (see the expression-growth
    note there), no shuffle, no Python evaluation."""
    out = words.withColumn(
        out_col, F.filter(F.split(F.col(word_col), ""), lambda s: s != F.lit(""))
    )
    for left, right in merge_rules:
        out = out.withColumn(out_col, _merge_fold(F.col(out_col), left, right))
    return out
