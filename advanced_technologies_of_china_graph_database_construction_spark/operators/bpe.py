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
- Each round is two narrow JVM expressions (adjacent-pair extraction
  via `transform`, left-to-right greedy merge via `aggregate`) plus one
  tiny argmax aggregate; only the single winning pair is collected.
- `localCheckpoint` per round truncates the growing lineage so round k
  costs O(1) rounds of work, not O(k) recompute.

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
_PAIRS_EXPR = """
transform(slice(syms, 1, greatest(size(syms) - 1, 0)),
          (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))
"""


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

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            syms.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append((rank, row["l"], row["r"], int(row["pair_freq"])))
        syms = syms.select(
            "freq", _merge_fold(F.col("syms"), row["l"], row["r"]).alias("syms")
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
    ``bpe_merges``, a pure narrow map over each row (chained JVM folds,
    no shuffle, no Python evaluation)."""
    toks = F.filter(ws_tokens(F.lower(F.col(text_col))), lambda t: t != F.lit(""))
    return docs.withColumn(
        out_col, F.flatten(F.transform(toks, lambda w: _apply_merges_col(w, merge_rules)))
    )


def _apply_merges_col(word, merge_rules):
    """Replay the whole merge table over one word (chained
    ``_merge_fold``s, composable inside a ``transform`` lambda)."""
    col = F.filter(F.split(word, ""), lambda s: s != F.lit(""))
    for left, right in merge_rules:
        col = _merge_fold(col, left, right)
    return col
