"""N-gram language-model scoring: the perplexity quality filter.

The production shape (CCNet): score every document under a reference
language model and drop/bucket by perplexity.  A neural or KenLM model
is not SQL-derivable, but a BIGRAM model with Laplace smoothing is
CLOSED-FORM — training is one bigram count aggregation, scoring is a
join + log-sum — so the whole train+score pipeline gates exactly
against a DuckDB oracle (d37) while exercising the same plan shapes
the real filter needs (model join on the n-gram key, per-document
reduction).

Smoothing (add-α, α=1): P(w2|w1) = (c(w1,w2)+α) / (c(w1·)+α·V) where
c(w1·) is the count of bigrams STARTING with w1 and V the unigram
vocabulary size; a w1 never seen as a bigram start backs off to the
uniform floor α/(α·V) = 1/V.

Scale notes (100 TB): the model is |observed bigrams| rows (never the
dense V² matrix); scoring joins the corpus' bigram stream against it
on the bigram key — shuffle join with map-side combine on the (doc)
reduction; the starts/floor side is |V|-sized.  Float discipline (the
d30/d34/d36 rule): per-document log-prob sums are aggregation-order-
dependent doubles, so gated outputs ship INTEGERS (bigram counts,
unseen counts, floor(perplexity) — a 1e-13-relative float error never
crosses an integer floor at realistic perplexities), never raw sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import nonempty_tokens


_EMPTY_BIGRAMS = "array<struct<w1:string,w2:string>>"


def _bigrams(text_col):
    """Per-row array of (w1, w2) structs over whitespace tokens; empty
    for <2 tokens (sequence(1, k) DESCENDS for k<1 — the word_ngrams
    short-circuit, and the same bind-the-token-array-once idiom)."""
    toks = nonempty_tokens(text_col)
    return F.coalesce(
        F.element_at(
            F.transform(
                F.array(toks),
                lambda a: F.when(
                    F.size(a) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(a) - 1),
                        lambda i: F.struct(
                            F.element_at(a, i).alias("w1"),
                            F.element_at(a, i + F.lit(1)).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast(_EMPTY_BIGRAMS)),
            ),
            1,
        ),
        F.array().cast(_EMPTY_BIGRAMS),
    )


def bigram_lm_train(
    docs: DataFrame, text_col: str = "text", alpha: float = 1.0
) -> dict[str, DataFrame]:
    """Fit the add-α bigram model.  Returns joinable model frames:

    - ``bigrams``: (w1, w2, log_prob) for observed bigrams
    - ``starts``:  (w1, log_floor) — unseen-w2 floor per seen start
    - ``consts``:  1 row (log_uniform) — unseen-w1 floor ln(α/(α·V))
    """
    bg = docs.select(F.explode(_bigrams(F.col(text_col))).alias("b")).select(
        "b.w1", "b.w2"
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    c1 = c2.groupBy("w1").agg(F.sum("cnt").alias("total"))
    vocab = (
        docs.select(F.explode(nonempty_tokens(F.col(text_col))).alias("w"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("__v"))
    )
    denom = F.col("total") + F.lit(alpha) * F.col("__v")
    c1v = c1.crossJoin(F.broadcast(vocab))
    bigrams = c2.join(c1v, "w1").select(
        "w1", "w2", F.log((F.col("cnt") + F.lit(alpha)) / denom).alias("log_prob")
    )
    starts = c1v.select("w1", F.log(F.lit(alpha) / denom).alias("log_floor"))
    consts = vocab.select(
        F.log(F.lit(alpha) / (F.lit(alpha) * F.col("__v"))).alias("log_uniform")
    )
    return {"bigrams": bigrams, "starts": starts, "consts": consts}


def bigram_perplexity(
    docs: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, n_unseen, ppl_floor): per-document perplexity
    under the model.  ``n_unseen`` counts bigrams absent from the model
    (they took a smoothing floor); ``ppl_floor`` = floor(exp(−Σlp/n)) as
    a gate-stable integer, NULL for documents with <2 tokens."""
    bg = docs.select(
        F.col(id_col).alias("id"), F.explode_outer(_bigrams(F.col(text_col))).alias("b")
    ).select("id", "b.w1", "b.w2")
    scored = (
        bg.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["starts"], "w1", "left")
        .crossJoin(F.broadcast(model["consts"]))
        .select(
            "id",
            F.col("w1").isNotNull().alias("has_bigram"),
            F.coalesce("log_prob", "log_floor", "log_uniform").alias("lp"),
            F.col("log_prob").isNull().alias("unseen"),
        )
    )
    agg = scored.groupBy("id").agg(
        F.sum(F.when(F.col("has_bigram"), 1).otherwise(0)).alias("n_bigrams"),
        F.sum(F.when(F.col("has_bigram") & F.col("unseen"), 1).otherwise(0)).alias(
            "n_unseen"
        ),
        F.sum(F.when(F.col("has_bigram"), F.col("lp"))).alias("__s"),
    )
    return agg.select(
        "id",
        "n_bigrams",
        "n_unseen",
        F.when(
            F.col("n_bigrams") > 0,
            F.floor(F.exp(-F.col("__s") / F.col("n_bigrams"))),
        ).alias("ppl_floor"),
    )
