"""Document classification: exact-count multinomial Naive Bayes.

The training-data-pipeline role (CCNet / fastText-style filtering): a
cheap linear text classifier assigns every document a domain / quality /
language bucket, and the curation pass keeps or re-weights buckets.
Iterative trainers (logistic regression, fastText) are not
SQL-expressible and would leave a rows-only gate; multinomial Naive
Bayes with Laplace smoothing is CLOSED-FORM — training is two count
aggregations, prediction is a log-sum argmax — so the whole
train+predict pipeline gates exactly against a DuckDB oracle (d36)
while exercising the same plan shapes a production filter needs.

Scale notes (100 TB):

- Training shuffles (label, word) counts — vocabulary-sized, with
  map-side combine; never the corpus text.
- Prediction joins the token stream against the per-class word
  log-probability model ON THE WORD KEY (shuffle join): the model is
  |vocab|·|classes| rows — often broadcastable, but a 100 TB corpus'
  open vocabulary can reach 10⁸ rows, so the operator does not force a
  broadcast hint; Catalyst/AQE picks broadcast while the model fits.
- Unseen (word, class) pairs take the smoothing floor via a left join
  + coalesce, so the model table only materializes OBSERVED pairs —
  the dense |vocab|×|classes| matrix never exists.
- Per-document scores partial-aggregate on (doc, class) before the
  argmax, which is one `max_by` over |classes| rows per doc.

Float determinism: scores are double log-sums, so their exact values
are aggregation-order-dependent; callers that gate results ship the
ARGMAX (ties broken by class name), never the raw score — the same
discipline as the sketch contracts (d30/d34/d35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import nonempty_tokens


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    alpha: float = 1.0,
) -> dict[str, DataFrame]:
    """Fit multinomial NB with Laplace smoothing ``alpha``.

    Returns the model as three small DataFrames (the Spark-native model
    format — joinable, persistable, no driver materialization):

    - ``priors``:  (label, log_prior)
    - ``words``:   (label, word, log_prob) for OBSERVED pairs only
    - ``floors``:  (label, log_floor) — the smoothing floor
      log(alpha / (total_c + alpha·V)) an unseen word contributes
    """
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(nonempty_tokens(F.col(text_col))).alias("word"),
    )
    word_counts = toks.groupBy("label", "word").agg(F.count(F.lit(1)).alias("cnt"))
    class_totals = word_counts.groupBy("label").agg(F.sum("cnt").alias("total"))
    vocab = word_counts.select("word").distinct().agg(
        F.count(F.lit(1)).alias("__v")
    )
    n_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total_docs = n_docs.agg(F.sum("n").alias("__n"))
    priors = (
        n_docs.crossJoin(F.broadcast(total_docs))
        .select("label", F.log(F.col("n") / F.col("__n")).alias("log_prior"))
    )
    denom = F.col("total") + F.lit(alpha) * F.col("__v")
    with_v = class_totals.crossJoin(F.broadcast(vocab))
    words = (
        word_counts.join(with_v, "label")
        .select(
            "label",
            "word",
            F.log((F.col("cnt") + F.lit(alpha)) / denom).alias("log_prob"),
        )
    )
    floors = with_v.select(
        "label", F.log(F.lit(alpha) / denom).alias("log_floor")
    )
    return {"priors": priors, "words": words, "floors": floors}


def nb_predict(
    docs: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, predicted): argmax-class per document under the model.

    Stated exclusions (r12 review — contracts, not accidents): a
    document whose text tokenizes to ZERO tokens produces no (id,
    word) rows and therefore NO prediction row (the prior-only argmax
    carries no token evidence; callers joining predictions back decide
    the no-evidence policy, the DSIR rule).  Symmetrically, a TRAINING
    class whose documents hold zero tokens never enters ``floors`` and
    so never competes at predict time — an evidence-free class is not
    a hypothesis; train it with at least one token to score it.

    Every document is scored against every class (the class list rides
    in via the tiny ``floors`` frame — one row per class, broadcast):
    per token occurrence, the observed log-prob or the class floor;
    summed per (doc, class); plus the prior; argmax with ties broken by
    the smallest class name (deterministic — the raw float scores never
    leave the plan, see module docstring)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(nonempty_tokens(F.col(text_col))).alias("word"),
    )
    per_class = toks.crossJoin(
        F.broadcast(model["floors"])
    )  # (id, word, label, log_floor)
    scored = per_class.join(model["words"], ["label", "word"], "left").select(
        "id",
        "label",
        F.coalesce("log_prob", F.col("log_floor")).alias("lp"),
    )
    sums = scored.groupBy("id", "label").agg(F.sum("lp").alias("s"))
    with_prior = sums.join(F.broadcast(model["priors"]), "label").select(
        "id", "label", (F.col("s") + F.col("log_prior")).alias("score")
    )
    # max_by on (score, reversed-name): highest score wins, exact ties
    # go to the lexicographically smallest label on both engines
    return with_prior.groupBy("id").agg(
        F.expr("min_by(label, struct(-score, label))").alias("predicted")
    )
