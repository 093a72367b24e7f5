"""Ranked text retrieval: BM25 scoring and tf-idf term weighting.

The reference's fallback search is a boolean regex scan
(`neo4j_query_executor.py:414-459`) — every hit is equal.  A real
corpus-scale retrieval layer wants *ranked* lexical search; BM25
(Robertson/Sparck Jones, the Lucene default) is the standard scoring
function, and tf-idf term weighting is its per-document analogue used
for keyword extraction / document labeling in data-curation pipelines.

Scale design (100 TB story):
- Per-document term frequencies for a *known query* are a narrow map
  stage: ``aggregate``/``filter`` over the token array per row — no
  explode, no shuffle.  Shuffle enters only for the corpus statistics
  (N, df per query term, avgdl), which reduce to ONE broadcastable row
  via map-side partial aggregation.  Scoring is then another narrow map
  + a TakeOrderedAndProject top-k — the whole query costs one scan.
- tf-idf term extraction (query-independent) is the classic wordcount
  shape: explode → (doc, term) count → term df join (broadcast-sized
  dimension after the count) → per-doc window top-k.

Both paths compute in float64 with a single terminal 6-digit HALF_UP
round, and the expression trees mirror the DuckDB oracle SQL term for
term, so scores are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import nonempty_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(text_col: str):
    # THE token convention (textops.nonempty_tokens), lowercased — the
    # defining site shared with grams/NPMI/DSIR, not a local copy
    return nonempty_tokens(F.lower(F.col(text_col)))


def _term_tf(text_col: str, term: str):
    """Occurrences of ``term`` in the token array, as a narrow per-row
    expression.  (A separate def, not a default-arg lambda: PySpark
    reads a two-parameter lambda as the (element, index) form.)"""
    return F.size(F.filter(_tokens(text_col), lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score): top-k documents for ``query_terms`` under BM25.

    Lucene-shaped idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term
    contribution idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    Only documents matching ≥ 1 term are scored; ties break on doc id.

    Plan shape: tf per query term is an array-filter size per row (no
    explode); corpus stats (N, avgdl, df per term) collapse to one row
    that re-enters via a broadcast nested-loop join of a 1-row
    aggregate; the top-k is a global TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    # document tokens are lowercased, so terms must be too — a verbatim
    # uppercase term would silently match zero documents (r12 review)
    query_terms = [t.lower() for t in query_terms]
    # NULL-text rows: dl and every tf evaluate to NULL (size of a NULL
    # array), avg/sum skip them identically in Spark and the SQL
    # oracle, and `score > 0` drops their NULL score — so they are
    # consistently excluded, never ranked (test-pinned).
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(text_col)).cast("double").alias("dl"),
        *[
            _term_tf(text_col, term).cast("double").alias(f"tf_{i}")
            for i, term in enumerate(query_terms)
        ],
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = toks.join(F.broadcast(stats))
    contribs = [
        F.when(
            F.col(f"tf_{i}") > 0,
            F.log(
                1.0
                + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            )
            * (F.col(f"tf_{i}") * (k1 + 1.0))
            / (
                F.col(f"tf_{i}")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        ).otherwise(F.lit(0.0))
        for i in range(len(query_terms))
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        scored.select("doc_id", F.round(total, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tfidf, rank): each document's ``top_n`` most
    distinctive terms by tf·ln(N/df), ties broken lexicographically.

    The explode→count stage is plain wordcount (map-side combine); the
    df table after aggregation is vocabulary-sized, a broadcastable
    dimension; the final per-doc top-k is one window over ≤ |vocab|
    rows per document.
    """
    term_rows = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("term")
    )
    tf = term_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .filter(F.col("tfidf") > 0)
    )
