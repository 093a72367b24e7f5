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
