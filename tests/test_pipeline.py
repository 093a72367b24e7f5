"""p01 composed build-path: stage hand-off and ER-election unit tests
(the driver gate + gate_replica cover the full oracle equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.plans.pipeline_queries import (
    P01_VOCAB,
    keyword_er_mapping,
    p01_end_to_end_build_path,
    p02_enrichment_path,
)

from .conftest import SF_SMOKE


def test_keyword_er_collapses_typo_clusters_to_min_surface(spark):
    """{canonical, typo} pairs must merge with the lexicographic min
    (the typo, a strict prefix) elected; unrelated surfaces map to
    themselves (noise → identity)."""
    rec = spark.createDataFrame(
        [(1, ["kwaaa", "kwbbb"]), (2, ["kwaa"]), (3, ["zzz"])],
        "rid long, keywords array<string>",
    )
    got = {r["id"]: r["canonical"] for r in keyword_er_mapping(rec).collect()}
    assert got == {"kwaaa": "kwaa", "kwaa": "kwaa", "kwbbb": "kwbbb", "zzz": "zzz"}


def test_p01_full_run_produces_only_canonical_surfaces(spark):
    """End-to-end smoke at sf0.001: every output keyword is a post-ER
    canonical (the 4-char typo form) — a single 5-char survivor would
    mean the ER stage lost a cluster or a hand-off dropped the
    mapping."""
    out = p01_end_to_end_build_path(spark, SF_SMOKE).collect()
    assert len(out) > 0
    kws = {r["keyword"] for r in out}
    assert kws == {n[:-1] for n in P01_VOCAB}
    assert all(r["n_docs"] > 0 for r in out)


def test_p02_dead_letter_absent_and_gloss_stripped(spark):
    """The two hand-offs the composed enrichment path exists to pin:
    (1) dead-lettered docs (doc_id % 17 == 3) never reach the store —
    their doc count is missing from the per-author totals; (2) the F12
    parenthetical strip ran inside the sink, so every served topic is
    a bare taxonomy name, no ' (... gloss)' survivor."""
    from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table
    from advanced_technologies_of_china_graph_database_construction_spark.operators.enrich import TAXONOMY

    out = p02_enrichment_path(spark, SF_SMOKE).collect()
    assert len(out) > 0
    names = {name for _, _, name, _ in TAXONOMY}
    assert {r["topic"] for r in out} <= names  # gloss stripped
    served = sum(r["n_docs"] for r in out)
    docs = load_table(spark, SF_SMOKE, "documents")
    n_total = docs.count()
    n_failed = docs.filter(F.col("doc_id") % 17 == 3).count()
    assert n_failed > 0
    assert served == n_total - n_failed  # dead letters excluded, rest kept
