"""p01 composed build-path: stage hand-off and ER-election unit tests
(the driver gate + gate_replica cover the full oracle equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.plans.pipeline_queries import (
    P01_VOCAB,
    keyword_er_mapping,
    p01_end_to_end_build_path,
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
