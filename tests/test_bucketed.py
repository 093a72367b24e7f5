"""Bucketed store: the doc↔edge join must plan with no Exchange on
either side (co-located buckets), and return the same rows as the
unbucketed join."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.operators.graph import (
    REL_HAS_KEYWORD,
    build_graph,
)
from advanced_technologies_of_china_graph_database_construction_spark.sources.bucketed import (
    bucketed_traversal,
    write_bucketed_graph,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange_and_matches(spark):
    # disable broadcast so the join strategy decision is about shuffles,
    # not dim size (at 100 TB neither side broadcasts)
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        g = build_graph(spark, SF)
        docs_tbl, edges_tbl = write_bucketed_graph(g, spark, n_buckets=8)
        joined = bucketed_traversal(spark, docs_tbl, edges_tbl, REL_HAS_KEYWORD)

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        got = joined.select("src", "dst", "doc_id").count()
        e = g.edges_of(REL_HAS_KEYWORD)
        want = e.join(g.docs, e.src == g.docs.doc_id).count()
        assert got == want and got > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
        for tbl in ("bkt_docs", "bkt_edges"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_clear_stale_location_scoped_to_default_db(spark, tmp_path):
    """The stale-location helper must not touch the filesystem for
    qualified names or from a non-default current database — the
    warehouse/<tbl> layout it derives only holds for unqualified
    default-database tables (a db.tbl lives under <db>.db/<tbl>)."""
    from urllib.parse import urlparse, unquote
    from pathlib import Path

    from advanced_technologies_of_china_graph_database_construction_spark.sources.bucketed import (
        _clear_stale_location,
    )

    wh = Path(unquote(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path))
    stale = wh / "stale_probe_tbl"
    stale.mkdir(parents=True, exist_ok=True)
    try:
        # qualified name: untouched even though the dir exists
        _clear_stale_location(spark, "somedb.stale_probe_tbl")
        assert stale.is_dir()
        # non-default current database: untouched
        spark.sql("CREATE DATABASE IF NOT EXISTS clear_probe_db")
        spark.catalog.setCurrentDatabase("clear_probe_db")
        try:
            _clear_stale_location(spark, "stale_probe_tbl")
            assert stale.is_dir()
        finally:
            spark.catalog.setCurrentDatabase("default")
        # default db + unqualified + catalog-unknown: removed
        _clear_stale_location(spark, "stale_probe_tbl")
        assert not stale.exists()
    finally:
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
        spark.sql("DROP DATABASE IF EXISTS clear_probe_db")
