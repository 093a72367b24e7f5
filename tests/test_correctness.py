"""Replicates the driver's DuckDB-oracle gate for every registered query
that declares an oracle, at sf0.01 (the driver's correctness SF).
"""

from __future__ import annotations

import pytest

from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import all_specs

from .conftest import SF_CORRECT
from .oracle import compare, duckdb_conn

SPECS = all_specs()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_match(spark, con, spec):
    df = spec.fn(spark, SF_CORRECT)
    compare(df, con, spec.oracle)


def test_every_spec_has_an_oracle():
    """Since r11 every registered spec is hash-gated against a DuckDB
    oracle — the rows-only weak check is retired.  This guard keeps the
    set empty: a new oracle-less spec must be a deliberate, documented
    exception, not a silent registration."""
    assert [s.name for s in SPECS if not s.oracle] == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"year", "n_docs"}
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(SPECS)
