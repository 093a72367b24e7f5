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


@pytest.mark.parametrize("spec", [s for s in SPECS if not s.oracle], ids=lambda s: s.name)
def test_rows_only(spark, spec):
    """Oracle-less specs (none since r11 — d28 gained an unrolled
    DuckDB oracle) still must produce real rows on the fixture —
    count() > 0, not the vacuous >= 0 — their value-level verification
    lives in dedicated reference suites."""
    df = spec.fn(spark, SF_CORRECT)
    assert df.count() > 0
    assert len(df.columns) > 0


def _deferred_specs():
    from advanced_technologies_of_china_graph_database_construction_spark.plans import (
        analytics_queries,
        docs_queries,
    )

    return docs_queries.DEFERRED_SPECS + analytics_queries.DEFERRED_SPECS


@pytest.mark.parametrize("spec", _deferred_specs(), ids=lambda s: s.name)
def test_deferred_specs_match_oracle(spark, con, spec):
    """Specs staged for next round's registry (kept out of this round's
    budget-bounded gate) must ALREADY pass the same oracle comparison,
    so registering them later is a zero-risk one-line move.  Oracle-less
    specs get the driver's weaker rows-only check here too (their hard
    verification lives in their own test file, e.g. test_bpe.py)."""
    df = spec.fn(spark, SF_CORRECT)
    if spec.oracle is None:
        assert df.count() > 0 and len(df.columns) > 0
    else:
        compare(df, con, spec.oracle)


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
