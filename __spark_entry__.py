"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator as (spark, sf_dir) ->
DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL used by
the driver's correctness gate (row-count + schema + order-insensitive
value hash).  Implementation lives in
``advanced_technologies_of_china_graph_database_construction_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from advanced_technologies_of_china_graph_database_construction_spark.plans.graph_queries import (
        g10_docs_per_year_for_keyword,
    )

    return g10_docs_per_year_for_keyword(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
