"""Query-spec plumbing shared by all plan modules.

Each engine query is a ``QuerySpec``: a Spark callable ``(spark, sf_dir)
-> DataFrame`` plus (when SQL-expressible) the ANSI-SQL oracle string the
driver runs through DuckDB on the same parquet tables.  Column names are
aliased identically on both sides — the driver sorts columns by name and
hashes values order-insensitively.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    description: str = ""
    # queries worth timing in bench.py (headline set)
    bench: bool = False
    tags: list[str] = field(default_factory=list)
