"""Local replica of the driver's correctness gate: run the Spark query
and the DuckDB oracle SQL on the same parquet tables, compare row count,
schema (column names), and an order-insensitive value comparison.

TYPE-FAITHFUL since r13: the driver's value hash serializes the pandas
representation, so an oracle that ships HUGEINT (DuckDB ``sum()`` →
float64 via ``.df()``) against a Spark BIGINT (int64) hash-mismatches at
the driver even when every value compares equal — exactly how d46 passed
three local replicas and then failed the r12 gate (``6.0 == 6`` is True
in Python).  ``_norm_cell`` therefore tags every numeric with its TYPE
KIND (int vs float) so a representation drift fails HERE first.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np

from advanced_technologies_of_china_graph_database_construction_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(float(v), 6))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        # DuckDB DECIMAL columns surface as object-dtype Decimals via
        # .df(), and the DRIVER hashes that pandas representation — so a
        # DECIMAL oracle vs a Spark double/bigint must FAIL here, with
        # the same explicit kind-tag signal as the HUGEINT case (r13
        # ADVICE), not a confusing raw-value diff.  Distinct kind "d":
        # normalizing Decimal like float would HIDE the driver mismatch.
        return ("d", round(float(v), 6))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key(v):
    """Deterministic total order over NORMALIZED cells — sorting by the
    value itself (not ``repr``): two distinct normalized values must
    never sort ambiguously, and mixed None/str/tuple cells must not
    raise on comparison (r13 verdict nit)."""
    if v is None:
        return (0, "")
    if isinstance(v, tuple):
        # kind-tagged numerics ("b"/"f"/"i"/"d", x) and nested arrays
        return (1, tuple(_sort_key(x) for x in v))
    return (2, type(v).__name__, str(v))


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda row: tuple(_sort_key(c) for c in row))


def compare(spark_df, con, sql):
    sdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    s_rows = normalize([tuple(r) for r in sdf.itertuples(index=False)], list(sdf.columns))
    o_rows = normalize([tuple(r) for r in odf.itertuples(index=False)], list(odf.columns))
    assert len(s_rows) == len(o_rows), f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
