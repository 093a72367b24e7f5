"""Cross-engine contracts for the functions.integrity fragments.

These are the properties the i05/d40 gates CANNOT prove on the NULL-free
fixtures: dialect agreement in the presence of NULL fields, and the
field-shift sensitivity the NULL sentinel exists to provide (a bare
null-skipping concat_ws hashes lang=NULL,text='en' identically to
lang='en',text=NULL — invisible to the very replica audit d40 claims).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.functions.integrity import (
    duck_md5_slice,
    duck_row_key,
    spark_md5_slice,
    spark_row_key,
)

ROWS = [
    (1, "src1", "en", "hello"),
    (2, "src1", None, "wörld"),        # NULL mid-field
    (3, "src1", "en", None),           # NULL last field
    (4, "src2", None, None),           # two NULLs
    (5, "src2", "a|b", "pipe|in|data"),  # separator collisions
]
SCHEMA = "doc_id long, source string, lang string, text string"


def _duck(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, source VARCHAR, lang VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    return con


@pytest.mark.parametrize("width", [8, 15])
def test_md5_slice_dialects_agree_with_nulls(spark, width):
    df = spark.createDataFrame(ROWS, SCHEMA)
    row = spark_row_key("doc_id", "source", "lang", "text")
    got = {
        r.doc_id: r.cks
        for r in df.selectExpr(
            "doc_id", f"{spark_md5_slice(row, width)} AS cks"
        ).collect()
    }
    con = _duck(ROWS)
    drow = duck_row_key("doc_id", "source", "lang", "text")
    want = dict(
        con.execute(
            f"SELECT doc_id, {duck_md5_slice(drow, width)} FROM t"
        ).fetchall()
    )
    assert got == want


def test_null_sentinel_detects_field_shift(spark):
    """The corruption class the sentinel exists for: a value sliding
    from one field into an adjacent one must change the row key (a
    null-skipping join maps both layouts to the same string)."""
    shifted = [(2, "src1", "wörld", None)]  # row 2's text slid into lang
    df = spark.createDataFrame(ROWS[1:2] + shifted, SCHEMA)
    row = spark_row_key("doc_id", "source", "lang", "text")
    keys = [r.k for r in df.selectExpr(f"{row} AS k").collect()]
    assert keys[0] != keys[1], keys


def test_xor_and_sum_folds_agree_on_null_bearing_groups(spark):
    """The d40 aggregate shape end-to-end over NULL-bearing rows: both
    engines must fold every row (the sentinel keeps md5 non-NULL, so
    nothing silently drops out of bit_xor/sum while count still sees
    the row)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    row = spark_row_key("doc_id", "source", "lang", "text")
    got = {
        r.source: (r.n, r.x, r.s)
        for r in df.selectExpr(
            "source",
            f"{spark_md5_slice(row, 15)} AS h15",
            f"{spark_md5_slice(row, 8)} AS h8",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(h15)").alias("x"),
            F.expr("sum(h8)").alias("s"),
        )
        .collect()
    }
    con = _duck(ROWS)
    drow = duck_row_key("doc_id", "source", "lang", "text")
    want = {
        src: (n, x, s)
        for src, n, x, s in con.execute(
            f"""SELECT source, count(*), bit_xor({duck_md5_slice(drow, 15)}),
                       sum({duck_md5_slice(drow, 8)})::BIGINT
                FROM t GROUP BY source"""
        ).fetchall()
    }
    assert got == want


# ------------------- replica gate fidelity (tests/oracle.py) --------------


def test_replica_norm_cell_is_type_faithful():
    """r12's d46 incident, pinned at the replica layer: the driver's
    value hash serializes the pandas representation, so an oracle
    shipping HUGEINT/DECIMAL (float64 via .df()) against Spark's BIGINT
    (int64) fails the driver even when every value compares equal in
    Python (6.0 == 6).  _norm_cell must therefore tag numerics with
    their type KIND — int and int-valued float must normalize
    DIFFERENTLY — while staying stable for dates, NaN, strings, arrays
    and None."""
    import datetime
    import math

    import numpy as np

    from tests.oracle import _norm_cell

    # the d46 class: int-valued float != int
    assert _norm_cell(6.0) != _norm_cell(6)
    assert _norm_cell(np.float64(6.0)) == _norm_cell(6.0)
    assert _norm_cell(np.int64(6)) == _norm_cell(6)
    # bool is not int (python bool subclasses int — order matters)
    assert _norm_cell(True) != _norm_cell(1)
    # floats still rounded at 6 places; NaN normalized and equal to NaN
    assert _norm_cell(0.1234569) == _norm_cell(0.1234571)
    assert _norm_cell(float("nan")) == _norm_cell(np.float64("nan"))
    assert _norm_cell(float("nan")) != _norm_cell(0.0)
    # None, dates, strings, nested arrays
    assert _norm_cell(None) is None
    d = datetime.date(2026, 8, 16)
    assert _norm_cell(d) == d.isoformat()
    assert _norm_cell("x") == "x"
    assert _norm_cell([1, 2.0]) == _norm_cell(np.array([1, 2.0], dtype=object))
    assert _norm_cell([1]) != _norm_cell([1.0])


def test_replica_compare_catches_kind_mismatch(spark):
    """End-to-end: a Spark BIGINT column vs a DuckDB HUGEINT oracle
    (sum() over BIGINT) must FAIL the replica compare even though every
    value is equal — exactly what the r12 driver gate saw on d46."""
    import duckdb
    import pytest

    from tests.oracle import compare

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.execute("INSERT INTO t VALUES (2), (4)")
    sdf = spark.createDataFrame([(6,)], "s bigint")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(sdf, con, "SELECT sum(x) AS s FROM t")  # HUGEINT -> float64
    # and the cast form passes
    compare(sdf, con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM t")


def test_replica_norm_cell_tags_decimal_kind():
    """r13 ADVICE: DuckDB DECIMAL columns surface as object-dtype
    ``decimal.Decimal`` via .df() — the driver hashes that pandas
    representation, so a DECIMAL oracle vs a Spark double/bigint must
    fail the replica with an explicit kind tag (like the HUGEINT case),
    not an unnormalized raw-value diff."""
    import decimal

    from tests.oracle import _norm_cell

    d = decimal.Decimal("1.5")
    assert _norm_cell(d) == ("d", 1.5)
    # distinct KINDS from both float and int — the mismatch must show
    assert _norm_cell(d) != _norm_cell(1.5)
    assert _norm_cell(decimal.Decimal(6)) != _norm_cell(6)
    # 6-place rounding matches the float discipline
    assert _norm_cell(decimal.Decimal("0.1234569")) == (
        _norm_cell(decimal.Decimal("0.1234571"))
    )


def test_replica_compare_catches_decimal_kind_mismatch(spark):
    """End-to-end Decimal drift: this duckdb build converts DECIMAL to
    float64 in .df(), so the object-dtype ``decimal.Decimal`` direction
    comes from SPARK — a DecimalType column via toPandas() vs an
    equal-valued DuckDB DOUBLE oracle must FAIL the replica compare
    (the driver's pandas-representation hash would fail it too); the
    double-cast Spark form passes."""
    import duckdb
    import pytest

    from tests.oracle import compare

    con = duckdb.connect()
    sdf = spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS s")
    assert str(sdf.toPandas()["s"].dtype) == "object"  # Decimal objects
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(sdf, con, "SELECT CAST(1.5 AS DOUBLE) AS s")
    # and the double-cast Spark form passes
    compare(sdf.selectExpr("CAST(s AS DOUBLE) AS s"), con,
            "SELECT CAST(1.5 AS DOUBLE) AS s")


def test_replica_normalize_sorts_mixed_type_rows():
    """r13 verdict nit: normalize() must sort rows by a total order on
    the NORMALIZED values themselves, not repr — mixed None/str/tuple
    cells must neither raise TypeError nor let two distinct value sets
    slip past the zip-compare because of sort ambiguity."""
    from tests.oracle import normalize

    rows = [(None, "b"), (1, "a"), (2.0, "a"), (None, None), ("x", "y")]
    out = normalize(rows, ["c1", "c2"])
    assert len(out) == 5  # total order covered every row without raising
    # same multiset, different input order → identical normalized output
    assert normalize(rows[::-1], ["c1", "c2"]) == out
    # two column orders of the same frame normalize identically
    swapped = [(b, a) for a, b in rows]
    assert normalize(swapped, ["c2", "c1"]) == out
    # int-valued float and int rows remain DISTINCT after sorting
    a = normalize([(1,), (2.0,)], ["c"])
    b = normalize([(1.0,), (2,)], ["c"])
    assert a != b
