"""Cross-engine row-checksum fragments (single source for i05/d40).

The integrity specs fold md5 slices of a canonical row string on BOTH
engines, so the two dialect fragments must stay bit-compatible — any
tweak (slice width, separator, NULL sentinel, hash fn) applies HERE
once instead of drifting across four hand-inlined copies.

Canonical row string: fields cast to string, NULLs replaced by an
explicit ``<null>`` sentinel, joined with ``|``.  The sentinel matters
twice: a bare ``concat_ws`` SKIPS nulls (Spark) while ``||``
NULL-PROPAGATES (DuckDB) — silently divergent — and a null-skipping
join also hashes a row whose value slid from one field to the next
(lang=NULL, text='en' vs lang='en', text=NULL) identically, which is
exactly the corruption a replica checksum exists to catch.

Slice width 15 hex chars = 60 bits: far enough from the 2^63 signed
ceiling for XOR folds; SUM folds use width 8 (32 bits, overflow-safe
to ~2^31 rows per group).
"""

from __future__ import annotations

NULL_SENTINEL = "<null>"


def spark_row_key(*cols: str) -> str:
    """Spark-SQL fragment: the canonical NULL-sentinel pipe-joined row
    string over the given column expressions."""
    parts = ", ".join(
        f"coalesce(cast({c} as string), '{NULL_SENTINEL}')" for c in cols
    )
    return f"concat_ws('|', {parts})"


def duck_row_key(*cols: str) -> str:
    """DuckDB-SQL fragment computing the IDENTICAL row string."""
    return " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{NULL_SENTINEL}')" for c in cols
    )


def spark_md5_slice(payload_sql: str, width: int = 15) -> str:
    """Spark-SQL fragment: the first ``width`` hex chars of
    md5(payload) as a BIGINT (verified bit-exact vs ``duck_md5_slice``
    in tests/test_integrity.py)."""
    return f"cast(conv(substr(md5({payload_sql}), 1, {width}), 16, 10) as bigint)"


def duck_md5_slice(payload_sql: str, width: int = 15) -> str:
    """DuckDB-SQL fragment computing the IDENTICAL slice."""
    return f"('0x' || substr(md5({payload_sql}), 1, {width}))::BIGINT"
