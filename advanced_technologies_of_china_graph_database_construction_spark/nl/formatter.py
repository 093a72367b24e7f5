"""F14: result stringification — render Rows / lists / maps into
LLM-readable text (`neo4j_query_executor.py:45-121`), presentation-layer
only (operates on collected rows, never inside the plan).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Row


def format_value(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, Row):
        return "{" + ", ".join(f"{k}: {format_value(x)}" for k, x in v.asDict().items()) + "}"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {format_value(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(format_value(x) for x in v) + "]"
    # One record = one line: newlines inside string values are escaped so
    # the numbered-line framing (and anything counting records from the
    # text) stays exact.
    return str(v).replace("\r", "\\r").replace("\n", "\\n")


def format_rows(rows: list[Row]) -> str:
    """Numbered record lines, `key: value` pairs per row."""
    lines = []
    for i, r in enumerate(rows, 1):
        body = ", ".join(f"{k}: {format_value(v)}" for k, v in r.asDict().items())
        lines.append(f"{i}. {body}")
    return "\n".join(lines)
