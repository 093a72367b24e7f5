"""Per-spec plan fingerprints — derived plan-change detection for the
gate order.

The r8 incident class: a change to a SHARED kernel silently alters the
executed plan of specs whose own builder didn't change, so their names
stay green in ``gate_history`` and the staleness sort never re-gates
them.  The manual ``PLAN_CHANGED_REGATE`` set covered this, but it
relied on the builder noticing every plan that routes through changed
code — twice it needed judge enforcement.

This module derives the signal instead: ``scripts/plan_fingerprints.py``
builds every registered spec's DataFrame at sf0.001, hashes the
NORMALIZED analyzed-plan string, and persists ``PLAN_FINGERPRINTS.json``
at the repo root as ``{spec: {"fp": hex16, "round": N}}`` where
``round`` is the round in which that fingerprint was first observed
(unchanged fingerprints keep their original round).  The registry's
``effective_round`` then auto-pins any spec whose fingerprint round is
NEWER than its latest green gate row — the plan changed after it was
last proved — without ever needing a SparkSession at import time.
Specs whose normalized plan is not deterministic across sessions are
recorded with ``"fp": "unstable"`` (detected by the script's
``--selfcheck`` double-build) and exempted from auto-pinning, otherwise
they would stay pinned forever and burn a gate slot every round.

Normalization strips the non-semantic variance in analyzed-plan
strings: expression ids (``#123`` — fresh per session), plan ids,
filesystem paths (temp dirs and per-sf fixture locations), and hex
tokens ≥ 8 chars (uuid-suffixed temp table/view/dir names).
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

FINGERPRINTS_FILE = Path(__file__).resolve().parents[2] / "PLAN_FINGERPRINTS.json"

UNSTABLE = "unstable"

_NORMALIZERS = (
    (re.compile(r"#\d+"), "#"),  # expression ids, fresh per session
    (re.compile(r"plan_id=\d+"), "plan_id="),
    # higher-order-function lambda variables carry a session-global
    # counter: `lambda x_2#` in one session is `lambda x_20#` in the next
    (re.compile(r"lambda (\w+?)_\d+"), r"lambda \1_"),
    (re.compile(r"(?:file:)?/[\w./\-]+"), "<path>"),  # temp dirs, sf dirs
    # uuid'd names: createDataFrame's `_pyspark_<32hex>` views, streaming
    # sink views like `e11_sink_<8hex>` — `\b` never fires after `_`,
    # so anchor on the underscore itself
    (re.compile(r"_[0-9a-f]{8,}\b"), "_<hex>"),
    (re.compile(r"\b[0-9a-f]{8,}\b"), "<hex>"),  # bare uuid/hash tokens
    (re.compile(r"cte_?\d+", re.IGNORECASE), "cte"),
)


def normalize_plan(text: str) -> str:
    for pat, repl in _NORMALIZERS:
        text = pat.sub(repl, text)
    return text


def plan_fingerprint(df) -> str:
    """hex16 sha256 of the normalized analyzed-plan string.  Classic
    (non-Connect) sessions only — exactly what the local gate runs."""
    raw = df._jdf.queryExecution().analyzed().toString()
    return hashlib.sha256(normalize_plan(raw).encode()).hexdigest()[:16]


def load_fingerprints() -> dict[str, dict]:
    """{spec: {"fp": hex16 | "unstable", "round": int}} from the
    committed file; {} when absent (fresh checkout → no auto-pins)."""
    try:
        data = json.loads(FINGERPRINTS_FILE.read_text())
    except (OSError, ValueError):
        return {}
    if not isinstance(data, dict):
        return {}
    return {
        k: v
        for k, v in data.items()
        if isinstance(v, dict) and "fp" in v and isinstance(v.get("round"), int)
    }


def save_fingerprints(data: dict[str, dict]) -> None:
    FINGERPRINTS_FILE.write_text(
        json.dumps(dict(sorted(data.items())), indent=1) + "\n"
    )
