"""Central query registry — one QuerySpec per implemented operator from
SURVEY.md §2, exported to the driver via ``__spark_entry__.py``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from .spec import QuerySpec

# Specs whose EXECUTED PLAN changed after their latest green driver-gate
# row, promoted ahead of every already-green spec in the gate order: the
# staleness sort alone cannot see a plan change (the spec name stayed
# green), but a changed plan deserves the hard driver signal, not just
# the session replica.  Remove an entry once the next CORRECTNESS_r*
# round records it green again (gate_history then reflects the new
# plan and the ordinary rotation resumes).  Pinned specs sort AFTER
# genuinely never-gated ones (a spec with no green row at all is the
# bigger unknown) but BEFORE all green ones — see effective_round().
#
# Currently empty: d39/e26's r8 cdc-plan pins were cleared after their
# r9 gate rows came back green on the changed plan (the set's removal
# condition), as were g35/g36's r7 sparse-plan pins after r8.
PLAN_CHANGED_REGATE: set[str] = set()


def effective_round(name: str, history: dict[str, int] | None = None) -> float:
    """The sort key the gate order actually uses for a spec: -1 if it has
    never had a green driver-gate row, -0.5 if its plan changed after its
    last green row (``PLAN_CHANGED_REGATE``), else that row's round.
    Exposed so the invariant tests assert on the same key the sort uses —
    a legitimate pin can then never contradict the ordering invariant.
    """
    if history is None:
        history = gate_history()
    if name not in history:
        return -1.0
    if name in PLAN_CHANGED_REGATE:
        return -0.5
    return float(history[name])


def gate_history() -> dict[str, int]:
    """spec name → latest round whose driver gate recorded a fully-green
    row (rows+schema+hash all matched), read from the ``CORRECTNESS_r*``
    files the driver writes at the repo root.  Specs absent from every
    file have never been gated; specs present but not fully green are
    treated the same as never-green so they re-run at the front.
    """
    root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def all_specs() -> list[QuerySpec]:
    """Registry order = gate-run order.  The driver's correctness gate is
    budget-bounded (50 specs per round), so ordering is structural:
    ascending by "latest round with a green gate row" — never-gated specs
    first, then stalest-green first — with declaration order as the
    stable tiebreak.  A spec added this round therefore always reaches
    the gate before any already-green spec is re-proved.
    """
    from . import graph_queries, relational

    modules = []
    # Module order is the tiebreak among EQUALLY-stale specs (the sort
    # below is stable).  Families whose shared kernels changed most
    # recently (er/docs share the cosine+GEMM kernels touched in r3-r4;
    # events gained the streaming face) lead, so when the driver's
    # 50-spec budget can't cover every stale spec, the hard gate signal
    # lands on the code with the newest changes first.
    for optional in (
        "er_queries",
        "docs_queries",
        "events_queries",
        "ingest_queries",
        "enrich_queries",
        "media_queries",
        "nl_queries",
        "skew_queries",
        "analytics_queries",
        "sink_queries",
        "pipeline_queries",
        "spatial_queries",
    ):
        try:
            modules.append(__import__(f"{__package__}.{optional}", fromlist=["SPECS"]))
        except ImportError:
            pass
    modules += [relational, graph_queries]
    specs: list[QuerySpec] = []
    seen: set[str] = set()
    for m in modules:
        for s in m.SPECS:
            if s.name in seen:
                raise ValueError(f"duplicate query name {s.name}")
            seen.add(s.name)
            specs.append(s)
    history = gate_history()
    # stable sort keeps decl order; PLAN_CHANGED_REGATE pins sort ahead
    # of every green spec so a silently-changed plan reaches the driver
    # gate, but after never-gated ones (effective_round: -1 / -0.5 / rnd)
    specs.sort(key=lambda s: effective_round(s.name, history))
    return specs


def spec_map() -> dict[str, QuerySpec]:
    return {s.name: s for s in all_specs()}
