"""Central query registry — one QuerySpec per implemented operator from
SURVEY.md §2, exported to the driver via ``__spark_entry__.py``.
"""

from __future__ import annotations

from .spec import QuerySpec


def all_specs() -> list[QuerySpec]:
    """Registry order = gate-run order.  Families the round-1 driver run
    never reached (it stopped at spec #50) go FIRST so a budget-bounded
    correctness run covers them before re-proving the already-green
    relational/graph/docs families.
    """
    from . import graph_queries, relational

    modules = []
    for optional in (
        "ingest_queries",
        "events_queries",
        "enrich_queries",
        "media_queries",
        "nl_queries",
        "skew_queries",
        "analytics_queries",
        "er_queries",
        "docs_queries",
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
    return specs


def spec_map() -> dict[str, QuerySpec]:
    return {s.name: s for s in all_specs()}
