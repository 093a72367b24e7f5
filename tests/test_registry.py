"""Registry gate-order invariants: the driver's correctness gate is
budget-bounded (50 specs/round), so never-gated specs must sort before
already-green ones, and staler green rows before fresher ones.
"""

from __future__ import annotations

from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import (
    all_specs,
    gate_history,
)


def test_never_gated_specs_run_first():
    history = gate_history()
    names = [s.name for s in all_specs()]
    if not history:  # fresh checkout without driver artifacts: nothing to order by
        return
    never = [n for n in names if n not in history]
    gated = [n for n in names if n in history]
    idx = {n: i for i, n in enumerate(names)}
    if never and gated:
        assert max(idx[n] for n in never) < min(idx[n] for n in gated)


def test_gate_order_is_stalest_green_first():
    history = gate_history()
    rounds = [history.get(s.name, -1) for s in all_specs()]
    assert rounds == sorted(rounds)


def test_no_duplicate_names():
    names = [s.name for s in all_specs()]
    assert len(names) == len(set(names))
