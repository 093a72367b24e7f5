"""Registry gate-order invariants: the driver's correctness gate is
budget-bounded (50 specs/round), so never-gated specs must sort before
already-green ones, and staler green rows before fresher ones.  The
assertions use the registry's own ``effective_round`` key (which treats
``PLAN_CHANGED_REGATE`` members as staler than every green spec), so a
legitimate plan-change pin can never contradict these invariants.
"""

from __future__ import annotations

from advanced_technologies_of_china_graph_database_construction_spark.plans.registry import (
    PLAN_CHANGED_REGATE,
    all_specs,
    effective_round,
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


def test_plan_changed_pins_precede_every_green_spec():
    history = gate_history()
    if not history:
        return
    names = [s.name for s in all_specs()]
    idx = {n: i for i, n in enumerate(names)}
    pinned = [n for n in names if n in PLAN_CHANGED_REGATE and n in history]
    green = [
        n for n in names if n in history and n not in PLAN_CHANGED_REGATE
    ]
    if pinned and green:
        assert max(idx[n] for n in pinned) < min(idx[n] for n in green)


def test_gate_order_is_stalest_green_first():
    history = gate_history()
    rounds = [effective_round(s.name, history) for s in all_specs()]
    assert rounds == sorted(rounds)


def test_pins_name_registered_specs():
    names = {s.name for s in all_specs()}
    assert PLAN_CHANGED_REGATE <= names


def test_no_duplicate_names():
    names = [s.name for s in all_specs()]
    assert len(names) == len(set(names))
