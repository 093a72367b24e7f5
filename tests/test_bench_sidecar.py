"""bench.py sidecar merge-with-provenance (r16): a later bench pass
must never clobber committed entry-wise floors (the r15 footgun — a
busier-box driver pass overwrote the quiet-box merge), and a sidecar of
a DIFFERENT scale factor must be refused, not merged."""

from __future__ import annotations

import pytest

from bench import _merge_detail


def _detail(queries, runs=None, sf=0.1, passes=None):
    d = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": queries,
        "runs": runs or {k: [v] for k, v in queries.items()},
        "sf": sf,
        "env": {"cpus_conf": "32"},
    }
    if passes is not None:
        d["merged_passes"] = passes
    return d


def test_merge_keeps_entrywise_floors_and_appends_runs():
    old = _detail({"a": 1.0, "b": 5.0}, runs={"a": [1.0, 1.2], "b": [5.0]})
    new = _detail({"a": 2.0, "b": 3.0, "c": 7.0})
    merged = _merge_detail(old, new)
    assert merged["queries"] == {"a": 1.0, "b": 3.0, "c": 7.0}
    assert merged["value"] == 11.0
    assert merged["runs"]["a"] == [1.0, 1.2, 2.0]  # appended, not replaced
    assert merged["runs"]["c"] == [7.0]
    assert merged["merged_passes"] == 2


def test_merge_counts_passes_cumulatively():
    old = _detail({"a": 1.0}, passes=3)
    merged = _merge_detail(old, _detail({"a": 0.9}))
    assert merged["merged_passes"] == 4
    assert merged["queries"]["a"] == 0.9


def test_missing_or_foreign_sidecar_writes_new_payload_verbatim():
    new = _detail({"a": 2.0})
    assert _merge_detail(None, new) is new
    assert _merge_detail({"not": "a sidecar"}, new) is new


def test_different_sf_refuses_to_merge():
    old = _detail({"a": 1.0}, sf=0.1)
    new = _detail({"a": 2.0}, sf=0.001)
    with pytest.raises(ValueError, match="sf mismatch"):
        _merge_detail(old, new)
