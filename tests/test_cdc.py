"""Unit coverage for operators/cdc — MERGE semantics and latest-wins
log compaction, checked against hand-computed final states (the gated
d39 spec covers the oracle face; these pin the operator contract on
adversarial little logs).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from advanced_technologies_of_china_graph_database_construction_spark.operators.cdc import (
    apply_changes,
    compact_changes,
)

BASE_SCHEMA = "doc_id long, text string"
LOG_SCHEMA = "doc_id long, text string, seq long, op string"


def _state(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_apply_changes_upsert_delete_insert(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], BASE_SCHEMA)
    log = spark.createDataFrame(
        [
            (1, "a2", 1, "upsert"),   # replace existing
            (2, None, 1, "delete"),   # remove existing
            (9, "new", 1, "upsert"),  # insert new key
        ],
        LOG_SCHEMA,
    )
    got = _state(apply_changes(base, log, seq_col="seq"))
    assert got == {1: "a2", 3: "c", 9: "new"}


def test_compaction_late_delete_beats_early_upsert(spark):
    base = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    log = spark.createDataFrame(
        [(1, "a2", 1, "upsert"), (1, None, 2, "delete")], LOG_SCHEMA
    )
    assert _state(apply_changes(base, log, seq_col="seq")) == {}


def test_compaction_late_upsert_beats_early_delete(spark):
    base = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    log = spark.createDataFrame(
        [(1, None, 1, "delete"), (1, "back", 2, "upsert")], LOG_SCHEMA
    )
    assert _state(apply_changes(base, log, seq_col="seq")) == {1: "back"}


def test_compact_changes_keeps_max_seq_row(spark):
    log = spark.createDataFrame(
        [(1, "v1", 1, "upsert"), (1, "v3", 3, "upsert"), (1, "v2", 2, "upsert")],
        LOG_SCHEMA,
    )
    rows = compact_changes(log).collect()
    assert len(rows) == 1 and rows[0]["text"] == "v3" and rows[0]["seq"] == 3


def test_contract_violating_tie_elects_partitioning_independent_survivor(spark):
    """A log that violates the LSN-uniqueness contract — same (key, seq),
    different payloads — must still elect ONE survivor that is a pure
    function of the row set: the same row under any input order and any
    partitioning (r8 tie-break, operators/cdc.py xxhash64; this is its
    regression test).  Deterministic-wrong beats nondeterministic-wrong."""
    rows = [(1, "pay-A", 7, "upsert"), (1, "pay-B", 7, "upsert"),
            (1, "pay-C", 7, "upsert")]
    survivors = set()
    for ordering in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        for nparts in (1, 3, 7):
            df = spark.createDataFrame(ordering, LOG_SCHEMA).repartition(nparts)
            got = compact_changes(df).collect()
            assert len(got) == 1
            survivors.add(got[0]["text"])
    assert len(survivors) == 1  # identical survivor across all 9 runs


def test_tie_break_accepts_map_payload_columns(spark):
    """Hash expressions reject MapType (Spark 3.0+); the tie-break must
    route map-bearing payload columns through to_json instead of raising
    AnalysisException — and stay order/partitioning-independent."""
    schema = "doc_id long, props map<string,string>, seq long"
    rows = [(1, {"k": "A"}, 7), (1, {"k": "B"}, 7), (2, {"k": "z"}, 1)]
    survivors = set()
    for ordering in (rows, rows[::-1]):
        for nparts in (1, 4):
            df = spark.createDataFrame(ordering, schema).repartition(nparts)
            got = {r["doc_id"]: r["props"]["k"] for r in compact_changes(df).collect()}
            assert got[2] == "z" and got[1] in {"A", "B"}
            survivors.add(got[1])
    assert len(survivors) == 1


def test_apply_changes_without_seq_expects_compacted_log(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], BASE_SCHEMA)
    log = spark.createDataFrame(
        [(1, "a2", "upsert")], "doc_id long, text string, op string"
    )
    assert _state(apply_changes(base, log)) == {1: "a2", 2: "b"}


def test_unknown_ops_are_ignored_not_applied(spark):
    """A corrupt op neither deletes nor upserts — the base row survives
    untouched (auditing corrupt ops is the caller's dead-letter path)."""
    base = spark.createDataFrame([(1, "a")], BASE_SCHEMA)
    log = spark.createDataFrame(
        [(1, "x", 1, "truncate")], LOG_SCHEMA
    )
    assert _state(apply_changes(base, log, seq_col="seq")) == {1: "a"}


def test_unknown_op_never_supersedes_valid_change_in_compaction(spark):
    """A corrupt op with the HIGHEST seq must not win latest-wins
    compaction and void the earlier valid change for its key: unknown
    ops are filtered before compaction, so the upsert/delete still
    applies (r6 review finding)."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], BASE_SCHEMA)
    log = spark.createDataFrame(
        [
            (1, "a2", 1, "upsert"),    # valid change...
            (1, "x", 2, "truncate"),   # ...shadowed by a later corrupt op
            (2, None, 1, "delete"),
            (2, "y", 2, "garbage"),
        ],
        LOG_SCHEMA,
    )
    assert _state(apply_changes(base, log, seq_col="seq")) == {1: "a2"}


# random logs: small key space forces collisions (multi-entry compaction),
# unique (key, seq) pairs per the operator's LSN-uniqueness contract
_ENTRY = st.tuples(
    st.integers(0, 5),                       # key
    st.integers(0, 9),                       # seq
    st.sampled_from(["upsert", "delete"]),
)


def _python_merge(base, log):
    """Reference MERGE: latest-wins per key, then upsert/delete fold."""
    state = dict(base)
    latest = {}
    for k, seq, op in log:
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, op)
    for k, (seq, op) in latest.items():
        if op == "upsert":
            state[k] = f"v{k}s{seq}"
        elif k in state:
            del state[k]
    return state


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 5), max_size=4, unique=True),
    st.lists(_ENTRY, min_size=1, max_size=12, unique_by=lambda e: (e[0], e[1])),
    st.data(),
)
def test_merge_versioned_converges_under_any_replay_schedule(
    spark, base_keys, log, data
):
    """The e26 contract swept broadly: split a random log into seq-range
    batches, apply them in order, then RE-apply a random subset in a
    random order (the at-least-once adversary).  The live view must
    still equal the python-reference merge of the full log — any
    replayed batch regressing or resurrecting state fails."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.cdc import (
        live_view,
        merge_versioned,
    )

    VERSIONED = "doc_id long, text string, seq long, op string"
    state = spark.createDataFrame(
        [(k, f"base{k}", -1, "upsert") for k in base_keys], VERSIONED
    )
    seqs = sorted({seq for _, seq, _ in log})
    cut = seqs[len(seqs) // 2]
    batches = [
        [e for e in log if e[1] <= cut],
        [e for e in log if e[1] > cut],
    ]

    def batch_df(entries):
        return spark.createDataFrame(
            [
                (k, f"v{k}s{seq}" if op == "upsert" else None, seq, op)
                for k, seq, op in entries
            ],
            VERSIONED,
        )

    for b in batches:
        if b:
            state = merge_versioned(state, batch_df(b)).localCheckpoint(eager=True)
    replay = data.draw(
        st.lists(st.integers(0, 1), max_size=3), label="replay_schedule"
    )
    for i in replay:
        if batches[i]:
            state = merge_versioned(state, batch_df(batches[i])).localCheckpoint(
                eager=True
            )
    got = {r["doc_id"]: r["text"] for r in live_view(state).drop("seq").collect()}
    want = _python_merge({k: f"base{k}" for k in base_keys}, log)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 5), max_size=4, unique=True),
    st.lists(_ENTRY, max_size=12, unique_by=lambda e: (e[0], e[1])),
)
def test_apply_changes_matches_python_reference(spark, base_keys, log):
    base = spark.createDataFrame(
        [(k, f"base{k}") for k in base_keys], BASE_SCHEMA
    )
    log_df = spark.createDataFrame(
        [
            (k, f"v{k}s{seq}" if op == "upsert" else None, seq, op)
            for k, seq, op in log
        ],
        LOG_SCHEMA,
    )
    got = _state(apply_changes(base, log_df, seq_col="seq"))
    want = _python_merge({k: f"base{k}" for k in base_keys}, log)
    assert got == want
