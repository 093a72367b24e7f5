"""CDC change-log application — the MERGE half of incremental corpus
maintenance (the diff half is the d27 snapshot comparison in
plans/docs_queries.py).

A continuously-refreshed corpus is rebuilt as base snapshot + change
log, not re-crawled: upstream emits (key, seq, op, payload) records and
the engine folds them into the base with upsert/delete semantics.  On a
lakehouse this is `MERGE INTO`; here it is expressed as the exact
relational decomposition Spark executes it as — per-key log compaction,
one anti-join, one union — so the plan is inspectable and the pieces
reusable.

Reference parity: the reference rebuilds its Neo4j store from scratch on
every ingest (Hype.py drops and re-creates; SURVEY §3.2) — incremental
maintenance is beyond-reference surface, same family as d27.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

UPSERT = "upsert"
DELETE = "delete"


def _contains_map(dt: DataType) -> bool:
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _tie_break_col(df: DataFrame, name: str) -> Column:
    """Hashable stand-in for a payload column in the compaction
    tie-break: hash expressions reject MapType anywhere in the type
    (Spark 3.0+), so map-bearing columns go through ``to_json`` first.
    Two maps with equal entries in different internal orders serialize
    (and hash) differently — irrelevant here, since the tie-break only
    needs to be a pure function of each row's value, not a semantic
    map-equality."""
    if _contains_map(df.schema[name].dataType):
        return F.to_json(F.col(name))
    return F.col(name)


def compact_changes(
    changes: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Latest-wins log compaction: keep only the highest-``seq`` change
    per key — the op never participates (a delete superseded by an
    upsert vanishes the same way an upsert does), so no op column is
    taken.  ``seq`` must be unique per key (a log offset / LSN — the
    uniqueness every real CDC source provides); exact re-deliveries
    tie on byte-identical rows, which resolve to identical content.
    A log that VIOLATES the contract — same (key, seq), different
    payload — is tie-broken by ascending ``xxhash64`` over the
    non-key columns: still a wrong log, but the survivor is now a
    pure function of the row set (re-running compaction, or running
    it under a different partitioning / input order, elects the same
    row) instead of whichever row ``row_number`` happened to visit
    first.  Deterministic-wrong beats nondeterministic-wrong: replays
    stay idempotent and a diff against a second compaction run stays
    empty, so the violation is diagnosable upstream rather than
    flapping downstream.

    Scale shape: one window per key — the same shuffle the downstream
    anti-join needs, so at scale pre-partition (or bucket) both the log
    and the base by key and the whole apply is co-located.
    """
    payload = [c for c in changes.columns if c not in (key_col, seq_col)]
    tie = (
        F.xxhash64(*(_tie_break_col(changes, c) for c in payload)).asc()
        if payload
        else F.lit(0)
    )
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc(), tie)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_id",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Fold a CDC change set into a base snapshot (MERGE semantics):
    every changed key's base row is dropped, then ``upsert`` payloads
    are appended — an upsert of an existing key replaces it, an upsert
    of a new key inserts it, a ``delete`` removes it.  ``changes``
    carries the base's payload columns (NULL-irrelevant on deletes)
    plus ``op``; pass ``seq_col`` to compact a multi-entry log first
    (without it the change set must already be one row per key).  Ops
    other than 'upsert'/'delete' are dropped BEFORE compaction — so a
    corrupt high-seq entry can never supersede (and silently void) an
    earlier valid change for the same key; corrupt-op auditing is the
    caller's dead-letter concern, not a hidden action inside the fold.

    Scale shape: one anti-join on the key (bucket base and log by key
    and it is shuffle-free) plus a union with the delta — O(|delta|)
    maintenance instead of the O(|corpus|) rebuild, exactly the e21
    argument applied to row-level changes.
    """
    changes = changes.filter(F.col(op_col).isin(UPSERT, DELETE))
    if seq_col is not None:
        changes = compact_changes(changes, key_col, seq_col)
        changes = changes.drop(seq_col)
    upserts = changes.filter(F.col(op_col) == UPSERT).select(*base.columns)
    touched = changes.select(key_col)
    return base.join(touched, key_col, "left_anti").unionByName(upserts)


def merge_versioned(
    state: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Seq-guarded MERGE into a VERSIONED store — the streaming-upsert
    face of :func:`apply_changes`.  Every store row (live or tombstone)
    carries the ``seq`` of the change that produced it and its ``op``;
    folding a batch is latest-wins BY SEQ over store ∪ batch, so a
    change only lands if its seq exceeds the stored one.  That makes
    the merge IDEMPOTENT under at-least-once re-delivery: re-applying
    any already-applied batch — even out of order — is a no-op, which
    is what lets a foreachBatch sink replay micro-batches safely
    (proven by the e26 double-replay gate).  Deletes persist as
    tombstones so an isolated old-batch replay cannot resurrect a
    deleted key; :func:`live_view` drops them at read time (a real
    store compacts tombstones out once the log's retention window has
    passed — a maintenance job, not part of the merge).

    ``seq`` must be unique per key ACROSS the log (an offset/LSN);
    re-delivered duplicates are byte-identical rows, so the tie an
    exact re-delivery creates resolves to identical content.  Base
    snapshot rows enter the store as op='upsert' with a seq below the
    log's range (e.g. 0).

    Scale shape: one window shuffle on the key over |store| + |batch|
    rows — with store and log bucketed by key, co-located.  At 100 TB
    the store write beneath this is a partition overwrite of touched
    partitions only, not a full rewrite.
    """
    changes = changes.filter(F.col(op_col).isin(UPSERT, DELETE))
    return compact_changes(state.unionByName(changes), key_col, seq_col)


def live_view(state: DataFrame, op_col: str = "op") -> DataFrame:
    """The queryable face of a versioned store: tombstones drop out."""
    return state.filter(F.col(op_col) == UPSERT).drop(op_col)
