"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` (Arrow-batched, GroupState-backed).

This is the engine's extension point for operators Structured Streaming
lacks natively (SURVEY.md §2.11: the reference's only custom-compute
seams are pandas-shaped — embedding / LLM enrichment — and this is the
same seam applied to streaming state).

Scale notes: state is partitioned by user_id (the group key) and lives
in the state store per partition — at 1000 executors each task holds
only its hash range of users.  The gated faces run with
``GroupStateTimeout.NoTimeout`` (finite replayed sources, every key's
final state IS the answer); a production deployment over an unbounded
key space must switch to a processing-time timeout so idle keys expire
— state here is bounded by the KEY SPACE, not by time, and the
operator exposes exactly the timeout knob that changes that.  Batch
fallback (``running_totals_batch``) computes the same answer with a
window spec, which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals; emits the updated total for
    every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent: final per-user totals (what the stream's state
    converges to after all events)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def cumulative_by_event(events: DataFrame) -> DataFrame:
    """Per-user cumulative totals after every event (batch window-spec
    form of the same running aggregate — each row is the state the
    streaming operator would hold after that event)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_events"),
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


# ------------------------------------------------- streaming packing ------

PACK_STATE_SCHEMA = StructType([StructField("next_off", LongType())])
PACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("start_off", LongType()),
        StructField("bin", LongType()),
    ]
)


def _pack_stream_fn(budget: int):
    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        off = state.get[0] if state.exists else 0
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks in
        # arbitrary shuffle order — sorting each chunk independently
        # would misassign offsets whenever a batch spans chunks, so
        # materialize the whole group-batch and sort once.  Memory is
        # bounded by one source's share of one micro-batch.
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        toks = pdf["tok"].to_numpy()
        starts = off + toks.cumsum() - toks
        state.update((int(off + toks.sum()),))
        yield pd.DataFrame(
            {
                "source": source,
                "doc_id": pdf["doc_id"].to_numpy(),
                "start_off": starts,
                "bin": starts // budget,
            }
        )

    return update


def packing_stream(toks: DataFrame, budget: int) -> DataFrame:
    """Streaming sequence packing (the d14 operator's incremental face):
    per-source cumulative token offsets held in GroupState, so each
    micro-batch assigns its documents to token-budget bins exactly where
    the batch window computation would — append output, one state row
    (a single long) per source.

    Contract: within a source, documents must arrive in ``doc_id`` order
    across micro-batches (the batch face sorts globally; a stream cannot
    retroactively re-order, which is the standard packing-stream caveat —
    feed it an ordered ingest, e.g. file-source with one file per
    ingest-order chunk)."""
    if budget <= 0:
        # fail at the driver: the stream face would ZeroDivisionError
        # inside an executor mid-batch, the batch face would emit
        # silent NULL bins — neither is a contract (r12 review)
        raise ValueError("packing needs a positive token budget")
    return toks.groupBy("source").applyInPandasWithState(
        _pack_stream_fn(budget),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def packing_batch(toks: DataFrame, budget: int) -> DataFrame:
    """Batch equivalent of :func:`packing_stream` — the same cumulative
    window as the d14 spec, emitting per-document bins."""
    if budget <= 0:
        raise ValueError("packing needs a positive token budget")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select(
        "source",
        "doc_id",
        (F.sum("tok").over(w) - F.col("tok")).alias("start_off"),
    ).withColumn("bin", F.floor(F.col("start_off") / budget).cast("long"))
