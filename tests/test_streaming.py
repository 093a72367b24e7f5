"""Structured Streaming face of the unified event-time operators:
file-source micro-batches, watermarked windows, streaming dedup, and the
applyInPandasWithState running-total operator — each checked for
agreement with its batch face on the same data.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table
from advanced_technologies_of_china_graph_database_construction_spark.streaming import stateful, windows

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Events split into 4 parquet files ordered by ts, so
    maxFilesPerTrigger=1 yields 4 in-order micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    (
        load_table(spark, SF_CORRECT, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _run_stream(sdf, mode):
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = sdf.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return name


def _rows(spark, name, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in spark.table(name).collect()
    )


def test_tumbling_stream_matches_batch(spark, event_dir):
    stream = windows.streaming_source(spark, event_dir, watermark="1 hour")
    name = _run_stream(windows.tumbling_stats(stream, "1 day"), "complete")
    batch = windows.tumbling_stats(spark.read.parquet(event_dir), "1 day")
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(spark, name, cols) == sorted(
        tuple(r[c] for c in cols) for r in batch.collect()
    )


def test_session_stream_matches_batch(spark, event_dir):
    # no watermark: sessions never evict, so complete mode holds them all
    # (with a watermark, closed sessions flush exactly-once in append mode)
    stream = windows.streaming_source(spark, event_dir, watermark=None)
    name = _run_stream(windows.session_stats(stream, "30 minutes"), "complete")
    batch = windows.session_stats(spark.read.parquet(event_dir), "30 minutes")
    cols = ["session_start", "user_id", "n_events", "sum_value"]
    assert _rows(spark, name, cols) == sorted(
        tuple(r[c] for c in cols) for r in batch.collect()
    )


def test_streaming_dedup(spark, event_dir, tmp_path):
    # duplicate every event across two files: stream must emit each once
    dup_dir = str(tmp_path / "dup")
    ev = spark.read.parquet(event_dir).filter(F.col("event_id") < 200)
    ev.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    ev.coalesce(1).write.mode("append").parquet(dup_dir)
    stream = windows.streaming_source(spark, dup_dir, watermark=None)
    deduped = windows.dedup_events(stream, within="10 days")
    name = _run_stream(deduped.select("event_id"), "append")
    got = _rows(spark, name, ["event_id"])
    assert got == sorted((i,) for i in range(200))


def test_interval_join_stream_matches_batch(spark, event_dir):
    stream = windows.streaming_source(spark, event_dir, watermark=None)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    # unwatermarked: the file source doesn't guarantee ts-ordered
    # micro-batches, so a watermark would drop "late" earlier files;
    # inner stream-stream joins permit unbounded state for this check
    joined = windows.interval_join(clicks, purchases, watermark=None)
    name = _run_stream(joined, "append")
    batch_ev = spark.read.parquet(event_dir)
    batch = windows.interval_join(
        batch_ev.filter(F.col("event_type") == "click"),
        batch_ev.filter(F.col("event_type") == "purchase"),
    )
    cols = ["user_id", "l_event_id", "r_event_id"]
    got = _rows(spark, name, cols)
    want = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    assert got == want and len(got) > 0


def test_stateful_running_totals(spark, event_dir):
    stream = windows.streaming_source(spark, event_dir, watermark=None)
    name = _run_stream(stateful.running_totals_stream(stream), "update")
    # last update per user == batch totals
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = stateful.running_totals_batch(spark.read.parquet(event_dir)).select(
        "user_id", "n_events"
    )
    cols = ["user_id", "n_events"]
    got = sorted(tuple(r[c] for c in cols) for r in final.collect())
    want = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    assert got == want


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill-and-restart with the same checkpoint must pick up exactly
    where the stream left off: new files are processed once, processed
    files are not re-emitted, and the final sink equals the batch
    answer over all input."""
    import glob
    import shutil

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    full = load_table(spark, SF_CORRECT, "events").repartitionByRange(4, "ts")
    staged = str(tmp_path / "staged")
    full.write.mode("overwrite").parquet(staged)
    files = sorted(glob.glob(staged + "/part-*.parquet"))
    assert len(files) == 4

    import os

    os.makedirs(src)

    # append-mode parquet sink over the raw events: the simplest
    # exactly-once observable (aggregating sinks need complete/update
    # modes, which the parquet sink doesn't support)
    def start_raw():
        stream = windows.streaming_source(spark, src, watermark=None)
        return (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    for f in files[:2]:
        shutil.copy(f, src)
    q = start_raw()
    q.awaitTermination()
    n_phase1 = spark.read.parquet(sink).count()
    assert 0 < n_phase1 < full.count()

    # phase 2: two more files, fresh query object, SAME checkpoint
    for f in files[2:]:
        shutil.copy(f, src)
    q2 = start_raw()
    q2.awaitTermination()

    got = spark.read.parquet(sink)
    assert got.count() == full.count()  # nothing lost, nothing duplicated
    batch_ids = sorted(r["event_id"] for r in full.select("event_id").collect())
    stream_ids = sorted(r["event_id"] for r in got.select("event_id").collect())
    assert stream_ids == batch_ids


def test_streaming_packing_matches_batch(spark, tmp_path):
    """The stateful packing stream must place every document in exactly
    the bin the batch window assigns, across in-order micro-batches."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators import textops

    docs = load_table(spark, SF_CORRECT, "documents")
    toks = docs.select(
        "source", "doc_id", textops.token_count(F.col("text")).cast("long").alias("tok")
    )
    out = str(tmp_path / "toks_stream")
    # The packing stream's contract is in-order arrival; the file source
    # orders micro-batches by modification time, so write the doc_id
    # ranges sequentially (one file each, strictly increasing mtimes).
    bounds = [0, 125, 250, 375, 10**9]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            toks.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
    schema = spark.read.parquet(out).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(out)
    )
    # Force each group's micro-batch through MULTIPLE Arrow chunks: the
    # operator must materialize-and-sort the whole group batch, not sort
    # chunks independently (chunk arrival order is shuffle order).
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        name = _run_stream(stateful.packing_stream(stream, 256), "append")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
    batch = stateful.packing_batch(spark.read.parquet(out), 256)
    cols = ["source", "doc_id", "start_off", "bin"]
    got = _rows(spark, name, cols)
    want = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    assert got == want and len(got) > 0


def test_streaming_packing_checkpoint_recovery(spark, tmp_path):
    """Kill-and-restart the stateful packing stream with the same
    checkpoint: the GroupState offsets must survive, so documents fed
    after the restart land in exactly the bins the batch computation
    assigns over ALL input — nothing re-emitted, no offset reset."""
    import os

    from advanced_technologies_of_china_graph_database_construction_spark.operators import textops

    docs = load_table(spark, SF_CORRECT, "documents")
    toks = docs.select(
        "source", "doc_id", textops.token_count(F.col("text")).cast("long").alias("tok")
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def feed(lo, hi):
        (
            toks.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    def run_once():
        schema = toks.schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stateful.packing_stream(stream, 256)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed(0, 250)
    run_once()
    n1 = spark.read.parquet(sink).count()
    feed(250, 10**9)  # arrives only after the first query object died
    run_once()

    got = sorted(
        (r["source"], r["doc_id"], r["start_off"], r["bin"])
        for r in spark.read.parquet(sink).collect()
    )
    want = sorted(
        (r["source"], r["doc_id"], r["start_off"], r["bin"])
        for r in stateful.packing_batch(toks, 256).collect()
    )
    assert 0 < n1 < len(want)
    assert got == want


def test_e18_dual_watermark_join_matches_batch(spark):
    """The gated stream-stream face: dual-WATERMARKED readStream join
    over ts-ordered slices must agree with the batch interval join —
    unlike test_interval_join_stream_matches_batch (unwatermarked,
    unordered files), this exercises the state-cleanup configuration
    the e18 spec gates: watermarks bound the buffers AND must not drop
    a single pair on ts-ordered replay."""
    from advanced_technologies_of_china_graph_database_construction_spark.plans.events_queries import (
        e08_click_purchase_interval_join,
        e18_streaming_interval_join,
    )

    got = sorted(tuple(r) for r in e18_streaming_interval_join(spark, SF_CORRECT).collect())
    want = sorted(
        tuple(r) for r in e08_click_purchase_interval_join(spark, SF_CORRECT).collect()
    )
    assert got == want and len(got) > 0


def test_e19_left_outer_join_matches_batch(spark):
    """Outer-null rows must be exactly the clicks the batch LEFT JOIN
    leaves unmatched — spurious nulls (premature eviction) or a missing
    tail (unflushed state) both break the agreement."""
    import duckdb

    from advanced_technologies_of_china_graph_database_construction_spark.plans.events_queries import (
        E19_SQL,
        e19_streaming_left_outer_join,
    )

    got = sorted(
        tuple(r) for r in e19_streaming_left_outer_join(spark, SF_CORRECT).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_CORRECT}/events.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(E19_SQL).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2], (g, w)
        assert (g[3] is None) == (w[3] is None)
        if g[3] is not None:
            assert abs(g[3] - w[3]) < 1e-6, (g, w)


def test_e20_stream_static_join_matches_batch(spark, event_dir):
    """Stream-static join: the streamed join+agg must equal the same
    plan run batch-side on identical input — and the static side must
    ride a broadcast join at this scale WITHOUT a hint (the production
    e20 leaves the decision size-based so an SF-scaling dim can degrade
    to a shuffled join instead of OOMing), which the batch face's
    physical plan witnesses."""
    cust = load_table(spark, SF_CORRECT, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    def enriched_daily(ev):
        return (
            ev.join(cust, ev.user_id == cust.c_custkey)
            .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "c_mktsegment",
                "n_events",
            )
        )

    stream = windows.streaming_source(spark, event_dir, watermark="1 hour")
    name = _run_stream(enriched_daily(stream), "complete")
    cols = ["window_start", "c_mktsegment", "n_events"]
    batch = enriched_daily(spark.read.parquet(event_dir))
    want = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    assert _rows(spark, name, cols) == want and len(want) > 0
    plan = batch._sc._jvm.PythonSQLUtils.explainString(
        batch._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan, plan


def test_e26_streaming_cdc_upsert_matches_batch_merge(spark):
    """Batch/stream agreement for the CDC upsert composition: the e26
    streaming foreachBatch MERGE (double-replayed) must land on exactly
    the state the one-shot batch apply_changes produces from the same
    change log."""
    from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table as _lt
    from advanced_technologies_of_china_graph_database_construction_spark.operators.cdc import apply_changes
    from advanced_technologies_of_china_graph_database_construction_spark.plans.docs_queries import (
        _cdc_change_log,
        e26_streaming_cdc_upsert,
    )

    base = _lt(spark, SF_CORRECT, "documents").select("doc_id", "text")
    want = sorted(
        map(
            tuple,
            apply_changes(base, _cdc_change_log(base), seq_col="seq")
            .select("doc_id", F.md5("text").alias("text_md5"))
            .collect(),
        )
    )
    got = sorted(map(tuple, e26_streaming_cdc_upsert(spark, SF_CORRECT).collect()))
    assert got == want and len(got) > 0


def test_merge_versioned_replayed_batch_is_noop_unguarded_is_not(spark):
    """The seq guard in isolation: re-applying an already-applied batch
    onto the versioned store changes nothing, while the same replay
    through the UNGUARDED apply_changes regresses the state — the exact
    failure mode the guard exists for."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.cdc import (
        apply_changes,
        live_view,
        merge_versioned,
    )

    store0 = spark.createDataFrame(
        [(1, "a", 0, "upsert"), (2, "b", 0, "upsert")],
        "doc_id long, text string, seq int, op string",
    )
    b1 = spark.createDataFrame(
        [(1, "a2", 1, "upsert")], "doc_id long, text string, seq int, op string"
    )
    b2 = spark.createDataFrame(
        [(1, None, 2, "delete"), (2, "b3", 2, "upsert")],
        "doc_id long, text string, seq int, op string",
    )

    def live(state):
        return {r["doc_id"]: r["text"] for r in live_view(state).collect()}

    applied = merge_versioned(merge_versioned(store0, b1), b2)
    assert live(applied) == {2: "b3"}
    replayed = merge_versioned(applied, b1)  # duplicate delivery of b1
    assert live(replayed) == {2: "b3"}  # no resurrection, no regression
    # the unguarded merge re-applies b1 and resurrects the deleted key
    unguarded = apply_changes(
        live_view(applied).drop("seq"), b1.drop("seq")
    )
    assert {r["doc_id"]: r["text"] for r in unguarded.collect()} == {
        1: "a2", 2: "b3"
    }


def test_e22_per_batch_overwrite_is_idempotent_append_is_not(spark, tmp_path):
    """The e22 sink mechanism in isolation: re-delivering a batch into
    its own batch_id directory converges under overwrite and
    double-counts under append — the difference between a safe and an
    unsafe foreachBatch sink under micro-batch retries."""
    part = spark.createDataFrame(
        [("2024-01-01", "click", 10, 1.5)],
        "window_start string, event_type string, n_events long, sum_value double",
    )
    for mode, want in (("overwrite", 10), ("append", 20)):
        store = str(tmp_path / mode)
        for _ in range(2):  # duplicate delivery of the same batch
            part.write.mode(mode).parquet(f"{store}/batch_id=0")
        got = (
            spark.read.parquet(store)
            .agg(F.sum("n_events").alias("n"))
            .first()["n"]
        )
        assert got == want, (mode, got)


def test_e27_partitioned_cdc_matches_batch_merge(spark):
    """Batch/stream agreement for the PARTITIONED-store CDC upsert: the
    e27 in-place dynamic-partition-overwrite MERGE (double-replayed,
    with its per-batch untouched-partition byte-identity assertion
    live) must land on exactly the state the one-shot batch
    apply_changes produces from the same BANDED change log."""
    from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table as _lt
    from advanced_technologies_of_china_graph_database_construction_spark.operators.cdc import apply_changes
    from advanced_technologies_of_china_graph_database_construction_spark.plans.docs_queries import (
        _cdc_change_log,
        e27_streaming_partitioned_cdc,
    )

    base = _lt(spark, SF_CORRECT, "documents").select("doc_id", "text")
    banded = _cdc_change_log(base).filter(F.pmod(F.col("doc_id"), F.lit(8)).isin(1, 2))
    want = sorted(
        map(
            tuple,
            apply_changes(base, banded, seq_col="seq")
            .select("doc_id", F.md5("text").alias("text_md5"))
            .collect(),
        )
    )
    got = sorted(map(tuple, e27_streaming_partitioned_cdc(spark, SF_CORRECT).collect()))
    assert got == want and len(got) > 0
