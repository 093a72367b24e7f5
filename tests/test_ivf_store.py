"""Partitioned IVF store: search-from-store must agree with the
in-memory IVF operator, and bucket probing must appear in the plan as
partition pruning."""

from __future__ import annotations

import pytest

from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table
from advanced_technologies_of_china_graph_database_construction_spark.operators.similarity import ivf_topk
from advanced_technologies_of_china_graph_database_construction_spark.sources.ivf_store import (
    ivf_topk_batch,
    ivf_topk_from_store,
    write_ivf_store,
)

from .conftest import SF_CORRECT

QUERY_IDS = [100, 101, 102]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivf_store"))
    emb = load_table(spark, SF_CORRECT, "embeddings")
    write_ivf_store(emb, root, n_centroids=8)
    return root


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"]) for r in df.collect()
    )


def test_store_search_matches_inmemory_ivf(spark, store):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    want = _rows(ivf_topk(emb, QUERY_IDS, k=5, n_centroids=8, nprobe=2))
    got = _rows(ivf_topk_from_store(spark, store, QUERY_IDS, k=5, nprobe=2))
    assert got == want


def test_bucket_probe_is_partition_pruned(spark, store):
    df = ivf_topk_from_store(spark, store, QUERY_IDS, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pruned = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "centroid_id" in l and "vectors" in l
    ]
    assert any("IN (" in l or "In(" in l or "isin" in l.lower() for l in pruned), plan


def _queries(spark, ids):
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_CORRECT, "embeddings")
    return emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def test_batch_search_matches_inmemory_ivf(spark, store):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    want = _rows(ivf_topk(emb, QUERY_IDS, k=5, n_centroids=8, nprobe=2))
    got = _rows(ivf_topk_batch(spark, store, _queries(spark, QUERY_IDS), k=5, nprobe=2))
    assert got == want


def test_trained_quantizer_store_matches_inmemory(spark, tmp_path):
    """write_ivf_store(centroids=...) persists a TRAINED quantizer (the
    a04 composition) and store search reproduces the in-memory
    trained-IVF result exactly."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.kmeans import kmeans_centroids

    emb = load_table(spark, SF_CORRECT, "embeddings")
    cent = kmeans_centroids(emb, k=4, iters=2)
    root = str(tmp_path / "trained_store")
    write_ivf_store(emb, root, centroids=cent)
    want = _rows(ivf_topk(emb, QUERY_IDS, k=5, nprobe=2, centroids=cent))
    got = _rows(ivf_topk_batch(spark, root, _queries(spark, QUERY_IDS), k=5, nprobe=2))
    assert got == want


def test_batch_plan_no_collect_and_dynamic_pruning(spark, store):
    """The batch face's contract: zero driver round-trips (no
    CollectLimit anywhere) and bucket selection reaching the
    partitioned vectors scan as a DYNAMIC partition-pruning filter —
    the distributed replacement for the point API's collect+isin."""
    df = ivf_topk_batch(spark, store, _queries(spark, QUERY_IDS), k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" not in plan
    pruned = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "dynamicpruning" in l and "centroid_id" in l
    ]
    assert pruned, plan


# ----------------------- append (incremental index maintenance) ----------

def _file_state(root):
    import os

    out = {}
    for r, _, fs in os.walk(f"{root}/vectors"):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_append_equals_full_build(spark, tmp_path):
    """store(base) + append(delta) must answer queries exactly like a
    store built from the full corpus at once (same frozen centroid
    seed — the delta excludes ids < 8)."""
    from pyspark.sql import functions as F
    from advanced_technologies_of_china_graph_database_construction_spark.sources.ivf_store import append_ivf_store

    emb = load_table(spark, SF_CORRECT, "embeddings")
    full_root, inc_root = str(tmp_path / "full"), str(tmp_path / "inc")
    write_ivf_store(emb, full_root, n_centroids=8)
    write_ivf_store(emb.filter(F.col("vec_id") % 10 != 9), inc_root, n_centroids=8)
    append_ivf_store(emb.filter(F.col("vec_id") % 10 == 9), inc_root)
    want = _rows(ivf_topk_from_store(spark, full_root, QUERY_IDS, k=5, nprobe=2))
    got = _rows(ivf_topk_from_store(spark, inc_root, QUERY_IDS, k=5, nprobe=2))
    assert got == want


def test_append_redelivered_id_upserts_and_untouched_partitions_intact(spark, tmp_path):
    """A re-delivered vec_id must end up ONCE with the delta's vector
    (delta wins), and partitions the delta doesn't touch must keep
    byte-identical files (size+mtime unchanged)."""
    from pyspark.sql import functions as F
    from advanced_technologies_of_china_graph_database_construction_spark.sources.ivf_store import append_ivf_store

    emb = load_table(spark, SF_CORRECT, "embeddings")
    root = str(tmp_path / "store")
    write_ivf_store(emb, root, n_centroids=8)
    before = _file_state(root)
    # re-deliver one existing vector with a RECOGNIZABLE new payload:
    # its own embedding again (assignment unchanged → same partition)
    # plus a fresh id far outside the corpus
    some = emb.filter(F.col("vec_id") == 100).select("vec_id", "embedding", "label")
    fresh = some.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
    )
    append_ivf_store(some.unionByName(fresh), root)
    vectors = spark.read.parquet(f"{root}/vectors")
    assert vectors.filter(F.col("vec_id") == 100).count() == 1
    assert vectors.filter(F.col("vec_id") == 10_000_100).count() == 1
    after = _file_state(root)
    touched_parts = {
        r["centroid_id"]
        for r in vectors.filter(
            F.col("vec_id").isin([100, 10_000_100])
        ).select("centroid_id").collect()
    }
    for rel, st in before.items():
        part = int(rel.split("centroid_id=")[1].split("/")[0])
        if part not in touched_parts:
            assert after.get(rel) == st, rel
