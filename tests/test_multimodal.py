"""Multimodal plumbing: payload typing, decode error channel, resize
planning, frame sampling, and payload column pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from advanced_technologies_of_china_graph_database_construction_spark.catalog import load_table
from advanced_technologies_of_china_graph_database_construction_spark.multimodal import media as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_df(spark):
    return mm.attach_media(load_table(spark, SF, "documents"))


def test_media_schema(media_df):
    assert isinstance(media_df.schema["payload"].dataType, BinaryType)
    kinds = {r["kind"] for r in media_df.select("kind").distinct().collect()}
    assert kinds == set(mm.KINDS)


def test_decode_error_channel(spark, media_df):
    # inject an empty payload: must land in the error channel, not crash
    bad = media_df.limit(1).withColumn("payload", F.lit(b""))
    feats = mm.extract_features(media_df.limit(5).unionByName(bad))
    rows = feats.collect()
    errs = [r for r in rows if r["error"] is not None]
    ok = [r for r in rows if r["error"] is None]
    assert len(errs) == 1 and "empty payload" in errs[0]["error"]
    for r in ok:
        assert r["features"][0] == float(r["n_bytes"])


def test_pil_decoder_is_stubbed():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: the decode seam is live, not stubbed")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        mm.pil_decoder(b"\x89PNG")


def test_resize_plan_aspect_ratio(media_df):
    plan = mm.resize_plan(media_df, max_side=256).collect()
    for r in plan:
        assert max(r["target_width"], r["target_height"]) <= 256
        if max(r["width"], r["height"]) <= 256:
            assert (r["target_width"], r["target_height"]) == (r["width"], r["height"])
        else:
            ratio = r["width"] / r["height"]
            t_ratio = r["target_width"] / r["target_height"]
            assert abs(ratio - t_ratio) / ratio < 0.05


def test_sample_frames_counts(media_df):
    frames = mm.sample_frames(media_df, step_ms=1000)
    got = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    want = {
        r["media_id"]: (max(r["duration_ms"] - 1, 0)) // 1000 + 1
        for r in media_df.filter(F.col("kind") == "video").collect()
    }
    assert got == want


def test_payload_pruned_when_unread(media_df):
    # metadata-only query must not read the payload column from source
    plan = mm.resize_plan(media_df)._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_pil_decoder_real_decode(spark):
    """Runs only where Pillow exists (skipped in the shipped container):
    the real decoder must honor the same Decoder contract through the
    extract_features seam — features [w, h, channels, mean]."""
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 2), color=(10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, 1, "image", bytearray(png), 4, 2, 0)],
        "media_id long, doc_id long, kind string, payload binary, "
        "width int, height int, duration_ms long",
    )
    row = mm.extract_features(media, decoder=mm.pil_decoder).collect()[0]
    assert row["error"] is None
    assert row["features"] == [4.0, 2.0, 3.0, 20.0]
