"""Multimodal workload: binary-payload plumbing over synthesized media
(deterministic fake decode → oracle-expressible arithmetic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..multimodal import media as mm
from .spec import QuerySpec


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.attach_media(load_table(spark, sf_dir, "documents"))


def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )


M01_SQL = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       count(*) AS n_media,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       max((doc_id % 640 + 64)::INT) AS max_width,
       sum(n_chars * 10)::BIGINT AS total_duration_ms
FROM documents GROUP BY 1
"""


def m02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = mm.extract_features(_media(spark, sf_dir))
    return feats.filter(F.col("error").isNull()).select(
        "media_id",
        "kind",
        "n_bytes",
        F.element_at("features", 2).alias("first_byte"),
        F.element_at("features", 3).alias("last_byte"),
    )


M02_SQL = """
SELECT doc_id + 5000000 AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       octet_length(encode(text))::BIGINT AS n_bytes,
       ascii(substr(text, 1, 1))::FLOAT AS first_byte,
       ascii(substr(text, length(text), 1))::FLOAT AS last_byte
FROM documents WHERE length(text) > 0
"""


def m03_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = mm.sample_frames(_media(spark, sf_dir), step_ms=100_000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_offset_ms").alias("last_offset_ms"),
    )


M03_SQL = """
SELECT doc_id + 5000000 AS media_id,
       ((greatest(n_chars * 10 - 1, 0)) // 100000 + 1)::BIGINT AS n_frames,
       ((greatest(n_chars * 10 - 1, 0)) // 100000 * 100000)::BIGINT AS last_offset_ms
FROM documents WHERE doc_id % 3 = 2 AND n_chars > 0
"""


def m04_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL decode path (no stub, no external lib): audio payloads
    decoded as 8-bit PCM and reduced to energy stats with vectorized
    numpy inside the mapInPandas seam.  Integer-exact sums make the
    float64 mean/rms bit-identical to the SQL oracle's avg/sqrt."""
    audio = _media(spark, sf_dir).filter(F.col("kind") == "audio")
    feats = mm.audio_energy(audio)
    return feats.filter(F.col("error").isNull()).select(
        "media_id",
        "n_samples",
        F.round("mean_level", 6).alias("mean_level"),
        F.round("rms_level", 6).alias("rms_level"),
    )


M04_SQL = """
WITH samples AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) + 1),
                               i -> ascii(substr(text, i, 1)))) AS b
  FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0)
SELECT doc_id + 5000000 AS media_id,
       count(*)::BIGINT AS n_samples,
       round(avg(b), 6) AS mean_level,
       round(sqrt(avg(b * b)), 6) AS rms_level
FROM samples GROUP BY doc_id
"""


def m05_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (no stub, no external lib): per-row PPM (P6)
    payloads — varying dims, so the header parse is load-bearing —
    decoded to per-channel means with numpy inside the mapInPandas
    seam.  Integer-exact channel sums make the float64 means
    bit-identical to the SQL oracle's avg."""
    imgs = mm.attach_ppm_images(load_table(spark, sf_dir, "documents"))
    stats = mm.image_stats(imgs)
    return stats.filter(F.col("error").isNull()).select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


# Pixel byte i (0-based) of doc d is ascii(text[(i mod len)+1]) — the
# repeat/truncate construction of attach_ppm_images; channel = i mod 3.
M05_SQL = """
WITH px AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, (doc_id % 5 + 2) * (doc_id % 7 + 2) * 3),
           u -> struct_pack(
             i := u,
             b := ascii(substr(text, ((u % length(text)) + 1)::INT, 1))))) AS p
  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0)
SELECT doc_id + 5000000 AS media_id,
       (doc_id % 5 + 2)::INT AS width,
       (doc_id % 7 + 2)::INT AS height,
       round(avg(p.b) FILTER (WHERE p.i % 3 = 0), 6) AS mean_r,
       round(avg(p.b) FILTER (WHERE p.i % 3 = 1), 6) AS mean_g,
       round(avg(p.b) FILTER (WHERE p.i % 3 = 2), 6) AS mean_b,
       round(avg(p.b), 6) AS mean_intensity
FROM px GROUP BY doc_id
"""


def m06_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode (no stub, no external lib): per-row YUV4MPEG2
    streams — varying dims AND frame counts, so the header parse and
    the FRAME-marker walk are both load-bearing — decoded to stream and
    per-frame luma stats with numpy inside the mapInPandas seam.
    Integer-exact sums make the float64 means bit-identical to the SQL
    oracle's avg.  With m04 (PCM audio) and m05 (PPM image) this gates
    every modality's decode path on real binary formats."""
    vids = mm.attach_y4m_videos(load_table(spark, sf_dir, "documents"))
    stats = mm.video_stats(vids)
    return stats.filter(F.col("error").isNull()).select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round("mean_luma", 6).alias("mean_luma"),
        F.round("first_frame_mean", 6).alias("first_frame_mean"),
        F.round("last_frame_mean", 6).alias("last_frame_mean"),
    )


# Luma byte u (0-based, counted across frames) of doc d is
# ascii(text[(u mod len)+1]); frame index = u // (w·h).
M06_SQL = """
WITH px AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, (doc_id % 4 + 2) * (doc_id % 5 + 2) * (doc_id % 7 + 2)),
           u -> struct_pack(
             f := u // ((doc_id % 4 + 2) * (doc_id % 5 + 2)),
             b := ascii(substr(text, ((u % length(text)) + 1)::INT, 1))))) AS p
  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0)
SELECT doc_id + 5000000 AS media_id,
       (doc_id % 4 + 2)::INT AS width,
       (doc_id % 5 + 2)::INT AS height,
       (doc_id % 7 + 2)::INT AS n_frames,
       round(avg(p.b), 6) AS mean_luma,
       round(avg(p.b) FILTER (WHERE p.f = 0), 6) AS first_frame_mean,
       round(avg(p.b) FILTER (WHERE p.f = doc_id % 7 + 1), 6) AS last_frame_mean
FROM px GROUP BY doc_id
"""


M07_STEP = 2


def m07_sampled_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECTIVE video decode: stats over every 2nd frame only, the
    sampled frames located by closed-form byte offsets (seek, not
    scan) — at 100 TB the skipped frames' bytes are never read, which
    is what makes frame-sampling over a video corpus tractable.  The
    oracle derives the same filtered mean from the text bytes, so the
    gate proves the seek arithmetic landed on exactly the right
    frames."""
    vids = mm.attach_y4m_videos(load_table(spark, sf_dir, "documents"))
    stats = mm.sampled_frame_stats(vids, step=M07_STEP)
    return stats.filter(F.col("error").isNull()).select(
        "media_id",
        "width",
        "height",
        "n_frames",
        "n_sampled",
        F.round("mean_sampled_luma", 6).alias("mean_sampled_luma"),
    )


# Same byte construction as M06; sampled frames are f % 2 = 0 and
# n_sampled = ceil(nf / 2).
M07_SQL = f"""
WITH px AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, (doc_id % 4 + 2) * (doc_id % 5 + 2) * (doc_id % 7 + 2)),
           u -> struct_pack(
             f := u // ((doc_id % 4 + 2) * (doc_id % 5 + 2)),
             b := ascii(substr(text, ((u % length(text)) + 1)::INT, 1))))) AS p
  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0)
SELECT doc_id + 5000000 AS media_id,
       (doc_id % 4 + 2)::INT AS width,
       (doc_id % 5 + 2)::INT AS height,
       (doc_id % 7 + 2)::INT AS n_frames,
       (((doc_id % 7 + 2) + {M07_STEP} - 1) // {M07_STEP})::INT AS n_sampled,
       round(avg(p.b) FILTER (WHERE p.f % {M07_STEP} = 0), 6) AS mean_sampled_luma
FROM px GROUP BY doc_id
"""


M08_TARGET = 3


def m08_resized_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resample: every PPM resized to a fixed
    3×3 thumbnail (source dims 2–6 × 2–8, so both up- and
    down-sampling paths run), per-channel means of the RESIZED pixels
    gated against an oracle that replays the index map (r·h//3,
    c·w//3) over the text bytes — metadata-only resize planning can't
    fake this."""
    imgs = mm.attach_ppm_images(load_table(spark, sf_dir, "documents"))
    stats = mm.resized_image_stats(imgs, target=M08_TARGET)
    return stats.filter(F.col("error").isNull()).select(
        "media_id",
        "width",
        "height",
        "target_w",
        "target_h",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# Resized pixel u of t·t·3 (rr = u//(t·3), cc = (u//3) % t, ch = u%3)
# reads source byte ((rr·h//t)·w + cc·w//t)·3 + ch of the repeated
# text — the exact nearest-neighbor index map the operator applies.
M08_SQL = f"""
WITH px AS (
  SELECT doc_id,
         (doc_id % 5 + 2) AS w, (doc_id % 7 + 2) AS h,
         unnest(list_transform(
           range(0, {M08_TARGET * M08_TARGET * 3}),
           u -> struct_pack(
             ch := u % 3,
             b := ascii(substr(text,
               (((((u // {M08_TARGET * 3}) * (doc_id % 7 + 2) // {M08_TARGET})
                    * (doc_id % 5 + 2)
                   + ((u // 3) % {M08_TARGET}) * (doc_id % 5 + 2) // {M08_TARGET})
                  * 3 + u % 3) % length(text) + 1)::INT,
               1))))) AS p
  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0)
SELECT doc_id + 5000000 AS media_id,
       w::INT AS width, h::INT AS height,
       {M08_TARGET}::INT AS target_w, {M08_TARGET}::INT AS target_h,
       round(avg(p.b) FILTER (WHERE p.ch = 0), 6) AS mean_r,
       round(avg(p.b) FILTER (WHERE p.ch = 1), 6) AS mean_g,
       round(avg(p.b) FILTER (WHERE p.ch = 2), 6) AS mean_b
FROM px GROUP BY doc_id, w, h
"""


def m09_binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media INGEST path every real pipeline starts with: a
    directory of actual image FILES read through Spark's built-in
    ``binaryFile`` source (one row per file: path, length, content)
    and decoded by the same ``image_stats`` seam the in-plan payloads
    use — proving the decoder is source-agnostic and that the identity
    key can be recovered from the file path JVM-side.  At 100 TB this
    is an object-store listing + streamed binary reads with the decode
    fanned out per file; ``pathGlobFilter`` stands in for the
    prefix/suffix filters used to scope a bucket scan.

    The fixture files are materialized from the deterministic PPM
    payloads by a driver-side loop — test scaffolding for the gate
    (one tiny toLocalIterator pass, NOT the operator under test; a
    real corpus's files already exist).  Stats equal m05's oracle
    because the bytes are identical."""
    import os
    import shutil
    import tempfile

    imgs = mm.attach_ppm_images(load_table(spark, sf_dir, "documents"))
    d = tempfile.mkdtemp(prefix="m09_imgs_")
    try:
        for row in imgs.select("media_id", "payload").toLocalIterator():
            with open(os.path.join(d, f"{row['media_id']}.ppm"), "wb") as f:
                f.write(bytes(row["payload"]))
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.ppm")
            .load(d)
            .select(
                F.regexp_extract(F.col("path"), r"(\d+)\.ppm$", 1)
                .cast("long")
                .alias("media_id"),
                F.col("content").alias("payload"),
            )
        )
        stats = mm.image_stats(files)
        return (
            stats.filter(F.col("error").isNull())
            .select(
                "media_id",
                "width",
                "height",
                F.round("mean_intensity", 6).alias("mean_intensity"),
            )
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


M09_SQL = """
WITH px AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, (doc_id % 5 + 2) * (doc_id % 7 + 2) * 3),
           u -> ascii(substr(text, ((u % length(text)) + 1)::INT, 1)))) AS b
  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0)
SELECT doc_id + 5000000 AS media_id,
       (doc_id % 5 + 2)::INT AS width,
       (doc_id % 7 + 2)::INT AS height,
       round(avg(b), 6) AS mean_intensity
FROM px GROUP BY doc_id
"""


SPECS = [
    QuerySpec("m09_binary_file_ingest", m09_binary_file_ingest, M09_SQL,
              "multimodal", "REAL file ingest: a directory of .ppm files read "
              "through the built-in binaryFile source, identity recovered from "
              "the path, decoded by the same image_stats seam"),
    QuerySpec("m08_resized_image_stats", m08_resized_image_stats, M08_SQL,
              "multimodal", "REAL nearest-neighbor resize to a fixed thumbnail "
              "shape: resampled-pixel means gated vs an oracle replaying the "
              "index map"),
    QuerySpec("m07_sampled_frame_stats", m07_sampled_frame_stats, M07_SQL,
              "multimodal", "SELECTIVE frame decode via closed-form byte-offset "
              "seek (skipped frames never read), gated vs the filtered-frame "
              "oracle"),
    QuerySpec("m06_video_stats", m06_video_stats, M06_SQL, "multimodal",
              "REAL Y4M video decode: header parse + frame walk + numpy luma "
              "stats through the Arrow seam, integer-exact vs the SQL oracle"),
    QuerySpec("m05_image_stats", m05_image_stats, M05_SQL, "multimodal",
              "REAL PPM image decode: header parse + numpy channel means "
              "through the Arrow seam, integer-exact vs the SQL oracle"),
    QuerySpec("m04_audio_energy", m04_audio_energy, M04_SQL, "multimodal",
              "REAL PCM decode: numpy energy stats through the Arrow seam, "
              "integer-exact vs the SQL oracle"),
    QuerySpec("m01_media_metadata", m01_media_metadata, M01_SQL, "multimodal",
              "binary payload + typed metadata stats per kind"),
    QuerySpec("m02_decode_features", m02_decode_features, M02_SQL, "multimodal",
              "Arrow-batched decode seam (deterministic fake decoder)"),
    QuerySpec("m03_frame_samples", m03_frame_samples, M03_SQL, "multimodal",
              "video frame-offset sampling via metadata explode"),
]


# --------------- m10 quiet-segment detection (STAGED for r11) ------------

def m10_quiet_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style silence-segment detection over the audio clips: fixed
    16-sample frames, frame quiet ⇔ frame mean < clip mean (adaptive,
    scale-free), consecutive quiet frames merged gaps-and-islands.
    Integer counts end-to-end; the quiet comparison is avg-vs-avg of
    exact integer sums, bit-identical cross-engine."""
    audio = _media(spark, sf_dir).filter(F.col("kind") == "audio")
    segs = mm.quiet_segments(audio, window=16)
    return segs.filter(F.col("error").isNull()).select(
        "media_id", "n_windows", "n_quiet", "n_segments", "longest_quiet"
    )


M10_SQL = """
WITH samples AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) + 1),
                               i -> struct_pack(pos := i - 1,
                                                b := ascii(substr(text, i, 1))))) AS s
  FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0),
flat AS (SELECT doc_id, s.pos AS pos, s.b AS b FROM samples),
wins AS (
  SELECT doc_id, pos // 16 AS w, avg(b) AS wmean
  FROM flat GROUP BY doc_id, pos // 16),
clip AS (SELECT doc_id, avg(b) AS cmean FROM flat GROUP BY doc_id),
flags AS (
  SELECT w.doc_id, w.w, (w.wmean < c.cmean) AS quiet
  FROM wins w JOIN clip c USING (doc_id)),
islands AS (
  SELECT doc_id,
         w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
  FROM flags WHERE quiet),
seg AS (
  SELECT doc_id, count(*) AS seg_len FROM islands GROUP BY doc_id, grp)
SELECT f.doc_id + 5000000 AS media_id,
       count(*)::BIGINT AS n_windows,
       count(*) FILTER (WHERE f.quiet)::BIGINT AS n_quiet,
       coalesce(any_value(s.n_segments), 0)::BIGINT AS n_segments,
       coalesce(any_value(s.longest), 0)::BIGINT AS longest_quiet
FROM flags f
LEFT JOIN (SELECT doc_id, count(*) AS n_segments, max(seg_len) AS longest
           FROM seg GROUP BY doc_id) s ON s.doc_id = f.doc_id
GROUP BY f.doc_id
"""


# Registered r11 (staged through r10 while the 50-slot gate was exactly
# consumed by the r6 re-gate cohort + nine new specs).
SPECS.append(
    QuerySpec("m10_quiet_segments", m10_quiet_segments, M10_SQL, "multimodal",
              "VAD-style quiet-segment detection: adaptive frame threshold + "
              "gaps-and-islands merge, integer-exact"),
)

