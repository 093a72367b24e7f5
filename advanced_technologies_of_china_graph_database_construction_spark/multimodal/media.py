"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched pandas seams.

No media tables exist in the reference (text-only bibliometrics) or the
driver's fixtures, so payloads are synthesized deterministically from
``documents`` — but the Spark-side plumbing is the real thing a 100 TB
training-data pipeline needs: a stable media schema, ``mapInPandas``
decode/feature/resize/frame-sample operators with per-row error
channels, and partitioning that keeps payload bytes from shuffling
twice.

The decode step itself is STUBBED: the container has no image/audio
libraries, so ``pil_decoder`` raises ``NotImplementedError`` unless PIL
appears, and the default ``fake_decoder`` derives deterministic
"pixels" from payload bytes (tests and oracles stay exact).  Swapping in
a real decoder changes one callable, not the pipeline.

Scale notes: feature extraction is a narrow Arrow-batched map — no
shuffle touches payload bytes; aggregations downstream group on the
small feature/meta columns only (column pruning drops ``payload`` at
the scan when the query never reads it — verify with
``.explain`` ReadSchema).  Frame sampling explodes metadata-derived
offsets, not frames, so the blow-up is bounded by ``duration/step``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", StringType()),  # cast to binary in attach_media
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("error", StringType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic media table from documents: payload =
    UTF-8 text bytes, kind by doc_id mod 3, metadata from n_chars."""
    d = F.col("doc_id")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (d % 3 + 1).cast("int"))
    return docs.select(
        (d + 5_000_000).alias("media_id"),
        d.alias("doc_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        (d % 640 + 64).cast("int").alias("width"),
        (d % 480 + 48).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


# ------------------------------------------------------------- decoders ----

# decoder: bytes -> list[float] feature vector; raises on undecodable.
Decoder = Callable[[bytes], list[float]]


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in: [n_bytes, first_byte, last_byte].
    Empty payloads are undecodable (exercises the error channel)."""
    if not payload:
        raise ValueError("empty payload")
    return [float(len(payload)), float(payload[0]), float(payload[-1])]


def pil_decoder(payload: bytes) -> list[float]:
    """Real image decode → [width, height, channels, mean intensity],
    gated on Pillow being present (the test container ships no imaging
    libs, so there this raises the documented ``NotImplementedError``
    and the conditional test skips; on a cluster with Pillow it runs
    as-is — same ``Decoder`` contract as ``fake_decoder``)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover — exercised only sans PIL
        raise NotImplementedError(
            "image decoding requires Pillow; install it on the cluster or "
            "use fake_decoder for plumbing tests"
        ) from exc
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float64)
    h, w, c = arr.shape
    return [float(w), float(h), float(c), float(arr.mean())]


def extract_features(media: DataFrame, decoder: Decoder | None = None) -> DataFrame:
    """Arrow-batched feature extraction with a per-row error channel
    (same dead-letter shape as enrichment)."""
    dec = decoder or fake_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs, nbytes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                nbytes.append(len(raw))
                try:
                    feats.append(dec(raw))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — dead-letter, not crash
                    feats.append(None)
                    errs.append(f"decode_error: {exc}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "features": feats,
                    "error": errs,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("mean_level", DoubleType()),
        StructField("rms_level", DoubleType()),
        StructField("error", StringType()),
    ]
)


def audio_energy(media: DataFrame) -> DataFrame:
    """REAL decode path that needs no external library: payload bytes as
    unsigned 8-bit PCM samples → per-clip energy stats (mean level, RMS)
    with vectorized numpy — the audio counterpart of ``pil_decoder``
    that actually runs in this container, so the mapInPandas decode seam
    is exercised end-to-end, not just through the fake decoder.

    Determinism: samples are summed as int64 (every intermediate is an
    exact integer well inside 2^53), so mean = sum/n and rms =
    sqrt(sumsq/n) are each ONE float64 division/sqrt — bit-identical to
    the SQL oracle's avg/sqrt regardless of summation order.  Output is
    double end-to-end (the float32 feature array of ``extract_features``
    would destroy the 6-digit rounding contract).  Per-row errors ride
    the same dead-letter channel."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, means, rmss, errs = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if not raw:
                    ns.append(0)
                    means.append(None)
                    rmss.append(None)
                    errs.append("decode_error: empty payload")
                    continue
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                n = len(x)
                ns.append(n)
                means.append(float(x.sum()) / n)
                rmss.append(float(np.sqrt(float((x * x).sum()) / n)))
                errs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": ns,
                    "mean_level": means,
                    "rms_level": rmss,
                    "error": errs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, ENERGY_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure metadata arithmetic — JVM-side, no decode:
    compute target dims preserving aspect ratio; the actual pixel
    resample would ride the same mapInPandas seam as extract_features."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest("width", "height"),
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(media: DataFrame, step_ms: int = 1000) -> DataFrame:
    """Frame sampling for video: explode metadata-derived frame offsets
    (0, step, 2*step, ... < duration).  The per-frame decode is the
    stubbed seam; the offsets/explode/partitioning are real."""
    video = media.filter(F.col("kind") == "video")
    offsets = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0).cast("long")),
        F.lit(step_ms).cast("long"),
    )
    return video.select(
        "media_id",
        "doc_id",
        "duration_ms",
        F.explode(offsets).alias("frame_offset_ms"),
    )
