"""Multimodal (image/audio/video) column plumbing for training pipelines.

The reference has no media path at all; this is the forward-looking
surface a 100 TB corpus build needs. Design: media payloads are opaque
``binary`` columns travelling NEXT TO typed metadata structs — Spark
never interprets the bytes, so columnar pruning keeps metadata-only
queries from ever reading the blobs (keep the binary column LAST and
query metadata columns only; parquet column pruning skips the payload
pages entirely).

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
the decode kernels are stubbed two ways:

* ``decoder="fake"`` (default) — a deterministic header parser for the
  synthetic ``FAKEIMG``/``FAKEAUD`` payloads produced by
  ``synth_media()``; everything around it (schema, Arrow batch shape,
  partitioning, UDF signatures) is real and tested.
* ``decoder="pil"`` / ``"ffmpeg"`` — raise ``NotImplementedError`` with
  the exact dependency needed, so the seam is obvious in production.

All kernels are ``mapInPandas`` (iterator-of-batches: one Python
worker handles many Arrow batches with zero per-row overhead, and
payloads stream batch-by-batch instead of materializing per task).
"""

from __future__ import annotations

import struct
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media",
    "extract_image_meta",
    "decode_and_resize",
    "sample_frames",
    "audio_features",
]

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("format", StringType()),      # fake-img | fake-aud | ...
    StructField("meta_width", IntegerType()),
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),
    StructField("payload", BinaryType()),     # LAST: column pruning skips it
])

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA.

    Image payload: magic + packed (w, h) + w*h bytes from a seeded LCG.
    Audio payload: magic + packed (n_samples, rate) + int16 samples.
    """
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 3 != 2:
            w = int(rng.randint(4, 33))
            h = int(rng.randint(4, 33))
            px = rng.randint(0, 256, size=w * h, dtype=np.int32).astype(np.uint8)
            payload = _IMG_MAGIC + struct.pack("<II", w, h) + px.tobytes()
            rows.append((i, "image", "fake-img", w, h, 0, bytearray(payload)))
        else:
            ns = int(rng.randint(100, 1000))
            rate = 8000
            samples = rng.randint(-(1 << 12), 1 << 12, size=ns, dtype=np.int32).astype(np.int16)
            payload = _AUD_MAGIC + struct.pack("<II", ns, rate) + samples.tobytes()
            rows.append((i, "audio", "fake-aud", 0, 0, int(ns * 1000 / rate), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _require_real_decoder(decoder: str) -> None:
    if decoder == "pil":
        raise NotImplementedError(
            "real image decode needs Pillow (`import PIL.Image`) which is not "
            "in this container; swap decoder='fake' -> 'pil' when available"
        )
    if decoder == "ffmpeg":
        raise NotImplementedError(
            "real audio/video decode needs ffmpeg/soundfile, not in this "
            "container; swap decoder='fake' -> 'ffmpeg' when available"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")


def extract_image_meta(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payload headers -> (media_id, width, height, mean_px).

    The metadata columns already present cover the no-decode path; this
    kernel demonstrates the decode seam + validates payload vs metadata.
    """
    _require_real_decoder(decoder)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, means = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_IMG_MAGIC):
                    continue
                w, h = struct.unpack_from("<II", buf, len(_IMG_MAGIC))
                px = np.frombuffer(buf, dtype=np.uint8, offset=len(_IMG_MAGIC) + 8)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                means.append(round(float(px.mean()), 4))
            yield pd.DataFrame({
                "media_id": ids, "width": ws, "height": hs, "mean_px": means,
            })

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema="media_id long, width int, height int, mean_px double")
    )


def decode_and_resize(df: DataFrame, out_w: int = 8, out_h: int = 8,
                      decoder: str = "fake") -> DataFrame:
    """Resize via nearest-neighbour index sampling (numpy, vectorized)
    -> (media_id, out_w, out_h, thumb binary)."""
    _require_real_decoder(decoder)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, thumbs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_IMG_MAGIC):
                    continue
                w, h = struct.unpack_from("<II", buf, len(_IMG_MAGIC))
                px = np.frombuffer(buf, dtype=np.uint8, offset=len(_IMG_MAGIC) + 8).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                thumb = px[np.ix_(yi, xi)]
                ids.append(mid)
                thumbs.append(bytearray(thumb.tobytes()))
            yield pd.DataFrame({
                "media_id": ids,
                "out_w": np.full(len(ids), out_w, dtype=np.int32),
                "out_h": np.full(len(ids), out_h, dtype=np.int32),
                "thumb": thumbs,
            })

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema="media_id long, out_w int, out_h int, thumb binary")
    )


def sample_frames(df: DataFrame, every_ms: int = 100,
                  decoder: str = "fake") -> DataFrame:
    """Frame-sampling plumbing (1 row in -> N frame rows out, the UDTF
    shape): for fake audio, emit one 'frame' per ``every_ms`` window
    with its RMS energy."""
    _require_real_decoder(decoder)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ts, rms = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_AUD_MAGIC):
                    continue
                ns, rate = struct.unpack_from("<II", buf, len(_AUD_MAGIC))
                samples = np.frombuffer(buf, dtype=np.int16, offset=len(_AUD_MAGIC) + 8).astype(np.float64)
                win = max(1, rate * every_ms // 1000)
                for f, start in enumerate(range(0, len(samples), win)):
                    chunk = samples[start:start + win]
                    ids.append(mid)
                    ts.append(f * every_ms)
                    rms.append(round(float(np.sqrt((chunk ** 2).mean())), 4))
            yield pd.DataFrame({"media_id": ids, "t_ms": ts, "rms": rms})

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(gen, schema="media_id long, t_ms int, rms double")
    )


def audio_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Whole-clip features (duration, peak, rms, zero-crossing rate)."""
    _require_real_decoder(decoder)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, List] = {"media_id": [], "dur_ms": [], "peak": [], "rms": [], "zcr": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_AUD_MAGIC):
                    continue
                ns, rate = struct.unpack_from("<II", buf, len(_AUD_MAGIC))
                s = np.frombuffer(buf, dtype=np.int16, offset=len(_AUD_MAGIC) + 8).astype(np.float64)
                out["media_id"].append(mid)
                out["dur_ms"].append(int(ns * 1000 / rate))
                out["peak"].append(int(np.abs(s).max()) if s.size else 0)
                out["rms"].append(round(float(np.sqrt((s ** 2).mean())), 4) if s.size else 0.0)
                out["zcr"].append(round(float((np.diff(np.signbit(s)) != 0).mean()), 6) if s.size > 1 else 0.0)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(gen, schema="media_id long, dur_ms int, peak int, rms double, zcr double")
    )
