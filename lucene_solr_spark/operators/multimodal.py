"""Multimodal (image/audio/video) column plumbing for training pipelines.

The reference has no media path at all; this is the forward-looking
surface a 100 TB corpus build needs. Design: media payloads are opaque
``binary`` columns travelling NEXT TO typed metadata structs — Spark
never interprets the bytes, so columnar pruning keeps metadata-only
queries from ever reading the blobs (keep the binary column LAST and
query metadata columns only; parquet column pruning skips the payload
pages entirely).

Decoder tiers:

* ``decoder="fake"`` (default) handles BOTH the deterministic
  ``FAKEIMG``/``FAKEAUD`` plumbing payloads AND the real uncompressed
  standards — 24-bit BMP images and PCM16 WAV audio are decoded with
  struct+numpy alone (``decode_bmp_gray`` / ``decode_wav_pcm16``), so
  the full decode -> feature-extract -> resize path runs end-to-end on
  genuine file formats with no external dependency.
* ``decoder="pil"`` / ``"ffmpeg"`` — compressed codecs (png/jpeg/video)
  raise ``NotImplementedError`` naming the exact dependency, so the
  production seam is obvious.

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
    "synth_media", "synth_rows",
    "image_meta_of", "thumb_of", "frames_of", "audio_feats_of",
    "encode_bmp_gray", "decode_bmp_gray",
    "encode_wav_pcm16", "decode_wav_pcm16",
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


# ------------------------------------------------- real (uncompressed) codecs
#
# BMP (24-bit) and WAV (PCM16 mono) are fully decodable with
# struct+numpy — no external library — so the decode seam is REAL for
# the uncompressed standards; only compressed codecs (png/jpeg/ffmpeg)
# stay behind NotImplementedError.


def encode_bmp_gray(px: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> standard 24-bit bottom-up BMP bytes."""
    h, w = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = np.repeat(px[y], 3).tobytes()
        rows.append(row + b"\x00" * (row_size - len(row)))
    return header + dib + b"".join(rows)


def decode_bmp_gray(buf: bytes):
    """24-bit BMP -> (h, w) uint8 (blue channel); None if not BMP."""
    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", buf, 10)[0]
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    if bpp != 24:
        return None
    top_down = h_raw < 0
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, dtype=np.uint8, offset=off,
                         count=row_size * h).reshape(h, row_size)
    px = data[:, : w * 3].reshape(h, w, 3)[:, :, 0]
    return px if top_down else px[::-1]


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> standard 44-byte-header WAV bytes."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_pcm16(buf: bytes):
    """WAV -> (int16 samples, rate); None if not PCM16 mono WAV."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        sz = struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", buf, pos + 8)
            if fmt != 1 or ch != 1:
                return None
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", offset=pos + 8,
                                    count=sz // 2)
        pos += 8 + sz + (sz & 1)
    if rate is None or samples is None:
        return None
    return samples, rate


def _decode_image(buf: bytes):
    """payload -> (h, w) uint8 array, via the fake header OR real BMP."""
    if buf.startswith(_IMG_MAGIC):
        w, h = struct.unpack_from("<II", buf, len(_IMG_MAGIC))
        return np.frombuffer(buf, dtype=np.uint8,
                             offset=len(_IMG_MAGIC) + 8).reshape(h, w)
    return decode_bmp_gray(buf)


def _decode_audio(buf: bytes):
    """payload -> (int16 samples, rate), via the fake header OR real WAV."""
    if buf.startswith(_AUD_MAGIC):
        ns, rate = struct.unpack_from("<II", buf, len(_AUD_MAGIC))
        return (np.frombuffer(buf, dtype=np.int16,
                              offset=len(_AUD_MAGIC) + 8), rate)
    return decode_wav_pcm16(buf)


def synth_rows(n: int = 64, seed: int = 5, codec: str = "fake") -> list:
    """Deterministic synthetic media rows (pure numpy, no Spark).

    Shared by ``synth_media`` (the Spark table) and the driver-side
    oracle replay (`__spark_entry__` emits literal expected rows from
    the SAME rows + per-payload kernels — the engine/oracle
    share-the-kernel invariant, same pattern as the k-means digest).
    """
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 3 != 2:
            w = int(rng.randint(4, 33))
            h = int(rng.randint(4, 33))
            px = rng.randint(0, 256, size=w * h, dtype=np.int32).astype(np.uint8)
            if codec == "bmp_wav":
                payload = encode_bmp_gray(px.reshape(h, w))
                fmt = "bmp"
            else:
                payload = _IMG_MAGIC + struct.pack("<II", w, h) + px.tobytes()
                fmt = "fake-img"
            rows.append((i, "image", fmt, w, h, 0, bytearray(payload)))
        else:
            ns = int(rng.randint(100, 1000))
            rate = 8000
            samples = rng.randint(-(1 << 12), 1 << 12, size=ns, dtype=np.int32).astype(np.int16)
            if codec == "bmp_wav":
                payload = encode_wav_pcm16(samples, rate)
                fmt = "wav"
            else:
                payload = _AUD_MAGIC + struct.pack("<II", ns, rate) + samples.tobytes()
                fmt = "fake-aud"
            rows.append((i, "audio", fmt, 0, 0, int(ns * 1000 / rate), bytearray(payload)))
    return rows


def synth_media(spark: SparkSession, n: int = 64, seed: int = 5,
                codec: str = "fake") -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA.

    ``codec="fake"``: magic-header payloads (fastest plumbing tests).
    ``codec="bmp_wav"``: REAL standard 24-bit BMP images and PCM16 WAV
    audio — the decode kernels parse these with struct+numpy alone, so
    the uncompressed-codec path is fully exercised end-to-end.
    """
    return spark.createDataFrame(synth_rows(n, seed, codec), MEDIA_SCHEMA)


# --------------------------------------------------- per-payload kernels
#
# One pure function per media kernel, shared by the distributed
# mapInPandas closures AND the driver-side oracle replay — the oracle
# literals are generated BY these functions, never hand-written.


def image_meta_of(payload: bytes):
    """payload -> (width, height, mean_px rounded 4) or None."""
    px = _decode_image(payload)
    if px is None:
        return None
    h, w = px.shape
    return w, h, round(float(px.mean()), 4)


def thumb_of(payload: bytes, out_w: int, out_h: int):
    """payload -> nearest-neighbour (out_h, out_w) thumb bytes or None."""
    px = _decode_image(payload)
    if px is None:
        return None
    h, w = px.shape
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return px[np.ix_(yi, xi)].tobytes()


def frames_of(payload: bytes, every_ms: int):
    """payload -> [(t_ms, rms rounded 4)] per window, or None."""
    dec = _decode_audio(payload)
    if dec is None:
        return None
    samples, rate = dec
    samples = samples.astype(np.float64)
    win = max(1, rate * every_ms // 1000)
    out = []
    for f, start in enumerate(range(0, len(samples), win)):
        chunk = samples[start:start + win]
        out.append((f * every_ms, round(float(np.sqrt((chunk ** 2).mean())), 4)))
    return out


def audio_feats_of(payload: bytes):
    """payload -> (dur_ms, peak, rms rounded 4, zcr rounded 6) or None."""
    dec = _decode_audio(payload)
    if dec is None:
        return None
    s, rate = dec
    s = s.astype(np.float64)
    return (
        int(len(s) * 1000 / rate),
        int(np.abs(s).max()) if s.size else 0,
        round(float(np.sqrt((s ** 2).mean())), 4) if s.size else 0.0,
        round(float((np.diff(np.signbit(s)) != 0).mean()), 6) if s.size > 1 else 0.0,
    )


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
                m = image_meta_of(bytes(payload))
                if m is None:
                    continue
                ids.append(mid)
                ws.append(m[0])
                hs.append(m[1])
                means.append(m[2])
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
                thumb = thumb_of(bytes(payload), out_w, out_h)
                if thumb is None:
                    continue
                ids.append(mid)
                thumbs.append(bytearray(thumb))
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
                frames = frames_of(bytes(payload), every_ms)
                if frames is None:
                    continue
                for t_ms, r in frames:
                    ids.append(mid)
                    ts.append(t_ms)
                    rms.append(r)
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
                feats = audio_feats_of(bytes(payload))
                if feats is None:
                    continue
                out["media_id"].append(mid)
                out["dur_ms"].append(feats[0])
                out["peak"].append(feats[1])
                out["rms"].append(feats[2])
                out["zcr"].append(feats[3])
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(gen, schema="media_id long, dur_ms int, peak int, rms double, zcr double")
    )
