"""Multimodal binary-column plumbing tests (decode stubs + Arrow shape)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 48).cache()


def test_synth_schema_and_determinism(spark, media):
    assert media.schema == mm.MEDIA_SCHEMA
    again = mm.synth_media(spark, 48)
    a = sorted(media.select("media_id", F.md5(F.col("payload")).alias("h")).collect())
    b = sorted(again.select("media_id", F.md5(F.col("payload")).alias("h")).collect())
    assert a == b


def test_image_meta_matches_header(media):
    metas = {r["media_id"]: r for r in mm.extract_image_meta(media).collect()}
    src = {r["media_id"]: r for r in media.filter(F.col("kind") == "image").collect()}
    assert set(metas) == set(src)
    for mid, r in metas.items():
        assert (r["width"], r["height"]) == (src[mid]["meta_width"], src[mid]["meta_height"])
        px = np.frombuffer(bytes(src[mid]["payload"]), dtype=np.uint8,
                           offset=len(b"FAKEIMG1") + 8)
        assert abs(r["mean_px"] - round(float(px.mean()), 4)) < 1e-9


def test_resize_shape(media):
    out = mm.decode_and_resize(media, out_w=8, out_h=6).collect()
    assert len(out) == media.filter(F.col("kind") == "image").count()
    for r in out:
        assert len(bytes(r["thumb"])) == 8 * 6


def test_frame_sample_udtf_shape(media):
    frames = mm.sample_frames(media, every_ms=50).collect()
    n_audio = media.filter(F.col("kind") == "audio").count()
    assert len(frames) > n_audio  # 1 row in -> N frame rows out
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["t_ms"])
    for mid, ts in per.items():
        assert sorted(ts) == list(range(0, max(ts) + 1, 50))


def test_audio_features(media):
    feats = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    src = {r["media_id"]: r for r in media.filter(F.col("kind") == "audio").collect()}
    assert set(feats) == set(src)
    for mid, r in feats.items():
        buf = bytes(src[mid]["payload"])
        ns, rate = struct.unpack_from("<II", buf, len(b"FAKEAUD1"))
        s = np.frombuffer(buf, dtype=np.int16, offset=len(b"FAKEAUD1") + 8).astype(np.float64)
        assert r["dur_ms"] == int(ns * 1000 / rate) == src[mid]["meta_duration_ms"]
        assert r["peak"] == int(np.abs(s).max())


def test_real_decoders_are_explicit_stubs(media):
    for fn in (mm.extract_image_meta, mm.decode_and_resize):
        with pytest.raises(NotImplementedError, match="not"):
            fn(media, decoder="pil")
    with pytest.raises(NotImplementedError, match="not"):
        mm.sample_frames(media, decoder="ffmpeg")
    with pytest.raises(ValueError):
        mm.audio_features(media, decoder="bogus")


def test_metadata_query_prunes_payload(media, tmp_path):
    """Columnar pruning: a metadata-only query over the parquet media
    table must not read the payload column."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    df = media.sparkSession.read.parquet(p).filter(F.col("kind") == "image") \
        .select("media_id", "meta_width", "meta_height")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_bmp_wav_roundtrip_exact():
    """Real-codec round trips are pixel/sample exact (incl. BMP row
    padding for odd widths and bottom-up row order)."""
    import numpy as np

    from lucene_solr_spark.operators.multimodal import (
        decode_bmp_gray,
        decode_wav_pcm16,
        encode_bmp_gray,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(3)
    for (h, w) in ((5, 7), (4, 4), (31, 3)):
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert (decode_bmp_gray(encode_bmp_gray(px)) == px).all(), (h, w)
    s = rng.integers(-30000, 30000, 777).astype(np.int16)
    out = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert out is not None and out[1] == 8000 and (out[0] == s).all()


def test_real_codec_equals_fake_path(spark):
    """The SAME kernels produce identical features from real BMP/WAV
    payloads as from the fake plumbing payloads (same seeded content)."""
    from lucene_solr_spark.operators import multimodal as mm

    fake = mm.synth_media(spark, 30, codec="fake")
    real = mm.synth_media(spark, 30, codec="bmp_wav")
    a = sorted(map(tuple, mm.extract_image_meta(fake).collect()))
    b = sorted(map(tuple, mm.extract_image_meta(real).collect()))
    assert a == b
    fa = sorted(map(tuple, mm.audio_features(fake).collect()))
    fb = sorted(map(tuple, mm.audio_features(real).collect()))
    assert fa == fb
    ta = sorted(map(tuple, mm.decode_and_resize(fake).collect()))
    tb = sorted(map(tuple, mm.decode_and_resize(real).collect()))
    assert [r[:3] for r in ta] == [r[:3] for r in tb]
    assert all(bytes(x[3]) == bytes(y[3]) for x, y in zip(ta, tb))
