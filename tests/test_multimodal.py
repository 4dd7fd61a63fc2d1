"""Multimodal operators: real container codecs, batch shapes, determinism,
and the clearly-marked external-codec stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from roddy_spark.operators import multimodal as M
from roddy_spark.sources import codecs


def test_pcm16_roundtrip():
    rng = np.random.default_rng(5)
    samples = rng.uniform(-0.9, 0.9, size=4000)
    data = M.encode_pcm16(samples, 8000)
    dec, rate = M.decode_audio(data)
    assert rate == 8000 and len(dec) == 4000
    assert np.abs(dec - samples).max() < 1e-3  # 16-bit quantization only


def test_fvid_roundtrip():
    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
              for _ in range(5)]
    data = M.encode_video(frames, fps=10)
    out = list(M.decode_video_frames(data))
    assert [i for i, _ in out] == list(range(5))
    for (_, got), exp in zip(out, frames):
        assert np.array_equal(got, exp)  # PNG frames are lossless


def test_external_codecs_are_stubbed():
    with pytest.raises(NotImplementedError, match="STUB"):
        M.decode_audio(b"ID3\x04fake-mp3-bytes")
    with pytest.raises(NotImplementedError, match="STUB"):
        list(M.decode_video_frames(b"\x00\x00\x00 ftypisom-fake-mp4"))


def test_media_df_and_audio_features(spark):
    media = M.media_df(spark, n_audio=6, n_video=3, seed=42)
    assert media.count() == 9
    feats = M.audio_features(media).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["decode_error"] is None
        assert 0.4 <= r["duration_s"] <= 2.1
        assert 0 < r["rms"] < 1 and 0 < r["peak"] <= 1
        assert 0 < r["zero_crossing_rate"] < 1


def test_audio_stub_error_is_a_column_not_a_crash(spark):
    import pandas as pd
    rows = [M.gen_audio_row(42, 0)]
    rows[0]["fmt"] = "mp3"
    rows[0]["bytes"] = b"ID3\x04not-really-mp3"
    df = spark.createDataFrame(pd.DataFrame(rows), M.MEDIA_SCHEMA)
    out = M.audio_features(df).collect()
    assert len(out) == 1 and out[0]["decode_error"].startswith("stub:")


def test_video_frame_sampling(spark):
    media = M.media_df(spark, n_audio=0, n_video=4, seed=42)
    frames = M.video_frame_sample(media, every_k=2).collect()
    assert frames
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
        assert r["frame_idx"] % 2 == 0          # sampling respected
        assert r["ts_ms"] == r["frame_idx"] * 100
        px = codecs.decode_png(bytes(r["png"]))  # sampled frame decodable
        assert px.ndim == 3
    metas = {r["media_id"]: r["meta"]["n_frames"]
             for r in media.filter("media_type='video'").collect()}
    for vid, rows in by_vid.items():
        assert len(rows) == (metas[vid] + 1) // 2


def test_resize_and_features(spark):
    from roddy_spark.sources.corpus import corpus_df
    corpus = corpus_df(spark, 12, seed=42, partitions=2)
    small = M.resize_images(corpus, 8, 8).collect()
    assert all(r["w"] == 8 and r["h"] == 8 for r in small)
    for r in small[:3]:
        assert codecs.decode_png(bytes(r["bytes"])).shape == (8, 8, 3)
    feats = M.image_features(corpus).collect()
    assert all(len(r["features"]) == 12 for r in feats)
    for r in feats:
        s = sum(r["features"])
        assert abs(s - 3.0) < 1e-3  # 3 normalized histograms


def test_generation_deterministic(spark):
    a = M.gen_video_row(42, 3)
    b = M.gen_video_row(42, 3)
    assert a["bytes"] == b["bytes"]
    assert M.gen_audio_row(42, 1)["bytes"] == M.gen_audio_row(42, 1)["bytes"]
