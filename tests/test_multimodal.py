"""Multimodal binary-column plumbing: resize, video frame-sampling, audio
features — schema/batch-shape/determinism tests (the codecs that need
external libs are stubbed at a clearly-marked boundary; everything Spark
sees is real)."""

import numpy as np
import pandas as pd
import pytest

from traffic_engine_spark.functions.images import decode_image, encode_image, phash64
from traffic_engine_spark.plans import multimodal as MM


def test_resize_images(spark, images_pd):
    out = MM.resize_images(spark.createDataFrame(images_pd.head(40)), 16, 12).toPandas()
    assert len(out) == 40
    assert (out.w == 16).all() and (out.h == 12).all()
    # payloads re-encoded in the original format and decodable at new dims
    px = decode_image(bytes(out.iloc[0]["bytes"]))
    assert px.shape == (12, 16)
    # deterministic: pHash column matches recomputation from the payload
    assert int(out.iloc[0]["phash"]) == phash64(px)
    # resize is a pure function: second run byte-identical
    out2 = MM.resize_images(spark.createDataFrame(images_pd.head(40)), 16, 12).toPandas()
    a = out.sort_values("image_id").reset_index(drop=True)
    b = out2.sort_values("image_id").reset_index(drop=True)
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))


def _fake_videos(n_videos=5, n_frames=7, w=16, h=12):
    rows = []
    for v in range(n_videos):
        rng = np.random.default_rng(100 + v)
        frames = [rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.uint8)
                  for _ in range(n_frames)]
        rows.append((f"vid_{v}", MM.encode_video(frames, fmt="png"), frames))
    return rows


def test_video_frame_sampling(spark):
    vids = _fake_videos()
    df = spark.createDataFrame(
        pd.DataFrame({"video_id": [r[0] for r in vids], "bytes": [r[1] for r in vids]})
    )
    out = MM.sample_video_frames(df, every_n=2).toPandas()
    # 7 frames, every 2nd → indices 0,2,4,6
    assert sorted(set(out.frame_idx)) == [0, 2, 4, 6]
    assert len(out) == len(vids) * 4
    # sampled frame bytes decode to EXACTLY the source frame
    row = out[(out.video_id == "vid_0") & (out.frame_idx == 2)].iloc[0]
    got = decode_image(bytes(row["bytes"]))
    np.testing.assert_array_equal(got, vids[0][2][2])
    assert int(row["phash"]) == phash64(got)


def test_video_real_codec_stub_boundary():
    with pytest.raises(NotImplementedError):
        MM.decode_video(b"\x00\x00\x00\x01gibberish-h264")


def test_audio_features(spark):
    sr = 16_000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 second
    tone = (np.sin(2 * np.pi * 440.0 * t) * 10_000).astype("<i2")
    silent = np.zeros(sr // 2, dtype="<i2")
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["tone", "silence"],
                      "bytes": [tone.tobytes(), silent.tobytes()]})
    )
    out = MM.audio_features(df, sample_rate=sr).toPandas().set_index("audio_id")
    assert out.loc["tone", "n_samples"] == sr
    assert abs(out.loc["tone", "duration_s"] - 1.0) < 1e-9
    # RMS of a sine = amplitude/sqrt(2)
    assert abs(out.loc["tone", "rms"] - 10_000 / np.sqrt(2)) < 50
    assert out.loc["tone", "peak"] == 10_000
    # 440 Hz over 1 s crosses zero ~880 times
    assert 850 <= out.loc["tone", "zero_crossings"] <= 910
    assert out.loc["silence", "rms"] == 0.0 and out.loc["silence", "peak"] == 0
