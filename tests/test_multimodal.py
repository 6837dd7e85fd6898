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


def test_image_unknown_magic_without_pil_raises():
    """Sandbox path: a non-in-repo payload must fail loudly at the codec
    boundary (naming the missing library), never decode as garbage."""
    from traffic_engine_spark.functions import images as IM

    if IM._pil() is not None:
        pytest.skip("Pillow installed — covered by the real-codec test")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # jpeg SOI magic


def test_image_real_codec_branch_wiring(monkeypatch):
    """The optional-Pillow branch is wired even in this Pillow-less
    sandbox: inject a minimal stand-in and check unknown magics route
    through it with the grayscale-convert contract."""
    from traffic_engine_spark.functions import images as IM

    class _Img:
        def __init__(self, data):
            self.data = data

        def convert(self, mode):
            assert mode == "L"
            return np.full((2, 3), 7, dtype=np.uint8)

    class _FakeImage:
        @staticmethod
        def open(buf):
            assert buf.read(4) == b"\xff\xd8\xff\xe0"
            return _Img(buf)

    monkeypatch.setattr(IM, "_PIL_IMAGE", _FakeImage)
    out = IM.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 8)
    assert out.shape == (2, 3) and (out == 7).all()
    # in-repo containers still decode natively, never via the fake
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (IM.decode_image(IM.encode_png(px)) == px).all()


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="Pillow not installed (sandbox); branch covered by wiring test",
)
def test_image_real_codec_roundtrip_with_pil():
    from PIL import Image
    import io

    from traffic_engine_spark.functions import images as IM

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="JPEG", quality=95)
    out = IM.decode_image(buf.getvalue())
    assert out.shape == (8, 8)
    # lossy codec: allclose, not exact
    assert float(np.abs(out.astype(float) - px).mean()) < 8.0


def test_video_real_codec_branch_wiring(monkeypatch):
    """Same wiring proof for the PyAV branch of decode_video."""
    from traffic_engine_spark.functions.images import decode_png
    from traffic_engine_spark.plans import multimodal as M2

    class _Frame:
        def to_ndarray(self, format):
            assert format == "gray"
            return np.full((4, 4), 9, dtype=np.uint8)

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video):
            return [_Frame(), _Frame()]

    class _FakeAv:
        @staticmethod
        def open(buf):
            return _Container()

    monkeypatch.setattr(M2, "_AV_MODULE", _FakeAv)
    frames = M2.decode_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)
    assert len(frames) == 2
    assert (decode_png(frames[0]) == 9).all()


def test_image_features_match_independent_replay(spark, images_pd):
    sub = images_pd.head(60)
    out = MM.image_features(spark.createDataFrame(sub)).toPandas()
    out = out.set_index("image_id")
    assert len(out) == 60
    for r in sub.itertuples():
        px = decode_image(bytes(r.bytes))
        g = out.loc[r.image_id]
        # independent replay of every feature (no shared kernel)
        assert (int(g.w), int(g.h)) == (px.shape[1], px.shape[0])
        assert float(g["mean"]) == round(float(np.mean(px.astype(float))), 6)
        assert float(g["std"]) == round(float(np.std(px.astype(float))), 6)
        assert (int(g.p_min), int(g.p_max)) == (int(px.min()), int(px.max()))
        counts = [int(np.sum((px >= lo) & (px < lo + 32))) for lo in range(0, 256, 32)]
        assert list(g["hist"]) == counts
        d = np.abs(px[:, 1:].astype(int) - px[:, :-1].astype(int))
        assert float(g.edge_density) == round(float(np.mean(d >= 16)), 6)
        assert int(g.phash) == phash64(px)
    # histogram mass always equals the pixel count
    assert all(sum(hist) == w * h for hist, w, h in zip(out["hist"], out.w, out.h))


def test_corrupt_payload_handling(spark, images_pd):
    """Planet-scale robustness: a corrupt payload must (a) be REPORTED by
    verify_payloads (bytes_ok False), never crash the task; (b) kill the
    job under the default on_error='raise' for resize/features (parity
    posture); (c) be dropped cleanly under on_error='skip'."""
    from pyspark.errors import PythonException

    from traffic_engine_spark.plans import tiles as TI

    sub = images_pd.head(12).copy()
    bad_id = sub.iloc[3]["image_id"]
    sub.loc[sub.image_id == bad_id, "bytes"] = b"\x00GARBAGE-not-a-container"
    df = spark.createDataFrame(sub)

    ver = TI.verify_payloads(df).toPandas()
    assert len(ver) == 12
    bad = ver[ver.image_id == bad_id].iloc[0]
    assert not bad.bytes_ok and not bad.caption_ok and bad.psnr_db == 0.0
    assert ver[ver.image_id != bad_id].bytes_ok.all()

    with pytest.raises(PythonException):
        MM.resize_images(df, 16, 12).toPandas()
    with pytest.raises(PythonException):
        MM.image_features(df).toPandas()

    ok = MM.resize_images(df, 16, 12, on_error="skip").toPandas()
    assert len(ok) == 11 and bad_id not in set(ok.image_id)
    feats = MM.image_features(df, on_error="skip").toPandas()
    assert len(feats) == 11 and bad_id not in set(feats.image_id)


def test_render_tiles_fixture_grid_and_plan(spark):
    """Vector→raster rendering (plans/tiles.render_tiles): a duplicated
    point renders at 255, a lone point at 255*1//2 = 127, every other
    pixel stays 0; the executed plan holds exactly TWO exchanges (pixel
    hash-agg, per-tile applyInPandas) — the binary payload is born on the
    tile's executor and never re-shuffles."""
    import re

    from traffic_engine_spark.functions.cells import tile_x_np, tile_y_np
    from traffic_engine_spark.functions.images import decode_png
    from traffic_engine_spark.plans import tiles as TI

    lat0, lon0 = 37.7599, -122.1732
    lat1, lon1 = 37.7601, -122.1735
    pts = spark.createDataFrame(
        pd.DataFrame({"lat": [lat0, lat0, lat1], "lon": [lon0, lon0, lon1]})
    )
    df = TI.render_tiles(pts, zoom=15)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 2
    out = df.toPandas()

    lats, lons = np.array([lat0, lat1]), np.array([lon0, lon1])
    tx, ty = tile_x_np(lons, 15), tile_y_np(lats, 15)
    assert tx[0] == tx[1] and ty[0] == ty[1]  # fixture: one tile
    px = tile_x_np(lons, 23) - 256 * tx
    py = tile_y_np(lats, 23) - 256 * ty
    assert (px != px[::-1]).any() or (py != py[::-1]).any()  # distinct pixels

    assert len(out) == 1
    row = out.iloc[0]
    assert (row.tile_x, row.tile_y, row.z) == (tx[0], ty[0], 15)
    assert (row.n_points, row.n_pixels, row.max_count) == (3, 2, 2)
    grid = decode_png(bytes(row.png))
    assert grid.shape == (256, 256)
    assert grid[py[0], px[0]] == 255
    assert grid[py[1], px[1]] == 127
    assert int(np.count_nonzero(grid)) == 2


def test_render_tiles_matches_independent_replay(spark):
    """The yardstick query equals the materialized oracle (independent
    pandas-groupby replay, shared slippy/PNG leaf primitives) exactly —
    including the PNG payload md5."""
    import duckdb

    from traffic_engine_spark import queries as Q
    from traffic_engine_spark.oracle.materialize import ensure_yardstick_oracles

    sqls = ensure_yardstick_oracles()
    got = (
        Q.YARDSTICKS["render_tiles"][0](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(sqls["render_tiles"])
        .df()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    assert len(got) > 1
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if c != "png_md5"}),
        exp.astype({c: "int64" for c in exp.columns if c != "png_md5"}),
    )


def test_raster_pyramid_compose_and_conservation(spark):
    """Overview composition (plans/tiles.raster_pyramid): every parent
    grid equals the independent replay — each child decoded, 2×2
    max-pooled, placed at its (x&1, y&1) quadrant; n_points is conserved
    level to level."""
    from traffic_engine_spark.functions.images import decode_png
    from traffic_engine_spark.plans import tiles as TI

    rng = np.random.default_rng(7)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "lat": 37.75 + rng.uniform(0, 0.03, 400),
                "lon": -122.18 + rng.uniform(0, 0.03, 400),
            }
        )
    )
    base = TI.render_tiles(pts, zoom=15).toPandas()
    assert len(base) >= 4  # fixture spans several z15 tiles
    pyr = TI.raster_pyramid(
        TI.render_tiles(pts, zoom=15), base_zoom=15, min_zoom=13
    ).toPandas()

    for pz, child_level in ((14, base), (13, None)):
        level = pyr[pyr.z == pz]
        kids = child_level if child_level is not None else pyr[pyr.z == pz + 1]
        # n_points conservation per level
        assert level.n_points.sum() == kids.n_points.sum() == 400
        # exact grid replay from the children
        for row in level.itertuples(index=False):
            expect = np.zeros((256, 256), dtype=np.uint8)
            mine = kids[
                (kids.tile_x // 2 == row.tile_x) & (kids.tile_y // 2 == row.tile_y)
            ]
            assert len(mine) >= 1
            for c in mine.itertuples(index=False):
                cg = decode_png(bytes(c.png))
                pooled = cg.reshape(128, 2, 128, 2).max(axis=(1, 3))
                qx, qy = int(c.tile_x) & 1, int(c.tile_y) & 1
                expect[qy * 128:(qy + 1) * 128, qx * 128:(qx + 1) * 128] = pooled
            got = decode_png(bytes(row.png))
            assert np.array_equal(got, expect)
            assert row.n_pixels == int(np.count_nonzero(expect))
            assert row.max_count == mine.max_count.max()


def test_raster_pyramid_matches_independent_replay(spark):
    """The yardstick query equals the materialized oracle (independent
    dict-of-grids numpy replay) exactly, PNG md5 included."""
    import duckdb

    from traffic_engine_spark import queries as Q
    from traffic_engine_spark.oracle.materialize import ensure_yardstick_oracles

    sqls = ensure_yardstick_oracles()
    keys = ["z", "tile_x", "tile_y"]
    got = (
        Q.YARDSTICKS["raster_pyramid"][0](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    exp = duckdb.sql(sqls["raster_pyramid"]).df().sort_values(keys).reset_index(drop=True)
    assert set(got.z) == {13, 14}
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if c != "png_md5"}),
        exp.astype({c: "int64" for c in exp.columns if c != "png_md5"}),
    )
