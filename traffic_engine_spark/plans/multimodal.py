"""Multimodal binary-column operators: resize, video frame-sampling, audio
feature extraction (the training-data pipeline's media plumbing).

Payloads stay opaque ``binary`` columns with typed metadata; all compute is
numpy inside Arrow-batched ``mapInPandas`` — never per-row Python at the
Spark API level.  Codec reality in this container (no PIL/opencv/ffmpeg):

  * images — the real PNG / deterministic-lossy codecs from
    functions/images.py;
  * video  — a deterministic container (magic ``VID0`` + frame count +
    length-prefixed per-frame image payloads).  Real-codec (h264 etc.)
    decode is stubbed with NotImplementedError at `decode_video`; the
    Spark-side plumbing (schema, explode shape, batch flow) is real and
    tested;
  * audio  — int16 little-endian PCM in the binary column: genuinely
    decodable with numpy (`frombuffer`), so the feature extractor is real.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.images import decode_image, encode_image, phash64

VIDEO_MAGIC = b"VID0"


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _resize_np(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resample (pure numpy — deterministic, no deps)."""
    h, w = px.shape
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[np.ix_(ys, xs)]


def resize_images(
    images: DataFrame, out_w: int, out_h: int, on_error: str = "raise"
) -> DataFrame:
    """Decode → nearest-neighbour resize → re-encode (same fmt), with the
    resized pHash.  One Arrow batch per task; bytes never shuffle.

    ``on_error``: 'raise' (default — bit-parity with the oracle on clean
    corpora) or 'skip' — undecodable payloads are dropped instead of
    killing the task, the posture a 10^12-row corpus with a nonzero
    corruption rate needs (count skips by anti-joining on image_id)."""
    assert on_error in ("raise", "skip"), on_error

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    px = _resize_np(decode_image(bytes(r.bytes)), out_w, out_h)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows.append(
                    (r.image_id, encode_image(px, r.fmt), out_w, out_h, r.fmt,
                     phash64(px))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# image feature extraction
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("std", T.DoubleType(), False),
        T.StructField("p_min", T.IntegerType(), False),
        T.StructField("p_max", T.IntegerType(), False),
        T.StructField("hist", T.ArrayType(T.LongType(), False), False),
        T.StructField("edge_density", T.DoubleType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

#: intensity histogram bins: value >> 5 → 8 equal-width bins over 0..255
_HIST_BINS = 8
#: horizontal-gradient magnitude at or above this counts as an edge pixel
_EDGE_THRESHOLD = 16


def image_feature_row(px: np.ndarray) -> tuple:
    """(w, h, mean, std, min, max, 8-bin histogram, edge density, phash)
    of one grayscale uint8 frame.  std is population std; edge density is
    the fraction of horizontal first differences with |d| >= 16; rounding
    to 6 decimals makes the doubles stable across accumulation orders.
    The pytest gate recomputes every feature independently
    (tests/test_multimodal.py)."""
    x = px.astype(np.float64)
    hist = np.bincount((px >> 5).ravel(), minlength=_HIST_BINS)
    if px.shape[1] > 1:
        d = np.abs(np.diff(px.astype(np.int32), axis=1))
        edges = round(float(np.mean(d >= _EDGE_THRESHOLD)), 6)
    else:
        edges = 0.0
    return (
        int(px.shape[1]),
        int(px.shape[0]),
        round(float(x.mean()), 6),
        round(float(x.std()), 6),
        int(px.min()),
        int(px.max()),
        [int(c) for c in hist],
        edges,
        phash64(px),
    )


def image_features(images: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes", on_error: str = "raise") -> DataFrame:
    """Decode → per-image feature vector (the feature-extract stage of the
    multimodal checklist: decode / feature-extract / resize / frame-sample).
    Intensity stats, an 8-bin histogram, a gradient edge-density score, and
    the 64-bit pHash per image — Arrow-batched mapInPandas, numpy per
    frame; the input bytes never shuffle (features are born in the map
    task that read the row).

    ``on_error``: 'raise' (default) or 'skip' — same contract as
    resize_images; corrupt payloads in a planet-scale corpus must not
    kill the job."""
    assert on_error in ("raise", "skip"), on_error

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                try:
                    feat = image_feature_row(
                        decode_image(bytes(getattr(r, bytes_col)))
                    )
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows.append((getattr(r, id_col), *feat))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return images.select(id_col, bytes_col).mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# video: deterministic container + frame sampling
# ---------------------------------------------------------------------------


def encode_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Deterministic video container: VID0 + u32 n_frames + per-frame
    (u32 length, image payload)."""
    parts = [VIDEO_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        payload = encode_image(f, fmt)
        parts.append(struct.pack(">I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


_AV_MODULE = None  # lazily probed; False = probed and absent


def _av():
    """Optional real-codec branch: PyAV (ffmpeg bindings) when installed,
    else None.  Same contract as functions.images._pil."""
    global _AV_MODULE
    if _AV_MODULE is None:
        try:
            import av  # type: ignore

            _AV_MODULE = av
        except ImportError:
            _AV_MODULE = False
    return _AV_MODULE or None


def decode_video(data: bytes) -> list[bytes]:
    """→ list of per-frame image payloads (grayscale PNG re-encodes for
    real codecs, raw stored payloads for VID0).  The deterministic VID0
    container decodes natively; any other container (mp4/h264/vp9/…)
    routes through PyAV/ffmpeg when installed, else raises at this one
    boundary."""
    if data[:4] != VIDEO_MAGIC:
        av = _av()
        if av is not None:
            import io

            from ..functions.images import encode_png

            out = []
            with av.open(io.BytesIO(data)) as container:
                for frame in container.decode(video=0):
                    out.append(encode_png(frame.to_ndarray(format="gray")))
            return out
        raise NotImplementedError(
            "real video codecs (h264/vp9/…) need PyAV/ffmpeg, absent in "
            "this environment — only the deterministic VID0 container "
            "decodes without it"
        )
    (n,) = struct.unpack(">I", data[4:8])
    pos, out = 8, []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        out.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return out


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def sample_video_frames(
    videos: DataFrame, every_n: int = 2, id_col: str = "video_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Explode every n-th frame of each video payload into
    (video_id, frame_idx, bytes, phash) rows — the frame-sampling shape of
    a video training pipeline.  Partition-parallel; the per-frame bytes are
    born in the output rows (the input video blob never shuffles)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                frames = decode_video(bytes(getattr(r, bytes_col)))
                for i in range(0, len(frames), every_n):
                    rows.append(
                        (getattr(r, id_col), i, frames[i],
                         phash64(decode_image(frames[i])))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.select(id_col, bytes_col).mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# audio: PCM features (real numpy decode)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_features(
    audio: DataFrame, sample_rate: int = 16_000,
    id_col: str = "audio_id", bytes_col: str = "bytes",
) -> DataFrame:
    """int16-LE PCM payload → (n_samples, duration, rms, peak, zero
    crossings).  The decode is REAL (numpy frombuffer); compressed formats
    (mp3/opus) would raise at the same boundary a real decoder slots into."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                pcm = np.frombuffer(bytes(getattr(r, bytes_col)), dtype="<i2")
                x = pcm.astype(np.float64)
                rows.append(
                    (
                        getattr(r, id_col),
                        int(pcm.size),
                        round(pcm.size / sample_rate, 6),
                        round(float(np.sqrt(np.mean(x * x))) if pcm.size else 0.0, 6),
                        int(np.max(np.abs(pcm))) if pcm.size else 0,
                        int(np.count_nonzero(np.diff(np.signbit(x)))) if pcm.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return audio.select(id_col, bytes_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
