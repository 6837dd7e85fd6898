"""Image payload codecs + perceptual hash + PSNR (the multimodal column layer).

The input table carries opaque ``bytes:binary`` image payloads
(BASELINE.json input_hint).  This container has no image libraries
(PIL/opencv absent), so per round-1 instructions the codecs are:

  * ``fmt='png'``  — a REAL minimal PNG codec (grayscale 8-bit, zlib,
    filter 0) written here with stdlib ``zlib``/``struct`` + numpy.  Output
    is a spec-valid PNG file readable by any external tool.
  * ``fmt='jpeg'`` — a DETERMINISTIC LOSSY STAND-IN (quantise to step 4 +
    zlib container, magic ``b'LOSY'``).  It is NOT a real JPEG — swap
    `encode_lossy/decode_lossy` for a libjpeg binding in production.  The
    Spark-side plumbing (schema, Arrow batch shape, UDF signatures) is the
    real design and is fully tested.  Quantisation step 4 bounds MSE at
    ~1.33 ⇒ PSNR ≈ 47 dB ≥ the 40 dB invariant.

Geotag carriage (FIXTURES.md §1): the canonical caption string is packed
into the pixel grid one *nibble per pixel* (value = nibble*16 + 8), so the
geotag survives the lossy path (max quantisation error 2 < nibble step 16)
and a vectorised UDF can recover it from ``bytes`` alone.

pHash is a real average-hash: 8×8 block means thresholded at their global
mean → 64-bit int (sign bit avoided by int64 two's complement is fine).

Everything is numpy per-image inside Arrow-batched pandas UDFs
(`mapInPandas`/`pandas_udf`) — no per-row Python at the Spark API level.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
LOSSY_MAGIC = b"LOSY"
LOSSY_Q = 4  # quantisation step of the lossy stand-in


# ---------------------------------------------------------------------------
# minimal real PNG (grayscale-8)
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Grayscale uint8 (h, w) → spec-valid PNG bytes."""
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, gray
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == PNG_SIG, "not a PNG"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 0, "codec only handles grayscale-8"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    assert (raw[:, 0] == 0).all(), "codec only writes filter 0"
    return raw[:, 1:].copy()


# ---------------------------------------------------------------------------
# deterministic lossy stand-in (NOT a real JPEG — see module docstring)
# ---------------------------------------------------------------------------


def encode_lossy(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    q = (pixels.astype(np.int32) // LOSSY_Q) * LOSSY_Q + LOSSY_Q // 2
    q = np.clip(q, 0, 255).astype(np.uint8)
    return LOSSY_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    assert data[:4] == LOSSY_MAGIC, "not a LOSY payload"
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w).copy()


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    return encode_png(pixels) if fmt == "png" else encode_lossy(pixels)


_PIL_IMAGE = None  # lazily probed; False = probed and absent


def _pil():
    """Optional real-codec branch: Pillow's Image class when installed,
    else None.  Probed once; tests monkeypatch the cache to exercise the
    branch without the library."""
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image  # type: ignore

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = False
    return _PIL_IMAGE or None


def decode_image(data: bytes) -> np.ndarray:
    """Payload → grayscale uint8 (h, w).  The two deterministic in-repo
    containers decode natively; any OTHER magic (real jpeg/webp/…) routes
    through Pillow when installed, else raises at this one boundary.
    Encoding stays deterministic (PNG/LOSY) regardless — engine outputs
    must not depend on which libraries the cluster happens to have."""
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:4] == LOSSY_MAGIC:
        return decode_lossy(data)
    Image = _pil()
    if Image is not None:
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("L"), dtype=np.uint8)
    raise NotImplementedError(
        f"payload magic {data[:4]!r} is not an in-repo container and real "
        "image codecs need Pillow, absent in this environment — install "
        "Pillow to decode real jpeg/webp/png-rgb payloads"
    )


# ---------------------------------------------------------------------------
# geotag pixel carriage
# ---------------------------------------------------------------------------


def render_pixels(caption: str, w: int, h: int) -> np.ndarray:
    """Render the canonical caption into an (h, w) grayscale grid:
    [u16 length][nibbles of utf-8 caption] then a deterministic fill."""
    payload = caption.encode("utf-8")
    assert 4 + 2 * len(payload) <= w * h, "image too small for geotag"
    header = struct.pack(">H", len(payload))
    nibbles = []
    for b in header + payload:
        nibbles.append((b >> 4) & 0xF)
        nibbles.append(b & 0xF)
    flat = np.empty(w * h, dtype=np.uint8)
    n = len(nibbles)
    flat[:n] = np.asarray(nibbles, dtype=np.uint8) * 16 + 8
    # deterministic textured fill derived from the caption (keeps pHash varied)
    seed = zlib.crc32(payload) & 0xFFFFFFFF
    idx = np.arange(n, w * h, dtype=np.uint64)
    flat[n:] = ((idx * np.uint64(2654435761) + np.uint64(seed)) >> np.uint64(16)).astype(np.uint8)
    return flat.reshape(h, w)


def extract_caption(pixels: np.ndarray) -> str:
    flat = pixels.reshape(-1)
    nib = np.floor_divide(flat.astype(np.int32), 16).astype(np.uint8)  # nearest nibble
    ln = int(nib[0]) << 12 | int(nib[1]) << 8 | int(nib[2]) << 4 | int(nib[3])
    body = nib[4 : 4 + 2 * ln]
    by = (body[0::2].astype(np.uint8) << 4) | body[1::2].astype(np.uint8)
    return by.tobytes().decode("utf-8")


# ---------------------------------------------------------------------------
# pHash + PSNR
# ---------------------------------------------------------------------------


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: 8×8 block means > global mean → 64 bits → int64."""
    h, w = pixels.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = pixels[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # int64 two's complement


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
