"""Deterministic image codec + synthetic pixel generator.

Real image libraries (PIL / libjpeg) are not present in this container,
so the engine ships a self-contained deterministic codec with the same
*contract* as png/jpeg:

- ``fmt="png"``  : lossless — raw RGB uint8 buffer, zlib-compressed.
- ``fmt="jpeg"`` : lossy — pixels quantized to steps of Q=4 before zlib;
  worst-case MSE is Q²/12 ≈ 1.33, i.e. PSNR ≈ 46.8 dB > the 40 dB
  invariant from BASELINE.json ``input_hint``.

A 16-byte header carries magic/fmt/w/h so decode is self-describing.
The decode path is where a real deployment would call libjpeg-turbo /
libpng via a vectorized pandas UDF; the Spark-side plumbing (binary
column in, Arrow batch out) is identical, so swapping the codec is a
one-function change (see operators/images.py).
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = b"GSKI"
Q_JPEG = 4  # quantization step for the lossy path


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (w, h, 3) uint8 image from the image_id alone.

    Seeded gradient + hash-noise: reproducible on any executor without
    shared state, so golden checks can regenerate expected pixels.
    """
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
    grad = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
    img = np.stack([base, grad, ((base.astype(np.uint16) + grad) // 2).astype(np.uint8)], axis=-1)
    return (img.astype(np.uint16) + noise).clip(0, 255).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape[:2]
    if fmt == "jpeg":
        px = (pixels.astype(np.int32) // Q_JPEG * Q_JPEG + Q_JPEG // 2).clip(0, 255).astype(np.uint8)
    elif fmt == "png":
        px = pixels
    else:
        raise NotImplementedError(
            f"fmt={fmt!r}: real codecs (libjpeg/libpng) are unavailable in this "
            "container; only the deterministic 'png'/'jpeg' stand-ins are wired"
        )
    header = MAGIC + fmt[:1].encode() + b"\x00" + w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\x00\x00"
    return header + zlib.compress(px.tobytes(), level=1)


def decode(blob: bytes) -> np.ndarray:
    if blob[:4] != MAGIC:
        raise NotImplementedError(
            "non-synthetic image payload: plug a real decoder (libjpeg/libpng) here"
        )
    w = int.from_bytes(blob[6:10], "little")
    h = int.from_bytes(blob[10:14], "little")
    raw = zlib.decompress(blob[16:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0**2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-hash stand-in: 8×8 mean-threshold
    of the grayscale image (aHash — public-domain algorithm)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    blocks = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
    counts = np.outer(np.diff(np.append(ys, h)), np.diff(np.append(xs, w)))
    means = blocks / counts
    bits = (means > means.mean()).reshape(-1)
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def _box_mean_grid(gray: np.ndarray, n: int = 32) -> np.ndarray:
    """Deterministic n×n box-mean downsample of a 2-D float array.

    When a dimension is smaller than n, falls back to nearest-neighbor
    index sampling (reduceat needs strictly increasing bin edges) —
    still fully deterministic.
    """
    h, w = gray.shape
    if h >= n and w >= n:
        ys = (np.arange(n) * h) // n
        xs = (np.arange(n) * w) // n
        blocks = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
        counts = np.outer(np.diff(np.append(ys, h)), np.diff(np.append(xs, w)))
        return blocks / counts
    yi = np.minimum((np.arange(n) * h) // n, h - 1)
    xi = np.minimum((np.arange(n) * w) // n, w - 1)
    return gray[np.ix_(yi, xi)].astype(np.float64)


_DCT32 = None


def _dct32_matrix() -> np.ndarray:
    """The 32-point DCT-II basis matrix (orthonormal scaling), cached."""
    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n)[:, None].astype(np.float64)
        j = np.arange(n)[None, :].astype(np.float64)
        m = np.cos(np.pi * (2.0 * j + 1.0) * k / (2.0 * n))
        m[0, :] *= np.sqrt(1.0 / n)
        m[1:, :] *= np.sqrt(2.0 / n)
        _DCT32 = m
    return _DCT32


def phash_dct64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (the classic public pHash recipe):
    luma → 32×32 box-mean → 2-D DCT-II → keep the low-frequency 8×8
    block → bit k set iff coefficient k exceeds the median of the 63
    non-DC coefficients.  Signed int64 (two's complement) so the hash
    rides a Spark `long` column and the Hamming banding in
    dedup.phash_neardup_pairs applies unchanged.
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    g = _box_mean_grid(gray, 32)
    c = _dct32_matrix()
    d = c @ g @ c.T
    block = d[:8, :8].reshape(-1)
    med = np.median(block[1:])
    v = 0
    for bit in block > med:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash64(pixels: "np.ndarray") -> int:
    """64-bit difference hash (the public dHash recipe): luma → 9×8
    box-mean → bit k set iff cell (r, c+1) > cell (r, c) — horizontal
    GRADIENT signs, the most edit-robust of the classic hash trio
    (aHash/codec.phash64, DCT pHash, wHash): immune to global
    brightness/contrast shifts that flip aHash and wHash bits, cheaper
    than the DCT.  Same signed-int64 surface as its siblings, so the
    Hamming banding in dedup.phash_neardup_pairs applies unchanged.
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # 8 rows x 9 cols of block means (one extra column for the diffs)
    if h >= 8 and w >= 9:
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(9) * w) // 9
        blocks = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
        counts = np.outer(np.diff(np.append(ys, h)), np.diff(np.append(xs, w)))
        g = blocks / counts
    else:
        yi = np.minimum((np.arange(8) * h) // 8, h - 1)
        xi = np.minimum((np.arange(9) * w) // 9, w - 1)
        g = gray[np.ix_(yi, xi)]
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def whash64(pixels: np.ndarray) -> int:
    """64-bit Haar wavelet hash (the public wHash recipe, e.g. the
    `imagehash` library): luma → 32×32 box-mean → 2 levels of the 2-D
    Haar DWT (each level halves the grid by 2×2 block averaging, the LL
    band) → the 8×8 LL approximation thresholded at its MEDIAN.

    Complements the DCT pHash: the Haar LL band is a pure local
    average, so wHash is more tolerant of high-frequency noise (jpeg
    ringing, sharpening) and less tolerant of global contrast shifts —
    running BOTH and unioning the banded pairs is the standard
    near-dup-recall booster.  Deterministic: block averages are fixed
    +/÷ op order, no libm.  Signed int64 like phash_dct64 so
    dedup.phash_neardup_pairs' Hamming banding applies unchanged.
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    g = _box_mean_grid(gray, 32)
    for _ in range(2):  # Haar LL: 2x2 block average, fixed summation order
        g = ((g[0::2, 0::2] + g[0::2, 1::2]) + (g[1::2, 0::2] + g[1::2, 1::2])) / 4.0
    block = g.reshape(-1)
    med = np.median(block)
    v = 0
    for bit in block > med:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v
