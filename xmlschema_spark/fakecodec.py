"""Deterministic fake image codec.

The container has no image libraries (PIL/opencv), so the *codec* is a
deterministic stand-in — a tiny container format with a lossless variant
("png") and lossy variants ("jpeg"/"webp") implemented as uniform
quantization + zlib. Everything downstream of the codec (Arrow-batched
decode UDFs, dimensional/format consistency checks, PSNR>=40dB lossy
parity, phash) is real Spark plumbing and real math.

Reference semantics mirrored here:
- binary value-space validation (hexBinary/base64Binary validators,
  reference: xmlschema/validators/helpers.py:240-257) -> a decodable,
  format-tagged binary payload;
- fixed-value equality per element (reference:
  xmlschema/validators/elements.py:750-769) -> decoded-pixel allclose
  (PSNR>=40dB for lossy) against the expected deterministic pattern.

Wire format (little-endian):
    magic[4]  b"FPNG" | b"FJPG" | b"FWBP"
    w uint32, h uint32
    zlib-compressed RGB uint8 pixel buffer (h*w*3 bytes)

Lossy variants quantize each channel to the NEAREST multiple of Q=4
(top level clamped to 255): max per-pixel error Q/2 = 2 => worst-case
MSE <= 4 => PSNR >= 42.1dB for EVERY image size, deterministically above
the 40dB gate (floor-quantization's error-3 worst case dips to 39.5dB on
1x1 images — found by hypothesis, tests/test_property.py); a "corrupt"
re-encode at wrong dims or heavier quantization falls below the gate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = {"png": b"FPNG", "jpeg": b"FJPG", "webp": b"FWBP"}
FMT_OF_MAGIC = {v: k for k, v in MAGIC.items()}
LOSSY_Q = 4
HEADER = struct.Struct("<4sII")


def gen_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixel pattern for row index i (seed-free, pure)."""
    # uint8 wraparound addition IS mod-256 — no int64 temporaries
    # (this is the hot path of payload pixel-parity validation)
    base = np.uint8((i * 2654435761) % 256)
    ys = ((np.arange(h, dtype=np.int64) * 5) % 256).astype(np.uint8)
    xs = ((np.arange(w, dtype=np.int64) * 3) % 256).astype(np.uint8)
    cs = np.array([0, 17, 34], dtype=np.uint8)
    px = base + ys[:, None, None] + xs[None, :, None] + cs[None, None, :]
    # stamp i into the first 8 bytes so every i yields a distinct buffer
    # (the gradient alone has only 256*65*5 distinct patterns, which would
    # create false phash duplicates in clean fixtures)
    flat = px.reshape(-1)
    stamp = np.frombuffer(int(i % (1 << 64)).to_bytes(8, "little"), dtype=np.uint8)
    n = min(8, flat.size)
    flat[:n] = stamp[:n]
    return px


def encode(pixels: np.ndarray, fmt: str, q: int = LOSSY_Q) -> bytes:
    h, w = pixels.shape[0], pixels.shape[1]
    if fmt != "png":
        # round-to-NEAREST multiple of q, top clamped to 255: max error
        # q/2 (floor-quantization's q-1 worst case breaks the PSNR>=40dB
        # contract on tiny images)
        r = ((pixels.astype(np.int16) + q // 2) // q) * q
        pixels = np.minimum(r, 255).astype(np.uint8)
    return HEADER.pack(MAGIC[fmt], w, h) + zlib.compress(pixels.tobytes(), 1)


def decode(buf: bytes) -> tuple[str, int, int, np.ndarray]:
    """Returns (fmt, w, h, pixels). Raises ValueError on malformed input."""
    if buf is None or len(buf) < HEADER.size:
        raise ValueError("truncated payload")
    magic, w, h = HEADER.unpack_from(buf)
    fmt = FMT_OF_MAGIC.get(magic)
    if fmt is None:
        raise ValueError(f"bad magic {magic!r}")
    raw = zlib.decompress(buf[HEADER.size:])
    if len(raw) != h * w * 3:
        raise ValueError("pixel buffer size mismatch")
    return fmt, w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_header(buf: bytes) -> tuple[str, int, int]:
    """Header-only decode (no decompress) — cheap metadata consistency path."""
    if buf is None or len(buf) < HEADER.size:
        raise ValueError("truncated payload")
    magic, w, h = HEADER.unpack_from(buf)
    fmt = FMT_OF_MAGIC.get(magic)
    if fmt is None:
        raise ValueError(f"bad magic {magic!r}")
    return fmt, w, h


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return 0.0
    d = a.astype(np.int16) - b.astype(np.int16)   # exact in int16
    mse = np.mean(np.square(d, dtype=np.int32))   # exact integer squares
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def stable_hash64(pixels: np.ndarray) -> int:
    """Stable signed-64 content hash of the exact pixel buffer (used as
    the fixture `phash` column: FIXTURES.md F1 'stable 64-bit hash of the
    generated pixel pattern')."""
    return stable_hash64_bytes(pixels.tobytes())


def stable_hash64_bytes(raw: bytes) -> int:
    """stable_hash64 over an already-flat pixel byte buffer (the
    payload validator hashes the decompressed buffer directly — same
    bytes as pixels.tobytes(), no reshape needed)."""
    import hashlib

    d = hashlib.blake2b(raw, digest_size=8).digest()
    v = int.from_bytes(d, "little")
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64(pixels: np.ndarray) -> int:
    """Stable 64-bit perceptual-style hash: 8x8 block-mean > global mean.

    Vectorized via one reshape (the 64 per-block np.mean calls of the
    loop formulation cost ~100us/row); images smaller than 8px on a side
    fall back to the slice loop (empty tail blocks -> NaN -> 0 bits,
    preserved behavior)."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ph, pw = max(h // 8, 1), max(w // 8, 1)
    if h >= 8 and w >= 8:
        blocks = g[:8 * ph, :8 * pw].reshape(8, ph, 8, pw).mean(axis=(1, 3))
    else:
        blocks = np.empty((8, 8))
        for by in range(8):
            for bx in range(8):
                blocks[by, bx] = g[by * ph:(by + 1) * ph or None,
                                   bx * pw:(bx + 1) * pw or None].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v  # signed int64
