"""Codec invariants the payload validator relies on."""

import numpy as np
import pytest

from xmlschema_spark import fakecodec as fc


def test_roundtrip_lossless():
    px = fc.gen_pixels(7, 33, 21)
    fmt, w, h, out = fc.decode(fc.encode(px, "png"))
    assert (fmt, w, h) == ("png", 33, 21)
    assert (out == px).all()


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_above_gate(fmt):
    px = fc.gen_pixels(3, 48, 48)
    _, _, _, out = fc.decode(fc.encode(px, fmt))
    assert fc.psnr(out, px) >= 40.0


def test_heavy_quantization_below_gate():
    px = fc.gen_pixels(3, 48, 48)
    _, _, _, out = fc.decode(fc.encode(px, "jpeg", q=64))
    assert fc.psnr(out, px) < 40.0


def test_malformed_raises():
    with pytest.raises(ValueError):
        fc.decode(b"nope")
    with pytest.raises(ValueError):
        fc.decode(b"")


def test_pixels_distinct_per_index():
    a = fc.gen_pixels(1, 16, 16)
    b = fc.gen_pixels(1 + 256 * 65, 16, 16)  # same gradient params, diff i
    assert not (a == b).all()
    assert fc.stable_hash64(a) != fc.stable_hash64(b)


def test_stable_hash_deterministic():
    px = fc.gen_pixels(99, 20, 20)
    assert fc.stable_hash64(px) == fc.stable_hash64(px.copy())
    lo, hi = -(1 << 63), (1 << 63) - 1
    assert lo <= fc.stable_hash64(px) <= hi


def test_phash64_in_int64_range():
    px = fc.gen_pixels(5, 40, 40)
    v = fc.phash64(px)
    assert -(1 << 63) <= v <= (1 << 63) - 1
