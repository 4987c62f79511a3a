"""Image+caption payload codecs: per-row invariants from BASELINE.json —
decoded-pixel allclose (PSNR >= 40 dB for lossy), caption equality,
determinism."""

import numpy as np
import pytest

from frontera_ray.payload import (
    caption_of,
    decode_image,
    fetch_simulated,
    gen_pixels,
    phash64,
    png_decode,
    png_encode,
    psnr,
    qimg_decode,
    qimg_encode,
)


def test_png_lossless_roundtrip():
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    data = png_encode(pix)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = png_decode(data)
    assert np.array_equal(out, pix)
    assert psnr(pix, out) == float("inf")


def test_qimg_lossy_psnr_gate():
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    out = qimg_decode(qimg_encode(pix))
    p = psnr(pix, out)
    assert 40.0 <= p < 50.0  # 5-bit quantization: ~40.9 dB


def test_jpeg_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_fetch_deterministic():
    url = "http://host-00001.test/123"
    a, b = fetch_simulated(url), fetch_simulated(url)
    assert a["bytes"] == b["bytes"]
    assert a["caption"] == b["caption"] == caption_of(url)
    assert a["phash"] == b["phash"]
    pix, fmt = gen_pixels(url)
    assert a["fmt"] == fmt
    decoded = decode_image(a["bytes"], fmt)
    assert decoded.shape == (a["h"], a["w"], 3)
    if fmt == "png":
        assert np.array_equal(decoded, pix)
    else:
        assert psnr(pix, decoded) >= 40.0
    assert a["phash"] == phash64(pix)


def test_phash_similarity():
    pix, _ = gen_pixels("http://host-00002.test/1")
    noisy = pix.copy()
    noisy[0, 0] = 255 - noisy[0, 0]
    # near-identical images have near-identical phash
    d = bin(phash64(pix) ^ phash64(noisy)).count("1")
    assert d <= 4
