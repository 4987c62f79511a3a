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


def test_qaud_codec_roundtrip_and_stage():
    """qaud PCM round-trips bit-exactly; AudioFeatureStage extracts
    real features for qaud and flags (not kills) gated formats."""
    import numpy as np
    import pyarrow as pa

    from frontera_ray.payload import gen_audio_group, qaud_decode, qaud_encode
    from frontera_ray.stages.images import AudioFeatureStage

    seeds = np.array([42, 7, 123456789], dtype=np.uint64)
    pcm = gen_audio_group(seeds, 1600)
    for row in pcm:
        assert (qaud_decode(qaud_encode(row)) == row).all()

    batch = pa.table({
        "audio_id": pa.array(["a0", "a1", "bad"], pa.string()),
        "bytes": pa.array([qaud_encode(pcm[0]), qaud_encode(pcm[1]),
                           b"ID3\x04junk"], pa.binary()),
        "fmt": pa.array(["qaud", "qaud", "mp3"], pa.string()),
    })
    out = AudioFeatureStage()(batch).to_pandas()
    assert list(out["decode_ok"]) == [True, True, False]
    s0 = pcm[0].astype(np.int64)
    assert int(out.loc[0, "sum_sq"]) == int((s0 * s0).sum())
    assert int(out.loc[0, "zero_cross"]) == int((s0[:-1] * s0[1:] < 0).sum())


def test_qvid_container_and_frame_sampler():
    """qvid frames round-trip through qimg exactly; the sampler decodes
    every k-th frame only and emits per-frame luma rows; gated
    containers are skipped (or raise when strict)."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from frontera_ray.payload import (_gen_pixels_group, qimg_decode,
                                      qimg_encode, qvid_decode, qvid_encode)
    from frontera_ray.stages.images import VideoFrameSampleStage

    seeds = np.arange(5, dtype=np.uint64) + 99
    frames = [f for f in _gen_pixels_group(seeds, 16, 12)]
    data = qvid_encode(frames)
    dec = qvid_decode(data)
    assert len(dec) == 5
    for f, g in zip(frames, dec):
        assert (g == qimg_decode(qimg_encode(f))).all()
    assert len(qvid_decode(data, every=2)) == 3  # frames 0, 2, 4

    batch = pa.table({
        "video_id": pa.array(["v0", "gated"], pa.string()),
        "bytes": pa.array([data, b"\x00\x00\x00 ftypmp4"], pa.binary()),
        "fmt": pa.array(["qvid", "mp4"], pa.string()),
    })
    out = VideoFrameSampleStage(every=2)(batch).to_pandas()
    assert list(out["video_id"]) == ["v0"] * 3
    assert list(out["frame_idx"]) == [0, 2, 4]
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(every=2, strict=True)(batch)
