"""Deterministic image+caption payload generation and codecs.

The graft's fetch simulation is a *pure function* of the canonical URL:
``fetch(url) -> (image bytes, w, h, fmt, caption, phash)`` — no external
data, fully seeded (BASELINE.json input_hint; FIXTURES.md §F4).

Because no image libraries ship in this environment, we implement two
real, self-contained codecs with numpy + zlib:

- ``png``: a genuine, spec-conformant minimal PNG (8-bit RGB, filter 0)
  — lossless, decodable by any PNG reader; our decoder handles the
  subset we emit. PSNR is infinite (exact pixel match).
- ``qimg``: a deliberately lossy codec (5-bit/channel quantization +
  zlib) standing in for JPEG; uniform quantization with step 8 yields
  MSE ≈ 8²/12 ≈ 5.33 → PSNR ≈ 40.9 dB ≥ the 40 dB gate, so the per-row
  "decoded-pixel PSNR ≥ 40 dB for lossy formats" invariant is exercised
  for real. A true JPEG stage would slot into the same actor-pool
  decode stage (see stages/images.py).

``phash`` is an 8x8 average-hash over the grayscale image (64-bit int).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# minimal PNG (8-bit RGB, no interlace, filter 0 per scanline)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real PNG."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 1)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode the PNG subset emitted by ``png_encode``."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError("decoder handles 8-bit RGB only")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise NotImplementedError("decoder handles filter 0 only")
    return raw[:, 1:].reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# lossy codec (JPEG stand-in): 5-bit/channel quantization + zlib
# ---------------------------------------------------------------------------

def qimg_encode(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels >> 3).astype(np.uint8)  # 5 bits/channel
    return b"QIMG" + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 1)


def qimg_decode(data: bytes) -> np.ndarray:
    if data[:4] != b"QIMG":
        raise ValueError("not a QIMG")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # reconstruct at bin center: q*8 + 4, clipped (max bin 31 -> 252)
    return (q.astype(np.uint16) * 8 + 4).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "qimg":
        return qimg_decode(data)
    if fmt in ("jpeg", "jpg"):
        # no JPEG lib in this environment; the decode stage is real, the
        # codec is gated (stages/images.py wires the same actor signature)
        raise NotImplementedError("jpeg decode requires an image library")
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_PHASH_BITS = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: grayscale -> 8x8 block means -> bit per cell.
    Block sums via a 2-D integral image (fully vectorized)."""
    gray = pixels.astype(np.float64).sum(axis=2)
    h, w = gray.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=ii[1:, 1:])
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    corners = ii[np.ix_(ys, xs)]
    sums = (corners[1:, 1:] - corners[:-1, 1:] - corners[1:, :-1]
            + corners[:-1, :-1])
    areas = np.outer(np.diff(ys), np.diff(xs))
    cells = sums / areas
    bits = (cells > cells.mean()).ravel()
    v = int(np.sum(_PHASH_BITS[bits], dtype=np.uint64))
    return v - (1 << 64) if v >= 1 << 63 else v  # signed int64 for Arrow


# ---------------------------------------------------------------------------
# deterministic fetch simulation
# ---------------------------------------------------------------------------

_SIZES = [(32, 24), (48, 32), (64, 48), (40, 40), (56, 42), (80, 60)]


def _seed_of(url: str) -> int:
    return int.from_bytes(hashlib.sha1(url.encode("utf8")).digest()[8:16], "big")


def gen_pixels(url: str) -> tuple[np.ndarray, str]:
    """(pixels, fmt) for a URL — a seeded gradient + hash-derived noise,
    fully vectorized integer math (no RNG object), stable forever."""
    seed = _seed_of(url)
    w, h = _SIZES[seed % len(_SIZES)]
    fmt = "png" if (seed >> 3) % 2 == 0 else "qimg"
    yy = np.arange(h, dtype=np.uint32)[:, None, None]
    xx = np.arange(w, dtype=np.uint32)[None, :, None]
    cc = np.arange(3, dtype=np.uint32)[None, None, :]
    base = (xx * np.uint32(1 + seed % 5) + yy * np.uint32(1 + (seed >> 4) % 7))
    # xorshift-style per-pixel noise derived from coordinates + seed
    n = (xx * np.uint32(2654435761) ^ yy * np.uint32(40503)
         ^ cc * np.uint32(69069)) + np.uint32(seed & 0xFFFFFFFF)
    n ^= n >> np.uint32(13)
    pix = ((base + (n & np.uint32(63)) + np.uint32(seed % 256)) % np.uint32(256))
    return pix.astype(np.uint8), fmt


def resolve_alias(url: str) -> str:
    """Synthetic single-hop redirect rule (mirrors SyntheticWeb.resolve):
    '...?r=1' aliases 301 to the bare URL. Pure string surgery so
    validators can re-derive a record's source content from its
    canonical key alone."""
    return url[:-4] if url.endswith("?r=1") else url


def caption_of(url: str) -> str:
    tag = hashlib.sha1(url.encode("utf8")).hexdigest()[:12]
    return f"synthetic caption {tag} for {url}"


def fetch_simulated(url: str) -> dict:
    """Pure deterministic fetch: URL -> one image+caption row
    (schema per BASELINE.json input_hint)."""
    pix, fmt = gen_pixels(url)
    data = png_encode(pix) if fmt == "png" else qimg_encode(pix)
    h, w, _ = pix.shape
    return {
        "image_id": url,
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption_of(url),
        "phash": np.int64(phash64(pix)),
    }


def _gen_pixels_group(seeds: np.ndarray, w: int, h: int) -> np.ndarray:
    """Vectorized pixel generation for a group of same-size images —
    bit-identical to per-URL gen_pixels (same integer formulas applied
    with a leading group axis)."""
    g = len(seeds)
    yy = np.arange(h, dtype=np.uint32)[None, :, None, None]
    xx = np.arange(w, dtype=np.uint32)[None, None, :, None]
    cc = np.arange(3, dtype=np.uint32)[None, None, None, :]
    s5 = (1 + seeds % 5).astype(np.uint32)[:, None, None, None]
    s7 = (1 + (seeds >> 4) % 7).astype(np.uint32)[:, None, None, None]
    s32 = (seeds & 0xFFFFFFFF).astype(np.uint32)[:, None, None, None]
    s256 = (seeds % 256).astype(np.uint32)[:, None, None, None]
    n = (xx * np.uint32(2654435761) ^ yy * np.uint32(40503)
         ^ cc * np.uint32(69069)) + s32
    n ^= n >> np.uint32(13)
    n &= np.uint32(63)
    n += xx * s5 + yy * s7     # base gradient, fused in place
    n += s256
    n %= np.uint32(256)
    return n.astype(np.uint8)


def _phash_group(pix: np.ndarray) -> np.ndarray:
    """Vectorized 8x8 average-hash for a (G, h, w, 3) stack —
    bit-identical to per-image phash64."""
    g, h, w, _ = pix.shape
    gray = pix.astype(np.float64).sum(axis=3)
    ii = np.zeros((g, h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(gray, axis=1), axis=2, out=ii[:, 1:, 1:])
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    corners = ii[:, ys[:, None], xs[None, :]]  # (G, 9, 9)
    sums = (corners[:, 1:, 1:] - corners[:, :-1, 1:]
            - corners[:, 1:, :-1] + corners[:, :-1, :-1])
    areas = np.outer(np.diff(ys), np.diff(xs))[None, :, :]
    cells = sums / areas
    bits = cells.reshape(g, 64) > cells.mean(axis=(1, 2))[:, None]
    vals = (bits * _PHASH_BITS[None, :]).sum(axis=1, dtype=np.uint64)
    return vals.astype(np.int64)  # two's-complement reinterpret == signed


def phash_batch_columns(urls) -> dict:
    """Sketch-only batch fetch: (image_id, phash) without the encode
    step — for perceptual-dedup pre-passes that need only the 64-bit
    sketch. Pixel generation and hashing run vectorized per size-class
    group (same kernels as fetch_batch_columns, so the phash is
    bit-identical to fetch_simulated's) and the zlib/PNG cost is
    skipped entirely."""
    n = len(urls)
    seeds = np.fromiter((_seed_of(u) for u in urls), dtype=np.uint64, count=n)
    size_idx = (seeds % np.uint64(len(_SIZES))).astype(np.int64)
    phashes = np.empty(n, dtype=np.int64)
    for si in np.unique(size_idx):
        idx = np.nonzero(size_idx == si)[0]
        w, h = _SIZES[si]
        phashes[idx] = _phash_group(_gen_pixels_group(seeds[idx], w, h))
    return {"image_id": list(urls), "phash": phashes}


def meta_batch_columns(urls) -> dict:
    """Metadata-only batch fetch: (image_id, w, h, caption) with NO
    pixel generation or encode at all — for curation gates that run
    on typed metadata before any expensive decode touches the row
    (on a real corpus this is the header/EXIF sniff)."""
    n = len(urls)
    seeds = np.fromiter((_seed_of(u) for u in urls), dtype=np.uint64, count=n)
    size_idx = (seeds % np.uint64(len(_SIZES))).astype(np.int64)
    sizes = np.asarray(_SIZES, dtype=np.int32)
    return {"image_id": list(urls),
            "w": sizes[size_idx, 0], "h": sizes[size_idx, 1],
            "caption": [caption_of(u) for u in urls]}


def fetch_batch_columns(urls) -> dict:
    """Columnar batch fetch. Pixel generation and phashing run
    vectorized per size-class group (one numpy dispatch for the whole
    group instead of per URL); encoding stays per image (zlib).
    Output is bit-identical to fetch_simulated per URL."""
    n = len(urls)
    seeds = np.fromiter((_seed_of(u) for u in urls), dtype=np.uint64, count=n)
    size_idx = (seeds % np.uint64(len(_SIZES))).astype(np.int64)
    is_png = ((seeds >> np.uint64(3)) % np.uint64(2)) == 0

    data = [None] * n
    ws = np.empty(n, dtype=np.int32)
    hs = np.empty(n, dtype=np.int32)
    fmts = [None] * n
    phashes = np.empty(n, dtype=np.int64)
    for si in np.unique(size_idx):
        idx = np.nonzero(size_idx == si)[0]
        w, h = _SIZES[si]
        pix = _gen_pixels_group(seeds[idx], w, h)
        phashes[idx] = _phash_group(pix)
        ws[idx], hs[idx] = w, h
        for j, i in enumerate(idx):
            if is_png[i]:
                fmts[i] = "png"
                data[i] = png_encode(pix[j])
            else:
                fmts[i] = "qimg"
                data[i] = qimg_encode(pix[j])
    captions = [caption_of(u) for u in urls]
    return {"image_id": list(urls), "bytes": data, "w": ws, "h": hs,
            "fmt": fmts, "caption": captions, "phash": phashes}


# ---------------------------------------------------------------------------
# deterministic audio / video codecs (qaud / qvid)
#
# The sandbox has no media libraries, so real-world formats (mp3/wav,
# mp4) stay gated behind NotImplementedError — but the AUDIO and VIDEO
# pipeline stages themselves are real: qaud is a 16-bit mono PCM
# container and qvid a frame container of qimg images, both generated
# by the same closed-form integer recurrences as the image corpus so
# every decoded sample/pixel is independently recomputable by a SQL
# twin (the image family's oracle pattern extended to the other two
# modalities).
# ---------------------------------------------------------------------------


def gen_audio_group(seeds: np.ndarray, n: int) -> np.ndarray:
    """Vectorized PCM generation for a group of same-length clips:
    (G, n) int16. Sample t of seed u: x = (t·2654435761 + (u & 2³²−1))
    mod 2³²; x ^= x>>13; s = ((x & 4095) − 2048) · amp with
    amp = 1 + (u>>5) % 4 — the audio twin of _gen_pixels_group."""
    tt = np.arange(n, dtype=np.uint32)[None, :]
    s32 = (seeds & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None]
    amp = (1 + (seeds >> np.uint64(5)) % np.uint64(4)) \
        .astype(np.int32)[:, None]
    x = tt * np.uint32(2654435761) + s32
    x ^= x >> np.uint32(13)
    v = (x & np.uint32(4095)).astype(np.int32) - np.int32(2048)
    return (v * amp).astype(np.int16)


def qaud_encode(samples: np.ndarray) -> bytes:
    return b"QAUD" + struct.pack(">I", len(samples)) \
        + samples.astype("<i2").tobytes()


def qaud_decode(data: bytes) -> np.ndarray:
    if data[:4] != b"QAUD":
        raise ValueError("not a QAUD")
    (n,) = struct.unpack(">I", data[4:8])
    return np.frombuffer(data[8:8 + 2 * n], dtype="<i2").astype(np.int16)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "qaud":
        return qaud_decode(data)
    if fmt in ("mp3", "wav", "flac", "ogg"):
        raise NotImplementedError(
            f"{fmt} decode requires an audio library")
    raise ValueError(f"unknown audio fmt {fmt!r}")


def qvid_encode(frames: list) -> bytes:
    """Frame container: each frame is an independently-decodable qimg
    payload (length-prefixed), so frame sampling can skip without
    decoding — the seek-table property real containers provide."""
    parts = [b"QVID", struct.pack(">I", len(frames))]
    for f in frames:
        enc = qimg_encode(f)
        parts.append(struct.pack(">I", len(enc)))
        parts.append(enc)
    return b"".join(parts)


def qvid_decode(data: bytes, every: int = 1) -> list:
    """Decode every ``every``-th frame (frame sampling at the container
    level: skipped frames are never inflated)."""
    if data[:4] != b"QVID":
        raise ValueError("not a QVID")
    (k,) = struct.unpack(">I", data[4:8])
    off = 8
    out = []
    for f in range(k):
        (ln,) = struct.unpack(">I", data[off:off + 4])
        off += 4
        if f % every == 0:
            out.append(qimg_decode(data[off:off + ln]))
        off += ln
    return out


def decode_video(data: bytes, fmt: str, every: int = 1) -> list:
    if fmt == "qvid":
        return qvid_decode(data, every=every)
    if fmt in ("mp4", "webm", "mkv"):
        raise NotImplementedError(
            f"{fmt} decode requires a video library")
    raise ValueError(f"unknown video fmt {fmt!r}")
