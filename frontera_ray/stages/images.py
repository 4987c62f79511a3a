"""Multimodal (image/audio/video) stages over binary payload columns.

The pages sink schema (BASELINE.json input_hint) carries images as
opaque ``bytes`` with typed metadata (w, h, fmt, phash). These stages
are actor-pool ``map_batches`` classes: codec/model state initialized
once per actor in ``__init__``, vectorized work per ``__call__``.

Real here: PNG + QIMG image decode, nearest-neighbor resize, phash
recompute, PSNR validation; QAUD PCM audio feature extraction; QVID
container frame sampling (per-frame qimg payloads, container-level
seek). Gated (environment has no media libraries): JPEG decode,
mp3/wav audio, mp4/webm video — each raises NotImplementedError
behind a format check while keeping the Ray-side plumbing (schema,
batch size, actor signature, output layout) identical to the real
path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..payload import decode_image, phash64, psnr, gen_pixels


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


class DecodeStatsStage:
    """Decode each image and emit features: mean brightness, recomputed
    phash, decode_ok flag. Unsupported formats are flagged, not fatal."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ok, bright, ph = [], [], [], []
        for row in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            ids.append(row["image_id"])
            try:
                pix = decode_image(row["bytes"], row["fmt"])
                ok.append(True)
                bright.append(round(float(pix.mean()), 4))
                ph.append(phash64(pix))
            except (NotImplementedError, ValueError):
                # gated codec or corrupt payload: flag, don't kill the run
                if self.strict:
                    raise
                ok.append(False)
                bright.append(0.0)
                ph.append(0)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "decode_ok": pa.array(ok, pa.bool_()),
                "brightness": pa.array(bright, pa.float64()),
                "phash2": pa.array(ph, pa.int64()),
            }
        )


class ResizeStage:
    """Decode -> nearest-neighbor resize -> re-encode (PNG). The
    thumbnailing stage of a training-data pipeline."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        from ..payload import png_encode

        self.out_w, self.out_h = out_w, out_h
        self._encode = png_encode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs = [], []
        for row in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            try:
                pix = decode_image(row["bytes"], row["fmt"])
            except NotImplementedError:
                continue
            thumb = resize_nearest(pix, self.out_w, self.out_h)
            ids.append(row["image_id"])
            thumbs.append(self._encode(thumb))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "thumb": pa.array(thumbs, pa.binary()),
                "w": pa.array([self.out_w] * len(ids), pa.int32()),
                "h": pa.array([self.out_h] * len(ids), pa.int32()),
            }
        )


class ValidateStage:
    """Per-row invariant check vs the deterministic generator: decoded
    pixels allclose (PSNR >= 40 dB for lossy fmt) + caption equality
    (BASELINE.json per-row invariant)."""

    def __init__(self, min_psnr: float = 40.0):
        self.min_psnr = min_psnr

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..payload import caption_of, resolve_alias

        ids, pix_ok, cap_ok, psnrs = [], [], [], []
        for row in batch.to_pylist():
            url = row["image_id"]
            src = resolve_alias(url)  # redirect records carry target content
            ids.append(url)
            try:
                got = decode_image(row["bytes"], row["fmt"])
                ref, _ = gen_pixels(src)
                p = psnr(ref, got)
                psnrs.append(round(p, 2) if np.isfinite(p) else 999.0)
                pix_ok.append(p >= self.min_psnr)
            except NotImplementedError:
                psnrs.append(-1.0)
                pix_ok.append(False)
            cap_ok.append(row["caption"] == caption_of(src))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "pixels_ok": pa.array(pix_ok, pa.bool_()),
                "caption_ok": pa.array(cap_ok, pa.bool_()),
                "psnr": pa.array(psnrs, pa.float64()),
            }
        )


class ImageFeatureStage:
    """Decode → 8×8 grayscale grid embedding (64 float dims, unit
    scale) — the visual-feature-extraction stage that bridges the
    image family into the embedding family: its output feeds the
    cosine near-dup / ANN machinery unchanged (`vec_id` = image_id64,
    `embedding` = list<float>[64]). A deterministic stand-in for a
    real vision encoder (same Ray plumbing: codec state per actor in
    ``__init__``, batched inference in ``__call__``); swap the
    pooling body for a model forward on a GPU cluster."""

    def __init__(self, grid: int = 8):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, vecs = [], []
        g = self.grid
        for row in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            try:
                pix = decode_image(row["bytes"], row["fmt"])
            except (NotImplementedError, ValueError):
                continue
            gray = pix.astype(np.float32).mean(axis=2)
            small = resize_nearest(gray[:, :, None].repeat(3, axis=2),
                                   g, g)[:, :, 0].astype(np.float32)
            ids.append(row["image_id"])
            vecs.append((small / 255.0).ravel())
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "vec_id": pa.array(image_id64(ids), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })


class AudioFeatureStage:
    """Audio feature extraction over opaque binary payload columns
    (audio_id, bytes, fmt) — REAL for the deterministic qaud PCM
    container (decode → Σs², peak, zero crossings: the loudness /
    silence / voiced-unvoiced screens); real-world formats (mp3/wav/
    flac/ogg) stay gated behind NotImplementedError (no audio library
    in this environment) with the same actor signature, exactly like
    the jpeg gate on the image path."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..payload import decode_audio

        ids, ok, n, ssq, peak, zc = [], [], [], [], [], []
        for row in batch.select(["audio_id", "bytes", "fmt"]).to_pylist():
            ids.append(row["audio_id"])
            try:
                s = decode_audio(row["bytes"], row["fmt"]) \
                    .astype(np.int64)
                ok.append(True)
                n.append(len(s))
                ssq.append(int((s * s).sum()))
                peak.append(int(np.abs(s).max()) if len(s) else 0)
                zc.append(int((s[:-1] * s[1:] < 0).sum()))
            except (NotImplementedError, ValueError):
                if self.strict:
                    raise
                ok.append(False)
                n.append(0); ssq.append(0); peak.append(0); zc.append(0)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "decode_ok": pa.array(ok, pa.bool_()),
            "n_samples": pa.array(n, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "zero_cross": pa.array(zc, pa.int64()),
        })


class VideoFrameSampleStage:
    """Video frame sampling over opaque binary payload columns
    (video_id, bytes, fmt) — REAL for the deterministic qvid frame
    container (length-prefixed per-frame qimg payloads: the sampler
    decodes every k-th frame WITHOUT inflating the skipped ones — the
    container-level seek real pipelines rely on) and emits one row
    per sampled frame (video_id, frame_idx, w, h, luma_sum);
    real-world containers (mp4/webm/mkv) stay gated behind
    NotImplementedError with the same actor signature."""

    def __init__(self, every: int = 2, strict: bool = False):
        self.every = every
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..payload import decode_video

        ids, fi, ws, hs, luma = [], [], [], [], []
        wgt = np.asarray([299, 587, 114], dtype=np.int64)
        for row in batch.select(["video_id", "bytes", "fmt"]).to_pylist():
            try:
                frames = decode_video(row["bytes"], row["fmt"],
                                      every=self.every)
            except (NotImplementedError, ValueError):
                if self.strict:
                    raise
                continue
            for j, f in enumerate(frames):
                ids.append(row["video_id"])
                fi.append(j * self.every)
                hs.append(f.shape[0])
                ws.append(f.shape[1])
                luma.append(int((f.astype(np.int64) * wgt).sum()))
        return pa.table({
            "video_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(fi, pa.int64()),
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "luma_sum_milli": pa.array(luma, pa.int64()),
        })


def image_id64(urls) -> np.ndarray:
    """Stable int64 pair-id per image_id string (sha1 top 8 bytes,
    two's-complement reinterpret). Distinct per URL, so exact-duplicate
    pixels under different URLs still pair at hamming 0 — unlike the
    content seed, which would collapse them to one sketch row."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.sha1(u.encode("utf8")).digest()[:8], "big")
         for u in urls),
        dtype=np.uint64, count=len(urls)).view(np.int64)


def phash_sketch(batch: pa.Table) -> pa.Table:
    """(url) -> (doc_id, simhash) sketch rows for the shared 64-bit
    Hamming exchange: sketch-only fetch (no encode), doc_id =
    image_id64 of the URL string."""
    from ..payload import phash_batch_columns

    urls = batch["url"].to_pylist()
    cols = phash_batch_columns(urls)
    return pa.table({
        "doc_id": pa.array(image_id64(urls), pa.int64()),
        "simhash": pa.array(cols["phash"], pa.int64()),
    })


def _resolve_pair_ids(urls_ds, pair_ids: np.ndarray,
                      col: str = "url") -> dict:
    """Map a (small, sorted) int64 pair-id set back to image_id strings
    by broadcasting the set and filtering the streaming corpus — pair
    ids << corpus, so nothing corpus-sized lands on the driver."""
    import ray

    ids_ref = ray.put(pair_ids)

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)  # zero-copy local object-store read
        urls = batch[col].to_pylist()
        ids = image_id64(urls)
        pos = np.searchsorted(wanted, ids)
        pos[pos == len(wanted)] = 0
        m = wanted[pos] == ids
        return pa.table({
            "id": pa.array(ids[m], pa.int64()),
            "image_id": pa.array(np.asarray(urls, dtype=object)[m],
                                 pa.string()),
        })

    mapping = urls_ds.map_batches(pick, batch_format="pyarrow").take_all()
    return {r["id"]: r["image_id"] for r in mapping}


def phash_neardup_pairs(urls_ds, max_hamming: int = 2,
                        blocks: int | None = None,
                        exchange: str | None = None) -> pa.Table:
    """Distributed perceptual near-dup over an image corpus (the
    image-side twin of simhash_neardup_pairs): a sketch-only fetch
    (pixels -> 64-bit average-hash, no encode) feeds the shared
    bit-block-LSH + vectorized Hamming-verify exchange
    (dedup.hamming64_neardup_pairs — exact recall for
    blocks >= max_hamming+1). The int64 pair ids then resolve back to
    image_id strings by broadcasting the (tiny) pair-id set and
    filtering the streaming corpus — pair ids << corpus, so nothing
    corpus-sized ever lands on the driver.

    ``urls_ds`` is a Dataset with a ``url`` column; its lineage is
    re-executed for the (cheap, sketch-free) id-resolution pass."""
    from .dedup import hamming64_neardup_pairs

    pairs = hamming64_neardup_pairs(
        urls_ds.map_batches(phash_sketch, batch_format="pyarrow"),
        max_hamming=max_hamming, blocks=blocks, exchange=exchange)
    if len(pairs) == 0:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "hamming": pa.array([], pa.int32())})

    id2url = _resolve_pair_ids(urls_ds, np.unique(np.concatenate(
        [pairs["a"].to_numpy(), pairs["b"].to_numpy()])))
    recs = sorted(
        (min(ua, ub), max(ua, ub), h)
        for ua, ub, h in zip(
            (id2url[x] for x in pairs["a"].to_pylist()),
            (id2url[x] for x in pairs["b"].to_pylist()),
            pairs["hamming"].to_pylist()))
    return pa.table({
        "a": pa.array([r[0] for r in recs], pa.string()),
        "b": pa.array([r[1] for r in recs], pa.string()),
        "hamming": pa.array([r[2] for r in recs], pa.int32()),
    })


def image_keeper_table(urls_ds, max_hamming: int = 2,
                       blocks: int | None = None,
                       exchange: str | None = None):
    """End-to-end image dedup keep-list (the image twin of
    dedup.keeper_table): distributed phash near-dup pairs ->
    pair-scoped union-find (component keeper = smallest pair id) ->
    broadcast keeper map -> streaming (image_id, keeper_image_id) over
    the corpus. Images absent from the pair stream keep themselves by
    definition; only the result-sized pair set ever lands on the
    driver, and the output is itself a Dataset (write it partitioned
    at scale)."""
    import ray

    from .dedup import dedup_keepers_np, hamming64_neardup_pairs

    pairs = hamming64_neardup_pairs(
        urls_ds.map_batches(phash_sketch, batch_format="pyarrow"),
        max_hamming=max_hamming, blocks=blocks, exchange=exchange)
    keepers = dedup_keepers_np(pairs["a"].to_numpy(),
                               pairs["b"].to_numpy())
    keys = np.fromiter(sorted(keepers), dtype=np.int64, count=len(keepers))
    id2url = _resolve_pair_ids(urls_ds, keys) if len(keys) else {}
    keeper_urls = np.asarray(
        [id2url[keepers[int(k)]] for k in keys], dtype=object)
    map_ref = ray.put((keys, keeper_urls))
    cache: dict = {}

    def assign(batch: pa.Table) -> pa.Table:
        if "m" not in cache:
            cache["m"] = ray.get(map_ref)
        keys_, kurls_ = cache["m"]
        urls = np.asarray(batch["url"].to_pylist(), dtype=object)
        keeper = urls.copy()
        if len(keys_):
            ids = image_id64(urls)
            pos = np.searchsorted(keys_, ids)
            pos_c = np.minimum(pos, len(keys_) - 1)
            hit = keys_[pos_c] == ids
            keeper[hit] = kurls_[pos_c[hit]]
        return pa.table({
            "image_id": pa.array(urls, pa.string()),
            "keeper_image_id": pa.array(keeper, pa.string()),
        })

    return urls_ds.map_batches(assign, batch_format="pyarrow")


def sink_keeper_table(pages_ds, max_hamming: int = 2,
                      blocks: int | None = None,
                      exchange: str | None = None,
                      keeper: str = "min_id"):
    """Keep-list over an already-sketched image corpus — the crawl
    sink's (image_id, phash) columns ARE the sketch (the input_hint's
    phash column put to its stated purpose).

    Exact-duplicate collapse FIRST: Hamming distance is a pure function
    of the sketch VALUE, so images sharing a phash are interchangeable
    for near-dup search — one native groupby-min shrinks the corpus to
    its DISTINCT sketch values (each with its min-image_id64
    representative) before the 64-bit Hamming LSH exchange. Without
    this, c-sized exact groups explode into c^2 verify pairs (a real
    583k-image crawl measured 1e8 pairs -> OOM); with it the pair
    stream is representative-level and the whole clique contributes
    c-1 implicit star edges that never materialize anywhere.

    Keeper assignment is then a sketch-value lookup: distinct-sketch ->
    keeper-url map built driver-side (BOUNDED by the distinct-sketch
    count — the documented broadcast assumption; swap the broadcast for
    an equi-join on phash if a corpus ever has too many distinct
    sketches to broadcast) and broadcast once; each batch resolves
    keeper by searchsorted on its phash column. Output: streaming
    (image_id, keeper_image_id, keep) Dataset. Representative of an
    exact-sketch group = its min-image_id member (carried by the
    aggregate, so keeper URLs resolve driver-side with NO extra corpus
    pass); keeper of a component = the representative whose pair id is
    the component minimum.

    ``keeper`` picks the keep rule: ``'min_id'`` (smallest image_id —
    deterministic and cheapest) or ``'best_area'`` (largest w*h pixel
    area, tiebreak smallest image_id — the training-data practice of
    keeping the highest-resolution copy of a near-dup image cluster;
    reads two extra int32 columns, same passes)."""
    import ray

    from .dedup import dedup_keepers_np, hamming64_neardup_pairs

    if keeper not in ("min_id", "best_area"):
        raise ValueError(f"keeper must be 'min_id' or 'best_area', "
                         f"got {keeper!r}")
    best = keeper == "best_area"
    cols = ["image_id", "phash"] + (["w", "h"] if best else [])
    # pin the slim sketch projection once: the aggregate pass and the
    # assign pass would otherwise each re-execute the (many-fragment)
    # read lineage. At corpus scale this is the 2-4 column table, not
    # the pages.
    src = pages_ds.select_columns(cols).materialize()

    # distinct sketch values, representative = the group's BEST member
    # under the keep rule (min url, or max area tie min url). Per-block
    # partial + a driver combine over the (distinct-bounded) partials —
    # a combiner, not a sort shuffle (measured 3.2 s -> sub-second at
    # 557k rows / 68k distinct); the rep's pair id is then derivable
    # driver-side, so NO corpus pass is spent resolving keeper ids
    # back to URLs.
    def _phash_rep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"phash": pa.array([], pa.int64()),
                             "rep_url": pa.array([], pa.string()),
                             "rep_area": pa.array([], pa.int64())})
        ph = batch["phash"].to_numpy().astype(np.int64)
        urls = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        if best:
            area = (batch["w"].to_numpy().astype(np.int64)
                    * batch["h"].to_numpy().astype(np.int64))
            order = np.lexsort((urls, -area, ph))
            area = area[order]
        else:
            order = np.lexsort((urls, ph))
            area = np.zeros(len(ph), np.int64)
        ph, urls = ph[order], urls[order]
        first = np.concatenate(([True], ph[1:] != ph[:-1]))
        return pa.table({"phash": pa.array(ph[first], pa.int64()),
                         "rep_url": pa.array(urls[first], pa.string()),
                         "rep_area": pa.array(area[first], pa.int64())})

    partials = pa.concat_tables(list(
        src.map_batches(_phash_rep, batch_format="pyarrow",
                        batch_size=None)
           .iter_batches(batch_format="pyarrow", batch_size=None)))
    distinct = _phash_rep(pa.table({
        "phash": partials["phash"],
        "image_id": partials["rep_url"],
        "w": partials["rep_area"],
        "h": pa.array(np.ones(len(partials), np.int64), pa.int64())}))
    sketches = distinct["phash"].to_numpy().astype(np.int64)
    rep_urls = np.asarray(distinct["rep_url"].to_pylist(), dtype=object)
    rep_areas = distinct["rep_area"].to_numpy().astype(np.int64)
    rep_ids = image_id64(rep_urls)

    # near-dup pairs between REPRESENTATIVES only
    reps_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rep_ids, pa.int64()),
        "simhash": pa.array(sketches, pa.int64())}))
    pairs = hamming64_neardup_pairs(reps_ds, max_hamming=max_hamming,
                                    blocks=blocks, exchange=exchange)
    keepers = dedup_keepers_np(pairs["a"].to_numpy(),
                               pairs["b"].to_numpy())

    # sketch-value -> keeper-url map (distinct-sized, broadcast once)
    url_of_rep = {int(i): u for i, u in zip(rep_ids, rep_urls)}
    labels = np.asarray(
        [keepers.get(int(r), int(r)) for r in rep_ids], dtype=np.int64)
    if best:
        # component keeper = the rep with the LARGEST area (tie: min
        # url) among the component's reps — vectorized first-of-run
        # over (component label, -area, url)
        lorder = np.lexsort((rep_urls, -rep_areas, labels))
        ll = labels[lorder]
        lfirst = np.concatenate(([True], ll[1:] != ll[:-1]))
        comp_label = ll[lfirst]
        comp_url = rep_urls[lorder][lfirst]
        keeper_url_of_rep = comp_url[
            np.searchsorted(comp_label, labels)]
    else:
        # keeper of a component = the rep whose id64 is the comp min
        keeper_url_of_rep = np.asarray(
            [url_of_rep[int(k)] for k in labels], dtype=object)
    order = np.argsort(sketches)
    sk_sorted = sketches[order]
    keeper_urls = keeper_url_of_rep[order]
    map_ref = ray.put((sk_sorted, keeper_urls))
    cache: dict = {}

    def assign(batch: pa.Table) -> pa.Table:
        if "m" not in cache:
            cache["m"] = ray.get(map_ref)
        sk_, kurls_ = cache["m"]
        urls = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        ph = batch["phash"].to_numpy().astype(np.int64)
        pos = np.searchsorted(sk_, ph)  # every phash is in the map
        keeper = kurls_[np.minimum(pos, len(sk_) - 1)]
        return pa.table({
            "image_id": pa.array(urls, pa.string()),
            "keeper_image_id": pa.array(keeper, pa.string()),
            "keep": pa.array(keeper == urls, pa.bool_()),
        })

    return src.map_batches(assign, batch_format="pyarrow")


ASPECT_BUCKETS_PPM = (500_000, 750_000, 1_000_000, 1_333_333, 2_000_000)


def aspect_bucket_table(batch: pa.Table,
                        buckets_ppm=ASPECT_BUCKETS_PPM) -> pa.Table:
    """Aspect-ratio bucketing for batched multimodal training: each
    image snaps to the nearest canonical aspect bucket (nearest in
    log-aspect space — the symmetric measure; ties to the smaller
    bucket), and carries its padding-waste estimate = the fraction of
    a bucket-shaped canvas the image would leave unused if fitted
    (1 - min(a,b)/max(a,b), integer ppm). Metadata-only per-block
    transform over (w, h) — NO decode; the standard pre-batching step
    (NovelAI/SDXL-style bucketing, public technique) so a batch never
    mixes aspects. Emits (image_id, w, h, bucket_ppm, waste_ppm)."""
    w = batch["w"].to_numpy().astype(np.float64)
    h = batch["h"].to_numpy().astype(np.float64)
    a = w / h
    b = np.asarray(buckets_ppm, np.float64) / 1e6
    dist = np.abs(np.log(a)[:, None] - np.log(b)[None, :])
    idx = np.argmin(dist, axis=1)  # first min = smaller bucket on ties
    chosen = b[idx]
    ratio = np.minimum(a, chosen) / np.maximum(a, chosen)
    waste = np.round((1.0 - ratio) * 1e6).astype(np.int64)
    return pa.table({
        "image_id": batch["image_id"],
        "w": batch["w"], "h": batch["h"],
        "bucket_ppm": pa.array(
            np.asarray(buckets_ppm, np.int64)[idx], pa.int64()),
        "waste_ppm": pa.array(waste, pa.int64())})


def curate_image_captions(urls_ds, min_side: int = 32,
                          max_aspect: float = 4.0,
                          min_caption_tokens: int = 4,
                          max_hamming: int = 2,
                          blocks: int | None = None,
                          exchange: str | None = None,
                          pool: tuple[int, int] = (2, 4),
                          decode_batch: int = 256):
    """End-to-end multimodal curation composite over an image+caption
    corpus (the input_hint's row shape driven through a full keep/drop
    decision) — the image twin of the text `curate` pipeline:

    1. DUP map: distributed phash near-dup pairs -> pair-scoped
       union-find -> broadcast (loser -> keeper) lookup (tiny; only
       pair ids touch the driver).
    2. CHEAP gates, one metadata-only pass (no pixel decode): caption
       token count, min image side, aspect ratio, dup-loser — each row
       fails fast with its FIRST failing reason.
    3. EXPENSIVE gate, survivors only: the actor-pool decode/stats
       stage (codec state per actor) confirms the payload decodes.
       The decode pool never sees rows the cheap gates dropped — the
       ordering every 100-TB curation pipeline needs.

    Failure rows and survivor rows are separate streaming datasets
    union'ed at the end; output is (image_id, keep, reason) with
    reason in {'ok','caption','dims','dup','decode'}."""
    import pyarrow.compute as pc
    import ray

    from ..payload import meta_batch_columns
    from .dedup import dedup_keepers_np, hamming64_neardup_pairs

    pairs = hamming64_neardup_pairs(
        urls_ds.map_batches(phash_sketch, batch_format="pyarrow"),
        max_hamming=max_hamming, blocks=blocks, exchange=exchange)
    keepers = dedup_keepers_np(pairs["a"].to_numpy(),
                               pairs["b"].to_numpy())
    losers = np.fromiter(
        sorted(k for k, v in keepers.items() if v != k),
        dtype=np.int64)
    losers_ref = ray.put(losers)
    cache: dict = {}

    def gate(batch: pa.Table) -> pa.Table:
        if "l" not in cache:
            cache["l"] = ray.get(losers_ref)
        losers_ = cache["l"]
        urls = batch["url"].to_pylist()
        cols = meta_batch_columns(urls)
        w = cols["w"].astype(np.float64)
        h = cols["h"].astype(np.float64)
        cap = pa.array(cols["caption"], pa.string())
        n_tok = pc.list_value_length(
            pc.utf8_split_whitespace(cap)).to_numpy()
        cap_bad = n_tok < min_caption_tokens
        side = np.minimum(w, h)
        aspect = np.maximum(w, h) / np.maximum(side, 1.0)
        dims_bad = (side < min_side) | (aspect > max_aspect)
        ids = image_id64(np.asarray(urls, dtype=object))
        dup_bad = np.isin(ids, losers_, assume_unique=False)
        reason = np.where(cap_bad, "caption",
                          np.where(dims_bad, "dims",
                                   np.where(dup_bad, "dup", "")))
        return pa.table({
            "image_id": pa.array(urls, pa.string()),
            "reason": pa.array(reason.astype(object), pa.string()),
        })

    gated = urls_ds.map_batches(gate, batch_format="pyarrow")
    failed = gated.filter(
        expr="reason != ''") \
        .map_batches(lambda b: pa.table({
            "image_id": b["image_id"],
            "keep": pa.array(np.zeros(len(b), bool), pa.bool_()),
            "reason": b["reason"]}), batch_format="pyarrow")

    survivors = gated.filter(expr="reason == ''") \
        .map_batches(lambda b: pa.table({"url": b["image_id"]}),
                     batch_format="pyarrow")

    class DecodeGate(DecodeStatsStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..payload import fetch_batch_columns

            cols = fetch_batch_columns(batch["url"].to_pylist())
            stats = super().__call__(pa.table({
                "image_id": pa.array(cols["image_id"], pa.string()),
                "bytes": pa.array(cols["bytes"], pa.binary()),
                "fmt": pa.array(cols["fmt"], pa.string())}))
            ok = stats["decode_ok"].to_numpy(zero_copy_only=False)
            return pa.table({
                "image_id": stats["image_id"],
                "keep": stats["decode_ok"],
                "reason": pa.array(np.where(ok, "ok", "decode")
                                   .astype(object), pa.string()),
            })

    decoded = survivors.map_batches(DecodeGate, batch_format="pyarrow",
                                    batch_size=decode_batch,
                                    concurrency=pool)
    return failed.union(decoded)


# ---------------------------------------------------------------------------
# md5-derived deterministic image corpus (SQL-twin-expressible)
#
# The graft's input_hint table (image_id, bytes, w, h, fmt, caption,
# phash) is synthesized at small scale from the documents parquet via
# md5 arithmetic that DuckDB can reproduce expression-for-expression
# (('0x'||substr(md5(s),1,16))::UBIGINT == int(md5(s).hexdigest()[:16],
# 16)). That turns the multimodal family — metadata sniff, perceptual
# near-dup, and the real PNG/QIMG encode->decode round trip — into
# EXACTLY SQL-oracled operators instead of rows-only ones: the DuckDB
# twin re-derives sizes, planted phashes and even per-pixel values from
# closed-form integer expressions while the Ray side runs the genuine
# codec path over generated pixels.
# ---------------------------------------------------------------------------

def md5_u64(strings) -> np.ndarray:
    """Top 64 bits of md5 per string (uint64) — DuckDB-exact:
    ('0x'||substr(md5(s),1,16))::UBIGINT."""
    import hashlib

    _md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(_md5(s.encode("utf8")).digest()[:8], "big")
         for s in strings),
        dtype=np.uint64, count=len(strings))


# same size table as payload._SIZES; (w, h) per size class u % 6
_SYNTH_W = np.asarray([32, 48, 64, 40, 56, 80], dtype=np.int64)
_SYNTH_H = np.asarray([24, 32, 48, 40, 42, 60], dtype=np.int64)

# planted near-dup bit flips per group member doc_id % 4:
# member 0 keeps the group hash, 1 and 2 flip the SAME bit (hamming-0
# pair), 3 flips a different one — within a 4-member group the pair
# hammings are {0, 1, 2}, across groups md5 uniformity puts pairs at
# ~32 bits, so hamming <= 2 recovers exactly the planted clusters.
_SYNTH_FLIPS = np.asarray([0, 1 << 5, 1 << 5, 1 << 19], dtype=np.uint64)


def synth_image_seed(batch: pa.Table) -> np.ndarray:
    """Per-doc image seed u = md5_64('img:' || doc_id) (uint64)."""
    ids = batch["doc_id"].to_numpy()
    return md5_u64([f"img:{i}" for i in ids])


def synth_image_meta(batch: pa.Table) -> pa.Table:
    """Metadata sniff over the derived corpus: (doc_id, w, h, fmt) —
    the header-read that runs before any decode touches a row."""
    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    fmt = np.where((u >> np.uint64(3)) % np.uint64(2) == 0, "png", "qimg")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "w": pa.array(_SYNTH_W[six], pa.int64()),
        "h": pa.array(_SYNTH_H[six], pa.int64()),
        "fmt": pa.array(fmt.astype(object), pa.string()),
    })


def synth_phash_table(batch: pa.Table) -> pa.Table:
    """Derived perceptual-hash sketch rows (doc_id, simhash) with
    planted near-dup clusters: group hash md5_64('ph:' || doc_id // 4)
    xor the member flip — column contract of
    dedup.hamming64_neardup_pairs."""
    ids = batch["doc_id"].to_numpy()
    base = md5_u64([f"ph:{i // 4}" for i in ids])
    ph = base ^ _SYNTH_FLIPS[ids % 4]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array(ph.view(np.int64), pa.int64()),
    })


def decode_parity_table(batch: pa.Table) -> pa.Table:
    """The REAL codec round trip, per image: derived seed -> vectorized
    pixel generation (payload._gen_pixels_group) -> genuine PNG or QIMG
    encode -> genuine decode -> decoded-pixel channel sum. The SQL twin
    recomputes the same sum from the closed-form per-pixel integer
    expression (xorshift noise + gradient, fmt-aware dequantization for
    the lossy codec), so a single mismatched pixel anywhere in the
    encoder or decoder fails the oracle — the per-row decoded-pixel
    exactness invariant from BASELINE.json input_hint, hash-checked by
    an independent engine."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    sums = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            sums[i] = int(out.sum(dtype=np.int64))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "w": pa.array(_SYNTH_W[six], pa.int64()),
        "h": pa.array(_SYNTH_H[six], pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "px_sum": pa.array(sums, pa.int64()),
    })


def phash_bit_balance_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial of the sketch bit-balance census: 64 rows of
    (bit, ones, n) — the LSH-quality diagnostic (a biased sketch bit
    skews every band bucket it participates in). Combine with a sum
    rollup; 64 keys never shuffle wide."""
    ph = synth_phash_table(batch)["simhash"].to_numpy().view(np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    ones = ((ph[:, None] >> bits[None, :]) & np.uint64(1)) \
        .sum(axis=0, dtype=np.int64)
    return pa.table({
        "bit": pa.array(bits.astype(np.int64), pa.int64()),
        "ones": pa.array(ones, pa.int64()),
        "n": pa.array(np.full(64, len(ph), dtype=np.int64), pa.int64()),
    })


def thumb_parity_table(batch: pa.Table, out_w: int = 16,
                       out_h: int = 12) -> pa.Table:
    """Thumbnail parity through the FULL image path: seeded pixel gen
    -> genuine encode -> genuine decode -> nearest-neighbor resize ->
    decoded-thumb channel sum. Nearest-neighbor sampling is exact
    integer index math (src_y = (ty*h)//out_h, src_x = (tx*w)//out_w),
    so the DuckDB twin recomputes each SAMPLED pixel from the
    closed-form generator expression (fmt-aware dequantization for the
    lossy codec) and any off-by-one in the resize kernel or either
    codec fails the hash."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    sums = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            thumb = resize_nearest(out, out_w, out_h)
            sums[i] = int(thumb.sum(dtype=np.int64))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "thumb_sum": pa.array(sums, pa.int64()),
    })


def image_gate_table(batch: pa.Table, text_col: str = "text",
                     min_side: int = 32, aspect_max_pct: int = 140,
                     min_caption_tokens: int = 5,
                     caption_chars: int = 64) -> pa.Table:
    """Typed-metadata image+caption curation gate (the LAION-style
    pre-decode filter): captions are the first ``caption_chars`` chars
    of the document text, gates run in a FIXED order (small side ->
    aspect ratio -> caption token count) and each row reports keep +
    the first failing reason — all derivable expressions, so the
    DuckDB twin is exact. Vectorized: one RE2 token count over caption
    slices + numpy selects; shuffle-free."""
    import pyarrow.compute as pc

    meta = synth_image_meta(batch)
    w = meta["w"].to_numpy()
    h = meta["h"].to_numpy()
    cap = pc.utf8_slice_codeunits(batch[text_col], 0, caption_chars)
    toks = pc.count_substring_regex(cap, r"\S+").to_numpy().astype(np.int64)
    small = np.minimum(w, h) < min_side
    aspect = np.maximum(w * 100 // h, h * 100 // w) > aspect_max_pct
    thin = toks < min_caption_tokens
    reason = np.select([small, aspect, thin], ["small", "aspect", "caption"],
                       default="ok")
    return pa.table({
        "doc_id": meta["doc_id"],
        "w": meta["w"], "h": meta["h"], "fmt": meta["fmt"],
        "cap_tokens": pa.array(toks, pa.int64()),
        "keep": pa.array(reason == "ok", pa.bool_()),
        "reason": pa.array(reason.astype(object), pa.string()),
    })


def psnr_gate_table(batch: pa.Table) -> pa.Table:
    """The input_hint's PSNR >= 40 dB lossy-decode invariant as an
    EXACT integer operator: per image the squared-error sum between
    original and round-tripped pixels (real encode -> real decode),
    plus the gate evaluated without any floating point —

        PSNR >= 40 dB  <=>  255^2 / MSE >= 10^4
                       <=>  65025 * n_px >= 10000 * sq_err_sum.

    For the lossless codec sq_err_sum must be exactly 0; for the lossy
    quantizer the per-pixel error is val%8 - 4, so the DuckDB twin
    recomputes sq_err_sum closed-form from the generator expression —
    a decoder drifting even one pixel fails the hash, and the 40 dB
    bound itself is checked by an independent engine."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    sq = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            d = pix[j].astype(np.int64) - out.astype(np.int64)
            sq[i] = int((d * d).sum(dtype=np.int64))
    n_px = _SYNTH_W[six] * _SYNTH_H[six] * 3
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "n_px": pa.array(n_px, pa.int64()),
        "sq_err_sum": pa.array(sq, pa.int64()),
        "pass_40db": pa.array(65025 * n_px >= 10000 * sq, pa.bool_()),
    })


def tile_variance_table(batch: pa.Table) -> pa.Table:
    """Flat-image curation gate through the REAL decode path: per
    image the four quadrant pixel sums (x < w//2, y < h//2 split) and
    the integer between-tile variance proxy Σ(4·q_i − total)² — zero
    for perfectly flat images, large for structured ones; the cheap
    screen that drops solid-color / letterbox placeholders before any
    model sees them. The DuckDB twin recomputes every quadrant sum
    closed-form from the generator expression, so the gate is exact
    end-to-end."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    q = np.zeros((len(ids), 4), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            hw, hh = w // 2, h // 2
            q[i, 0] = o[:hh, :hw].sum()
            q[i, 1] = o[:hh, hw:].sum()
            q[i, 2] = o[hh:, :hw].sum()
            q[i, 3] = o[hh:, hw:].sum()
    tot = q.sum(axis=1)
    dev = 4 * q - tot[:, None]
    var4 = (dev * dev).sum(axis=1)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "q0": pa.array(q[:, 0], pa.int64()),
        "q1": pa.array(q[:, 1], pa.int64()),
        "q2": pa.array(q[:, 2], pa.int64()),
        "q3": pa.array(q[:, 3], pa.int64()),
        "tile_var4": pa.array(var4, pa.int64()),
    })


def sharpness_table(batch: pa.Table, blur_milli: int = 30000) -> pa.Table:
    """Blur/sharpness screen through the REAL decode path: per image
    the horizontal gradient energy Σ|p(x+1,y,c) − p(x,y,c)| over
    decoded pixels — the classic cheap focus metric (gradient-energy
    variant of variance-of-Laplacian) that drops out-of-focus or
    upscaled-then-saved placeholders before any model decode. Exact
    integers end-to-end: grad_sum, n_pairs = (w−1)·h·3, the milli-units
    mean gradient, and the blur flag grad_milli < ``blur_milli``. The
    DuckDB twin recomputes BOTH neighbor pixels closed-form from the
    generator expression (fmt-aware dequantization), so one drifted
    pixel in either codec fails the hash."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    grad = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            grad[i] = int(np.abs(o[:, 1:, :] - o[:, :-1, :]).sum())
    n_pairs = (_SYNTH_W[six] - 1) * _SYNTH_H[six] * 3
    grad_milli = 1000 * grad // n_pairs
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "n_pairs": pa.array(n_pairs, pa.int64()),
        "grad_sum": pa.array(grad, pa.int64()),
        "grad_milli": pa.array(grad_milli, pa.int64()),
        "blurry": pa.array(grad_milli < blur_milli, pa.bool_()),
    })


def luma_table(batch: pa.Table, dark_milli: int = 85_000,
               bright_milli: int = 170_000) -> pa.Table:
    """Exposure census through the REAL decode path: per image the
    integer ITU-R BT.601 luma mass Σ(299·R + 587·G + 114·B) over
    decoded pixels (milli-luma units — no float, no division until the
    final per-pixel mean), the per-pixel mean, and the exposure bucket
    (dark / mid / bright) — the brightness screen that catches
    near-black failed fetches and blown-out scans in image+caption
    curation. The DuckDB twin pivots the three generated channels per
    (x, y) and re-derives every bucket closed-form."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    luma = np.zeros(len(ids), dtype=np.int64)
    wgt = np.asarray([299, 587, 114], dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            luma[i] = int((out.astype(np.int64) * wgt).sum())
    n_px = _SYNTH_W[six] * _SYNTH_H[six]
    mean_milli = luma // n_px
    bucket = np.select([mean_milli < dark_milli, mean_milli > bright_milli],
                       ["dark", "bright"], default="mid")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "luma_sum_milli": pa.array(luma, pa.int64()),
        "mean_luma_milli": pa.array(mean_milli, pa.int64()),
        "bucket": pa.array(bucket.astype(object), pa.string()),
    })


def dhash_table(batch: pa.Table) -> pa.Table:
    """Difference hash (dHash, public technique: row-wise horizontal
    gradient signs over a coarse grid) through the REAL decode path —
    the second perceptual sketch beside the average-hash ``phash``
    column: gradient structure survives brightness/contrast shifts that
    flip average-hash bits, so the pair (phash, dhash) disagreeing is
    itself a transform signal. Grid = 8 rows x 9 cols sampled at
    (x, y) = ((c*w)//9, (r*h)//8); gray = integer BT.601 milli-luma of
    the DECODED pixel; bit(r, c) = gray(r, c+1) > gray(r, c), packed
    little-endian to 64 bits (two's-complement int64, same signed-view
    convention as simhash/phash). Emits (doc_id, fmt, dhash,
    n_bits_set). Shuffle-free map_batches; the DuckDB twin re-derives
    every sampled pixel closed-form (fmt-aware dequantization)."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    wgt = np.asarray([299, 587, 114], dtype=np.int64)
    dh = np.zeros(len(ids), dtype=np.uint64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        xs = (np.arange(9, dtype=np.int64) * w) // 9
        ys = (np.arange(8, dtype=np.int64) * h) // 8
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            grid = out[np.ix_(ys, xs)].astype(np.int64)   # (8, 9, 3)
            gray = (grid * wgt).sum(axis=2)               # milli-luma
            bits = gray[:, 1:] > gray[:, :-1]             # (8, 8)
            weights = (np.uint64(1)
                       << (np.arange(64, dtype=np.uint64)
                           .reshape(8, 8)))
            dh[i] = np.bitwise_or.reduce(
                np.where(bits, weights, np.uint64(0)).ravel())
    signed = dh.view(np.int64)
    nbits = np.array([int(x).bit_count() for x in dh], dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "dhash": pa.array(signed, pa.int64()),
        "n_bits_set": pa.array(nbits, pa.int64()),
    })


def color_forensics_table(batch: pa.Table,
                          cast_milli_thresh: int = 10) -> pa.Table:
    """Color-cast + quantization-provenance forensics through the REAL
    decode path, one decode pass per image: per-channel pixel-sum
    masses (the white-balance screen — a stuck sensor channel or
    chroma-shifted re-encode shows up as channel-mass imbalance), the
    integer cast score 1000·(max−min)//total, and the lossy-provenance
    sniff — the count of decoded values ≡ 4 (mod 8), which equals
    EVERY value for the qimg quantizer ((v//8)·8+4) but only ~1/8 of a
    PNG's — re-deriving the container format from pixels alone and
    checking it against the header (`fmt_match`; a mismatch is a
    re-encoded / transcoded image, the classic laundered-duplicate
    signal in image+caption curation). The DuckDB twin recomputes
    every pixel closed-form and replays both screens exactly."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    sums = np.zeros((len(ids), 3), dtype=np.int64)
    n_quant = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            sums[i] = o.sum(axis=(0, 1))
            n_quant[i] = int((o % 8 == 4).sum())
    total = sums.sum(axis=1)
    cast_milli = 1000 * (sums.max(axis=1) - sums.min(axis=1)) // total
    n_vals = _SYNTH_W[six] * _SYNTH_H[six] * 3
    sniffed = np.where(n_quant == n_vals, "qimg", "png")
    actual = np.where(is_png, "png", "qimg")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(actual.astype(object), pa.string()),
        "sum_r": pa.array(sums[:, 0], pa.int64()),
        "sum_g": pa.array(sums[:, 1], pa.int64()),
        "sum_b": pa.array(sums[:, 2], pa.int64()),
        "cast_milli": pa.array(cast_milli, pa.int64()),
        "color_cast": pa.array(cast_milli >= cast_milli_thresh, pa.bool_()),
        "n_quant": pa.array(n_quant, pa.int64()),
        "n_vals": pa.array(n_vals, pa.int64()),
        "sniffed_fmt": pa.array(sniffed.astype(object), pa.string()),
        "fmt_match": pa.array(sniffed == actual, pa.bool_()),
    })


def grad_orientation_table(batch: pa.Table, iso_lo: int = 900,
                           iso_hi: int = 1100) -> pa.Table:
    """Gradient-anisotropy screen through the REAL decode path:
    horizontal (Σ|p(x+1,y,c)−p(x,y,c)|) AND vertical
    (Σ|p(x,y+1,c)−p(x,y,c)|) gradient energies per image, and the
    normalized integer anisotropy ratio 1000·(gv/n_v)/(gh/n_h) — an
    isotropic image sits near 1000; interlacing artifacts, scanline
    banding, or stretched-single-axis upscales push it outside
    [iso_lo, iso_hi] (`banded`). Complements sharpness_table (which
    measures the horizontal axis only). The DuckDB twin recomputes
    BOTH neighbor pixels of BOTH orientations closed-form with
    fmt-aware dequantization."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    gh = np.zeros(len(ids), dtype=np.int64)
    gv = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            gh[i] = int(np.abs(o[:, 1:, :] - o[:, :-1, :]).sum())
            gv[i] = int(np.abs(o[1:, :, :] - o[:-1, :, :]).sum())
    n_h = (_SYNTH_W[six] - 1) * _SYNTH_H[six] * 3
    n_v = _SYNTH_W[six] * (_SYNTH_H[six] - 1) * 3
    denom = gh * n_v
    aniso = np.where(denom > 0, 1000 * gv * n_h // np.maximum(denom, 1), -1)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "n_h": pa.array(n_h, pa.int64()),
        "n_v": pa.array(n_v, pa.int64()),
        "grad_h": pa.array(gh, pa.int64()),
        "grad_v": pa.array(gv, pa.int64()),
        "aniso_milli": pa.array(aniso, pa.int64()),
        "banded": pa.array((aniso < iso_lo) | (aniso > iso_hi), pa.bool_()),
    })


def clipping_table(batch: pa.Table, clip_ppm_thresh: int = 7_800
                   ) -> pa.Table:
    """Exposure-clipping census through the REAL decode path: per image
    the count of decoded values crushed to 0 or blown to 255 — the
    classic histogram-endpoint screen for failed exposures, scanner
    glare and over-processed re-encodes (complements the mean-level
    luma bucket, which misses a correct-mean image with clipped tails).
    Integer-exact: n_lo, n_hi, clip_ppm over w·h·3 values, and the
    `clipped` gate at ``clip_ppm_thresh``. The DuckDB twin recomputes
    every pixel closed-form and counts the same endpoints."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    n_lo = np.zeros(len(ids), dtype=np.int64)
    n_hi = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            n_lo[i] = int((out == 0).sum())
            n_hi[i] = int((out == 255).sum())
    n_vals = _SYNTH_W[six] * _SYNTH_H[six] * 3
    clip_ppm = 1_000_000 * (n_lo + n_hi) // n_vals
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "n_lo": pa.array(n_lo, pa.int64()),
        "n_hi": pa.array(n_hi, pa.int64()),
        "n_vals": pa.array(n_vals, pa.int64()),
        "clip_ppm": pa.array(clip_ppm, pa.int64()),
        "clipped": pa.array(clip_ppm >= clip_ppm_thresh, pa.bool_()),
    })


def palette_table(batch: pa.Table, posterized_max_ppm: int = 900_000
                  ) -> pa.Table:
    """Palette-size / posterization audit through the REAL decode
    path: per image the number of DISTINCT (r,g,b) triples among
    decoded pixels — a GIF-style palette re-encode, a posterizing
    filter, or the qimg quantizer all collapse the color count far
    below a natural image's; the `posterized` gate flags images whose
    distinct-color-per-pixel ratio (colors_ppm) collapses below
    ``posterized_max_ppm`` — here the qimg quantizer's 512×-coarser
    value lattice produces measurably more triple collisions than the
    lossless path. Exact integers (each triple packed as
    r·65536+g·256+b before the distinct). The DuckDB twin
    recomputes every pixel closed-form, pivots the three channels per
    coordinate and replays count(DISTINCT packed)."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    n_colors = np.zeros(len(ids), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            packed = (o[:, :, 0] << 16) | (o[:, :, 1] << 8) | o[:, :, 2]
            n_colors[i] = len(np.unique(packed))
    n_px = _SYNTH_W[six] * _SYNTH_H[six]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fmt": pa.array(np.where(is_png, "png", "qimg").astype(object),
                        pa.string()),
        "n_px": pa.array(n_px, pa.int64()),
        "n_colors": pa.array(n_colors, pa.int64()),
        "colors_ppm": pa.array(1_000_000 * n_colors // n_px, pa.int64()),
        "posterized": pa.array(1_000_000 * n_colors // n_px
                               <= posterized_max_ppm, pa.bool_()),
    })


def caption_alignment_table(batch: pa.Table) -> pa.Table:
    """Image↔caption alignment gate — the CLIP-filtering shape of
    image+caption curation (decode → visual embedding → join a text
    embedding → cosine gate), run entirely in EXACT integers so an
    independent engine can replay it: the visual vector is the 8×8
    nearest-sample grid over decoded pixels summed across channels
    (64 ints, the integer core of ImageFeatureStage's grid embedding);
    the caption vector is a 64-bucket signed bag-of-words sketch
    (bucket = md5_64('ce:'||token) % 64, sign from the next hash bit —
    a feature-hashing / SimHash-style text embedding); the gate keeps
    integer dot and squared norms and flags `misaligned` by the
    integer-exact test dot ≤ 0 OR 100·dot² < |a|²·|b|² (cos < 0.1).
    One fused pass, no shuffle; the DuckDB twin recomputes the sampled
    pixels closed-form and the same md5 sketch."""
    import pyarrow.compute as pc

    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    n = len(ids)
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    avec = np.zeros((n, 64), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        pix = _gen_pixels_group(u[idx], w, h)
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            avec[i] = out[np.ix_(ys, xs)].astype(np.int64) \
                .sum(axis=2).ravel()

    toks = pc.utf8_split_whitespace(batch["text"])
    parent = pc.list_parent_indices(toks).to_numpy()
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.to_numpy(zero_copy_only=False)[keep]
    parent = parent[keep]
    uniq, inv = np.unique(flat, return_inverse=True)
    hu = md5_u64([f"ce:{t}" for t in uniq])
    bucket = (hu % np.uint64(64)).astype(np.int64)[inv]
    sign = np.where((hu >> np.uint64(6)) % np.uint64(2) == 0,
                    1, -1).astype(np.int64)[inv]
    bvec = np.zeros((n, 64), dtype=np.int64)
    np.add.at(bvec, (parent, bucket), sign)

    dot = (avec * bvec).sum(axis=1)
    na2 = (avec * avec).sum(axis=1)
    nb2 = (bvec * bvec).sum(axis=1)
    misaligned = (dot <= 0) | (100 * dot * dot < na2 * nb2)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "dot": pa.array(dot, pa.int64()),
        "na2": pa.array(na2, pa.int64()),
        "nb2": pa.array(nb2, pa.int64()),
        "misaligned": pa.array(misaligned, pa.bool_()),
    })


def audio_features_table(batch: pa.Table,
                         loud_rms2_milli: int = 9_000_000_000
                         ) -> pa.Table:
    """Audio feature extraction through the REAL qaud codec round trip
    (encode → decode → features), the audio twin of the image-family
    decode ops: per clip the exact integer loudness mass Σs² (rms² in
    milli-units), the peak sample, and the zero-crossing count (the
    cheap voiced/unvoiced + silence screen of audio curation). Clip
    length and amplitude class derive from md5('aud:'||doc_id) exactly
    like the image corpus; the DuckDB twin recomputes every SAMPLE
    closed-form, so one drifted sample in the codec fails the hash."""
    from ..payload import gen_audio_group, qaud_decode, qaud_encode

    ids = batch["doc_id"].to_numpy()
    u = md5_u64([f"aud:{i}" for i in ids])
    n_cls = (u % np.uint64(4)).astype(np.int64)
    n_samples = 1600 + n_cls * 400
    sum_sq = np.zeros(len(ids), dtype=np.int64)
    peak = np.zeros(len(ids), dtype=np.int64)
    zc = np.zeros(len(ids), dtype=np.int64)
    for nc in np.unique(n_cls):
        idx = np.nonzero(n_cls == nc)[0]
        n = int(1600 + nc * 400)
        pcm = gen_audio_group(u[idx], n)
        for j, i in enumerate(idx):
            s = qaud_decode(qaud_encode(pcm[j])).astype(np.int64)
            sum_sq[i] = int((s * s).sum())
            peak[i] = int(np.abs(s).max())
            zc[i] = int((s[:-1] * s[1:] < 0).sum())
    rms2_milli = 1000 * sum_sq // n_samples
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_samples": pa.array(n_samples, pa.int64()),
        "sum_sq": pa.array(sum_sq, pa.int64()),
        "peak": pa.array(peak, pa.int64()),
        "zero_cross": pa.array(zc, pa.int64()),
        "rms2_milli": pa.array(rms2_milli, pa.int64()),
        "loud": pa.array(rms2_milli >= loud_rms2_milli, pa.bool_()),
    })


_VID_W, _VID_H = 16, 12


def video_motion_table(batch: pa.Table) -> pa.Table:
    """Temporal-motion census through the REAL qvid container round
    trip (per-frame qimg encode → container → per-frame decode): per
    video the exact integer motion mass Σ_f Σ_px |p_f − p_{f−1}| over
    decoded values — the static-clip / slideshow screen of video
    curation (a stuck encoder or duplicated frame shows up as a
    near-zero inter-frame delta). Frame count derives from
    md5('vid:'||doc_id), each frame's pixels from
    md5('vf:'||doc_id||':'||f) through the shared image generator;
    the DuckDB twin recomputes BOTH frames of every pixel pair
    closed-form with qimg dequantization."""
    from ..payload import _gen_pixels_group, qvid_decode, qvid_encode

    ids = batch["doc_id"].to_numpy()
    u = md5_u64([f"vid:{i}" for i in ids])
    k = (4 + (u % np.uint64(3)) * np.uint64(2)).astype(np.int64)
    # one vectorized pixel-gen call for EVERY (doc, frame)
    doc_idx = np.repeat(np.arange(len(ids)), k)
    frame_no = np.concatenate([np.arange(x) for x in k]) \
        if len(ids) else np.zeros(0, np.int64)
    uf = md5_u64([f"vf:{ids[d]}:{f}"
                  for d, f in zip(doc_idx, frame_no)])
    pix = _gen_pixels_group(uf, _VID_W, _VID_H)
    motion = np.zeros(len(ids), dtype=np.int64)
    pos = 0
    for i, kk in enumerate(k):
        frames = [pix[pos + f] for f in range(kk)]
        pos += int(kk)
        dec = qvid_decode(qvid_encode(frames))
        arr = np.stack(dec).astype(np.int64)
        motion[i] = int(np.abs(arr[1:] - arr[:-1]).sum())
    denom = (k - 1) * _VID_W * _VID_H * 3
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_frames": pa.array(k, pa.int64()),
        "w": pa.array(np.full(len(ids), _VID_W, np.int64), pa.int64()),
        "h": pa.array(np.full(len(ids), _VID_H, np.int64), pa.int64()),
        "motion_sum": pa.array(motion, pa.int64()),
        "motion_per_px_milli": pa.array(1000 * motion // denom,
                                        pa.int64()),
    })


def audio_silence_table(batch: pa.Table, thresh: int = 1500
                        ) -> pa.Table:
    """Silence-trim census through the REAL qaud round trip: per clip
    the first and last sample whose |s| exceeds ``thresh`` (the trim
    points an ingest pipeline cuts at), the below-threshold sample
    share, and the all-silent flag — the dead-air / truncated-upload
    screen of audio curation. Integer-exact; the DuckDB twin
    recomputes every sample closed-form."""
    from ..payload import gen_audio_group, qaud_decode, qaud_encode

    ids = batch["doc_id"].to_numpy()
    u = md5_u64([f"aud:{i}" for i in ids])
    n_cls = (u % np.uint64(4)).astype(np.int64)
    n_samples = 1600 + n_cls * 400
    first = np.full(len(ids), -1, dtype=np.int64)
    last = np.full(len(ids), -1, dtype=np.int64)
    quiet = np.zeros(len(ids), dtype=np.int64)
    for nc in np.unique(n_cls):
        idx = np.nonzero(n_cls == nc)[0]
        n = int(1600 + nc * 400)
        pcm = gen_audio_group(u[idx], n)
        for j, i in enumerate(idx):
            s = np.abs(qaud_decode(qaud_encode(pcm[j])).astype(np.int64))
            loudpos = np.flatnonzero(s > thresh)
            if len(loudpos):
                first[i] = int(loudpos[0])
                last[i] = int(loudpos[-1])
            quiet[i] = int((s <= thresh).sum())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_samples": pa.array(n_samples, pa.int64()),
        "trim_start": pa.array(first, pa.int64()),
        "trim_end": pa.array(last, pa.int64()),
        "quiet_ppm": pa.array(1_000_000 * quiet // n_samples, pa.int64()),
        "all_silent": pa.array(first < 0, pa.bool_()),
    })


def video_flicker_table(batch: pa.Table) -> pa.Table:
    """Exposure-flicker census through the REAL qvid round trip: per
    video each frame's BT.601 luma mass, then the integer
    between-frame variance proxy Σ(k·L_f − ΣL)² — near zero for a
    steady exposure, large for strobing / auto-exposure hunting —
    the GLOBAL-brightness twin of video_motion's local pixel deltas.
    The DuckDB twin recomputes every frame's luma closed-form."""
    from ..payload import _gen_pixels_group, qvid_decode, qvid_encode

    ids = batch["doc_id"].to_numpy()
    u = md5_u64([f"vid:{i}" for i in ids])
    k = (4 + (u % np.uint64(3)) * np.uint64(2)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids)), k)
    frame_no = np.concatenate([np.arange(x) for x in k]) \
        if len(ids) else np.zeros(0, np.int64)
    uf = md5_u64([f"vf:{ids[d]}:{f}" for d, f in zip(doc_idx, frame_no)])
    pix = _gen_pixels_group(uf, _VID_W, _VID_H)
    wgt = np.asarray([299, 587, 114], dtype=np.int64)
    var4 = np.zeros(len(ids), dtype=np.int64)
    luma_tot = np.zeros(len(ids), dtype=np.int64)
    pos = 0
    for i, kk in enumerate(k):
        frames = [pix[pos + f] for f in range(kk)]
        pos += int(kk)
        dec = qvid_decode(qvid_encode(frames))
        lum = np.asarray([int((f.astype(np.int64) * wgt).sum())
                          for f in dec], dtype=np.int64)
        tot = int(lum.sum())
        luma_tot[i] = tot
        dev = int(kk) * lum - tot
        var4[i] = int((dev * dev).sum())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_frames": pa.array(k, pa.int64()),
        "luma_total_milli": pa.array(luma_tot, pa.int64()),
        "flicker_var": pa.array(var4, pa.int64()),
    })


def audio_clipping_table(batch: pa.Table, thresh: int = 8000
                         ) -> pa.Table:
    """Clipped-audio census through the REAL qaud round trip: per clip
    the count and ppm share of samples at or beyond ``thresh`` —
    the hot-mix / mastering-damage screen (in this corpus only the
    loudest amplitude class ever reaches the region, so the gate
    separates the classes exactly like real clipping separates broken
    masters). Integer-exact; the DuckDB twin recomputes every sample
    closed-form from the same md5 recurrence."""
    from ..payload import gen_audio_group, qaud_decode, qaud_encode

    ids = batch["doc_id"].to_numpy()
    u = md5_u64([f"aud:{i}" for i in ids])
    n_cls = (u % np.uint64(4)).astype(np.int64)
    n_samples = 1600 + n_cls * 400
    n_clip = np.zeros(len(ids), dtype=np.int64)
    for nc in np.unique(n_cls):
        idx = np.nonzero(n_cls == nc)[0]
        n = int(1600 + nc * 400)
        pcm = gen_audio_group(u[idx], n)
        for j, i in enumerate(idx):
            s = qaud_decode(qaud_encode(pcm[j])).astype(np.int64)
            n_clip[i] = int((np.abs(s) >= thresh).sum())
    clip_ppm = 1_000_000 * n_clip // n_samples
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_samples": pa.array(n_samples, pa.int64()),
        "n_clip": pa.array(n_clip, pa.int64()),
        "clip_ppm": pa.array(clip_ppm, pa.int64()),
        "clipped": pa.array(clip_ppm > 10_000, pa.bool_()),
    })


def video_scene_cuts_table(batch: pa.Table, cut_thresh: int = 48_000
                           ) -> pa.Table:
    """Scene-cut census through the REAL qvid round trip: per video
    each adjacent frame pair's absolute pixel-delta mass, the count of
    pairs at or beyond ``cut_thresh`` (hard cuts), and the min/max
    pair mass — the shot-boundary detector of video curation (a
    slideshow is all cuts, a static clip none). Integer-exact; the
    DuckDB twin recomputes both frames of every pixel pair."""
    from ..payload import _gen_pixels_group, qvid_decode, qvid_encode

    ids = batch["doc_id"].to_numpy()
    u = md5_u64([f"vid:{i}" for i in ids])
    k = (4 + (u % np.uint64(3)) * np.uint64(2)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(ids)), k)
    frame_no = np.concatenate([np.arange(x) for x in k]) \
        if len(ids) else np.zeros(0, np.int64)
    uf = md5_u64([f"vf:{ids[d]}:{f}" for d, f in zip(doc_idx, frame_no)])
    pix = _gen_pixels_group(uf, _VID_W, _VID_H)
    n_cuts = np.zeros(len(ids), dtype=np.int64)
    pair_min = np.zeros(len(ids), dtype=np.int64)
    pair_max = np.zeros(len(ids), dtype=np.int64)
    pos = 0
    for i, kk in enumerate(k):
        frames = [pix[pos + f] for f in range(kk)]
        pos += int(kk)
        dec = qvid_decode(qvid_encode(frames))
        arr = np.stack(dec).astype(np.int64)
        pair = np.abs(arr[1:] - arr[:-1]).sum(axis=(1, 2, 3))
        n_cuts[i] = int((pair >= cut_thresh).sum())
        pair_min[i] = int(pair.min())
        pair_max[i] = int(pair.max())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_pairs": pa.array(k - 1, pa.int64()),
        "n_cuts": pa.array(n_cuts, pa.int64()),
        "pair_min": pa.array(pair_min, pa.int64()),
        "pair_max": pa.array(pair_max, pa.int64()),
    })


def channel_corr_table(batch: pa.Table, gray_ppm: int = 990_000
                       ) -> pa.Table:
    """Channel-correlation census through the REAL decode path: per
    image the exact integer cross-channel covariances
    cov(a,b) = n·Σab − Σa·Σb for (R,G) and (G,B), the Pearson
    correlation in ppm (one sqrt over exactly-representable integer
    products — identical IEEE ops in the DuckDB twin), and the
    grayscale/sepia gate (both correlations >= ``gray_ppm``) — the
    desaturated-duplicate screen of image curation (a grayscale
    re-encode of a color original defeats exact-hash dedup but not
    this gate)."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    n = len(ids)
    cov_rg = np.zeros(n, dtype=np.int64)
    cov_gb = np.zeros(n, dtype=np.int64)
    var = np.zeros((n, 3), dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        npx = w * h
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            ch = out.astype(np.int64).reshape(-1, 3)
            s = ch.sum(axis=0)
            cov_rg[i] = npx * int((ch[:, 0] * ch[:, 1]).sum()) \
                - int(s[0]) * int(s[1])
            cov_gb[i] = npx * int((ch[:, 1] * ch[:, 2]).sum()) \
                - int(s[1]) * int(s[2])
            var[i] = npx * (ch * ch).sum(axis=0) - s * s
    def corr_ppm(cov, va, vb):
        denom = np.sqrt(va.astype(np.float64) * vb.astype(np.float64))
        return np.where(
            denom > 0,
            np.floor(1_000_000.0 * cov.astype(np.float64) / denom + 0.5),
            1_000_000.0).astype(np.int64)
    rg = corr_ppm(cov_rg, var[:, 0], var[:, 1])
    gb = corr_ppm(cov_gb, var[:, 1], var[:, 2])
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "cov_rg": pa.array(cov_rg, pa.int64()),
        "cov_gb": pa.array(cov_gb, pa.int64()),
        "corr_rg_ppm": pa.array(rg, pa.int64()),
        "corr_gb_ppm": pa.array(gb, pa.int64()),
        "grayish": pa.array((rg >= gray_ppm) & (gb >= gray_ppm),
                            pa.bool_()),
    })


def blockiness_table(batch: pa.Table, lo_milli: int = 900,
                     hi_milli: int = 1100) -> pa.Table:
    """JPEG-style blockiness census through the REAL decode path: per
    image the horizontal gradient mass is split into 8x8 BLOCK-BOUNDARY
    column pairs (x % 8 == 7) vs interior pairs, and the per-pair
    boundary/interior ratio is reported in milli — a block-coded
    re-encode concentrates gradient energy on the boundary lattice
    (ratio >> 1000), the transcoded-duplicate screen complementing
    color_forensics' quantizer sniff. Exact integers end to end; the
    DuckDB twin recomputes both pixels of every pair closed-form and
    splits on the same ``x % 8`` lattice."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    n = len(ids)
    grad_b = np.zeros(n, dtype=np.int64)
    grad_i = np.zeros(n, dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        bmask = (np.arange(w - 1) % 8) == 7
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            dh = np.abs(o[:, 1:, :] - o[:, :-1, :]).sum(axis=(0, 2))
            grad_b[i] = int(dh[bmask].sum())
            grad_i[i] = int(dh[~bmask].sum())
    w_all, h_all = _SYNTH_W[six], _SYNTH_H[six]
    nb = ((w_all - 9) // 8 + 1).clip(min=0) * h_all * 3
    ni = (w_all - 1) * h_all * 3 - nb
    milli = np.where((grad_i > 0) & (nb > 0),
                     (1000 * grad_b * ni) // np.maximum(grad_i * nb, 1),
                     -1)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_boundary": pa.array(nb, pa.int64()),
        "n_interior": pa.array(ni, pa.int64()),
        "grad_boundary": pa.array(grad_b, pa.int64()),
        "grad_interior": pa.array(grad_i, pa.int64()),
        "blockiness_milli": pa.array(milli, pa.int64()),
        "blocky": pa.array((milli > hi_milli) | ((milli >= 0)
                           & (milli < lo_milli)), pa.bool_()),
    })


def border_energy_table(batch: pa.Table, frame: int = 2,
                        flat_milli: int = 100) -> pa.Table:
    """Letterbox / pillarbox screen through the REAL decode path: per
    image the pixel-value variance registers (n, Σv, Σv² over all
    channels) of the ``frame``-pixel border ring vs the interior, and
    the border/interior variance ratio in milli — a letterboxed or
    frame-padded duplicate has a near-zero-variance border
    (ratio < ``flat_milli``) while its interior still matches the
    original, the crop-before-dedup signal of image curation. Variance
    cross-products exceed int64 at 80x60, so the per-image fold runs
    in Python bigints (the HUGEINT of the DuckDB twin)."""
    from ..payload import (_gen_pixels_group, png_decode, png_encode,
                           qimg_decode, qimg_encode)

    ids = batch["doc_id"].to_numpy()
    u = synth_image_seed(batch)
    six = (u % np.uint64(6)).astype(np.int64)
    is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
    n = len(ids)
    var_b = np.zeros(n, dtype=np.int64)
    var_i = np.zeros(n, dtype=np.int64)
    n_b = np.zeros(n, dtype=np.int64)
    n_i = np.zeros(n, dtype=np.int64)
    milli = np.zeros(n, dtype=np.int64)
    for si in np.unique(six):
        idx = np.nonzero(six == si)[0]
        w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
        pix = _gen_pixels_group(u[idx], w, h)
        yy, xx = np.mgrid[0:h, 0:w]
        border = ((xx < frame) | (xx >= w - frame)
                  | (yy < frame) | (yy >= h - frame))
        for j, i in enumerate(idx):
            if is_png[i]:
                out = png_decode(png_encode(pix[j]))
            else:
                out = qimg_decode(qimg_encode(pix[j]))
            o = out.astype(np.int64)
            vb = o[border].ravel()
            vi = o[~border].ravel()
            nb, ni = len(vb), len(vi)
            wb = nb * int((vb * vb).sum()) - int(vb.sum()) ** 2
            wi = ni * int((vi * vi).sum()) - int(vi.sum()) ** 2
            n_b[i], n_i[i] = nb, ni
            var_b[i], var_i[i] = wb, wi
            milli[i] = ((1000 * wb * ni * ni) // (wi * nb * nb)
                        if wi > 0 else -1)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_border": pa.array(n_b, pa.int64()),
        "n_interior": pa.array(n_i, pa.int64()),
        "var_border_num": pa.array(var_b, pa.int64()),
        "var_interior_num": pa.array(var_i, pa.int64()),
        "border_ratio_milli": pa.array(milli, pa.int64()),
        "framed": pa.array((milli >= 0) & (milli < flat_milli),
                           pa.bool_()),
    })
