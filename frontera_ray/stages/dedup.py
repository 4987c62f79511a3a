"""Deduplication operators for training-data pipelines.

Exact dedup is a hash-partitioned groupby-first (the scalable pattern:
partition by content hash, first-wins per group — identical semantics to
the crawl engine's fingerprint dedup). Near-dup families:

- MinHash + LSH: word-shingle -> k minhash permutations -> banded
  buckets -> candidate pairs within buckets -> exact Jaccard verify.
- SimHash: 64-bit sketch; block-LSH (4 x 16-bit) candidate buckets ->
  Hamming verify.
- n-gram Jaccard: exact pairwise within candidate buckets (small-side).
- Embedding cosine near-dup: see ann.cosine_neardup_pairs.

At 100 TB the only all-to-all exchanges are the bucket groupbys, whose
keys (band hashes / simhash blocks) are uniformly distributed by
construction — no skew. Verification joins fetch only candidate bucket
members, never the full corpus.

References (public): Broder, "On the resemblance and containment of
documents" (1997) — minhash; Leskovec/Rajaraman/Ullman, *Mining of
Massive Datasets* ch.3 — LSH banding s-curve; Charikar, "Similarity
estimation techniques from rounding algorithms" (STOC 2002) — simhash.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

# universal-hash parameters for minhash permutations (fixed seeds)
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """crc32 hashes of word k-grams (unique)."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    hs = np.fromiter(
        (zlib.crc32(g.encode("utf8")) for g in grams), dtype=np.uint64, count=len(grams)
    )
    return np.unique(hs)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x+b) mod p over the shingle set."""
    if len(shingles) == 0:
        return np.full(len(a), np.uint64(_MERSENNE))
    # (P, S) universal hashes — vectorized
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHashStage:
    """map_batches stage: doc -> (doc_id, band, band_hash) rows.

    num_perm=64, bands=16 x rows_per_band=4 targets Jaccard ~0.5+
    candidates (s-curve threshold ~ (1/16)^(1/4) ≈ 0.5)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, hashes = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch[self.text_col].to_pylist()
        ):
            sig = minhash_signature(word_shingles(text, self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = zlib.crc32(chunk.tobytes())
                doc_ids.append(doc_id)
                bands.append(band)
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(hashes, pa.int64()),
            }
        )


def candidate_pairs_from_buckets(group: pa.Table) -> pa.Table:
    """map_groups kernel over (band, band_hash) buckets -> unique doc
    pairs (a < b)."""
    ids = sorted(set(group["doc_id"].to_pylist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table(
        {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
    )


def jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_neardup_pairs(ds, threshold: float = 0.6, shingle_k: int = 3,
                          text_lookup=None, num_perm: int = 64, bands: int = 16):
    """Full MinHash-LSH pipeline over a documents Dataset.

    Returns a pyarrow Table (a, b, jaccard) with jaccard >= threshold.
    ``text_lookup``: dict doc_id->text used for the verify stage (small
    corpora; at scale this becomes a bucket-local join). Built from the
    dataset when not given."""
    import ray

    if text_lookup is None:
        text_lookup = {}
        for b in ds.select_columns(["doc_id", "text"]).iter_batches(
            batch_format="pyarrow", batch_size=4096
        ):
            text_lookup.update(
                zip(b["doc_id"].to_pylist(), b["text"].to_pylist())
            )
    buckets = ds.map_batches(
        MinHashStage, fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                                 shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=(1, 2),
    )
    # candidate generation: group the small (doc_id, band, band_hash)
    # table by bucket. At terabyte scale this becomes a groupby shuffle
    # keyed by (band, band_hash) — uniformly distributed, no skew; here
    # the bucket table is tiny so a driver-side numpy group is faster
    # than thousands of map_groups tasks.
    parts = pa.concat_tables(
        list(buckets.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    key = (parts["band"].to_numpy().astype(np.int64) << 32) | \
        (parts["band_hash"].to_numpy().astype(np.int64) & 0xFFFFFFFF)
    docs = np.asarray(parts["doc_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(key, kind="stable")
    key, docs = key[order], docs[order]
    pairs = set()
    bounds = list(np.nonzero(np.diff(key))[0] + 1) + [len(key)]
    start = 0
    for end in bounds:
        members = np.unique(docs[start:end])
        if len(members) > 1:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((int(members[i]), int(members[j])))
        start = end
    out_a, out_b, out_j = [], [], []
    sh_cache: dict[int, np.ndarray] = {}

    def sh(d):
        if d not in sh_cache:
            sh_cache[d] = word_shingles(text_lookup[d], shingle_k)
        return sh_cache[d]

    for a, b in sorted(pairs):
        j = jaccard(sh(a), sh(b))
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 4))
    return pa.table(
        {
            "a": pa.array(out_a, pa.int64()),
            "b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


def brute_force_jaccard_pairs(texts: dict, threshold: float, shingle_k: int = 3):
    """O(n^2) oracle for tests."""
    ids = sorted(texts)
    shs = {d: word_shingles(texts[d], shingle_k) for d in ids}
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jv = jaccard(shs[ids[i]], shs[ids[j]])
            if jv >= threshold:
                out.append((ids[i], ids[j], round(jv, 4)))
    return out


def dedup_keepers(ids, pairs) -> dict:
    """Resolve near-dup pairs into a keeper assignment: connected
    components via union-find, keeper = the smallest id of each
    component (the reduce step that turns pair lists from minhash /
    simhash / cosine near-dup into a deduplicated keep-list)."""
    parent = {int(i): int(i) for i in ids}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {i: find(int(i)) for i in parent}


def simhash_neardup_pairs(ds, max_hamming: int = 3):
    """SimHash near-dup: 4 x 16-bit block LSH then Hamming verify.
    Two sketches within Hamming<=3 share at least one of 4 blocks
    (pigeonhole), so bucket recall is exact for max_hamming<=3."""
    from .text import hamming64, simhash_table

    sh = ds.map_batches(simhash_table, batch_format="pyarrow")
    rows = []
    for b in sh.iter_batches(batch_format="pyarrow", batch_size=8192):
        rows.extend(zip(b["doc_id"].to_pylist(), b["simhash"].to_pylist()))
    by_block: dict[tuple[int, int], list] = {}
    for doc_id, h in rows:
        hu = h & 0xFFFFFFFFFFFFFFFF
        for blk in range(4):
            key = (blk, (hu >> (16 * blk)) & 0xFFFF)
            by_block.setdefault(key, []).append((doc_id, hu))
    cand = set()
    for members in by_block.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b_ = members[i], members[j]
                if a[0] != b_[0]:
                    cand.add((min(a, b_), max(a, b_)))
    out_a, out_b, out_d = [], [], []
    for (da, ha), (db, hb) in sorted(cand):
        d = int(hamming64(np.array([ha], dtype=np.uint64),
                          np.array([hb], dtype=np.uint64))[0])
        if d <= max_hamming:
            out_a.append(da)
            out_b.append(db)
            out_d.append(d)
    return pa.table(
        {
            "a": pa.array(out_a, pa.int64()),
            "b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_d, pa.int32()),
        }
    )
