"""URL-seen / link-state shard.

Re-expresses frontera's States store (frontera/core/components.py:93-134:
enum NOT_CRAWLED=0, QUEUED=1, CRAWLED=2, ERROR=3; fetch/set_states/
update_cache/flush contract) as a shard owned by exactly one actor per
``fp64 % num_shards`` — mirroring the reference's rule that one strategy
worker owns a fingerprint (spider-log partitioning by fingerprint).

At test scale the shard is an exact dict (zero false positives, required
for crawl-ordering parity). At 10^10-URL scale the dict is replaced by a
bloom filter + bounded exact overlay: the bloom answers "definitely
unseen", the overlay holds recent exact states until flushed to the
checkpoint. A 2^33-bit bloom (1 GiB) with 7 hashes holds ~8e8 keys/shard
at <1e-4 FP; 16 such shards cover 1.3e10 URLs in 16 GiB cluster-wide.

References (public): Bloom, "Space/time trade-offs in hash coding with
allowable errors" (CACM 1970); Kirsch & Mitzenmacher, "Less hashing,
same performance" (2006) — the double-hashing probe scheme used here.
"""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class States:
    NOT_CRAWLED = 0
    QUEUED = 1
    CRAWLED = 2
    ERROR = 3
    DEFAULT = 0


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derive independent bloom probes from fp64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Vectorized numpy bloom filter over uint64 keys."""

    def __init__(self, num_bits: int = 1 << 24, num_hashes: int = 7):
        assert num_bits % 64 == 0
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.words = np.zeros(num_bits // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # double hashing: h1 + i*h2 (Kirsch–Mitzenmacher)
        h1 = _mix64(keys.astype(np.uint64))
        h2 = _mix64(h1) | np.uint64(1)
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)

    def add_batch(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0)

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(buf, words=self.words,
                            meta=np.array([self.num_bits, self.num_hashes]))
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        with np.load(io.BytesIO(data)) as z:
            num_bits, num_hashes = (int(v) for v in z["meta"])
            bf = cls(num_bits, num_hashes)
            bf.words[:] = z["words"]
        return bf


class UrlSeenShard:
    """One shard of the URL-seen / states table.

    ``exact=True`` (default) keeps a full fp->state dict — required for
    exact dedup parity with the reference States semantics. With
    ``exact=False`` a bloom filter + dict overlay is used; the overlay is
    truncated at ``overlay_limit`` after each checkpoint flush (states
    degrade to "seen", which is all the crawl loop needs at scale).
    """

    def __init__(self, shard_id: int = 0, exact: bool = True,
                 bloom_bits: int = 1 << 24, overlay_limit: int = 3_000_000):
        self.shard_id = shard_id
        self.exact = exact
        self.states: dict[int, int] = {}
        self.bloom = None if exact else BloomFilter(bloom_bits)
        self.overlay_limit = overlay_limit
        self.n_seen = 0

    # -- core dedup operation ------------------------------------------------
    def check_and_mark(self, fps: np.ndarray, mark: int = States.QUEUED) -> np.ndarray:
        """For a batch of fingerprints return a boolean keep-mask that is
        True for fingerprints never seen before (state NOT_CRAWLED), and
        atomically mark kept ones with ``mark``. First occurrence within
        the batch wins (within-batch dedup included)."""
        fps = np.asarray(fps, dtype=np.uint64)
        keep = np.zeros(len(fps), dtype=bool)
        if self.bloom is not None:
            maybe_seen = self.bloom.contains_batch(fps)
        states = self.states
        batch_new: set[int] = set()
        for i, fp in enumerate(fps):
            fp = int(fp)
            if fp in batch_new or fp in states:
                continue
            if self.bloom is not None and maybe_seen[i]:
                continue  # bloom hit => treat as seen (no false negatives)
            batch_new.add(fp)
            keep[i] = True
            states[fp] = mark
        if self.bloom is not None and batch_new:
            self.bloom.add_batch(np.fromiter(batch_new, dtype=np.uint64))
        self.n_seen += len(batch_new)
        return keep

    # -- States-contract operations -----------------------------------------
    def set_states(self, fps, values) -> None:
        """Bulk state update (page_crawled -> CRAWLED, request_error ->
        ERROR etc.)."""
        lru = self.bloom is not None  # overlay is an LRU in bloom mode
        for fp, v in zip(fps, values):
            fp = int(fp)
            if self.bloom is not None and fp not in self.states:
                self.bloom.add_batch(np.array([fp], dtype=np.uint64))
                self.n_seen += 1
            elif lru:
                # writes refresh recency too: del+reinsert moves the key
                # to the end (plain assignment would leave a hot,
                # frequently-rewritten entry in eviction position)
                del self.states[fp]
            self.states[fp] = int(v)

    def get_states(self, fps) -> np.ndarray:
        out = np.empty(len(fps), dtype=np.int8)
        states = self.states
        lru = self.bloom is not None  # overlay is an LRU in bloom mode
        for i, fp in enumerate(fps):
            fp = int(fp)
            v = states.get(fp)
            if v is None:
                out[i] = States.DEFAULT
                continue
            out[i] = v
            if lru:  # move-to-end: reads keep entries hot
                del states[fp]
                states[fp] = v
        return out

    def flush(self) -> None:
        """Overlay LRU eviction in bloom mode (reference HBase state
        cache semantics: bounded cache, least-recently-used out first —
        dict insertion order is recency because reads re-insert). Evicts
        down to half the limit so flushes amortize."""
        if self.bloom is not None and len(self.states) > self.overlay_limit:
            n_drop = len(self.states) - self.overlay_limit // 2
            drop = []
            for fp in self.states:  # oldest first
                drop.append(fp)
                if len(drop) >= n_drop:
                    break
            for fp in drop:
                del self.states[fp]

    # -- checkpoint ----------------------------------------------------------
    def checkpoint(self, directory: str) -> None:
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        fps = np.fromiter(self.states.keys(), dtype=np.uint64, count=len(self.states))
        vals = np.fromiter(self.states.values(), dtype=np.int8, count=len(self.states))
        t = pa.table({"fingerprint": fps, "state": vals})
        pq.write_table(t, d / f"states-{self.shard_id:04d}.parquet")
        if self.bloom is not None:
            (d / f"bloom-{self.shard_id:04d}.npz").write_bytes(self.bloom.to_bytes())

    @classmethod
    def restore(cls, directory: str, shard_id: int, exact: bool = True,
                bloom_bits: int = 1 << 24) -> "UrlSeenShard":
        d = Path(directory)
        shard = cls(shard_id, exact=exact, bloom_bits=bloom_bits)
        t = pq.read_table(d / f"states-{shard_id:04d}.parquet")
        fps = t["fingerprint"].to_numpy()
        vals = t["state"].to_numpy()
        shard.states = {int(f): int(v) for f, v in zip(fps, vals)}
        bloom_path = d / f"bloom-{shard_id:04d}.npz"
        if not exact and bloom_path.exists():
            shard.bloom = BloomFilter.from_bytes(bloom_path.read_bytes())
        shard.n_seen = len(shard.states)
        return shard
