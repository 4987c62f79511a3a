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


class CuckooFilter:
    """Partial-key cuckoo filter (Fan et al., CoNEXT 2014 — the public
    cuckoo-filter paper) over uint64 keys: buckets of 4 uint16
    fingerprints, two candidate buckets via partial-key cuckoo hashing
    (i2 = i1 XOR mix(fp), so the alternate bucket is computable from
    the stored fingerprint alone — the property that makes eviction
    kicks and DELETION possible, which a bloom filter cannot do). The
    north rule names "bloom/cuckoo URL-seen"; this is the deletable
    option a revisit-heavy crawl wants (un-mark a fingerprint when a
    page is evicted/expired without rebuilding the whole filter).

    Same duck-type as ``BloomFilter`` (add_batch / contains_batch /
    to_bytes / from_bytes) plus ``delete_batch``. Lookups are fully
    vectorized (two gathers + compares); inserts walk only NOVEL keys
    in Python with a DETERMINISTIC kick rotation (no RNG — actor
    behavior is reproducible across restarts), overflowing into a
    small stash instead of failing (Kirsch-Mitzenmacher-Wieder); at
    the default 95%-load sizing the stash stays ~empty. Memory:
    ``num_buckets * 8`` bytes (4 slots x uint16)."""

    def __init__(self, num_buckets: int = 1 << 18, max_kicks: int = 500):
        assert num_buckets & (num_buckets - 1) == 0, "power of two"
        self.num_buckets = num_buckets
        self.max_kicks = max_kicks
        self.table = np.zeros((num_buckets, 4), dtype=np.uint16)
        self.stash: set[tuple[int, int]] = set()  # (bucket, fp) overflow

    # -- hashing -------------------------------------------------------------
    def _fp_i1(self, keys: np.ndarray):
        h = _mix64(np.asarray(keys, dtype=np.uint64))
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        i1 = (h & np.uint64(self.num_buckets - 1)).astype(np.int64)
        return fp, i1

    def _alt(self, i, fp):
        fh = _mix64(np.asarray(fp, dtype=np.uint64))
        return (np.asarray(i, dtype=np.int64)
                ^ (fh & np.uint64(self.num_buckets - 1)).astype(np.int64))

    # -- queries ---------------------------------------------------------
    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        fp, i1 = self._fp_i1(keys)
        i2 = self._alt(i1, fp)
        hit = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        if self.stash:
            for j in np.flatnonzero(~hit):
                if ((int(i1[j]), int(fp[j])) in self.stash
                        or (int(i2[j]), int(fp[j])) in self.stash):
                    hit[j] = True
        return hit

    def add_batch(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        fp, i1 = self._fp_i1(keys)
        i2 = self._alt(i1, fp)
        present = ((self.table[i1] == fp[:, None]).any(axis=1)
                   | (self.table[i2] == fp[:, None]).any(axis=1))
        for j in np.flatnonzero(~present):
            self._insert(int(i1[j]), int(i2[j]), int(fp[j]))

    def _insert(self, i1: int, i2: int, fp: int) -> None:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        cur = i1
        for kick in range(self.max_kicks):
            slot = kick & 3  # deterministic rotation, no RNG
            fp, self.table[cur, slot] = int(self.table[cur, slot]), fp
            cur = int(self._alt(cur, np.uint16(fp)))
            row = self.table[cur]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        self.stash.add((cur, fp))  # bounded overflow, never drop a key

    def delete_batch(self, keys: np.ndarray) -> np.ndarray:
        """Remove one stored fingerprint per present key; returns the
        removed-mask. (The bloom filter has no equivalent.)"""
        keys = np.asarray(keys, dtype=np.uint64)
        fp, i1 = self._fp_i1(keys)
        i2 = self._alt(i1, fp)
        removed = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):
            f = int(fp[j])
            done = False
            for i in (int(i1[j]), int(i2[j])):
                slots = np.flatnonzero(self.table[i] == f)
                if len(slots):
                    self.table[i, slots[0]] = 0
                    done = True
                    break
            if not done:
                for i in (int(i1[j]), int(i2[j])):
                    if (i, f) in self.stash:
                        self.stash.discard((i, f))
                        done = True
                        break
            removed[j] = done
        return removed

    def occupancy(self) -> float:
        return float((self.table != 0).mean())

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        stash = np.array(sorted(self.stash), dtype=np.int64).reshape(-1, 2)
        np.savez_compressed(buf, table=self.table, stash=stash,
                            meta=np.array([self.num_buckets,
                                           self.max_kicks]))
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        with np.load(io.BytesIO(data)) as z:
            num_buckets, max_kicks = (int(v) for v in z["meta"])
            cf = cls(num_buckets, max_kicks)
            cf.table[:] = z["table"]
            cf.stash = {(int(a), int(b)) for a, b in z["stash"]}
        return cf


def membership_filter_from_bytes(data: bytes):
    """Restore whichever membership filter a checkpoint holds (the npz
    key set distinguishes bloom's ``words`` from cuckoo's ``table``)."""
    with np.load(io.BytesIO(data)) as z:
        kind = "cuckoo" if "table" in z.files else "bloom"
    return (CuckooFilter if kind == "cuckoo" else BloomFilter) \
        .from_bytes(data)


class UrlSeenShard:
    """One shard of the URL-seen / states table.

    ``exact=True`` (default) keeps a full fp->state dict — required for
    exact dedup parity with the reference States semantics. With
    ``exact=False`` an approximate MEMBERSHIP filter + dict overlay is
    used; the overlay is truncated at ``overlay_limit`` after each
    checkpoint flush (states degrade to "seen", which is all the crawl
    loop needs at scale). ``filter_kind`` picks the filter: ``'bloom'``
    (default; smallest per-key footprint) or ``'cuckoo'`` (supports
    delete_batch — revisit/expiry un-marking — at the same memory via
    ``bloom_bits/8`` bytes of 4-slot uint16 buckets). The ``bloom``
    attribute name is kept for both kinds (duck-typed)."""

    def __init__(self, shard_id: int = 0, exact: bool = True,
                 bloom_bits: int = 1 << 24, overlay_limit: int = 3_000_000,
                 filter_kind: str = "bloom"):
        self.shard_id = shard_id
        self.exact = exact
        self.filter_kind = filter_kind
        self.states: dict[int, int] = {}
        if exact:
            self.bloom = None
        elif filter_kind == "bloom":
            self.bloom = BloomFilter(bloom_bits)
        elif filter_kind == "cuckoo":
            # same memory budget as the bloom: bits/8 bytes = bits/64
            # buckets of 8 bytes (4 x uint16); next power of two down
            nb = 1 << max(10, (int(bloom_bits) >> 6).bit_length() - 1)
            self.bloom = CuckooFilter(nb)
        else:
            raise ValueError(f"unknown filter_kind {filter_kind!r}")
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

    def unmark(self, fps) -> np.ndarray:
        """Remove fingerprints from the seen set so they can be
        scheduled again (revisit / expiry / retract) — the operation
        the CUCKOO filter exists for (reference frontera re-schedules
        revisits by writing a future crawl_at; un-marking the States
        entry is the equivalent for engines that gate on the seen set).
        Exact mode deletes dict entries; cuckoo mode deletes filter
        fingerprints + the overlay; bloom mode raises (a bloom filter
        cannot delete — configure filter_kind='cuckoo' for
        revisit-heavy crawls). Returns the removed-mask."""
        fps = np.asarray(fps, dtype=np.uint64)
        if self.exact:
            removed = np.zeros(len(fps), dtype=bool)
            for i, fp in enumerate(fps):
                removed[i] = self.states.pop(int(fp), None) is not None
            self.n_seen -= int(removed.sum())
            return removed
        if isinstance(self.bloom, CuckooFilter):
            removed = self.bloom.delete_batch(fps)
            for fp in fps[removed]:
                self.states.pop(int(fp), None)
            self.n_seen -= int(removed.sum())
            return removed
        raise TypeError(
            "unmark requires exact states or filter_kind='cuckoo' — "
            "a bloom filter cannot delete")

    # -- States-contract operations -----------------------------------------
    def mark_crawled(self, fps) -> None:
        """page_crawled marks that must NOT overwrite ERROR: the
        streaming round marks popped pages CRAWLED optimistically in
        parallel with the fetch wave, so a request_error mark for the
        same fingerprint can arrive in either order. Both paths
        serialize on this shard, and ERROR wins regardless of arrival
        (reference strategy-worker semantics: request_error -> states
        ERROR, worker/strategy.py)."""
        states = self.states
        keep = [fp for fp in fps
                if states.get(int(fp)) != int(States.ERROR)]
        if keep:
            self.set_states(np.asarray(keep, dtype=np.uint64),
                            np.full(len(keep), States.CRAWLED,
                                    dtype=np.int8))

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
    def checkpoint(self, directory: str, fs=None) -> None:
        """Persist this shard's state under ``directory``. ``fs`` (a
        ``pyarrow.fs.FileSystem``) routes the write through shared
        storage — REQUIRED on a multi-node cluster, where this method
        runs on the actor's node and a plain path would land on that
        node's local disk, invisible to a restore elsewhere."""
        fps = np.fromiter(self.states.keys(), dtype=np.uint64, count=len(self.states))
        vals = np.fromiter(self.states.values(), dtype=np.int8, count=len(self.states))
        t = pa.table({"fingerprint": fps, "state": vals})
        if fs is None:
            d = Path(directory)
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(t, d / f"states-{self.shard_id:04d}.parquet")
            if self.bloom is not None:
                (d / f"bloom-{self.shard_id:04d}.npz").write_bytes(
                    self.bloom.to_bytes())
            return
        fs.create_dir(directory, recursive=True)
        pq.write_table(t, f"{directory}/states-{self.shard_id:04d}.parquet",
                       filesystem=fs)
        if self.bloom is not None:
            with fs.open_output_stream(
                    f"{directory}/bloom-{self.shard_id:04d}.npz") as f:
                f.write(self.bloom.to_bytes())

    @classmethod
    def restore(cls, directory: str, shard_id: int, exact: bool = True,
                bloom_bits: int = 1 << 24,
                filter_kind: str = "bloom", fs=None) -> "UrlSeenShard":
        shard = cls(shard_id, exact=exact, bloom_bits=bloom_bits,
                    filter_kind=filter_kind)
        t = pq.read_table(f"{directory}/states-{shard_id:04d}.parquet",
                          filesystem=fs)
        fps = t["fingerprint"].to_numpy()
        vals = t["state"].to_numpy()
        shard.states = {int(f): int(v) for f, v in zip(fps, vals)}
        if fs is None:
            bloom_path = Path(directory) / f"bloom-{shard_id:04d}.npz"
            bloom_bytes = (bloom_path.read_bytes()
                           if bloom_path.exists() else None)
        else:
            from pyarrow import fs as _pafs

            p = f"{directory}/bloom-{shard_id:04d}.npz"
            info = fs.get_file_info(p)
            bloom_bytes = (fs.open_input_stream(p).read()
                           if info.type == _pafs.FileType.File else None)
        if not exact and bloom_bytes is not None:
            # the checkpoint, not the argument, decides the kind
            shard.bloom = membership_filter_from_bytes(bloom_bytes)
            shard.filter_kind = ("cuckoo" if isinstance(shard.bloom,
                                                        CuckooFilter)
                                 else "bloom")
        shard.n_seen = len(shard.states)
        return shard
