"""Deduplication operators for training-data pipelines.

Exact dedup is a hash-partitioned groupby-first (the scalable pattern:
partition by content hash, first-wins per group — identical semantics to
the crawl engine's fingerprint dedup). Near-dup families:

- MinHash + LSH: word-shingle -> k minhash permutations -> banded
  buckets -> candidate pairs within buckets -> exact Jaccard verify.
- SimHash: 64-bit sketch; block-LSH (4 x 16-bit) candidate buckets ->
  Hamming verify.
- n-gram Jaccard: exact pairwise within candidate buckets (small-side);
  the UNBOUNDED-corpus exact path is ``jaccard_join_pairs`` (rarity-
  ordered prefix filtering, PPJoin-style, CMS-ranked).
- Edit distance <= 1: ``edit_distance_join_le1`` (SymSpell deletion-
  neighborhood buckets, exact early-out verify).
- Embedding cosine near-dup: see ann.cosine_neardup_pairs.

At 100 TB the only all-to-all exchanges are the bucket exchanges,
whose keys (band hashes / simhash blocks) are uniformly distributed by
construction — no skew. Both near-dup pipelines: one streaming sketch
pass, ONE keyed exchange that lands each LSH bucket whole in one block
(coarse-pkey sort groupby by default; ``exchange='hash'`` = key-hash
repartition for when the sort dominates), then a vectorized run-aware
verify kernel. Nothing corpus-sized ever lands on the driver; it only
touches the final pair list (the result) and, with
``prefilter=True`` (minhash), the collision-key broadcast set.

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

# per-worker gram-hash memo (md5 once per distinct gram; bounded)
_GRAM_HASH_CACHE: dict[str, int] = {}
_GRAM_HASH_CACHE_MAX = 2_000_000


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def word_shingles(text: str, k: int = 3, strict: bool = False) -> np.ndarray:
    """64-bit hashes of word k-grams (unique set). The gram hash is the
    top 64 bits of md5 (``text._token_hash64``) — SQL-expressible, so
    the full minhash pipeline is oracle-checkable in DuckDB. Default: a
    doc with fewer than k tokens contributes one whole-text gram
    (minhash-friendly — short docs stay comparable). ``strict=True``
    contributes nothing, matching windowed-gram SQL semantics (the
    ngram_jaccard oracle)."""
    from .text import _token_hash64

    toks = text.split()
    if len(toks) < k:
        grams = [] if strict or not toks else [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    cache = _GRAM_HASH_CACHE  # near-dup corpora repeat grams heavily
    if len(cache) > _GRAM_HASH_CACHE_MAX:
        cache.clear()
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = cache.get(g)
        if h is None:
            h = cache[g] = _token_hash64(g)
        out[i] = h
    return np.unique(out)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x+b) mod p over the shingle set."""
    if len(shingles) == 0:
        return np.full(len(a), np.uint64(_MERSENNE))
    # (P, S) universal hashes — vectorized
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHashStage:
    """map_batches stage: doc -> (doc_id, bucket_key) rows, one per band
    (bucket_key = band<<32 | crc32(band signature chunk)).

    num_perm=64, bands=16 x rows_per_band=4 targets Jaccard ~0.5+
    candidates (s-curve threshold ~ (1/16)^(1/4) ≈ 0.5).

    ``carry_shingles`` additionally ships each emitted row with the
    doc's shingle hash set (list<uint64>) so the downstream bucket
    groupby can verify exact Jaccard locally — no driver text lookup.
    ``hot_keys_ref`` (ray.put of an int64 array) filters emitted rows
    to collision buckets so shingles ship only for candidate docs."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 text_col: str = "text", carry_shingles: bool = False,
                 hot_keys_ref=None):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.carry_shingles = carry_shingles
        self._hot_ref = hot_keys_ref
        self._hot: np.ndarray | None = None

    def _hot_keys(self) -> np.ndarray | None:
        if self._hot_ref is None:
            return None
        if self._hot is None:
            import ray

            self._hot = (ray.get(self._hot_ref)
                         if isinstance(self._hot_ref, ray.ObjectRef)
                         else np.asarray(self._hot_ref, dtype=np.int64))
        return self._hot

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc_ids = batch["doc_id"].to_numpy()
        keys = np.empty(n * self.bands, dtype=np.int64)
        shingle_sets: list[np.ndarray] = []
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            shs = word_shingles(text, self.k)
            if self.carry_shingles:
                shingle_sets.append(shs)
            sig = minhash_signature(shs, self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                keys[i * self.bands + band] = (band << 32) | zlib.crc32(chunk.tobytes())
        rep_ids = np.repeat(doc_ids, self.bands)
        cols: dict = {"doc_id": pa.array(rep_ids, pa.int64()),
                      "bucket_key": pa.array(keys, pa.int64())}
        hot = self._hot_keys()
        mask = np.isin(keys, hot) if hot is not None else None
        if self.carry_shingles:
            # vectorized list<uint64> construction: values + offsets
            lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
            values = (np.concatenate(shingle_sets) if shingle_sets
                      else np.zeros(0, dtype=np.uint64))
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            per_doc = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(values, pa.uint64()))
            cols["shingles"] = per_doc.take(
                pa.array(np.repeat(np.arange(n), self.bands), pa.int64()))
        t = pa.table(cols)
        return t.filter(pa.array(mask)) if mask is not None else t


def _hot_bucket_keys(buckets_ds) -> np.ndarray:
    """Distributed collision-bucket detection: groupby(bucket_key).count,
    filter n>1 remotely, and only then collect — the driver sees one
    int64 per *colliding* bucket (candidate docs), never the corpus.

    Partitioning assumption (documented for 100-TB use): the number of
    collision buckets is proportional to the number of near-duplicate
    docs, which is the quantity the pipeline exists to find — if that
    set itself overwhelms one node, shard this broadcast by key range."""
    import ray

    counts = buckets_ds.groupby("bucket_key").count()

    def hot_only(batch: pa.Table) -> pa.Table:
        n = batch["count()"].to_numpy()
        return batch.select(["bucket_key"]).filter(pa.array(n > 1))

    parts = list(counts.map_batches(hot_only, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return pa.concat_tables(parts)["bucket_key"].to_numpy().astype(np.int64)


def jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# Verify-stage exchange sizing. Partition/aggregator counts are sized
# for the 32-CPU single-node test box; on a real cluster raise both
# (roughly: partitions ~ 2x total cores, aggregators ~ nodes) — each
# hash-shuffle aggregator is an actor, and oversubscribing them on one
# node thrashes (measured: 64 aggregators on 32 CPUs stalls for minutes,
# 8 finishes in ~1 s).
_NUM_VERIFY_PARTITIONS = 16
_MAX_SHUFFLE_AGGREGATORS = 8


def _enable_hash_shuffle(ds):
    """Key-based ``repartition(keys=...)`` requires the hash-shuffle
    strategy (Ray 2.49 defaults to sort shuffle). Each Dataset carries
    its own DataContext copy, so flipping it on the pipeline's final
    dataset scopes the override to this execution only. Aggregators are
    ACTORS — sized to the cluster so they never oversubscribe it (a
    starved aggregator wave stalls for minutes)."""
    import ray
    from ray.data.context import ShuffleStrategy

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.max_hash_shuffle_aggregators = max(
        1, min(_MAX_SHUFFLE_AGGREGATORS, cpus // 2))
    return ds



def _coarse_grouped(ds, kernel, partitions: int = _NUM_VERIFY_PARTITIONS):
    """Sort-based alternative to the hash exchange: bucket rows gain a
    coarse pkey (hash of bucket_key into ``partitions`` groups) and a
    groupby(pkey).map_groups feeds the same run-aware kernel — one
    kernel call per coarse partition, no hash-shuffle aggregator
    actors. Cheaper at bench scale; the hash exchange wins when the
    sort itself dominates (see keyed_exchange in stages/relational)."""
    def add_pkey(batch: pa.Table) -> pa.Table:
        k = batch["bucket_key"].to_numpy().astype(np.uint64)
        pk = ((k ^ (k >> np.uint64(32))) * np.uint64(0x9E3779B97F4A7C15)
              >> np.uint64(40)) % np.uint64(partitions)
        return batch.append_column(
            "pkey", pa.array(pk.astype(np.int64), pa.int64()))

    return ds.map_batches(add_pkey, batch_format="pyarrow").groupby(
        "pkey").map_groups(kernel, batch_format="pyarrow")


def _bucket_verify_exchange(ds, kernel, exchange: str | None):
    """Route bucket rows to the verify kernel through the chosen
    exchange ('groups' = coarse-pkey sort groupby, 'hash' = key-hash
    repartition, 'tasks' = the two-stage raw-task shuffle — no
    aggregator actors, the fastest at >=16 cpus; see
    relational.choose_exchange)."""
    if exchange is None:
        from .relational import choose_exchange

        exchange = choose_exchange("tasks")
    if exchange == "tasks":
        from .relational import task_exchange

        return task_exchange(ds, "bucket_key", kernel)
    if exchange == "hash":
        return _enable_hash_shuffle(ds.repartition(
            num_blocks=_NUM_VERIFY_PARTITIONS, keys=["bucket_key"],
        ).map_batches(kernel, batch_format="pyarrow", batch_size=None))
    if exchange == "groups":
        return _coarse_grouped(ds, kernel)
    raise ValueError(
        f"exchange must be 'groups', 'hash' or 'tasks', got {exchange!r}")


# Ray 2.49's hash-shuffle aggregators are actors; under CPU starvation
# (aggregator count ~ cluster cores, or an aggregator wave scheduled
# behind a long map stage) an execution can stall for tens of seconds
# to indefinitely (repro in COVERAGE.md §hash-exchange-stall). The
# guard below makes exchange='hash' safe to choose when it wins: if the
# hash execution hasn't produced its (result-sized) output within the
# timeout, the same lineage re-runs through the sort exchange and the
# wedged execution is abandoned (daemon thread; its tasks die with the
# session).
_HASH_EXCHANGE_TIMEOUT_S = 60.0


def _iter_parts(pairs_ds) -> list:
    return list(pairs_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None))


def collect_bucket_pairs(bucket_ds, kernel, exchange: str | None) -> list:
    """Execute the bucket->verify exchange and collect the pair parts
    (result-sized). 'hash' runs under the stall guard with a sort-
    exchange fallback; 'groups' executes directly."""
    if exchange != "hash":
        return _iter_parts(_bucket_verify_exchange(bucket_ds, kernel, exchange))
    import threading

    box: dict = {}

    def run():
        try:
            box["out"] = _iter_parts(
                _bucket_verify_exchange(bucket_ds, kernel, "hash"))
        except BaseException as exc:  # surfaced on the caller thread
            box["err"] = exc

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(_HASH_EXCHANGE_TIMEOUT_S)
    if t.is_alive():
        import logging

        logging.getLogger(__name__).warning(
            "hash-shuffle exchange stalled > %.0fs; re-running through "
            "the sort exchange (wedged execution abandoned)",
            _HASH_EXCHANGE_TIMEOUT_S)
        return _iter_parts(_bucket_verify_exchange(bucket_ds, kernel, "groups"))
    if "err" in box:
        raise box["err"]
    return box["out"]


def _bucket_runs(sorted_keys: np.ndarray):
    """(start, end) slices of equal-key runs with length > 1."""
    if len(sorted_keys) == 0:
        return
    bounds = np.flatnonzero(np.diff(sorted_keys)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sorted_keys)]))
    for s, e in zip(starts, ends):
        if e - s > 1:
            yield int(s), int(e)


def _verify_minhash_partition(group: pa.Table, threshold: float) -> pa.Table:
    """map_groups kernel over one hash partition of bucket rows: local
    sort by bucket_key -> per-collision-bucket exact Jaccard from the
    carried shingle sets. Only collision rows are ever converted to
    Python objects."""
    key = group["bucket_key"].to_numpy()
    order = np.argsort(key, kind="stable")
    key = key[order]
    ids = group["doc_id"].to_numpy()[order]
    shingles = group["shingles"].combine_chunks().take(pa.array(order))
    out: set[tuple] = set()
    for s, e in _bucket_runs(key):
        run_ids = ids[s:e]
        shs = shingles.slice(s, e - s).to_pylist()
        uniq = {}
        for i, d in enumerate(run_ids):
            uniq.setdefault(int(d), i)
        members = sorted(uniq)
        for i in range(len(members)):
            si = np.asarray(shs[uniq[members[i]]], dtype=np.uint64)
            for j in range(i + 1, len(members)):
                sj = np.asarray(shs[uniq[members[j]]], dtype=np.uint64)
                inter = int(np.intersect1d(si, sj, assume_unique=True).size)
                union = int(len(si) + len(sj) - inter)
                jv = inter / union if union else 1.0
                if jv >= threshold:
                    out.add((members[i], members[j], round(jv, 4),
                             inter, union))
    rows = sorted(out)
    return pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                     "b": pa.array([r[1] for r in rows], pa.int64()),
                     "jaccard": pa.array([r[2] for r in rows], pa.float64()),
                     "inter_size": pa.array([r[3] for r in rows], pa.int64()),
                     "union_size": pa.array([r[4] for r in rows], pa.int64())})


def _dedupe_pair_table(pairs: pa.Table, value_col: str | None = None) -> pa.Table:
    """Final result assembly: drop pairs re-found in multiple buckets,
    sort by (a, b), keep ALL value columns. Operates on the RESULT
    (near-dup pairs), which is small by construction — not on the
    corpus. ``value_col`` is unused (kept for caller compatibility)."""
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    if len(a) == 0:
        return pairs
    order = np.lexsort((b, a))
    sa, sb = a[order], b[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (np.diff(sa) != 0) | (np.diff(sb) != 0)
    return pairs.take(pa.array(order[keep]))


def minhash_neardup_pairs(ds, threshold: float = 0.6, shingle_k: int = 3,
                          text_lookup=None, num_perm: int = 64, bands: int = 16,
                          prefilter: bool = False, exchange: str | None = None):
    """Full MinHash-LSH pipeline over a documents Dataset, fully
    distributed — returns a pyarrow Table (a, b, jaccard >= threshold).

    Default path (one corpus pass, ONE all-to-all): sketch each doc
    into (doc_id, bucket_key, shingles) band rows inside map_batches
    (task-based, callable instance cached per worker), then hash-
    repartition by bucket_key into a fixed block count — each bucket
    lands whole in exactly one block, no sort — and verify exact
    Jaccard inside collision runs with a vectorized whole-block kernel.
    The driver only ever sees the final pair list (result-sized).

    ``prefilter=True`` adds a slim first pass that detects colliding
    bucket keys distributedly and broadcasts them (ray.put) so shingles
    are shipped only for candidate docs — worth it at scale when
    near-dups are rare and shuffle bytes dominate; the default wins
    when fixed shuffle/launch costs dominate (benchmark scale).
    ``text_lookup`` is accepted for backward compatibility and ignored.
    """
    import ray
    from functools import partial as _partial

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    hot_ref = None
    if prefilter:
        slim = ds.map_batches(
            MinHashStage(num_perm=num_perm, bands=bands, shingle_k=shingle_k),
            batch_format="pyarrow",
        )
        hot = _hot_bucket_keys(slim)
        if len(hot) == 0:
            return empty
        hot_ref = ray.put(hot)
    cand = ds.map_batches(
        MinHashStage(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                     carry_shingles=True, hot_keys_ref=hot_ref),
        batch_format="pyarrow",
    )
    # keyed exchange by bucket_key into a fixed block count: every
    # bucket lands whole in exactly one block, so the verify kernel
    # sees full groups per batch (batch_size=None = one batch per
    # block); hash mode runs under the stall guard
    parts = collect_bucket_pairs(
        cand, _partial(_verify_minhash_partition, threshold=threshold),
        exchange)
    if not parts:
        return empty
    return _dedupe_pair_table(pa.concat_tables(parts), "jaccard")


def ngram_jaccard_pairs(ds, limit_ids: int, shingle_k: int = 3,
                        threshold_pct: int = 50) -> pa.Table:
    """Exact n-gram Jaccard pairs over a bounded doc_id slice —
    integer-exact outputs (a, b, inter_size, union_size) with
    100*inter >= threshold_pct*union, SQL-oracle-checkable (grams are
    crc32-hashed here; Jaccard over hashed gram SETS equals Jaccard
    over the grams themselves).

    Distributed brute baseline, same shape as cosine_neardup_pairs:
    the slice's shingle sets are collected once (bounded by limit_ids),
    broadcast via ray.put, and each block emits only its qualifying
    pairs. Unbounded corpora use minhash_neardup_pairs."""
    import ray

    def mask(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() < limit_ids))

    base = ds.select_columns(["doc_id", "text"]).map_batches(
        mask, batch_format="pyarrow")
    parts = pa.concat_tables(
        list(base.iter_batches(batch_format="pyarrow", batch_size=None)))
    set_ids = parts["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(set_ids)
    set_ids = set_ids[order]
    set_shingles = [word_shingles(t, shingle_k, strict=True)
                    for t in np.asarray(parts["text"].to_pylist(),
                                        dtype=object)[order]]
    ref = ray.put((set_ids, set_shingles))
    cache: dict = {}

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "inter_size": pa.array([], pa.int64()),
                          "union_size": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        if "s" not in cache:
            cache["s"] = ray.get(ref)
        sids, sshingles = cache["s"]
        out = []
        for d, text in zip(batch["doc_id"].to_numpy(),
                           batch["text"].to_pylist()):
            sa = word_shingles(text, shingle_k, strict=True)
            for j, b_id in enumerate(sids):
                if b_id <= d:
                    continue
                inter = int(np.intersect1d(sa, sshingles[j],
                                           assume_unique=True).size)
                union = int(len(sa) + len(sshingles[j]) - inter)
                if 100 * inter >= threshold_pct * union and union:
                    out.append((int(d), int(b_id), inter, union))
        if not out:
            return empty
        a_, b_, i_, u_ = zip(*out)
        return pa.table({"a": pa.array(a_, pa.int64()),
                         "b": pa.array(b_, pa.int64()),
                         "inter_size": pa.array(i_, pa.int64()),
                         "union_size": pa.array(u_, pa.int64())})

    parts2 = list(base.map_batches(block_pairs, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "inter_size": pa.array([], pa.int64()),
                         "union_size": pa.array([], pa.int64())})
    out = pa.concat_tables(parts2)
    order = np.lexsort((out["b"].to_numpy(), out["a"].to_numpy()))
    return out.take(pa.array(order))


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
    simhash / cosine near-dup into a deduplicated keep-list).

    ``ids=None`` (the scale path) runs union-find over only the ids
    that appear in ``pairs`` — every id absent from the pair stream
    keeps itself by definition, so callers must never collect the
    corpus id column just to feed this. The returned dict is then
    pair-scoped; map it over the corpus with a broadcast lookup
    (see ``keeper_table`` / ``q_dedup_keepers``)."""
    pairs = [(int(a), int(b)) for a, b in pairs]
    if ids is None:
        ids = sorted({i for p in pairs for i in p})
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


def dedup_keepers_np(a: np.ndarray, b: np.ndarray) -> dict:
    """Vectorized twin of ``dedup_keepers(None, zip(a, b))`` for DENSE
    pair streams (e.g. the sink keep-list's representative graph, where
    near-identical sketch clusters emit 1e5-1e6 edges): min-label
    propagation with pointer jumping over index arrays — O(E) numpy
    work per round, O(log n) rounds — instead of a per-edge Python
    union-find walk (measured 1.5 s -> ~20 ms at 787k edges). Same
    result by construction: component keeper = component-min id (node
    values sort ascending in np.unique, so min index == min value)."""
    if len(a) == 0:
        return {}
    nodes, inv = np.unique(np.concatenate([np.asarray(a, np.int64),
                                           np.asarray(b, np.int64)]),
                           return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = label.copy()
        np.minimum.at(nxt, ia, label[ib])
        np.minimum.at(nxt, ib, label[ia])
        nxt = nxt[nxt]  # pointer jumping halves chain depth per round
        if np.array_equal(nxt, label):
            break
        label = nxt
    return {int(n): int(k) for n, k in zip(nodes, nodes[label])}


def keeper_table(ds, pair_table: pa.Table, id_col: str = "doc_id"):
    """Corpus-wide (doc_id, keeper_doc_id) keep-list as a streaming
    Dataset: union-find over only the ids in ``pair_table`` (result-
    sized), broadcast the pair-scoped mapping once (ray.put), then a
    vectorized searchsorted lookup per batch — ids absent from the
    pair stream keep themselves. The corpus never lands on the driver;
    the output is itself a Dataset (write it partitioned at scale)."""
    import ray

    keepers = dedup_keepers(None, zip(pair_table["a"].to_pylist(),
                                      pair_table["b"].to_pylist()))
    keys = np.fromiter(sorted(keepers), dtype=np.int64, count=len(keepers))
    vals = np.fromiter((keepers[int(k)] for k in keys), dtype=np.int64,
                       count=len(keys))
    map_ref = ray.put((keys, vals))
    cache: dict = {}

    def lookup(batch: pa.Table) -> pa.Table:
        if "m" not in cache:
            cache["m"] = ray.get(map_ref)
        keys_, vals_ = cache["m"]
        ids = batch[id_col].to_numpy().astype(np.int64)
        keeper = ids.copy()
        if len(keys_):
            pos = np.searchsorted(keys_, ids)
            pos_c = np.minimum(pos, len(keys_) - 1)
            hit = keys_[pos_c] == ids
            keeper[hit] = vals_[pos_c[hit]]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "keeper_doc_id": pa.array(keeper, pa.int64())})

    return ds.select_columns([id_col]).map_batches(
        lookup, batch_format="pyarrow")


def connected_components(pairs_ds, max_iters: int = 50,
                         exchange: str | None = None):
    """Fully distributed connected components over a pair Dataset
    (a, b): iterative min-label propagation. Every step is Dataset
    algebra — an equi-join of the edge list against the current labels
    plus a groupby-min — so the pair graph never single-threads
    through driver Python (the union-find in ``dedup_keepers`` walks
    every pair sequentially on the driver; fine for result-sized pair
    lists, a wall when the pair stream itself is huge). Labels only
    decrease, so the integer label sum is a monotone convergence
    witness; iterations needed = component diameter (near-dup clusters
    are shallow). Returns a (node, label) Dataset, label = component
    minimum — the keeper id.

    Two wedge/latency mitigations, both also the right shapes at scale:
    each pair BLOCK first collapses through a local union-find combiner
    (star edges — component diameter drops to ~2 regardless of chain
    length, so the global loop converges in a couple of rounds instead
    of diameter-many), and the convergence witness (the monotone label
    sum) is read off the already-materialized result-sized label blocks
    on the driver instead of spending an extra Aggregate execution per
    round (Ray 2.49 wedges occasionally on tiny repeated all-to-alls in
    small sessions — COVERAGE.md).

    Reference semantics: the same fixpoint as the recursive min-label
    SQL oracle (`_dedup_keepers_oracle`)."""
    import ray  # noqa: F401  (Dataset API only)

    from .relational import equi_join

    def local_star(batch: pa.Table) -> pa.Table:
        # block-local union-find combiner: emit (node, root) star edges,
        # symmetric so min-labels flow both ways in the global loop
        roots = dedup_keepers(None, zip(batch["a"].to_numpy(),
                                        batch["b"].to_numpy()))
        n = np.fromiter(roots, dtype=np.int64, count=len(roots))
        r = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
        return pa.table({
            "src": pa.array(np.concatenate([n, r]), pa.int64()),
            "dst": pa.array(np.concatenate([r, n]), pa.int64()),
        })

    edges = pairs_ds.map_batches(local_star,
                                 batch_format="pyarrow").materialize()
    if edges.count() == 0:
        import ray as _ray
        return _ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))

    def driver_sum(lbl_ds) -> int:
        # labels are pair-scoped (result-sized); summing the
        # materialized blocks driver-side avoids one all-to-all/round
        return sum(int(b["label"].to_numpy().sum()) for b in
                   lbl_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if len(b))

    def fold_min(batch: pa.Table, src_col: str, min_col: str) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        m = batch[min_col].to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(s, pa.int64()),
                         "label": pa.array(np.minimum(s, m), pa.int64())})

    # iteration 1 folded into init: label = min(self, neighbors)
    labels = edges.groupby("src").min("dst").map_batches(
        lambda b: fold_min(b, "src", "min(dst)"),
        batch_format="pyarrow").materialize()
    total = driver_sum(labels)

    for _ in range(max_iters):
        joined = equi_join(
            edges, labels.map_batches(
                lambda b: b.rename_columns(["src", "label"]),
                batch_format="pyarrow"),
            "src", ["dst"], ["label"], exchange=exchange)
        cand = joined.map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow").union(labels)
        # pin the label block count: union+groupby otherwise double the
        # block count every round (task overhead grows exponentially
        # with iteration depth); labels are result-sized so a fixed
        # small partition count is always right
        labels = cand.groupby("node").min("label").map_batches(
            lambda b: pa.table({"node": b["node"],
                                "label": b["min(label)"]}),
            batch_format="pyarrow").repartition(8).materialize()
        new_total = driver_sum(labels)
        if new_total == total:
            return labels
        total = new_total
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations")


def keeper_table_cc(ds, pair_table: pa.Table, id_col: str = "doc_id"):
    """``keeper_table`` with the pair-graph reduction running as
    distributed connected components instead of driver union-find —
    the scale path when the PAIR list itself is too large to walk
    sequentially. The converged (node, label) table is result-sized by
    construction, so broadcasting it for the corpus-wide lookup keeps
    the same contract as ``keeper_table``."""
    import ray

    labels = connected_components(ray.data.from_arrow(pair_table))
    lt = pa.concat_tables(list(labels.iter_batches(
        batch_format="pyarrow", batch_size=None))) if labels.count() \
        else pa.table({"node": pa.array([], pa.int64()),
                       "label": pa.array([], pa.int64())})
    nodes = lt["node"].to_numpy().astype(np.int64)
    labs = lt["label"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    keys, vals = nodes[order], labs[order]
    map_ref = ray.put((keys, vals))
    cache: dict = {}

    def lookup(batch: pa.Table) -> pa.Table:
        if "m" not in cache:
            cache["m"] = ray.get(map_ref)
        keys_, vals_ = cache["m"]
        ids = batch[id_col].to_numpy().astype(np.int64)
        keeper = ids.copy()
        if len(keys_):
            pos = np.searchsorted(keys_, ids)
            pos_c = np.minimum(pos, len(keys_) - 1)
            hit = keys_[pos_c] == ids
            keeper[hit] = vals_[pos_c[hit]]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "keeper_doc_id": pa.array(keeper, pa.int64())})

    return ds.select_columns([id_col]).map_batches(
        lookup, batch_format="pyarrow")


def _simhash_block_rows(batch: pa.Table, blocks: int) -> pa.Table:
    """(doc_id, simhash) -> one row per bit-block: (doc_id, simhash,
    bucket_key) where bucket_key = blk*2^48 + block code. 64 bits are
    split into ``blocks`` near-equal spans. Fully vectorized."""
    hu = batch["simhash"].to_numpy().astype(np.uint64)
    doc_ids = batch["doc_id"].to_numpy()
    base, rem = divmod(64, blocks)
    sizes = np.array([base + (1 if i < rem else 0) for i in range(blocks)])
    offs = np.concatenate(([0], np.cumsum(sizes[:-1])))
    tabs = []
    for blk in range(blocks):
        code = (hu >> np.uint64(offs[blk])) & np.uint64((1 << int(sizes[blk])) - 1)
        key = np.int64(blk) * np.int64(1 << 48) + code.astype(np.int64)
        tabs.append(pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": batch["simhash"],
            "bucket_key": pa.array(key, pa.int64()),
        }))
    return pa.concat_tables(tabs)



def _first_per_bucket_doc(key: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Indices keeping the FIRST arrival of each (bucket_key, doc_id)
    pair, in original row order — a doc re-ingested into the same
    bucket must contribute exactly one sketch, deterministically
    (parity with the old per-run np.unique suppression)."""
    pos = np.arange(len(key))
    s1 = np.lexsort((pos, ids, key))
    kk, ii = key[s1], ids[s1]
    dup = np.concatenate(([False], (kk[1:] == kk[:-1]) & (ii[1:] == ii[:-1])))
    return np.sort(s1[~dup])


def _run_pair_indices(starts: np.ndarray, ends: np.ndarray):
    """All within-run (i<j) index pairs, vectorized by run-size class:
    one triu template per distinct size, broadcast over that size's run
    starts — no per-run Python loop. Pathological mega-runs (every doc
    identical) still cost O(s^2) pairs, inherent to pair output."""
    sizes = ends - starts
    pi_parts, pj_parts = [], []
    for s in np.unique(sizes[sizes >= 2]):
        st = starts[sizes == s]
        iu, ju = np.triu_indices(int(s), k=1)
        pi_parts.append((st[:, None] + iu[None, :]).ravel())
        pj_parts.append((st[:, None] + ju[None, :]).ravel())
    if not pi_parts:
        return (np.zeros(0, dtype=np.int64),) * 2
    return np.concatenate(pi_parts), np.concatenate(pj_parts)


def _verify_simhash_partition(group: pa.Table, max_hamming: int) -> pa.Table:
    """Whole-block kernel over one hash partition of simhash block
    rows: local sort by bucket_key, fully vectorized pair generation +
    Hamming verify + in-partition dedupe (no per-run Python loop)."""
    from .text import hamming64

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    key = group["bucket_key"].to_numpy()
    if len(key) == 0:
        return empty
    group = group.take(pa.array(_first_per_bucket_doc(
        key, group["doc_id"].to_numpy())))
    key = group["bucket_key"].to_numpy()
    order = np.argsort(key, kind="stable")
    key = key[order]
    ids = group["doc_id"].to_numpy()[order]
    hs = group["simhash"].to_numpy()[order].astype(np.uint64)
    new_run = np.concatenate(([True], key[1:] != key[:-1]))
    starts = np.flatnonzero(new_run)
    ends = np.concatenate((starts[1:], [len(key)]))
    pi, pj = _run_pair_indices(starts, ends)
    if not len(pi):
        return empty
    a, b = ids[pi], ids[pj]
    d = hamming64(hs[pi], hs[pj])
    m = (d <= max_hamming) & (a != b)
    a, b, d = a[m], b[m], d[m].astype(np.int32)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    order2 = np.lexsort((hi, lo))
    lo, hi, d = lo[order2], hi[order2], d[order2]
    keep = np.ones(len(lo), dtype=bool)
    keep[1:] = (np.diff(lo) != 0) | (np.diff(hi) != 0)
    return pa.table({"a": pa.array(lo[keep], pa.int64()),
                     "b": pa.array(hi[keep], pa.int64()),
                     "hamming": pa.array(d[keep], pa.int32())})


def hamming64_neardup_pairs(sketch_ds, max_hamming: int = 3,
                            blocks: int | None = None,
                            exchange: str | None = None) -> pa.Table:
    """Near-dup pairs for ANY 64-bit sketch column (simhash, phash, any
    fingerprint), fully distributed: bit-block LSH then Hamming verify —
    one corpus pass, one all-to-all (the coarse-partition groupby; see
    minhash_neardup_pairs for the pattern). Sketch rows are 16 B/doc so
    no prefilter pass is ever worth it here.

    Input contract: columns ``doc_id`` (int64, distinct per item) and
    ``simhash`` (the 64-bit sketch's bit pattern, two's-complement
    int64).

    Exact recall needs blocks >= max_hamming+1 (pigeonhole: d differing
    bits can touch at most d blocks, leaving one block identical).
    Default blocks = max(4, max_hamming+1), asserted."""
    from functools import partial as _partial

    if blocks is None:
        blocks = max(4, max_hamming + 1)
    assert blocks >= max_hamming + 1, (
        f"blocks={blocks} cannot give exact recall at hamming {max_hamming}")
    block_rows = sketch_ds.map_batches(
        _partial(_simhash_block_rows, blocks=blocks), batch_format="pyarrow")
    parts = collect_bucket_pairs(
        block_rows, _partial(_verify_simhash_partition,
                             max_hamming=max_hamming), exchange)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    if not parts:
        return empty
    return _dedupe_pair_table(pa.concat_tables(parts), "hamming")


def simhash_neardup_pairs(ds, max_hamming: int = 3, blocks: int | None = None,
                          exchange: str | None = None):
    """SimHash near-dup over documents: the batch simhash sketch stage
    feeding the shared 64-bit Hamming LSH exchange."""
    from .text import simhash_table

    return hamming64_neardup_pairs(
        ds.map_batches(simhash_table, batch_format="pyarrow"),
        max_hamming=max_hamming, blocks=blocks, exchange=exchange)


# ---------------------------------------------------------------------------
# Prefix-filtered EXACT set-similarity join (the unbounded scale path
# that ngram_jaccard_pairs' bounded-slice brute force routes to)
# ---------------------------------------------------------------------------

def _gram_table(batch: pa.Table, id_col: str, text_col: str,
                shingle_k: int) -> tuple:
    """Per-doc distinct gram-hash arrays for one batch: (ids int64[],
    sizes int64[], flat uint64[] concatenated doc-major). Docs with no
    grams (< k tokens, strict windowed semantics) are dropped — they
    cannot pair, matching the SQL oracle."""
    ids = batch[id_col].to_numpy()
    texts = batch[text_col].to_pylist()
    glists = [word_shingles(t, shingle_k, strict=True) for t in texts]
    sizes = np.fromiter((len(g) for g in glists), np.int64, len(glists))
    keep = sizes > 0
    ids, sizes = ids[keep], sizes[keep]
    glists = [g for g, k in zip(glists, keep) if k]
    flat = np.concatenate(glists) if glists else np.empty(0, np.uint64)
    return ids, sizes, flat


def _collision_gram_df(ds, id_col: str, text_col: str, shingle_k: int,
                       exchange: str):
    """Distributed document frequency of COLLIDING grams only (df >= 2;
    df == 1 grams stay implicit — a unique gram can't generate a
    candidate, and rarity-rank treats 'absent' as rank-best). One
    explode pass + one groupby(gram) count; the driver receives two
    sorted arrays bounded by the collision-gram count, not the gram
    universe. At 100-TB scale substitute a hash-sampled df (any
    CONSISTENT total order keeps the prefix filter exact — rarity
    order only improves pruning)."""

    def explode(batch: pa.Table) -> pa.Table:
        _, _, flat = _gram_table(batch, id_col, text_col, shingle_k)
        # distinct per doc already (word_shingles returns unique sets);
        # int64 bit-view: Ray's groupby round-trips values through
        # Python ints, and raw uint64 hashes overflow C long
        return pa.table({"gram": pa.array(flat.view(np.int64),
                                          pa.int64())})

    agg = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("gram").count()
    keys, dfs = [], []
    for t in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t) == 0:
            continue
        c = t["count()"].to_numpy()
        m = c >= 2
        keys.append(t["gram"].to_numpy()[m])
        dfs.append(c[m].astype(np.int64))
    if not keys:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = np.concatenate(keys)
    d = np.concatenate(dfs)
    o = np.argsort(k)
    return k[o], d[o]


def _prefix_len(sizes: np.ndarray, t_num: int, t_den: int) -> np.ndarray:
    """PPJoin prefix length p = n - ceil(tau*n) + 1, exact rational
    arithmetic: ceil(num*n/den) = (num*n + den - 1) // den."""
    return sizes - (t_num * sizes + t_den - 1) // t_den + 1


def _bucket_candidate_pairs(group: pa.Table, pair_mask) -> pa.Table:
    """Shared bucket->candidate kernel for the prefix-filter joins:
    sort one partition's (bucket_key, doc_id, n) rows, generate
    within-bucket i<j pairs (``_run_pair_indices``), apply the
    join-specific necessary condition ``pair_mask(a, b, na, nb)``,
    and dedup (a<b) pairs with a lexsort + consecutive-diff — NO
    packed-key arithmetic, so 64-bit ids are safe (lo*2^32+hi packing
    silently corrupts pairs once ids reach 2^32)."""
    key = group["bucket_key"].to_numpy()
    order = np.argsort(key, kind="stable")
    key = key[order]
    ids = group["doc_id"].to_numpy()[order]
    ns = group["n"].to_numpy()[order]
    bounds = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(key)]))
    pi, pj = _run_pair_indices(starts, ends)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if len(pi) == 0:
        return empty
    a, b = ids[pi], ids[pj]
    keep = pair_mask(a, b, ns[pi], ns[pj]) & (a != b)
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    if len(lo) == 0:
        return empty
    o = np.lexsort((hi, lo))
    lo, hi = lo[o], hi[o]
    uniq = np.ones(len(lo), dtype=bool)
    uniq[1:] = (np.diff(lo) != 0) | (np.diff(hi) != 0)
    return pa.table({"a": pa.array(lo[uniq], pa.int64()),
                     "b": pa.array(hi[uniq], pa.int64())})


# Count-Min Sketch over gram hashes for the rarity ordering: 4 rows x
# 2^18 int32 buckets = 4 MiB, independent of the gram universe. The
# bucket rows come from splitmix64 finalizers over salted gram hashes
# (grams are already 64-bit hashes — no re-hashing of strings).
_JCMS_D = 4
_JCMS_W = 1 << 18
_JCMS_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                        0x165667B19E3779F9, 0x27D4EB2F165667C5],
                       dtype=np.uint64)


def _jcms_buckets(grams_u64: np.ndarray) -> np.ndarray:
    """(d, n) int64 bucket indices, fully vectorized."""
    out = np.empty((_JCMS_D, len(grams_u64)), np.int64)
    for j in range(_JCMS_D):
        x = grams_u64 ^ _JCMS_SALTS[j]
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        out[j] = (x % np.uint64(_JCMS_W)).astype(np.int64)
    return out


def _gram_df_sketch(ds, id_col: str, text_col: str,
                    shingle_k: int) -> np.ndarray:
    """Document frequency as a merged Count-Min Sketch: one streaming
    pass, per-block register partials (d×w int32 = 4 MiB move per
    block, never the grams), driver sum — NO shuffle and no dependence
    on the gram-universe size, unlike the exact groupby path. The
    estimate only OVER-counts (collisions add), which can only demote
    a rare gram's rank: the prefix filter stays exact under any
    consistent order, so this costs pruning, never correctness."""

    def partial(batch: pa.Table) -> pa.Table:
        _, _, flat = _gram_table(batch, id_col, text_col, shingle_k)
        regs = np.zeros((_JCMS_D, _JCMS_W), np.int32)
        if len(flat):
            idx = _jcms_buckets(flat)
            for j in range(_JCMS_D):
                # per-block counts fit int32 (a block would need 2^31
                # gram instances to overflow); int32 halves the
                # register bytes this combine ships
                regs[j] = np.bincount(idx[j], minlength=_JCMS_W) \
                    .astype(np.int32)
        return pa.table({"r": pa.array(regs.ravel(), pa.int32())})

    regs = np.zeros(_JCMS_D * _JCMS_W, np.int64)  # driver sum widened
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        arr = t["r"].to_numpy()
        if len(arr):
            regs += arr.reshape(-1, _JCMS_D * _JCMS_W) \
                .astype(np.int64).sum(axis=0)
    return np.minimum(regs, np.iinfo(np.int32).max) \
        .reshape(_JCMS_D, _JCMS_W).astype(np.int32)


def jaccard_join_pairs(ds, t_num: int = 1, t_den: int = 2,
                       shingle_k: int = 5, id_col: str = "doc_id",
                       text_col: str = "text", exchange: str | None = None,
                       df_mode: str = "cms",
                       candidate_cap: int = 5_000_000) -> pa.Table:
    """EXACT word-k-gram Jaccard similarity join over the FULL corpus
    (threshold tau = t_num/t_den, checked as den*inter >= num*union in
    integers) via rarity-ordered PREFIX FILTERING — the published
    exact-set-similarity scale path (prefix filter as in PPJoin,
    Xiao et al., WWW'08; public algorithm), where the bounded-slice
    brute force of ``ngram_jaccard_pairs`` routes when the corpus is
    unbounded. Returns a pyarrow Table (a, b, inter_size, union_size).

    Pipeline (three streaming passes over documents, ONE all-to-all
    over SLIM rows):

    1. df pass — ``df_mode='cms'`` (default): a merged Count-Min
       Sketch of gram document frequencies (register combine, NO
       shuffle, 4 MiB regardless of gram universe — measured ~4x
       faster than the groupby at sf0.1); over-counts only demote a
       gram's rarity rank, so pruning may soften but the join stays
       exact. ``df_mode='exact'``: distributed groupby(gram) count,
       only COLLIDING grams (df >= 2) broadcast as two sorted arrays.
    2. prefix pass — each doc sorts its gram set by (df, gram) with
       absent-from-map = df 1 (rarest first) and emits only its first
       p = n - ceil(tau*n) + 1 grams as (bucket_key, doc_id, n) rows:
       any pair with J >= tau MUST collide inside both prefixes under
       a common total order. Rows are slim (24 bytes) — no gram-set
       payload rides the exchange (the lesson of the cosine-LSH
       payload amplification).
    3. bucket exchange — keyed on the gram; within-run i<j pairs,
       kept only if den*min(na,nb) >= num*max(na,nb) (a NECESSARY
       length condition for J >= tau), pack-deduped per partition.
       The driver sees the candidate pair list (prefix filtering makes
       it output-scale, asserted <= candidate_cap).
    4. verify — gram sets are fetched for CANDIDATE ids only (one
       filtered corpus pass, np.isin against the broadcast id set) and
       each deduped pair is checked with an exact sorted-set
       intersection. Integer-exact, so the whole join oracle-checks
       against the windowed-gram SQL twin.
    """
    import ray

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "inter_size": pa.array([], pa.int64()),
                      "union_size": pa.array([], pa.int64())})

    if df_mode == "cms":
        df_ref = ray.put(_gram_df_sketch(ds, id_col, text_col, shingle_k))
    elif df_mode == "exact":
        df_keys, df_vals = _collision_gram_df(ds, id_col, text_col,
                                              shingle_k, exchange)
        if len(df_keys) == 0:
            return empty
        df_ref = ray.put((df_keys, df_vals))
    else:
        raise ValueError(f"df_mode must be 'cms' or 'exact', got {df_mode!r}")

    def emit_prefix(batch: pa.Table) -> pa.Table:
        ids, sizes, flat = _gram_table(batch, id_col, text_col, shingle_k)
        if len(ids) == 0:
            return pa.table({"bucket_key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        flat_i = flat.view(np.int64)  # consistent bit-view everywhere
        if df_mode == "cms":
            regs = ray.get(df_ref)
            idx = _jcms_buckets(flat)
            df = regs[0, idx[0]].astype(np.int64)
            for j in range(1, _JCMS_D):
                np.minimum(df, regs[j, idx[j]], out=df)
        else:
            keys, vals = ray.get(df_ref)
            pos = np.searchsorted(keys, flat_i)
            pos = np.clip(pos, 0, max(len(keys) - 1, 0))
            df = np.where(keys[pos] == flat_i, vals[pos], 1) \
                if len(keys) else np.ones(len(flat), np.int64)
        doc_idx = np.repeat(np.arange(len(ids)), sizes)
        order = np.lexsort((flat_i, df, doc_idx))
        di = doc_idx[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(di)) + 1))
        run_id = np.cumsum(np.concatenate(
            ([True], di[1:] != di[:-1]))) - 1
        rank = np.arange(len(di)) - starts[run_id]
        keep = rank < _prefix_len(sizes, t_num, t_den)[di]
        return pa.table({
            "bucket_key": pa.array(flat_i[order][keep], pa.int64()),
            "doc_id": pa.array(ids[di[keep]], pa.int64()),
            "n": pa.array(sizes[di[keep]], pa.int64()),
        })

    def candidate_kernel(group: pa.Table) -> pa.Table:
        # necessary length condition for J >= tau
        return _bucket_candidate_pairs(
            group, lambda a, b, na, nb:
            t_den * np.minimum(na, nb) >= t_num * np.maximum(na, nb))

    bucket_rows = ds.map_batches(emit_prefix, batch_format="pyarrow")
    parts = collect_bucket_pairs(bucket_rows, candidate_kernel, exchange)
    parts = [p for p in parts if len(p)]
    if not parts:
        return empty
    pairs = _dedupe_pair_table(pa.concat_tables(parts))
    assert len(pairs) <= candidate_cap, (
        f"candidate pairs {len(pairs)} exceed cap {candidate_cap}: "
        "threshold too low / corpus too self-similar for the prefix "
        "filter — raise the threshold or route to minhash")
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    cand_ids = np.unique(np.concatenate((a, b)))
    ids_ref = ray.put(cand_ids)

    def fetch_grams(batch: pa.Table) -> pa.Table:
        ids, sizes, flat = _gram_table(batch, id_col, text_col, shingle_k)
        want = np.isin(ids, ray.get(ids_ref))
        if not want.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "grams": pa.array([], pa.list_(pa.uint64()))})
        offs = np.concatenate(([0], np.cumsum(sizes)))
        sel = np.flatnonzero(want)
        return pa.table({
            "doc_id": pa.array(ids[sel], pa.int64()),
            "grams": pa.array(
                [flat[offs[i]:offs[i + 1]] for i in sel],
                pa.list_(pa.uint64())),
        })

    gram_map: dict[int, np.ndarray] = {}
    for t in ds.map_batches(fetch_grams, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for did, g in zip(t["doc_id"].to_numpy(), t["grams"].to_pylist()):
            gram_map[int(did)] = np.asarray(g, dtype=np.uint64)

    rows = []
    for x, y in zip(a, b):
        gx, gy = gram_map[int(x)], gram_map[int(y)]
        inter = int(np.intersect1d(gx, gy, assume_unique=True).size)
        union = int(len(gx) + len(gy) - inter)
        if t_den * inter >= t_num * union:
            rows.append((int(x), int(y), inter, union))
    rows.sort()
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "inter_size": pa.array([r[2] for r in rows], pa.int64()),
        "union_size": pa.array([r[3] for r in rows], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Edit-distance (<=1) string similarity join via the deletion
# neighborhood (SymSpell-style candidate generation; public algorithm)
# ---------------------------------------------------------------------------

def _lev_le1(a: str, b: str) -> int:
    """Exact Levenshtein distance if <= 1, else 2 (early-out two-pointer
    check — O(len) instead of the DP table)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if la == lb:  # one substitution: suffixes after i must match
        return 1 if a[i + 1:] == b[i + 1:] else 2
    # one insertion into a: skip b[i]
    return 1 if a[i:] == b[i + 1:] else 2


def _deletion_variant_hashes(s: str) -> np.ndarray:
    """64-bit hashes of s and every single-char deletion of s (distinct).
    Two strings within Levenshtein distance 1 ALWAYS share a variant:
    equal -> s itself; one edit apart -> the deletion at the edit
    position coincides."""
    from .text import _token_hash64

    variants = {s}
    for i in range(len(s)):
        variants.add(s[:i] + s[i + 1:])
    return np.fromiter((_token_hash64(v) for v in variants),
                       np.uint64, len(variants))


def edit_distance_join_le1(ds, id_col: str = "doc_id",
                           string_col: str = "s",
                           exchange: str | None = None,
                           candidate_cap: int = 5_000_000) -> pa.Table:
    """EXACT Levenshtein-distance <= 1 self-join over a string column —
    the fuzzy-key matching primitive (near-identical titles, typo'd
    ids, OCR'd fields). Same scale shape as ``jaccard_join_pairs``:

    1. each row emits SLIM (variant_hash, id, len) rows for its
       deletion neighborhood (len(s)+1 variants of ~8+16 bytes; the
       strings themselves never ride the exchange);
    2. ONE keyed exchange on the variant hash; within-bucket i<j pairs
       with the |len_a - len_b| <= 1 necessary condition, pack-deduped;
    3. candidate pairs (output-scale, asserted) are verified with an
       exact early-out distance check against strings fetched for
       CANDIDATE ids only (one filtered corpus pass).

    Returns (a, b, dist) with dist in {0, 1}, sorted by (a, b).
    """
    import ray

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})

    def emit_variants(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        strs = batch[string_col].to_pylist()
        hs = [_deletion_variant_hashes(s) for s in strs]
        counts = np.fromiter((len(h) for h in hs), np.int64, len(hs))
        flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        lens = np.fromiter((len(s) for s in strs), np.int64, len(strs))
        return pa.table({
            "bucket_key": pa.array(flat.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            "n": pa.array(np.repeat(lens, counts), pa.int64()),
        })

    def candidate_kernel(group: pa.Table) -> pa.Table:
        # necessary condition: one edit changes length by at most 1
        return _bucket_candidate_pairs(
            group, lambda a, b, na, nb: np.abs(na - nb) <= 1)

    rows = ds.map_batches(emit_variants, batch_format="pyarrow")
    parts = [p for p in collect_bucket_pairs(rows, candidate_kernel,
                                             exchange) if len(p)]
    if not parts:
        return empty
    pairs = _dedupe_pair_table(pa.concat_tables(parts))
    assert len(pairs) <= candidate_cap, (
        f"candidate pairs {len(pairs)} exceed cap {candidate_cap}: "
        "key too uniform for the deletion neighborhood — lengthen the "
        "key or pre-bucket by an exact prefix")
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    cand_ids = np.unique(np.concatenate((a, b)))
    ids_ref = ray.put(cand_ids)

    def fetch_strings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        want = np.isin(ids, ray.get(ids_ref))
        return batch.filter(pa.array(want)).select([id_col, string_col])

    smap: dict[int, str] = {}
    for t in ds.map_batches(fetch_strings, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for did, s in zip(t[id_col].to_numpy(), t[string_col].to_pylist()):
            smap[int(did)] = s

    out = []
    for x, y in zip(a, b):
        d = _lev_le1(smap[int(x)], smap[int(y)])
        if d <= 1:
            out.append((int(x), int(y), d))
    out.sort()
    return pa.table({"a": pa.array([r[0] for r in out], pa.int64()),
                     "b": pa.array([r[1] for r in out], pa.int64()),
                     "dist": pa.array([r[2] for r in out], pa.int64())})


def winnow_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                     min_shared: int = 2, shingle_k: int = 3,
                     window: int = 4, exchange: str = "tasks",
                     max_bucket_docs: int = 1024):
    """Shared-region near-dup pairs from winnowing fingerprints
    (Schleimer et al., SIGMOD 2003): two documents pair when they share
    >= ``min_shared`` selected fingerprints — the plagiarism /
    boilerplate-overlap detector that catches LOCALLY duplicated
    passages MinHash's whole-document Jaccard dilutes away.

    Scale shape: per-block winnow explode to (doc_id, fp) rows
    (batch-vectorized: ``winnow_fingerprints_batch``), ONE keyed
    exchange on fp (default ``'tasks'`` — measured 0.31 s vs 0.99 s
    'groups' / 1.37 s 'hash' warm at sf0.1x32cpu, identical rows),
    vectorized within-run pair expansion (``_run_pair_indices`` — no
    per-bucket Python), loud guard on hot fingerprints (a fp shared by
    > ``max_bucket_docs`` docs is boilerplate; raise the floor or
    pre-filter). Pair-shared counting is a SECOND keyed exchange on
    ``a`` (identical (a,b) pairs co-locate under the smaller member;
    per-partition lexsort + run-count kernel applies ``min_shared``
    before anything ships) — the driver only ever concatenates the
    RESULT rows, so a skew of moderate buckets never lands the raw
    pair stream in one process. Returns a pandas DataFrame
    (a, b, shared) with a < b."""
    import pandas as pd

    from .relational import keyed_exchange
    from .text import winnow_table

    fps = ds.map_batches(
        lambda b: winnow_table(b, text_col, shingle_k, window),
        batch_format="pyarrow")

    def pair_kernel(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        fp = batch["fp"].to_numpy()
        ids = batch[id_col].to_numpy()
        order = np.lexsort((ids, fp))
        sf, si = fp[order], ids[order]
        new = np.concatenate(([True], sf[1:] != sf[:-1]))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(sf)]))
        if len(starts) and int((ends - starts).max()) > max_bucket_docs:
            raise AssertionError(
                f"winnow_dup_pairs: a fingerprint is shared by "
                f"{int((ends - starts).max())} docs (> {max_bucket_docs})"
                " — boilerplate fp; pre-filter or raise max_bucket_docs")
        ii, jj = _run_pair_indices(starts, ends)
        if len(ii) == 0:
            return empty
        return pa.table({
            "a": pa.array(np.minimum(si[ii], si[jj]), pa.int64()),
            "b": pa.array(np.maximum(si[ii], si[jj]), pa.int64())})

    def count_kernel(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "shared": pa.array([], pa.int64())})
        if len(batch) == 0 or "a" not in batch.column_names:
            return empty
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        new = np.concatenate(([True], (sa[1:] != sa[:-1])
                              | (sb[1:] != sb[:-1])))
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((starts, [len(sa)])))
        keep = counts >= min_shared
        return pa.table({
            "a": pa.array(sa[starts][keep], pa.int64()),
            "b": pa.array(sb[starts][keep], pa.int64()),
            "shared": pa.array(counts[keep], pa.int64())})

    pairs = keyed_exchange(fps, "fp", pair_kernel, exchange)
    counted = keyed_exchange(pairs, "a", count_kernel, exchange)
    parts = [t.to_pandas() for t in counted.iter_batches(
        batch_format="pyarrow", batch_size=None) if len(t)]
    if not parts:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "shared": pd.Series([], dtype="int64")})
    df = pd.concat(parts).astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def keeper_table_best(ds, pair_table: pa.Table, score_ds,
                      id_col: str = "doc_id", score_col: str = "score"):
    """``keeper_table`` with a QUALITY-AWARE keeper rule: within each
    near-dup component keep the member with the HIGHEST score
    (tiebreak: smallest id) instead of the smallest id — what a real
    training-data dedup pass does (keep the best copy, not the first;
    e.g. the longest / highest-quality near-duplicate).

    ``score_ds`` is a Dataset with (id_col, score_col) rows covering
    the corpus. Scale shape: components come from the pair-scoped
    union-find (result-sized); scores are fetched for PAIR MEMBERS ONLY
    via one broadcast-filter pass over ``score_ds`` (member-scale rows
    reach the driver, never the corpus); the final id→keeper map is
    broadcast once and applied as a vectorized streaming lookup, same
    contract as ``keeper_table``."""
    import ray

    comp = dedup_keepers(None, zip(pair_table["a"].to_pylist(),
                                   pair_table["b"].to_pylist()))
    if not comp:
        return ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({
                id_col: b[id_col].cast(pa.int64()),
                "keeper_doc_id": b[id_col].cast(pa.int64())}),
            batch_format="pyarrow")
    member_ids = np.fromiter(sorted(comp), dtype=np.int64, count=len(comp))
    members_ref = ray.put(member_ids)
    cache: dict = {}

    def member_scores(batch: pa.Table) -> pa.Table:
        if "m" not in cache:
            cache["m"] = ray.get(members_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        hit = np.isin(ids, cache["m"])
        return pa.table({
            id_col: pa.array(ids[hit], pa.int64()),
            score_col: batch[score_col].filter(pa.array(hit))})

    got = pa.concat_tables(list(
        score_ds.map_batches(member_scores, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    ids = got[id_col].to_numpy().astype(np.int64)
    scores = got[score_col].to_numpy(zero_copy_only=False)
    comps = np.fromiter((comp[int(i)] for i in ids), dtype=np.int64,
                        count=len(ids))
    # best member per component: (-score, id) ascending within comp runs
    order = np.lexsort((ids, -scores.astype(np.float64), comps))
    c_s = comps[order]
    first = np.concatenate(([True], c_s[1:] != c_s[:-1]))
    best = dict(zip(c_s[first].tolist(), ids[order][first].tolist()))

    keys = member_ids
    vals = np.fromiter((best[comp[int(i)]] for i in keys), dtype=np.int64,
                       count=len(keys))
    map_ref = ray.put((keys, vals))
    cache2: dict = {}

    def lookup(batch: pa.Table) -> pa.Table:
        if "m" not in cache2:
            cache2["m"] = ray.get(map_ref)
        keys_, vals_ = cache2["m"]
        bids = batch[id_col].to_numpy().astype(np.int64)
        keeper = bids.copy()
        pos = np.searchsorted(keys_, bids)
        pos_c = np.minimum(pos, len(keys_) - 1)
        hit = keys_[pos_c] == bids
        keeper[hit] = vals_[pos_c[hit]]
        return pa.table({id_col: pa.array(bids, pa.int64()),
                         "keeper_doc_id": pa.array(keeper, pa.int64())})

    return ds.select_columns([id_col]).map_batches(
        lookup, batch_format="pyarrow")


def containment_pairs(ds, limit_ids: int, shingle_k: int = 3,
                      threshold_pct: int = 80) -> pa.Table:
    """Exact ASYMMETRIC n-gram containment pairs over a bounded doc_id
    slice: ordered (a, b) with 100*|grams(a) ∩ grams(b)| >=
    ``threshold_pct``*|grams(a)| — the sub-document inclusion detector
    (quotes, boilerplate wrappers, doc-inside-doc) that symmetric
    Jaccard misses (a 100-gram doc fully contained in a 10,000-gram doc
    has Jaccard ~0.01 but containment 1.0; Broder 1997 distinguishes
    exactly these two resemblance measures).

    Same distributed-brute shape as ``ngram_jaccard_pairs``: the
    bounded slice's shingle sets broadcast once, each block emits only
    its qualifying ORDERED pairs (a from the block, any b != a).
    Integer-exact (a, b, inter_size, a_size); unbounded corpora route
    through minhash buckets first."""
    import ray

    def mask(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() < limit_ids))

    base = ds.select_columns(["doc_id", "text"]).map_batches(
        mask, batch_format="pyarrow")
    parts = pa.concat_tables(
        list(base.iter_batches(batch_format="pyarrow", batch_size=None)))
    set_ids = parts["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(set_ids)
    set_ids = set_ids[order]
    set_shingles = [word_shingles(t, shingle_k, strict=True)
                    for t in np.asarray(parts["text"].to_pylist(),
                                        dtype=object)[order]]
    ref = ray.put((set_ids, set_shingles))
    cache: dict = {}

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "inter_size": pa.array([], pa.int64()),
                      "a_size": pa.array([], pa.int64())})

    def block_pairs(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        if "s" not in cache:
            cache["s"] = ray.get(ref)
        sids, sshingles = cache["s"]
        out = []
        for d, text in zip(batch["doc_id"].to_numpy(),
                           batch["text"].to_pylist()):
            sa = word_shingles(text, shingle_k, strict=True)
            if not len(sa):
                continue
            for j, b_id in enumerate(sids):
                if b_id == d:
                    continue
                inter = int(np.intersect1d(sa, sshingles[j],
                                           assume_unique=True).size)
                if 100 * inter >= threshold_pct * len(sa):
                    out.append((int(d), int(b_id), inter, len(sa)))
        if not out:
            return empty
        a_, b_, i_, s_ = zip(*out)
        return pa.table({"a": pa.array(a_, pa.int64()),
                         "b": pa.array(b_, pa.int64()),
                         "inter_size": pa.array(i_, pa.int64()),
                         "a_size": pa.array(s_, pa.int64())})

    parts2 = list(base.map_batches(block_pairs, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts2:
        return empty
    out = pa.concat_tables(parts2)
    order = np.lexsort((out["b"].to_numpy(), out["a"].to_numpy()))
    return out.take(pa.array(order))


def minhash_band_rows(batch: pa.Table, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      text_col: str = "text") -> pa.Table:
    """Per-doc LSH band rows with the EXACT signature tuple as a
    decimal string key ('band:s_a:s_b:s_c:s_d') — the observability
    twin of the sketcher's crc32 bucket key (the stats path groups by
    the exact tuple so the bucket census is collision-free and
    SQL-twin-able; the pair path keeps the packed int64 key for the
    exchange). One row per (doc, band)."""
    a, b = _perm_params(num_perm)
    rpb = num_perm // bands
    n = len(batch)
    keys: list[str] = []
    bands_out = np.empty(n * bands, np.int64)
    for i, text in enumerate(batch[text_col].to_pylist()):
        sig = minhash_signature(word_shingles(text, shingle_k), a, b)
        for j in range(bands):
            chunk = sig[j * rpb:(j + 1) * rpb]
            keys.append(f"{j}:" + ":".join(str(int(x)) for x in chunk))
            bands_out[i * bands + j] = j
    return pa.table({
        "band": pa.array(bands_out, pa.int64()),
        "bkey": pa.array(keys, pa.string())})


def lsh_banding_eval(ds, limit_ids: int, threshold_pct: int = 50,
                     shingle_k: int = 3, num_perm: int = 64,
                     bands: int = 16) -> pa.Table:
    """Banding-quality evaluation over a bounded doc_id slice: exact
    candidate-pair precision and recall of the 16x4 minhash banding
    against ground-truth Jaccard >= ``threshold_pct``% — the
    measurement run before trusting an LSH configuration at corpus
    scale (the analytic 1-(1-s^r)^b curve, checked empirically).
    Integer-exact single-row output (n_true, n_cand, n_hit,
    precision_ppm, recall_ppm), so the whole evaluation — sketching,
    banding, verify — oracle-checks in SQL.

    Distributed-brute shape (``containment_pairs``): the slice's
    shingle sets + signatures broadcast once (bounded by
    ``limit_ids``), each block scores its docs against the upper
    triangle; the driver folds three counters."""
    import ray

    a_p, b_p = _perm_params(num_perm)
    rpb = num_perm // bands

    def mask(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() < limit_ids))

    base = ds.select_columns(["doc_id", "text"]).map_batches(
        mask, batch_format="pyarrow")
    parts = pa.concat_tables(
        list(base.iter_batches(batch_format="pyarrow", batch_size=None)))
    set_ids = parts["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(set_ids)
    set_ids = set_ids[order]
    texts = np.asarray(parts["text"].to_pylist(), dtype=object)[order]
    set_shingles = [word_shingles(t, shingle_k, strict=True)
                    for t in texts]
    set_sigs = np.stack([minhash_signature(s, a_p, b_p)
                         for s in set_shingles]) if len(set_ids) else \
        np.zeros((0, num_perm), np.uint64)
    ref = ray.put((set_ids, set_shingles, set_sigs))
    cache: dict = {}

    def block_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"t": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        if "s" not in cache:
            cache["s"] = ray.get(ref)
        sids, sshingles, ssigs = cache["s"]
        n_true = n_cand = n_hit = 0
        for d, text in zip(batch["doc_id"].to_numpy(),
                           batch["text"].to_pylist()):
            sa = word_shingles(text, shingle_k, strict=True)
            siga = minhash_signature(sa, a_p, b_p)
            for j, b_id in enumerate(sids):
                if b_id <= d:
                    continue
                # banding candidate: ANY band's rows all equal
                eq = siga == ssigs[j]
                cand = bool(eq.reshape(bands, rpb).all(axis=1).any())
                inter = int(np.intersect1d(sa, sshingles[j],
                                           assume_unique=True).size)
                union = int(len(sa) + len(sshingles[j]) - inter)
                true = bool(union and
                            100 * inter >= threshold_pct * union)
                n_true += true
                n_cand += cand
                n_hit += cand and true
        return pa.table({"t": pa.array([n_true], pa.int64()),
                         "c": pa.array([n_cand], pa.int64()),
                         "h": pa.array([n_hit], pa.int64())})

    tot = np.zeros(3, np.int64)
    for t in base.map_batches(block_counts, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            tot += np.array([int(t["t"].to_numpy().sum()),
                             int(t["c"].to_numpy().sum()),
                             int(t["h"].to_numpy().sum())], np.int64)
    n_true, n_cand, n_hit = (int(x) for x in tot)
    return pa.table({
        "n_true": pa.array([n_true], pa.int64()),
        "n_cand": pa.array([n_cand], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "precision_ppm": pa.array(
            [(1_000_000 * n_hit) // n_cand if n_cand else 0], pa.int64()),
        "recall_ppm": pa.array(
            [(1_000_000 * n_hit) // n_true if n_true else 0], pa.int64())})


def lsh_s_curve(ds, limit_ids: int, shingle_k: int = 3,
                num_perm: int = 64, bands: int = 16) -> pa.Table:
    """Empirical LSH S-curve over a bounded doc_id slice: for each
    Jaccard decile (pairs sharing >= 1 gram), the fraction of pairs the
    16x4 banding would propose as candidates — the measured version of
    the analytic 1-(1-s^r)^b collision curve, THE diagnostic for
    picking (bands, rows) before a corpus-scale run (`lsh_banding_eval`
    gives the single-threshold summary; this is the full curve).
    Integer-exact (bucket, n_pairs, n_cand, cand_ppm) so the whole
    measurement oracle-checks.

    Same distributed-brute shape as ``lsh_banding_eval``: slice
    shingles+signatures broadcast once, per-block decile counters, a
    20-register driver fold."""
    import ray

    a_p, b_p = _perm_params(num_perm)
    rpb = num_perm // bands

    def mask(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() < limit_ids))

    base = ds.select_columns(["doc_id", "text"]).map_batches(
        mask, batch_format="pyarrow")
    parts = pa.concat_tables(
        list(base.iter_batches(batch_format="pyarrow", batch_size=None)))
    set_ids = parts["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(set_ids)
    set_ids = set_ids[order]
    texts = np.asarray(parts["text"].to_pylist(), dtype=object)[order]
    set_shingles = [word_shingles(t, shingle_k, strict=True)
                    for t in texts]
    set_sigs = np.stack([minhash_signature(s, a_p, b_p)
                         for s in set_shingles]) if len(set_ids) else \
        np.zeros((0, num_perm), np.uint64)
    ref = ray.put((set_ids, set_shingles, set_sigs))
    cache: dict = {}

    def block_hist(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"reg": pa.array([], pa.int64())})
        if "s" not in cache:
            cache["s"] = ray.get(ref)
        sids, sshingles, ssigs = cache["s"]
        reg = np.zeros(20, np.int64)  # [pairs(10) ‖ cand(10)]
        for d, text in zip(batch["doc_id"].to_numpy(),
                           batch["text"].to_pylist()):
            sa = word_shingles(text, shingle_k, strict=True)
            siga = minhash_signature(sa, a_p, b_p)
            for j, b_id in enumerate(sids):
                if b_id <= d:
                    continue
                inter = int(np.intersect1d(sa, sshingles[j],
                                           assume_unique=True).size)
                if inter == 0:
                    continue  # curve over gram-sharing pairs only
                union = int(len(sa) + len(sshingles[j]) - inter)
                bucket = min(9, (10 * inter) // union)
                eq = siga == ssigs[j]
                cand = bool(eq.reshape(bands, rpb).all(axis=1).any())
                reg[bucket] += 1
                reg[10 + bucket] += cand
        return pa.table({"reg": pa.array(reg, pa.int64())})

    tot = np.zeros(20, np.int64)
    for t in base.map_batches(block_hist, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        reg = t["reg"].to_numpy()
        if len(reg):
            tot += reg.reshape(-1, 20).sum(axis=0)
    n_pairs, n_cand = tot[:10], tot[10:]
    keep = n_pairs > 0
    buckets = np.flatnonzero(keep)
    return pa.table({
        "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
        "n_pairs": pa.array(n_pairs[keep], pa.int64()),
        "n_cand": pa.array(n_cand[keep], pa.int64()),
        "cand_ppm": pa.array(
            (1_000_000 * n_cand[keep]) // n_pairs[keep], pa.int64())})
