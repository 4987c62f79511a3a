"""Deterministic (hash-based) sampling stages for training-data
pipelines.

Random sampling at 100-TB scale must be reproducible and
driver-free: the keep/drop decision is a pure function of the row's
id (md5 of its decimal string, top 32 bits), so re-runs, retried
tasks and incremental reprocessing all agree without any shared RNG
state, and the rate can differ per stratum (e.g. keep 50% of English
documents but 10% of everything else). Everything runs as a
map_batches filter — no shuffle, no materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_U32 = 1 << 32


def hash_u32(ids, salt: str = "") -> np.ndarray:
    """Top 32 bits of md5(salt + str(id)) per id, as uint64.

    Matches the SQL twin ('0x' || substr(md5(id::VARCHAR), 1, 8)) so a
    DuckDB oracle reproduces the exact sample."""
    return np.fromiter(
        (int(hashlib.md5((salt + str(i)).encode("utf8")).hexdigest()[:8], 16)
         for i in ids),
        dtype=np.uint64, count=len(ids))


def stratified_hash_sample(ds, id_col: str, strata_col: str | None = None,
                           rates: dict | None = None,
                           default_rate: float = 0.1, salt: str = ""):
    """Deterministic Bernoulli sample: keep a row iff
    hash_u32(id) < rate * 2^32, with the rate chosen by the row's
    stratum (``rates[stratum]``, else ``default_rate``). With
    ``strata_col=None`` every row uses ``default_rate`` (plain hash
    sample). Streaming filter — rate thresholds are plain Python ints
    captured in the closure."""
    rates = rates or {}
    thresholds = {s: int(r * _U32) for s, r in rates.items()}
    default_thr = int(default_rate * _U32)

    def keep(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col].to_pylist(), salt)
        if strata_col is None:
            thr = np.full(len(batch), default_thr, dtype=np.uint64)
        else:
            strata = np.asarray(batch[strata_col].to_pylist(), dtype=object)
            thr = np.full(len(batch), default_thr, dtype=np.uint64)
            for s, t in thresholds.items():
                thr[strata == s] = t
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, id_col: str, splits: dict[str, float], salt: str = ""):
    """Deterministic named-fraction split (train/val/test): appends a
    ``split`` column chosen by where the row's hash_u32 falls in the
    cumulative fraction ladder of ``splits`` (insertion order;
    fractions must sum to 1). Pure function of the id — every worker,
    retry and later incremental run assigns the same row to the same
    split with no shuffle and no shared RNG, which is what makes
    held-out sets stable across 100-TB reprocessing runs. SQL twin:
    CASE over ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT."""
    names = list(splits)
    fracs = np.array([splits[n] for n in names], dtype=np.float64)
    assert abs(fracs.sum() - 1.0) < 1e-9, "split fractions must sum to 1"
    # right-open cut points in hash space; last cut pinned to 2^32
    cuts = np.minimum(np.round(np.cumsum(fracs) * _U32), _U32).astype(
        np.uint64)
    labels = np.asarray(names, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col].to_pylist(), salt)
        idx = np.searchsorted(cuts, h, side="right")
        return batch.append_column(
            "split", pa.array(labels[idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def greedy_pack(buckets: np.ndarray, ids: np.ndarray, ws: np.ndarray,
                budget: int) -> np.ndarray:
    """Pure greedy packing kernel: scan each bucket's rows in id order,
    opening a new pack when the running weight would exceed ``budget``
    (a row heavier than ``budget`` keeps a pack of its own). Returns
    pack_id = bucket << 20 | local_pack per input row (input order
    preserved). Sequential by definition — each decision depends on
    the running total — so parallelism lives at the bucket level."""
    order = np.lexsort((ids, buckets))
    pack_ids = np.empty(len(ids), dtype=np.int64)
    cur_bucket, acc, local = None, 0, 0
    for pos in order:
        b, w = int(buckets[pos]), int(ws[pos])
        if b != cur_bucket:
            cur_bucket, acc, local = b, 0, 0
        if acc > 0 and acc + w > budget:
            local += 1
            acc = 0
        acc += w
        pack_ids[pos] = (b << 20) | local
    return pack_ids


def pack_sequences(ds, id_col: str, weight_col: str, budget: int,
                   bucket_size: int = 64, exchange: str | None = None):
    """Greedy sequence packing: group rows (documents) into packs whose
    total ``weight_col`` (token count) stays <= ``budget`` — the
    pre-training batch-shaping step that turns ragged documents into
    near-full context windows. Rows are bucketed by ``id // bucket_size``
    and packed greedily in id order within each bucket, so the
    assignment is a pure function of (id, weight) — independent of
    block structure, retries and parallelism — and buckets pack in
    parallel across the cluster with one keyed exchange. A row heavier
    than ``budget`` gets a pack of its own (never dropped). Emits
    (pack_id = bucket * 2^20 + local_pack, id, weight).

    The greedy scan inside a bucket is inherently sequential (each
    decision depends on the running total), so it is a bounded Python
    loop over the bucket's rows — parallelism comes from the bucket
    fan-out, exactly like the reference's per-partition batchers."""
    from .relational import keyed_exchange

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        return pa.table({
            "_bucket": pa.array(ids // bucket_size, pa.int64()),
            id_col: batch[id_col],
            weight_col: batch[weight_col],
        })

    def pack_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"pack_id": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          weight_col: pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        pack_ids = greedy_pack(batch["_bucket"].to_numpy(),
                               batch[id_col].to_numpy(),
                               batch[weight_col].to_numpy(), budget)
        return pa.table({"pack_id": pa.array(pack_ids, pa.int64()),
                         id_col: batch[id_col],
                         weight_col: batch[weight_col]})

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return keyed_exchange(keyed, "_bucket", pack_block, exchange)


def weighted_hash_sample(ds, id_col: str, weight_col: str,
                         weight_cap: int, salt: str = ""):
    """Importance-WEIGHTED deterministic Bernoulli sample: keep a row
    with probability min(weight, cap)/cap, decided as the integer
    comparison hash_u32(id) * cap < min(weight, cap) * 2^32 — the
    quality-proportional downsampling step (CCNet-style: high-scoring
    docs survive, low-scoring docs thin out proportionally) with no
    RNG state: retries, re-runs and incremental batches agree, and the
    exact cross-multiplied integers make the SQL twin reproduce the
    sample bit for bit. Streaming filter, no shuffle."""
    cap = int(weight_cap)

    def keep(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col].to_pylist(), salt).astype(np.int64)
        w = np.minimum(
            batch[weight_col].to_numpy(zero_copy_only=False).astype(
                np.int64), cap)
        return batch.filter(pa.array(h * cap < w * _U32))

    return ds.map_batches(keep, batch_format="pyarrow")


def unimax_epochs(ds, group_col: str, weight_col: str, budget: int,
                  max_epochs: int = 4) -> pa.Table:
    """UniMax training-mixture allocation (Chung et al. 2023, the
    public UniMax paper): split a global token ``budget`` across
    sources so every source gets an equal share EXCEPT that no source
    repeats more than ``max_epochs`` times — the standard fix for
    small-source over-repetition when mixing corpora.

    Walk sources by size ascending; each takes
    ``min(remaining // sources_left, max_epochs * tokens)`` and the
    leftover rolls forward to the larger sources. All-integer, so the
    whole operator (per-source sums + the allocation walk)
    oracle-checks against a recursive-CTE twin.

    Scale shape: the per-source token sums are a combiner aggregate
    (``relational.partial_groupby_agg`` — per-block partials, driver
    merge; the key space is the SOURCE list, bounded by construction);
    the walk itself is O(sources) on the driver.
    Returns (source, tokens, alloc, epochs_ppm) sorted by source."""
    from .relational import partial_groupby_agg

    rows = partial_groupby_agg(
        ds.select_columns([group_col, weight_col]), group_col,
        {"tok": (weight_col, "sum")})
    names = np.asarray(rows[group_col].to_numpy(), dtype=object)
    toks = rows["tok"].to_numpy().astype(np.int64)
    order = np.lexsort((names, toks))  # size asc, name tiebreak
    remaining = int(budget)
    n = len(order)
    alloc = np.zeros(n, np.int64)
    for i, j in enumerate(order):
        quota = remaining // (n - i)
        a = min(quota, max_epochs * int(toks[j]))
        alloc[j] = a
        remaining -= a
    out_order = np.argsort(names.astype(str), kind="stable")
    return pa.table({
        "source": pa.array(names[out_order].tolist(), pa.string()),
        "tokens": pa.array(toks[out_order], pa.int64()),
        "alloc": pa.array(alloc[out_order], pa.int64()),
        "epochs_ppm": pa.array(
            [(1_000_000 * int(a)) // int(t) if t else 0
             for a, t in zip(alloc[out_order], toks[out_order])],
            pa.int64())})
