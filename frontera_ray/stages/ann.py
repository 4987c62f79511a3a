"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is
  broadcast once (``ray.put``); each map_batches task computes a
  per-block partial top-k with one float64 matmul; the driver merges
  the tiny partials. No shuffle; scales linearly with corpus blocks.
- ``lsh_topk``: random-hyperplane LSH variant — buckets the corpus by
  sign bits, searches only matching/adjacent buckets (the scale path
  when the corpus no longer fits a full scan).
- ``cosine_neardup_pairs``: embedding near-dup pairs above a cosine
  threshold.

Determinism note: ranking uses round(sim, 9) with vec_id tie-break and
outputs round(sim, 4); with float64 accumulation this is hash-stable
against the DuckDB ``list_cosine_similarity(::DOUBLE[])`` oracle
(verified max diff ~2e-16).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


_QUERY_CACHE: dict[str, tuple] = {}


def _get_queries(query_ref):
    """Resolve + normalize the broadcast query matrix once per worker."""
    import ray

    if not isinstance(query_ref, ray.ObjectRef):
        qids, qmat = query_ref
        return qids, qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    key = query_ref.hex()
    if key not in _QUERY_CACHE:
        qids, qmat = ray.get(query_ref)
        _QUERY_CACHE[key] = (qids, qmat / np.linalg.norm(qmat, axis=1, keepdims=True))
    return _QUERY_CACHE[key]


def block_topk_batch(batch: pa.Table, query_ref, k: int) -> pa.Table:
    """map_batches kernel: per-block exact top-k against broadcast
    queries (task-based — no actor-pool CPU reservation, so upstream
    reads are never starved on small clusters)."""
    if len(batch) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    qids, qn = _get_queries(query_ref)
    emb = _matrix(batch)
    vec_ids = batch["vec_id"].to_numpy()
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (emb / norms) @ qn.T  # (B, Q)
    k = min(k, len(batch))
    # partial cut under the SAME total order as _merge_topk
    # (round(sim,9) desc, vec_id asc), at argpartition cost: O(B)
    # partition on the rounded sims finds the k-th boundary VALUE,
    # every row tied-or-above joins the candidate set, and only the
    # candidates pay the exact lexsort — a raw-float cut could drop
    # the vec_id-ascending winner of a rounding tie straddling the
    # boundary, and a full-column argsort would pay O(B log B) per
    # query on the hot scan path
    rs = np.round(sims, 9)
    out_q, out_v, out_s = [], [], []
    for qi, qid in enumerate(qids):
        col = rs[:, qi]
        part = np.argpartition(-col, k - 1)[:k]
        cand = np.flatnonzero(col >= col[part].min())
        rows = cand[np.lexsort((vec_ids[cand], -col[cand]))][:k]
        out_q.extend([qid] * len(rows))
        out_v.extend(vec_ids[rows])
        out_s.extend(sims[rows, qi])
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.asarray(out_v, dtype=np.int64), pa.int64()),
            "sim": pa.array(np.asarray(out_s, dtype=np.float64), pa.float64()),
        }
    )


def _merge_topk(partials: pa.Table, k: int) -> pa.Table:
    qs = partials["query_id"].to_numpy()
    vs = partials["vec_id"].to_numpy()
    ss = partials["sim"].to_numpy()
    out_q, out_v, out_s, out_r = [], [], [], []
    for qid in np.unique(qs):
        m = qs == qid
        # deterministic order: round(sim,9) desc, vec_id asc
        order = np.lexsort((vs[m], -np.round(ss[m], 9)))[:k]
        sel_v, sel_s = vs[m][order], ss[m][order]
        out_q.extend([qid] * len(order))
        out_v.extend(sel_v)
        out_s.extend(np.round(sel_s, 4))
        out_r.extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.asarray(out_v, np.int64), pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )


def _query_rows(ds, query_ids):
    """Fetch + sort the query vectors with a vectorized mask filter."""
    qset = set(int(q) for q in query_ids)

    def mask(batch: pa.Table) -> pa.Table:
        m = np.isin(batch["vec_id"].to_numpy(), list(qset))
        return batch.filter(pa.array(m))

    parts = pa.concat_tables(
        list(ds.map_batches(mask, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    order = np.argsort(parts["vec_id"].to_numpy())
    parts = parts.take(pa.array(order))
    qids = parts["vec_id"].to_pylist()
    qmat = _matrix(parts)
    return qids, qmat


def brute_force_topk(ds, query_ids, k: int = 10) -> pa.Table:
    """Exact cosine top-k of every query over the full Dataset."""
    import ray
    from functools import partial

    qids, qmat = _query_rows(ds, query_ids)
    query_ref = ray.put((qids, qmat))
    partials = ds.map_batches(
        partial(block_topk_batch, query_ref=query_ref, k=k),
        batch_format="pyarrow", batch_size=4096,
    )
    merged = pa.concat_tables(
        list(partials.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    return _merge_topk(merged, k)


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_topk(ds, query_ids, k: int = 10, bits: int = 8, dim: int = 64) -> pa.Table:
    """Approximate top-k: search only corpus vectors whose LSH code is
    within Hamming<=1 of some query's code (union of probe buckets) —
    the scale path when a full scan is too expensive. Same schema as
    brute_force_topk."""
    import ray
    from functools import partial

    assert bits <= 62, "sign-bit codes are packed into one int64"
    planes = _hyperplanes(dim, bits)
    qids, qmat = _query_rows(ds, query_ids)
    weights = np.left_shift(np.int64(1), np.arange(bits, dtype=np.int64))
    qcode_ints = ((qmat @ planes.T) > 0).astype(np.int64) @ weights
    union_allowed = set()
    for c in qcode_ints:
        union_allowed.add(int(c))
        for b in range(bits):
            union_allowed.add(int(c) ^ (1 << b))
    allowed_arr = np.fromiter(union_allowed, dtype=np.int64)

    def code_block(batch: pa.Table) -> pa.Table:
        emb = _matrix(batch)
        codes = ((emb @ planes.T) > 0).astype(np.int64) @ weights
        mask = np.isin(codes, allowed_arr)
        return batch.filter(pa.array(mask))

    cands = ds.map_batches(code_block, batch_format="pyarrow")
    query_ref = ray.put((qids, qmat))
    partials = cands.map_batches(
        partial(block_topk_batch, query_ref=query_ref, k=k),
        batch_format="pyarrow", batch_size=4096,
    )
    merged = pa.concat_tables(
        list(partials.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    return _merge_topk(merged, k)


def _kmeans(sample: np.ndarray, nlist: int, iters: int = 8,
            seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means on L2-normalized vectors (spherical
    k-means-lite): deterministic init by sample order hash, empty
    clusters re-seeded from the farthest points. Returns (nlist, dim)
    normalized centroids."""
    n = sample.shape[0]
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(n, size=min(nlist, n), replace=False)].copy()
    if len(cent) < nlist:  # degenerate tiny corpus: pad by repetition
        cent = np.concatenate([cent, cent[: nlist - len(cent)]])
    for _ in range(iters):
        sims = sample @ cent.T                      # (n, nlist)
        assign = sims.argmax(axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
            else:  # empty cluster: steal the globally worst-fit point
                worst = sims.max(axis=1).argmin()
                cent[c] = sample[worst]
    return cent


def ivf_topk(ds, query_ids, k: int = 10, nlist: int = 64, nprobe: int = 8,
             train_size: int = 4096, seed: int = 42) -> pa.Table:
    """IVF (inverted-file) ANN top-k — the coarse-quantizer scale path
    (the alternative to ``lsh_topk``): spherical k-means centroids are
    trained on a BOUNDED deterministic sample (first ``train_size``
    rows by vec_id — one pruned streaming pass), broadcast once
    (ray.put); each corpus block assigns its vectors to their nearest
    centroid with one matmul and keeps only vectors landing in the
    union of every query's ``nprobe`` closest lists; survivors feed the
    same per-block partial top-k + tiny driver merge as
    ``brute_force_topk``. No shuffle; the only driver-sized objects are
    the sample (bounded) and the merged top-k (result-sized).

    Approximate by construction: a true neighbor assigned to an
    unprobed list is missed; recall grows with nprobe (pytest asserts
    recall vs brute on a clustered fixture). Same output schema and
    deterministic ranking as brute_force_topk."""
    import ray
    from functools import partial

    qids, qmat = _query_rows(ds, query_ids)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def sample_mask(batch: pa.Table) -> pa.Table:
        m = batch["vec_id"].to_numpy() < train_size
        return batch.filter(pa.array(m))

    sample_parts = list(
        ds.select_columns(["vec_id", "embedding"])
          .map_batches(sample_mask, batch_format="pyarrow")
          .iter_batches(batch_format="pyarrow", batch_size=None))
    sample = _matrix(pa.concat_tables(sample_parts))
    nrm = np.linalg.norm(sample, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    cent = _kmeans(sample / nrm, nlist, seed=seed)

    # union of each query's nprobe nearest lists
    qsims = qn @ cent.T                              # (Q, nlist)
    nprobe = min(nprobe, nlist)
    probe = np.unique(
        np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe].ravel())
    cent_ref = ray.put(cent)
    _cent_cache: dict = {}

    def probe_filter(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        if "c" not in _cent_cache:
            _cent_cache["c"] = (ray.get(cent_ref)
                                if isinstance(cent_ref, ray.ObjectRef)
                                else cent_ref)
        emb = _matrix(batch)
        nr = np.linalg.norm(emb, axis=1, keepdims=True)
        nr[nr == 0] = 1.0
        assign = ((emb / nr) @ _cent_cache["c"].T).argmax(axis=1)
        return batch.filter(pa.array(np.isin(assign, probe)))

    cands = ds.select_columns(["vec_id", "embedding"]).map_batches(
        probe_filter, batch_format="pyarrow")
    query_ref = ray.put((qids, qmat))
    partials = cands.map_batches(
        partial(block_topk_batch, query_ref=query_ref, k=k),
        batch_format="pyarrow", batch_size=4096,
    )
    merged_parts = list(
        partials.iter_batches(batch_format="pyarrow", batch_size=None))
    if not merged_parts:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         "sim": pa.array([], pa.float64())})
    return _merge_topk(pa.concat_tables(merged_parts), k)


def ivf_topk_fixed(ds, query_ids, k: int = 10, nlist: int = 8,
                   nprobe: int = 3, iters: int = 1,
                   round_to: int = 9) -> pa.Table:
    """Deterministic (oracle-checkable) IVF ANN top-k — the coarse
    quantizer is the ``kmeans_centroids`` Lloyd recurrence (seeds = the
    ``nlist`` smallest vec_ids, round(d2, 1e-9) before argmin with ties
    to the smaller list, round(centroid, 1e-9) after each update), so
    the inverted lists are a pure function of the input and the whole
    pipeline is SQL-expressible as the unrolled k-means CTE + per-query
    probe ranking (``oracle_sql()['ann_ivf']``).

    Semantics (true per-query IVF, tighter than ``ivf_topk``'s
    union-of-probes filter): each vector belongs to exactly one list
    (rounded-d2 argmin under the final centroids); each query probes its
    ``nprobe`` nearest lists (rounded d2 asc, ties to the smaller list);
    query q's candidates are ONLY the vectors in q's probed lists; exact
    cosine top-k over candidates with the shared ranking convention
    (round(sim, 9) desc, vec_id asc; output sim rounded to 4).

    Scale shape: centroids train in ``iters`` streaming passes (no
    driver-side vectors), the (nlist x d) centroid matrix + (Q x nlist)
    probe mask broadcast once via ``ray.put``; ONE more streaming pass
    assigns + masks + partial-top-ks per block; the driver merges only
    k x Q x num_blocks partial rows. No shuffle. ``ivf_topk`` remains
    the sampled spherical-kmeans variant (recall-tested in pytest)."""
    import ray

    C = kmeans_centroids(ds, k=nlist, iters=iters, round_to=round_to)
    qids, qmat = _query_rows(ds, query_ids)
    # per-query probe lists under the final centroids, same argmin
    # convention as the assignment (round first, ties to smaller list)
    qd2 = np.round(((qmat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                   round_to)
    nprobe = min(nprobe, nlist)
    probe_mask = np.zeros((len(qids), nlist), dtype=bool)
    for qi in range(len(qids)):
        order = np.lexsort((np.arange(nlist), qd2[qi]))[:nprobe]
        probe_mask[qi, order] = True
    bundle_ref = ray.put((qids, qmat, C, probe_mask))
    _cache: dict = {}

    def block_kernel(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if len(batch) == 0:
            return empty
        if "b" not in _cache:
            qi_, qm_, C_, pm_ = ray.get(bundle_ref)
            qn_ = qm_ / np.linalg.norm(qm_, axis=1, keepdims=True)
            _cache["b"] = (qi_, qn_, C_, pm_)
        qids_, qn, Cm, pm = _cache["b"]
        X = _matrix(batch).astype(np.float64)
        d2 = np.round(((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2),
                      round_to)
        assign = np.argmin(d2, axis=1)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        sims = (X / nrm) @ qn.T                       # (B, Q)
        allowed = pm[:, assign].T                     # (B, Q)
        sims = np.where(allowed, sims, -np.inf)
        vec_ids = batch["vec_id"].to_numpy()
        kk = min(k, len(batch))
        # same-total-order partial cut as _merge_topk (see
        # block_topk_batch): argpartition boundary + tie-complete
        # candidate lexsort — rounding-tie-safe at the kk boundary at
        # O(B) cost
        rs = np.round(sims, 9)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids_):
            col = rs[:, qi]
            part = np.argpartition(-col, kk - 1)[:kk]
            cand = np.flatnonzero(col >= col[part].min())
            rows = cand[np.lexsort((vec_ids[cand], -col[cand]))][:kk]
            rows = rows[np.isfinite(sims[rows, qi])]
            out_q.extend([qid] * len(rows))
            out_v.extend(vec_ids[rows])
            out_s.extend(sims[rows, qi])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.asarray(out_v, np.int64), pa.int64()),
            "sim": pa.array(np.asarray(out_s, np.float64), pa.float64())})

    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
        block_kernel, batch_format="pyarrow", batch_size=4096)
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    if not parts:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         "sim": pa.array([], pa.float64())})
    return _merge_topk(pa.concat_tables(parts), k)


def cosine_neardup_pairs(ds, threshold: float = 0.95, limit_ids: int | None = None) -> pa.Table:
    """Embedding near-dup pairs (a<b, cosine>=threshold) — brute
    baseline, distributed: the (limit_ids-bounded) comparison set is
    normalized once and broadcast (ray.put); each corpus block computes
    block x set sims and emits only its above-threshold pairs, so no
    driver-side matmul and the driver only sees the result. The
    broadcast side must be bounded (use ``cosine_neardup_lsh`` for
    unbounded corpora — the scale path)."""
    import ray

    def mask(batch: pa.Table) -> pa.Table:
        if limit_ids is None:
            return batch
        return batch.filter(pa.array(batch["vec_id"].to_numpy() < limit_ids))

    base = ds.select_columns(["vec_id", "embedding"]).map_batches(
        mask, batch_format="pyarrow")
    parts = pa.concat_tables(
        list(base.iter_batches(batch_format="pyarrow", batch_size=None)))
    order = np.argsort(parts["vec_id"].to_numpy())
    parts = parts.take(pa.array(order))
    set_ids = parts["vec_id"].to_numpy().astype(np.int64)
    ref = ray.put((set_ids, _matrix(parts)))  # _get_queries normalizes once

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if len(batch) == 0:
            return empty
        sids, sn = _get_queries(ref)  # cached per worker, already normalized
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        emb = _matrix(batch)
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        sims = (emb / nrm) @ sn.T  # (B, S)
        keep = (sims >= threshold) & (ids[:, None] < np.asarray(sids)[None, :])
        bi, sj = np.nonzero(keep)
        if not len(bi):
            return empty
        return pa.table({
            "a": pa.array(ids[bi], pa.int64()),
            "b": pa.array(np.asarray(sids)[sj], pa.int64()),
            "sim": pa.array(np.round(sims[bi, sj], 4), pa.float64()),
        })

    parts2 = list(base.map_batches(block_pairs, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    out = pa.concat_tables(parts2)
    order = np.lexsort((out["b"].to_numpy(), out["a"].to_numpy()))
    return out.take(pa.array(order))


def cosine_neardup_lsh(ds, threshold: float = 0.6, bits: int = 16,
                       bands: int = 8, dim: int = 64, seed: int = 42,
                       exchange: str | None = None,
                       prefilter: bool | str = "auto") -> pa.Table:
    """Embedding near-dup pairs at corpus scale: random-hyperplane
    signatures split into ``bands`` sub-codes (minhash-style banding —
    two vectors are candidates when ANY band matches), a SLIM
    collision-bucket prefilter, one keyed bucket exchange carrying
    embeddings only for candidate rows, vectorized within-bucket cosine
    verify.

    Exchange payload discipline (the 100-TB shape): the first pass
    ships 16 B/band-row (vec_id, bucket_key) through a count groupby;
    colliding bucket keys — proportional to the number of near-dups,
    which is the quantity this pipeline exists to find — are broadcast
    once (ray.put), and only rows in collision buckets carry the
    embedding payload into the all-to-all. Near-dups are rare by
    construction, so the wide exchange moves candidate rows, never the
    corpus x bands. (The previous design shipped every embedding
    ``bands`` x through the exchange: 11.5 s at sf0.1 vs ~1 s now.)

    ``prefilter='auto'`` enables the slim pass only when the code
    space (bands x 2^(bits/bands)) is selective (> 4096 buckets): with
    coarse codes every bucket collides, the filter drops nothing, and
    the extra corpus pass is pure overhead. At corpus scale raise
    ``bits`` so per-band codes are selective (code space >> expected
    duplicate count) — the s-curve below tells you the recall cost.

    Recall at sim s: 1 - (1 - p^r)^bands with p = 1 - arccos(s)/pi and
    r = bits/bands (bits=16, bands=8 -> ~99.6% at s=0.6, higher above).
    Approximate-by-construction: pairs found are exact-verified, pairs
    whose bands all differ are missed."""
    import ray

    from .dedup import _dedupe_pair_table, _hot_bucket_keys

    assert bits % bands == 0
    r = bits // bands
    planes = _hyperplanes(dim, bits, seed)
    weights = np.left_shift(np.int64(1), np.arange(r, dtype=np.int64))

    def _band_keys(batch: pa.Table) -> np.ndarray:
        """(B, bands) bucket keys."""
        emb = _matrix(batch)
        bitsm = ((emb @ planes.T) > 0).astype(np.int64)  # (B, bits)
        keys = np.empty((len(batch), bands), dtype=np.int64)
        for band in range(bands):
            code = bitsm[:, band * r:(band + 1) * r] @ weights
            keys[:, band] = (np.int64(band) << np.int64(48)) | code
        return keys

    def slim_rows(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "bucket_key": pa.array([], pa.int64())})
        keys = _band_keys(batch)
        rep = np.repeat(batch["vec_id"].to_numpy().astype(np.int64), bands)
        return pa.table({"vec_id": pa.array(rep, pa.int64()),
                         "bucket_key": pa.array(keys.ravel(), pa.int64())})

    base = ds.select_columns(["vec_id", "embedding"])
    empty_pairs = pa.table({"a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64()),
                            "sim": pa.array([], pa.float64())})
    if prefilter == "auto":
        prefilter = bands * (1 << r) > 4096
    hot_ref = None
    if prefilter:
        hot = _hot_bucket_keys(
            base.map_batches(slim_rows, batch_format="pyarrow"))
        if len(hot) == 0:
            return empty_pairs
        hot_ref = ray.put(hot)
    _hot_cache: dict = {}

    def band_rows(batch: pa.Table) -> pa.Table:
        """(vec_id, embedding, bucket_key) band rows; with the
        prefilter on, only rows whose bucket collides — non-candidate
        rows never enter the wide exchange."""
        if len(batch) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": batch["embedding"],
                             "bucket_key": pa.array([], pa.int64())})
        keys = _band_keys(batch).ravel()
        if hot_ref is None:
            rep = np.repeat(np.arange(len(batch)), bands)
            sel = batch.select(["vec_id", "embedding"]).take(
                pa.array(rep, pa.int64()))
            return sel.append_column("bucket_key", pa.array(keys, pa.int64()))
        if "hot" not in _hot_cache:
            _hot_cache["hot"] = (ray.get(hot_ref)
                                 if isinstance(hot_ref, ray.ObjectRef)
                                 else np.asarray(hot_ref, dtype=np.int64))
        mask = np.isin(keys, _hot_cache["hot"])
        row_idx = np.flatnonzero(mask) // bands
        sel = batch.select(["vec_id", "embedding"]).take(
            pa.array(row_idx, pa.int64()))
        return sel.append_column("bucket_key", pa.array(keys[mask], pa.int64()))

    def verify(group: pa.Table) -> pa.Table:
        """Within-bucket exact cosine verify via chunked BLAS gram
        blocks (sub @ sub.T), never a per-pair gather: a bucket run of
        s rows costs one s x s dgemm in <=64 MB chunks instead of an
        O(pairs x dim) fancy-index einsum (the previous shape — 32 s
        single-threaded at sf0.1 for 4M candidate pairs; the gram path
        is ~100x faster and allocation-bounded)."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        key = group["bucket_key"].to_numpy()
        if len(key) == 0:
            return empty
        from .dedup import _bucket_runs, _first_per_bucket_doc

        group = group.take(pa.array(_first_per_bucket_doc(
            key, group["vec_id"].to_numpy())))
        key = group["bucket_key"].to_numpy()
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = group["vec_id"].to_numpy()[order].astype(np.int64)
        emb = _matrix(group.take(pa.array(order)))
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        nemb = emb / nrm
        outs = []
        for s, e in _bucket_runs(key):
            sub, sid, m = nemb[s:e], ids[s:e], e - s
            ch = max(1, 8_000_000 // m)  # gram chunk <= 64 MB float64
            for i0 in range(0, m, ch):
                i1 = min(i0 + ch, m)
                block = sub[i0:i1] @ sub.T  # (chunk, m) dgemm
                ri, cj = np.nonzero(block >= threshold)
                gi = ri + i0
                keep = cj > gi
                if not keep.any():
                    continue
                ri, gi, cj = ri[keep], gi[keep], cj[keep]
                a, b = sid[gi], sid[cj]
                dd = a != b
                outs.append((np.minimum(a, b)[dd], np.maximum(a, b)[dd],
                             np.round(block[ri, cj], 4)[dd]))
        if not outs:
            return empty
        lo = np.concatenate([o[0] for o in outs])
        hi = np.concatenate([o[1] for o in outs])
        sims = np.concatenate([o[2] for o in outs])
        order2 = np.lexsort((hi, lo))
        lo, hi, sims = lo[order2], hi[order2], sims[order2]
        keep = np.ones(len(lo), dtype=bool)
        keep[1:] = (np.diff(lo) != 0) | (np.diff(hi) != 0)
        return pa.table({"a": pa.array(lo[keep], pa.int64()),
                         "b": pa.array(hi[keep], pa.int64()),
                         "sim": pa.array(sims[keep], pa.float64())})

    from .dedup import collect_bucket_pairs

    parts = collect_bucket_pairs(
        base.map_batches(band_rows, batch_format="pyarrow"),
        verify, exchange)
    if not parts:
        return empty_pairs
    return _dedupe_pair_table(pa.concat_tables(parts), "sim")


def label_centroids(ds, label_col: str = "label",
                    vec_col: str = "embedding", dim: int = 64,
                    round_to: int = 9) -> pa.Table:
    """Per-label embedding centroids (class prototypes for
    classifier-style quality filtering / nearest-centroid routing):
    one streaming pass of per-block partial (label, count, sum-vector)
    rows, tiny driver combine keyed by the low-cardinality label.

    Emits LONG format (label, dim, c) so an SQL oracle can mirror it
    with list indexing; c = sum/count rounded (block summation order
    differs from a scan-order SQL SUM in the last bits).

    Scale: blocks stream, each partial is n_labels_in_block × dim
    floats; for high-cardinality label spaces route through
    ``ds.groupby(label)`` instead (one all-to-all)."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        mat = _matrix(batch, vec_col).astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(uniq.astype(np.int64), pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "s": pa.array(list(sums), pa.list_(pa.float64())),
        })

    acc: dict[int, tuple[int, np.ndarray]] = {}
    for t in ds.select_columns([label_col, vec_col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        ls = t["label"].to_numpy()
        ns = t["n"].to_numpy()
        ss = t["s"].to_numpy(zero_copy_only=False)
        for lb, n, s in zip(ls, ns, ss):
            lb = int(lb)
            prev = acc.get(lb)
            acc[lb] = ((prev[0] + int(n), prev[1] + s) if prev
                       else (int(n), np.asarray(s, np.float64).copy()))

    labels_out, dims_out, cs_out = [], [], []
    for lb in sorted(acc):
        n, s = acc[lb]
        c = np.round(s / np.float64(n), round_to)
        labels_out.extend([lb] * len(s))
        dims_out.extend(range(len(s)))
        cs_out.extend(c.tolist())
    return pa.table({"label": pa.array(labels_out, pa.int64()),
                     "dim": pa.array(dims_out, pa.int64()),
                     "c": pa.array(cs_out, pa.float64())})


def kmeans_centroids(ds, k: int = 8, iters: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     round_to: int = 9) -> np.ndarray:
    """The deterministic k-means recurrence of ``kmeans_fixed``, seeds
    through ``iters`` centroid updates, returning the k x d centroid
    matrix (for assignment-consuming pipelines like
    ``semantic_dedup_pairs``). Same conventions: smallest-``id_col``
    seeds, round(d2, round_to) before argmin (ties to the smaller
    cluster id), round(centroid, round_to) after each update, empty
    clusters keep their previous centroid. One streaming pass per
    iteration; vectors never visit the driver."""
    import ray

    import pyarrow.compute as pc

    seed_t = pa.concat_tables(list(
        ds.select_columns([id_col, vec_col])
        .map_batches(lambda b: b.filter(pc.less(b[id_col], k)),
                     batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    order = np.argsort(seed_t[id_col].to_numpy())
    C = _matrix(seed_t.take(pa.array(order)), vec_col).astype(np.float64)
    assert C.shape[0] == k, f"expected {k} seed vectors, got {C.shape[0]}"
    d = C.shape[1]

    def make_update(cref):
        def fn(batch: pa.Table) -> pa.Table:
            Cm = ray.get(cref)
            X = _matrix(batch, vec_col).astype(np.float64)
            d2 = np.round(((X[:, None, :] - Cm[None, :, :]) ** 2)
                          .sum(axis=2), round_to)
            a = np.argmin(d2, axis=1)
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, a, X)
            cnts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnts, pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64()))})
        return fn

    src = ds.select_columns([vec_col])
    for _ in range(iters):
        cref = ray.put(C)
        sums = np.zeros((k, d), np.float64)
        cnts = np.zeros(k, np.int64)
        for t in src.map_batches(make_update(cref), batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            cl = t["cluster"].to_numpy()
            cnts[cl] += t["cnt"].to_numpy()
            sums[cl] += np.stack(t["s"].to_numpy(zero_copy_only=False))
        nz = cnts > 0
        C = C.copy()
        C[nz] = np.round(sums[nz] / cnts[nz, None], round_to)
    return C


def kmeans_fixed(ds, k: int = 8, iters: int = 2, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_to: int = 9):
    """Fixed-iteration Lloyd k-means over an embedding column — the
    corpus-clustering shape (topic bucketing / dedup routing) with a
    deterministic, oracle-checkable recurrence:

    - seeds = the embeddings of the ``k`` smallest ``id_col`` values
      (deterministic; no RNG in the recurrence),
    - each iteration: broadcast the k x d centroid matrix (ray.put
      once), ONE streaming pass computes per-block rounded squared
      distances (round 1e-9 BEFORE the argmin, ties to the smaller
      cluster id — same convention as ``label_centroids`` /
      ``centroid_assign`` so summation order can't flip near-ties),
      partial per-cluster sum-vectors + counts; the driver re-centers
      (round 1e-9) over the tiny k x d combine. Empty clusters keep
      their previous centroid.
    - final pass: per-cluster size + EXACT integer inertia
      (per-row d2 in nano units, int64-summed — order-independent).

    Vectors never materialize on the driver; cost is (iters + 1)
    streaming passes over the input (re-read per pass — pin the input
    upstream if re-reading is costlier than pinning).

    Returns pandas (cluster, n, inertia_nano) for non-empty clusters.
    """
    import pandas as pd
    import ray

    C = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col,
                         vec_col=vec_col, round_to=round_to)

    def final_pass(cref):
        def fn(batch: pa.Table) -> pa.Table:
            Cm = ray.get(cref)
            X = _matrix(batch, vec_col).astype(np.float64)
            d2 = np.round(((X[:, None, :] - Cm[None, :, :]) ** 2)
                          .sum(axis=2), round_to)
            a = np.argmin(d2, axis=1)  # first min = smallest cluster id
            n = np.bincount(a, minlength=k).astype(np.int64)
            nano = np.round(d2[np.arange(len(a)), a] * 1e9).astype(np.int64)
            inert = np.zeros(k, np.int64)
            np.add.at(inert, a, nano)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(n, pa.int64()),
                "inertia_nano": pa.array(inert, pa.int64())})
        return fn

    src = ds.select_columns([vec_col])
    cref = ray.put(C)
    n_tot = np.zeros(k, np.int64)
    i_tot = np.zeros(k, np.int64)
    for t in src.map_batches(final_pass(cref),
                             batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        cl = t["cluster"].to_numpy()
        n_tot[cl] += t["n"].to_numpy()
        i_tot[cl] += t["inertia_nano"].to_numpy()
    keep = n_tot > 0
    return pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64)[keep],
        "n": n_tot[keep],
        "inertia_nano": i_tot[keep]})


def semantic_dedup_pairs(ds, k: int = 8, iters: int = 1,
                         threshold: float = 0.4, id_col: str = "vec_id",
                         vec_col: str = "embedding", round_to: int = 9,
                         max_cluster: int = 100_000,
                         exchange: str | None = None):
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540, public method): cluster the embedding space with
    the deterministic k-means recurrence (``kmeans_centroids``), then
    compare vectors ONLY within their cluster — all-pairs cosine is
    quadratic in the corpus, but quadratic-in-the-CLUSTER is bounded
    because k scales with the corpus (n/k vectors per cluster by
    design; SemDeDup uses k ~ n/10^4 at web scale).

    Scale shape: ONE cluster-keyed exchange ships each embedding
    exactly once (the cosine-LSH payload-amplification lesson); the
    per-cluster kernel normalizes once and computes the gram matrix in
    row slabs so peak memory is slab x |cluster|, not |cluster|^2.
    A loud guard trips when a cluster exceeds ``max_cluster`` (the fix
    is more clusters, not a bigger box). Driver sees only the pair
    list.

    Returns Arrow (cluster:int64, a:int64, b:int64, sim:float64) with
    a < b, round(sim, 4) >= threshold — same sim convention as
    ``cosine_neardup_pairs`` (hash-stable vs DuckDB
    list_cosine_similarity, verified max diff ~2e-16).
    """
    import ray

    from .relational import keyed_exchange

    # pin (vec_id, embedding) once: the centroid passes and the
    # assignment pass otherwise re-run the read lineage per pass
    src = ds.select_columns([id_col, vec_col]).materialize()
    C = kmeans_centroids(src, k=k, iters=iters, id_col=id_col,
                         vec_col=vec_col, round_to=round_to)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        X = _matrix(batch, vec_col).astype(np.float64)
        d2 = np.round(((X[:, None, :] - Cm[None, :, :]) ** 2)
                      .sum(axis=2), round_to)
        a = np.argmin(d2, axis=1).astype(np.int64)
        return pa.table({"cluster": pa.array(a, pa.int64()),
                         id_col: batch[id_col], vec_col: batch[vec_col]})

    assigned = src.map_batches(assign, batch_format="pyarrow")

    EMPTY = pa.table({"cluster": pa.array([], pa.int64()),
                      "a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64())})

    def cluster_pairs(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return EMPTY
        cl = batch["cluster"].to_numpy()
        order = np.lexsort((batch[id_col].to_numpy(), cl))
        batch = batch.take(pa.array(order))
        cl = cl[order]
        ids = batch[id_col].to_numpy().astype(np.int64)
        X = _matrix(batch, vec_col)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Xn = X / nrm
        starts = np.flatnonzero(np.concatenate(
            ([True], cl[1:] != cl[:-1])))
        ends = np.concatenate((starts[1:], [len(cl)]))
        out_c, out_a, out_b, out_s = [], [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            assert n <= max_cluster, (
                f"semantic_dedup: cluster {cl[s]} has {n} vectors "
                f"(> {max_cluster}); raise k so clusters stay bounded")
            G, gids = Xn[s:e], ids[s:e]
            slab = max(1, min(n, 8 * 1024 * 1024 // max(8 * n, 1)))
            for i in range(0, n, slab):
                S = G[i:i + slab] @ G.T
                ri, cj = np.nonzero(
                    (S >= threshold)
                    & (gids[i:i + slab, None] < gids[None, :]))
                if len(ri):
                    out_c.append(np.full(len(ri), cl[s], np.int64))
                    out_a.append(gids[i:i + slab][ri])
                    out_b.append(gids[cj])
                    out_s.append(np.round(S[ri, cj], 4))
        if not out_c:
            return EMPTY
        return pa.table({
            "cluster": pa.array(np.concatenate(out_c), pa.int64()),
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64())})

    parts = list(keyed_exchange(assigned, "cluster", cluster_pairs, exchange)
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    out = pa.concat_tables([t.select(EMPTY.column_names) for t in parts]
                           or [EMPTY])
    order = np.lexsort((out["b"].to_numpy(), out["a"].to_numpy()))
    return out.take(pa.array(order))


def proto_prune(ds, k: int = 8, iters: int = 1, keep_frac: float = 0.8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 9, exchange: str | None = None):
    """Prototype-distance data pruning (Sorscher et al. 2022
    "Beyond neural scaling laws", public method): cluster the
    embedding space (the deterministic ``kmeans_centroids``
    recurrence) and keep each cluster's ``keep_frac`` most PROTOTYPICAL
    examples (smallest distance to the centroid) — the
    easy-example-keep / outlier-prune curation step.

    One assignment pass (broadcast centroids), one cluster-keyed
    exchange of slim (id, cluster, d2) rows — embeddings do NOT ride
    the exchange — and a vectorized per-run rank. Returns Arrow
    (vec_id, cluster, rnk, d2_nano, keep) with
    keep = rank <= floor(keep_frac * cluster_size); rank ties break by
    id, distances rounded 1e-9 like every centroid op here."""
    import ray

    from .relational import keyed_exchange

    src = ds.select_columns([id_col, vec_col]).materialize()
    C = kmeans_centroids(src, k=k, iters=iters, id_col=id_col,
                         vec_col=vec_col, round_to=round_to)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        X = _matrix(batch, vec_col).astype(np.float64)
        d2 = np.round(((X[:, None, :] - Cm[None, :, :]) ** 2)
                      .sum(axis=2), round_to)
        a = np.argmin(d2, axis=1)
        nano = np.round(d2[np.arange(len(a)), a] * 1e9).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "d2_nano": pa.array(nano, pa.int64())})

    slim = src.map_batches(assign, batch_format="pyarrow")

    def rank_run(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64()),
                             "d2_nano": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.bool_())})
        cl = batch["cluster"].to_numpy()
        ids = batch[id_col].to_numpy()
        d2 = batch["d2_nano"].to_numpy()
        order = np.lexsort((ids, d2, cl))
        sk = cl[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rnk = np.arange(len(sk)) - starts[run_id] + 1
        sizes = np.diff(np.concatenate((starts, [len(sk)])))
        cut = np.floor(keep_frac * sizes).astype(np.int64)
        keep = rnk <= cut[run_id]
        out = batch.take(pa.array(order))
        return pa.table({
            id_col: out[id_col], "cluster": out["cluster"],
            "rnk": pa.array(rnk, pa.int64()),
            "d2_nano": out["d2_nano"],
            "keep": pa.array(keep, pa.bool_())})

    parts = list(keyed_exchange(slim, "cluster", rank_run, exchange)
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    t = pa.concat_tables(parts)
    order = np.argsort(t[id_col].to_numpy())
    return t.take(pa.array(order))


def knn_join_lsh(ds, bits: int = 16, bands: int = 8, dim: int = 64,
                 seed: int = 42, exchange: str | None = None):
    """Per-vector nearest neighbor (k=1 kNN self-join) over banded
    LSH candidates — the contrastive-pair-mining / nearest-duplicate
    attribution shape: every vector gets its best cosine match among
    vectors sharing ANY band bucket (vectors alone in all their
    buckets have no candidate and are absent — the recall s-curve of
    ``cosine_neardup_lsh`` applies).

    Scale shape: band rows through ONE bucket-keyed exchange; each
    bucket run computes its gram matrix once and emits ONE partial
    winner per (vector, bucket); a second slim exchange (vec_id keyed,
    24 B rows — at most ``bands`` per vector) reduces partials to the
    global winner by (round(sim, 9) desc, neighbor id asc). Returns
    Arrow (vec_id, nbr_id, sim) with round(sim, 4)."""
    from .dedup import _bucket_runs, _first_per_bucket_doc
    from .relational import per_key_topk

    assert bits % bands == 0
    r = bits // bands
    planes = _hyperplanes(dim, bits, seed)
    weights = np.left_shift(np.int64(1), np.arange(r, dtype=np.int64))

    def band_rows(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": batch["embedding"],
                             "bucket_key": pa.array([], pa.int64())})
        emb = _matrix(batch)
        bitsm = ((emb @ planes.T) > 0).astype(np.int64)
        keys = np.empty((len(batch), bands), dtype=np.int64)
        for band in range(bands):
            code = bitsm[:, band * r:(band + 1) * r] @ weights
            keys[:, band] = (np.int64(band) << np.int64(48)) | code
        rep = np.repeat(np.arange(len(batch)), bands)
        sel = batch.select(["vec_id", "embedding"]).take(
            pa.array(rep, pa.int64()))
        return sel.append_column("bucket_key",
                                 pa.array(keys.ravel(), pa.int64()))

    EMPTY = pa.table({"vec_id": pa.array([], pa.int64()),
                      "nbr": pa.array([], pa.int64()),
                      "sim_r9": pa.array([], pa.float64())})

    def bucket_best(batch: pa.Table) -> pa.Table:
        key = batch["bucket_key"].to_numpy()
        if len(key) == 0:
            return EMPTY
        batch = batch.take(pa.array(_first_per_bucket_doc(
            key, batch["vec_id"].to_numpy())))
        key = batch["bucket_key"].to_numpy()
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = batch["vec_id"].to_numpy()[order].astype(np.int64)
        emb = _matrix(batch.take(pa.array(order)))
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        nemb = emb / nrm
        out_v, out_n, out_s = [], [], []
        for s, e in _bucket_runs(key):
            m = e - s
            if m < 2:
                continue
            sub, sid = nemb[s:e], ids[s:e]
            # order by id so the row-wise argmax tie-breaks to the
            # SMALLER neighbor id (np.argmax returns the first max)
            io = np.argsort(sid, kind="stable")
            sub, sid = sub[io], sid[io]
            ch = max(1, 8_000_000 // m)
            for i0 in range(0, m, ch):
                i1 = min(i0 + ch, m)
                block = np.round(sub[i0:i1] @ sub.T, 9)
                rows = np.arange(i0, i1)
                block[np.arange(i1 - i0), rows] = -np.inf  # mask self
                best = np.argmax(block, axis=1)
                out_v.append(sid[rows])
                out_n.append(sid[best])
                out_s.append(block[np.arange(i1 - i0), best])
        if not out_v:
            return EMPTY
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "nbr": pa.array(np.concatenate(out_n), pa.int64()),
            "sim_r9": pa.array(np.concatenate(out_s), pa.float64())})

    from .relational import keyed_exchange

    partials = keyed_exchange(
        ds.select_columns(["vec_id", "embedding"]).map_batches(
            band_rows, batch_format="pyarrow"),
        "bucket_key", bucket_best, exchange)
    best = per_key_topk(partials, "vec_id", "sim_r9", k=1,
                        descending=True, tiebreak="nbr")
    t = pa.concat_tables([b.select(["vec_id", "nbr", "sim_r9"])
                          for b in best.iter_batches(
                              batch_format="pyarrow", batch_size=None)]
                         or [EMPTY])
    order = np.argsort(t["vec_id"].to_numpy())
    t = t.take(pa.array(order))
    return pa.table({
        "vec_id": t["vec_id"],
        "nbr_id": t["nbr"],
        "sim": pa.array(np.round(t["sim_r9"].to_numpy(), 4), pa.float64())})


def ridge_fit(ds, x_col: str = "embedding", y_col: str = "y",
              l2: float = 1e-3):
    """Distributed RIDGE regression via normal equations — the
    linear-probe shape (fit a scalar quality/label signal over an
    embedding column, the cheap classifier a data-curation loop trains
    between epochs). Register-combine scale pattern: each block ships
    one (d+1)x(d+1) Gram partial + (d+1) moment vector + a count
    ((d+1)(d+2)+1 float64s — independent of row count; rows never
    leave their blocks), the driver sums the handful of partials and
    solves the tiny augmented system once (intercept via the bias
    column, unpenalized). Block-order float addition means ~1e-12
    nondeterminism across runs — fine for a probe, so this is a
    rows-only op (pytest asserts closeness to the closed-form numpy
    solution). Returns (beta: float64[d], intercept: float, n: int)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"r": pa.array([], pa.list_(pa.float64()))})
        X = _matrix(batch, x_col)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        X1 = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        A = X1.T @ X1                      # (d+1, d+1)
        b = X1.T @ y                       # (d+1,)
        row = np.concatenate([A.ravel(), b, [float(len(X))]])
        # ONE list-typed row per partial: block coalescing then just
        # stacks rows instead of blurring the register boundaries
        return pa.table({"r": pa.array([row], pa.list_(pa.float64()))})

    acc = None
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in t["r"].to_pylist():
            arr = np.asarray(row, dtype=np.float64)
            acc = arr if acc is None else acc + arr
    if acc is None:
        raise ValueError("ridge_fit: empty input")
    d1 = int((np.sqrt(4 * len(acc) - 3) - 1) // 2)  # len = d1^2 + d1 + 1
    A = acc[: d1 * d1].reshape(d1, d1)
    b = acc[d1 * d1: d1 * d1 + d1]
    n = int(acc[-1])
    reg = np.eye(d1) * l2
    reg[-1, -1] = 0.0  # never penalize the intercept
    beta = np.linalg.solve(A + reg, b)
    return beta[:-1], float(beta[-1]), n


def pca_fit(ds, x_col: str = "embedding"):
    """Distributed PCA via the covariance register combine — the
    embedding-space profiling / dimensionality-reduction step of a
    curation loop (drift detection, compaction before clustering).
    Identical scale shape to ``ridge_fit``: each block ships ONE
    (d² + d + 1)-float64 register row (Σxxᵀ, Σx, n — payload
    independent of row count; rows never leave their blocks), the
    driver sums the handful of partials, forms the d×d covariance and
    eigendecomposes it once. Component signs are canonicalized (the
    max-|coordinate| of every component is made positive) so retries
    and block orders agree despite eigh's sign freedom. Block-order
    float addition gives ~1e-12 register nondeterminism — rows-only
    territory, like ridge_probe. Returns (eigvals desc, components
    [k,d] row-major, mean, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"r": pa.array([], pa.list_(pa.float64()))})
        X = _matrix(batch, x_col)
        row = np.concatenate([(X.T @ X).ravel(), X.sum(axis=0),
                              [float(len(X))]])
        return pa.table({"r": pa.array([row], pa.list_(pa.float64()))})

    acc = None
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in t["r"].to_pylist():
            arr = np.asarray(row, dtype=np.float64)
            acc = arr if acc is None else acc + arr
    if acc is None:
        raise ValueError("pca_fit: empty input")
    d = int((np.sqrt(4 * len(acc) - 3) - 1) // 2)  # len = d² + d + 1
    A = acc[: d * d].reshape(d, d)
    s = acc[d * d: d * d + d]
    n = int(acc[-1])
    assert n >= 2, "pca_fit: need at least 2 rows"
    mean = s / n
    cov = (A - np.outer(s, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)          # ascending
    w, v = w[::-1], v[:, ::-1].T        # desc; components as rows
    flip = np.sign(v[np.arange(d), np.abs(v).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return w, v * flip[:, None], mean, n


def pca_project(ds, mean: np.ndarray, components: np.ndarray, k: int,
                id_col: str = "vec_id", x_col: str = "embedding"):
    """Project an embedding column onto the top-k fitted components:
    the (mean, components) pair is broadcast once via ray.put and every
    block does one centered matmul — streaming, no shuffle. Emits
    (id_col, coords list<float64>[k])."""
    import ray

    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(components[:k], np.float64)))

    def project(batch: pa.Table) -> pa.Table:
        mu, comp = ray.get(ref)  # zero-copy plasma read per task
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "coords": pa.array([], pa.list_(pa.float64()))})
        X = _matrix(batch, x_col)
        C = (X - mu) @ comp.T
        return pa.table({id_col: batch[id_col],
                         "coords": pa.array(list(C), pa.list_(pa.float64()))})

    return ds.map_batches(project, batch_format="pyarrow")


def cluster_separation_pairs(ds, label_col: str = "label",
                             emb_col: str = "embedding") -> "object":
    """Between-label separation audit in EXACT integers — the
    Davies-Bouldin-style read a curation pipeline runs on labeled (or
    k-means-assigned) embeddings before trusting them for stratified
    dedup / sampling: for every label pair (a < b) the separation
    score

        sep = d²(μ_a, μ_b) / (var_a + var_b)
            = 10^6 · Σ_d (n_b·S_a,d − n_a·S_b,d)²
              // (W_a·n_b² + W_b·n_a²)      [floor, ppm]

    with S_l the per-label component-sum vector, W_l = n_l·ss_l −
    ‖S_l‖² (so W_l/n_l² is the within-label variance), everything over
    2^20-floor-quantized components (float32→float64 widening and the
    power-of-two scale are exact, so Ray and DuckDB compute identical
    integers; cross-products exceed int64, so the driver folds Python
    bigints — the twin's HUGEINT).

    Scale shape: one map_batches pass emits per-block per-label
    register rows (n, ss, S as list<int64>) — labels are few, so the
    fold is O(labels·d) on the driver regardless of corpus size; no
    shuffle. Returns pandas (label_a, label_b, n_a, n_b, sep_ppm)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        emb = b[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if len(b) == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.int64()))})
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(flat * 1048576.0).astype(np.int64)
        widths = np.diff(emb.offsets.to_numpy())
        d = int(widths.max())
        Q = q.reshape(len(b), d)
        lab = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        n = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        ss = np.zeros(len(ul), np.int64)
        np.add.at(ss, inv, (Q * Q).sum(axis=1))
        S = np.zeros((len(ul), d), np.int64)
        np.add.at(S, inv, Q)
        return pa.table({
            "label": pa.array(ul, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "ss": pa.array(ss, pa.int64()),
            "s": pa.array(list(S), pa.list_(pa.int64()))})

    acc: dict[int, list] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for i in range(len(t)):
            lab = int(t["label"][i].as_py())
            s = [int(x) for x in t["s"][i].as_py()]
            cur = acc.get(lab)
            if cur is None:
                acc[lab] = [int(t["n"][i].as_py()),
                            int(t["ss"][i].as_py()), s]
            else:
                cur[0] += int(t["n"][i].as_py())
                cur[1] += int(t["ss"][i].as_py())
                cur[2] = [a + b for a, b in zip(cur[2], s)]
    labels = sorted(acc)
    rows = []
    for ai in range(len(labels)):
        for bi in range(ai + 1, len(labels)):
            la, lb = labels[ai], labels[bi]
            na, ssa, Sa = acc[la]
            nb, ssb, Sb = acc[lb]
            Wa = na * ssa - sum(x * x for x in Sa)
            Wb = nb * ssb - sum(x * x for x in Sb)
            D = sum((nb * x - na * y) ** 2 for x, y in zip(Sa, Sb))
            den = Wa * nb * nb + Wb * na * na
            sep = (1_000_000 * D) // den if den > 0 else -1
            rows.append((la, lb, na, nb, sep))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "n_a",
                                       "n_b", "sep_ppm"])


def embedding_mmd_linear(ds, side_col: str = "side",
                         emb_col: str = "embedding") -> "object":
    """Two-sample embedding drift test: linear-kernel MMD² between the
    two sides' embedding distributions,

        MMD²_lin = ‖μ_a − μ_b‖²
                 = Σ_d (n_b·S_a,d − n_a·S_b,d)² / (n_a·n_b)²,

    in EXACT integers over 2^20-floor-quantized components — the
    did-the-encoder-or-corpus-shift read run between snapshots before
    trusting cached ANN indexes / dedup thresholds (the embedding
    counterpart of psi_drift/ks_drift on scalars). Reported in micro
    units of the raw [-1,1]² scale (divide by 2^40). Same register
    shape as cluster_separation_pairs: one shuffle-free partial pass,
    O(sides·d) driver fold in Python bigints (the twin's HUGEINT)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        emb = b[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if len(b) == 0:
            return pa.table({"side": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.int64()))})
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(flat * 1048576.0).astype(np.int64)
        widths = np.diff(emb.offsets.to_numpy())
        d = int(widths.max())
        Q = q.reshape(len(b), d)
        side = b[side_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us, inv = np.unique(side, return_inverse=True)
        n = np.bincount(inv, minlength=len(us)).astype(np.int64)
        S = np.zeros((len(us), d), np.int64)
        np.add.at(S, inv, Q)
        return pa.table({"side": pa.array(us, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "s": pa.array(list(S), pa.list_(pa.int64()))})

    acc: dict[int, list] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for i in range(len(t)):
            sd = int(t["side"][i].as_py())
            s = [int(x) for x in t["s"][i].as_py()]
            cur = acc.get(sd)
            if cur is None:
                acc[sd] = [int(t["n"][i].as_py()), s]
            else:
                cur[0] += int(t["n"][i].as_py())
                cur[1] = [a + b for a, b in zip(cur[1], s)]
    na, Sa = acc.get(0, [0, []])
    nb, Sb = acc.get(1, [0, []])
    if na == 0 or nb == 0:
        return pd.DataFrame({"n_a": [na], "n_b": [nb],
                             "mmd2_micro": [0]})
    D = sum((nb * x - na * y) ** 2 for x, y in zip(Sa, Sb))
    mmd2_micro = (1_000_000 * D) // ((na * nb) ** 2 * (1 << 40))
    return pd.DataFrame({"n_a": [na], "n_b": [nb],
                         "mmd2_micro": [int(mmd2_micro)]})


def pq_codebook(ds, m: int = 2, k: int = 4, iters: int = 1,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 9):
    """Product-quantization codebook training + distortion census
    (Jégou et al. 2011, public method — the PQ half of IVF-PQ, the
    standard billion-scale ANN memory layout): the d-dim embedding
    space splits into ``m`` contiguous subspaces; each subspace trains
    its own ``k``-centroid codebook with the deterministic
    ``kmeans_centroids`` Lloyd recurrence (smallest-vec_id seeds,
    round-1e-9 conventions), so the whole operator is SQL-expressible
    as m copies of the proven unrolled-Lloyd CTE over sliced
    dimensions.

    Returns pandas (subspace, cluster, n, distortion_nano): per
    sub-codebook cluster occupancy and EXACT integer quantization
    distortion (per-row rounded d2 in nano units, int64-summed —
    order-independent). Total distortion / (n · d) is the
    reconstruction-error read that sizes m and k before committing a
    corpus to PQ codes.

    Scale shape: per subspace, (iters + 1) streaming passes (the
    centroid updates + the census) over a SLICED view of the vectors —
    a map_batches projection, never a driver materialization; the only
    driver-sized objects are the m x k x (d/m) codebooks."""
    import pandas as pd

    def slicer(lo: int, hi: int):
        def fn(batch: pa.Table) -> pa.Table:
            X = _matrix(batch, vec_col)[:, lo:hi]
            return pa.table({
                id_col: batch[id_col],
                vec_col: pa.array(list(X), pa.list_(pa.float64()))})
        return fn

    dim = _matrix(pa.concat_tables(list(
        ds.select_columns([vec_col]).limit(1)
          .iter_batches(batch_format="pyarrow", batch_size=None))),
        vec_col).shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    outs = []
    for s in range(m):
        sliced = ds.select_columns([id_col, vec_col]).map_batches(
            slicer(s * sub, (s + 1) * sub), batch_format="pyarrow")
        t = kmeans_fixed(sliced, k=k, iters=iters, id_col=id_col,
                         vec_col=vec_col, round_to=round_to)
        t = t.rename(columns={"inertia_nano": "distortion_nano"})
        t.insert(0, "subspace", np.int64(s))
        outs.append(t)
    return (pd.concat(outs, ignore_index=True)
            .sort_values(["subspace", "cluster"]).reset_index(drop=True))


def ivfpq_topk_fixed(ds, query_ids, k: int = 10, nlist: int = 8,
                     nprobe: int = 3, m: int = 2, ksub: int = 4,
                     iters: int = 1, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     round_to: int = 9) -> pa.Table:
    """IVF-PQ ANN top-k with asymmetric-distance (ADC) lookup tables
    (Jégou et al. 2011 — the billion-scale memory layout: inverted
    lists prune the corpus, PQ codes compress what remains to m bytes,
    and queries score candidates with m table lookups instead of a
    d-dim distance). Deterministic end to end, so the whole pipeline is
    SQL-expressible (``oracle_sql()['ann_ivfpq']``):

    - coarse quantizer: ``kmeans_centroids`` Lloyd recurrence over the
      full d dims (smallest-id seeds, 1e-9 rounding); every vector
      joins the list of its rounded-d2 argmin (ties to smaller list),
      queries probe their ``nprobe`` nearest lists — identical
      conventions to ``ivf_topk_fixed``.
    - PQ: ``m`` contiguous subspaces, each with a ``ksub``-centroid
      codebook from the same recurrence over sliced dims (identical to
      ``pq_codebook``); vector code_s = rounded-d2 argmin in subspace s.
    - ADC: per query, LUT[s][j] = round(||q_s - c_{s,j}||^2, 9) in nano
      units (driver-side, m x ksub ints per query, broadcast); a
      candidate's distance is the INTEGER sum of m LUT entries — exact,
      order-independent, hash-stable.

    Scale shape: centroid training = (iters+1) streaming passes (full
    + m sliced); ONE more streaming pass assigns lists + codes, masks
    by probe membership, gathers LUT sums, and partial-top-ks per
    block; the driver merges k x Q x blocks rows. The per-block scoring
    is a code-gather + integer LUT sum — no matmul over candidates,
    which is exactly why IVF-PQ wins at 10^9 vectors.

    Returns (query_id, vec_id, rank, adc_nano) ranked by
    (adc_nano asc, vec_id asc)."""
    import ray

    C = kmeans_centroids(ds, k=nlist, iters=iters, id_col=id_col,
                         vec_col=vec_col, round_to=round_to)
    dim = C.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m

    def slicer(lo: int, hi: int):
        def fn(batch: pa.Table) -> pa.Table:
            X = _matrix(batch, vec_col)[:, lo:hi]
            return pa.table({
                id_col: batch[id_col],
                vec_col: pa.array(list(X), pa.list_(pa.float64()))})
        return fn

    books = []
    for s in range(m):
        sliced = ds.select_columns([id_col, vec_col]).map_batches(
            slicer(s * sub, (s + 1) * sub), batch_format="pyarrow")
        books.append(kmeans_centroids(sliced, k=ksub, iters=iters,
                                      id_col=id_col, vec_col=vec_col,
                                      round_to=round_to))

    qids, qmat = _query_rows(ds, query_ids)
    qd2 = np.round(((qmat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                   round_to)
    nprobe = min(nprobe, nlist)
    probe_mask = np.zeros((len(qids), nlist), dtype=bool)
    for qi in range(len(qids)):
        order = np.lexsort((np.arange(nlist), qd2[qi]))[:nprobe]
        probe_mask[qi, order] = True
    # ADC lookup tables in nano units: (Q, m, ksub) int64
    lut = np.empty((len(qids), m, ksub), np.int64)
    for s in range(m):
        qs = qmat[:, s * sub:(s + 1) * sub]
        d2 = np.round(((qs[:, None, :] - books[s][None, :, :]) ** 2)
                      .sum(axis=2), round_to)
        lut[:, s, :] = np.round(d2 * 1e9).astype(np.int64)
    bundle = ray.put((qids, C, books, probe_mask, lut))
    _cache: dict = {}

    def block_kernel(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "adc_nano": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        if "b" not in _cache:
            _cache["b"] = ray.get(bundle)
        qids_, C_, books_, pm_, lut_ = _cache["b"]
        X = _matrix(batch, vec_col).astype(np.float64)
        d2c = np.round(((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2),
                       round_to)
        assign = np.argmin(d2c, axis=1)
        codes = np.empty((len(X), m), np.int64)
        for s in range(m):
            Xs = X[:, s * sub:(s + 1) * sub]
            d2s = np.round(((Xs[:, None, :] - books_[s][None, :, :]) ** 2)
                           .sum(axis=2), round_to)
            codes[:, s] = np.argmin(d2s, axis=1)
        vec_ids = batch[id_col].to_numpy()
        out_q, out_v, out_d = [], [], []
        for qi, qid in enumerate(qids_):
            mask = pm_[qi, assign]
            if not mask.any():
                continue
            cand = np.flatnonzero(mask)
            adc = np.zeros(len(cand), np.int64)
            for s in range(m):
                adc += lut_[qi, s, codes[cand, s]]
            kk = min(k, len(cand))
            sel = np.lexsort((vec_ids[cand], adc))[:kk]
            out_q.extend([qid] * kk)
            out_v.extend(vec_ids[cand][sel])
            out_d.extend(adc[sel])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.asarray(out_v, np.int64), pa.int64()),
            "adc_nano": pa.array(np.asarray(out_d, np.int64),
                                 pa.int64())})

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        block_kernel, batch_format="pyarrow", batch_size=4096)
    parts = [t for t in partials.iter_batches(batch_format="pyarrow",
                                              batch_size=None) if len(t)]
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int32()),
                      "adc_nano": pa.array([], pa.int64())})
    if not parts:
        return empty
    allp = pa.concat_tables(parts)
    qs = allp["query_id"].to_numpy()
    vs = allp["vec_id"].to_numpy()
    dsn = allp["adc_nano"].to_numpy()
    out_q, out_v, out_d, out_r = [], [], [], []
    for qid in np.unique(qs):
        mm = qs == qid
        order = np.lexsort((vs[mm], dsn[mm]))[:k]
        out_q.extend([qid] * len(order))
        out_v.extend(vs[mm][order])
        out_d.extend(dsn[mm][order])
        out_r.extend(range(1, len(order) + 1))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(np.asarray(out_v, np.int64), pa.int64()),
        "rank": pa.array(out_r, pa.int32()),
        "adc_nano": pa.array(np.asarray(out_d, np.int64), pa.int64())})


def sq8_census(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Scalar (SQ8) quantization census — the second ANN compression
    beside PQ (FAISS's SQ8, public technique): per dimension, learn
    [min, max] over the corpus (one streaming min/max pass), quantize
    each value to round(255 * (x - min) / (max - min)) and measure the
    EXACT reconstruction error of the dequantized corpus. Integer
    nano-unit error sums (order-independent), so the whole census
    SQL-oracle-checks.

    Two streaming passes (range, then error); the only driver objects
    are the 2 x d range vectors. Returns one row:
    (n_vectors, total_err_nano, max_err_nano) where err is the squared
    reconstruction error per vector, rounded to 1e-9 before the
    nano-int conversion (same convention as the Lloyd distortions)."""
    import ray

    # pass 1: per-dim min/max (combiner: per-block partials)
    def mm(batch: pa.Table) -> pa.Table:
        X = _matrix(batch, vec_col)
        return pa.table({
            "lo": pa.array([list(X.min(axis=0))], pa.list_(pa.float64())),
            "hi": pa.array([list(X.max(axis=0))], pa.list_(pa.float64()))})

    lo = hi = None
    for t in ds.select_columns([vec_col]).map_batches(
            mm, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for i in range(len(t)):
            l = np.asarray(t["lo"][i].as_py())
            h = np.asarray(t["hi"][i].as_py())
            lo = l if lo is None else np.minimum(lo, l)
            hi = h if hi is None else np.maximum(hi, h)
    rng = hi - lo
    rng[rng == 0] = 1.0
    ref = ray.put((lo, rng))
    cache: dict = {}

    def err(batch: pa.Table) -> pa.Table:
        if "r" not in cache:
            cache["r"] = ray.get(ref)
        lo_, rng_ = cache["r"]
        X = _matrix(batch, vec_col)
        q = np.round(255.0 * (X - lo_) / rng_)
        deq = lo_ + q * rng_ / 255.0
        e = np.round(((X - deq) ** 2).sum(axis=1), 9)
        nano = np.round(e * 1e9).astype(np.int64)
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "tot": pa.array([int(nano.sum())], pa.int64()),
            "mx": pa.array([int(nano.max()) if len(nano) else 0],
                           pa.int64())})

    n = tot = mx = 0
    for t in ds.select_columns([vec_col]).map_batches(
            err, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        n += int(t["n"].to_numpy().sum())
        tot += int(t["tot"].to_numpy().sum())
        mx = max(mx, int(t["mx"].to_numpy().max(initial=0)))
    import pandas as pd

    return pd.DataFrame([{"n_vectors": n, "total_err_nano": tot,
                          "max_err_nano": mx}])


def dim_truncation_census(ds, ks=(8, 16, 32, 64),
                          vec_col: str = "embedding"):
    """Matryoshka-style dimension-ablation census: the energy fraction
    LOST by truncating every embedding to its first k dims (the read
    that sizes a cheap prefilter index before the full-dim rerank).
    Integer nano-unit energies (order-independent sums); one streaming
    pass for all k."""
    import pandas as pd

    ks = sorted(int(k) for k in ks)

    def partial(batch: pa.Table) -> pa.Table:
        X = _matrix(batch, vec_col)
        sq = np.round(X ** 2, 9)
        nano = np.round(sq * 1e9).astype(np.int64)
        cum = nano.cumsum(axis=1)
        rows = {"k": pa.array(ks, pa.int64()),
                "kept": pa.array([int(cum[:, k - 1].sum()) for k in ks],
                                 pa.int64()),
                "total": pa.array([int(cum[:, -1].sum())] * len(ks),
                                  pa.int64())}
        return pa.table(rows)

    kept = {k: 0 for k in ks}
    total = 0
    for t in ds.select_columns([vec_col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for i in range(len(t)):
            kept[int(t["k"][i].as_py())] += int(t["kept"][i].as_py())
        total += int(t["total"][0].as_py()) if len(t) else 0
    return pd.DataFrame([
        {"k": k, "kept_nano": kept[k], "total_nano": total,
         "lost_ppm": int(1_000_000 * (total - kept[k]) // total)
         if total else 0}
        for k in ks])


def binary_embed_audit(ds, probe_ids: int = 40,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding"):
    """Binary (sign-bit) quantization audit — the third ANN compression
    beside PQ and SQ8 (64 dims -> 8 bytes): b_i = (x_i >= 0), and the
    cosine of a pair is estimated from the Hamming distance of their
    sign patterns as cos(pi * h / d) (the hyperplane-LSH collision
    identity). The audit measures that estimator against true cosine
    over the bounded probe set's all-pairs (the pairs a curator would
    spot-check before trusting sign-bit prefiltering corpus-wide).

    Scale shape: ONE streaming mask-filter collects only the probe
    rows (probe_ids x d values on the driver — bounded); everything
    pairwise happens on that bounded set. Returns one row
    (n_pairs, mean_err_micro, max_err_micro) with micro-rounded float
    errors (identical formula order in the SQL twin)."""
    import pandas as pd

    qids, qmat = _query_rows(ds, range(probe_ids))
    X = qmat.astype(np.float64)
    bits = X >= 0
    n = len(qids)
    d = X.shape[1]
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Xn = X / nrm
    true = Xn @ Xn.T
    ham = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
    est = np.cos(np.pi * ham / d)
    iu = np.triu_indices(n, k=1)
    err = np.abs(true[iu] - est[iu])
    return pd.DataFrame([{
        "n_pairs": int(len(err)),
        "mean_err_micro": int(np.floor(err.mean() * 1e6 + 0.5)),
        "max_err_micro": int(np.floor(err.max() * 1e6 + 0.5))}])
