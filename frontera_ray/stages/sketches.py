"""Sketch operators: approximate distinct counting at 100-TB scale.

HyperLogLog (Flajolet et al. 2007, the public HLL paper) as a Ray Data
combine: each block folds its values into a 2^p-byte register array
(one vectorized pass), the driver max-merges the per-block partials —
2^p bytes move per block, never the values. With p=14 the whole sketch
is 16 KiB and the standard error is ~1.04/sqrt(2^14) ~= 0.8%.

The register update is EXACT integer arithmetic (md5 top-8-bytes hash,
bucket = top p bits, rho = leading-zero count of the low 64-p bits +
1), and the estimator is evaluated over an exact integer register sum
(sum of 2^(51 - M_j) — every term a power of two, summed as Python
ints), so the whole estimate — including the linear-counting branch —
is reproduced bit-for-bit by a DuckDB SQL oracle (`__ray_entry__
.oracle_sql()['hll_distinct']`). The reference has no sketch operators;
this is a graft addition for the training-data pipeline family.

Hash choice: ``hash='md5'`` (default) is the oracle-parity path and
hashes each value once per block (python md5 per UNIQUE value — fine
for cardinality work where values are mostly unique); ``hash='fast'``
is the vectorized splitmix64 path for integer columns at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hll_partial", "hll_merge", "hll_estimate",
           "hll_count_distinct"]


def _md5_hash64(vals) -> np.ndarray:
    """md5 top 8 bytes per value (== ('0x' || substr(md5(v),1,16)) in
    DuckDB) — the oracle-parity hash."""
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(str(v).encode("utf8")).digest()[:8], "big")
         for v in vals),
        dtype=np.uint64, count=len(vals))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact per-element integer bit length (uint64 -> int64; 0 -> 0).
    float64 frexp is NOT exact for w >= 2^53 near power-of-two
    boundaries (2^57 - 1 rounds up and frexp reports 58), so sketches
    whose hash words exceed 53 bits compute the length with integer
    ops over the distinct words — matching the SQL twins'
    length(bin(w)) bit-for-bit. The Python-int loop runs once per
    DISTINCT word; the md5 hashing upstream already paid a per-row
    Python pass, so this is never the batch's hot edge."""
    uniq, inv = np.unique(w, return_inverse=True)
    ubl = np.fromiter((int(v).bit_length() for v in uniq),
                      dtype=np.int64, count=len(uniq))
    return ubl[inv]


def hll_partial(h: np.ndarray, p: int) -> np.ndarray:
    """Fold 64-bit hashes into a fresh 2^p register array (uint8).

    bucket = top p bits; rho = (64-p) - bit_length(low 64-p bits) + 1
    (so an all-zero remainder gives the max rho of 64-p+1). bit_length
    is exact via np.frexp: for p >= 11 the remainder fits in 53 bits,
    so its float64 image is exact and frexp's exponent IS the bit
    length."""
    assert 11 <= p <= 18, "p in [11, 18]: frexp-exact + sane memory"
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    bitlen = np.frexp(w.astype(np.float64))[1]  # exact: w < 2^53
    rho = ((64 - p) - bitlen + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(parts: np.ndarray) -> np.ndarray:
    """Merge stacked (k, 2^p) partials — registers are max-mergeable,
    which is what makes the sketch a combiner (associative,
    commutative, idempotent)."""
    return np.maximum.reduce(parts.reshape(-1, parts.shape[-1]), axis=0)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the linear-counting small-range
    branch. The register sum is the EXACT integer
    sum_j 2^(51 - M_j) (M_j <= 64-11+1 <= 54... capped by p >= 11 at
    51+ ... every term a nonneg power of two), so the only float ops
    are the final alpha/division/ln — written identically in the SQL
    oracle. No large-range branch: 64-bit hashes make it unreachable
    below ~6e17 distinct."""
    m = len(regs)
    # exact integer register sum, scaled by 2^51 (max rho with p=11
    # is 54; 51 keeps terms integral for p >= 14 and the estimator
    # only needs a CONSISTENT scale, applied identically in SQL)
    s = sum(1 << (51 - int(r)) if r <= 51 else 0 for r in regs)
    # rho > 51 (possible only for p < 14) contributes 2^(51-rho) < 1:
    # fold those exactly as rational remainders over a common 2^13
    # denominator so the sum stays exact
    extra = sum(1 << (64 - int(r)) for r in regs if r > 51)  # /2^13
    v = int((regs == 0).sum())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_double = float(s) + float(extra) / 8192.0
    raw = alpha * m * m * 2251799813685248.0 / s_double
    if raw <= 2.5 * m and v > 0:
        return m * np.log(m / v)
    return raw


def hll_count_distinct(ds, col: str, p: int = 14,
                       hash: str = "md5") -> float:
    """Distributed approximate COUNT(DISTINCT col): one streaming pass
    emitting 2^p-byte register partials per block, driver max-merge,
    closed-form estimate. Never shuffles and never materializes values
    — the scale path for cardinality where ``grouped_count_distinct``'s
    exact exchange is too expensive."""
    if hash == "fast":
        from .relational import _key_hash64

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch[col]
        if col_arr.null_count:
            col_arr = col_arr.filter(pc.is_valid(col_arr))
        if hash == "md5":
            h = _md5_hash64(col_arr.to_pylist())
        else:
            h = _key_hash64(col_arr.combine_chunks()
                            if hasattr(col_arr, "combine_chunks")
                            else col_arr)
        return pa.table({"r": pa.array(hll_partial(h, p), pa.uint8())})

    parts = [t["r"].to_numpy()
             for t in ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)]
    regs = hll_merge(np.stack(parts)) if parts else np.zeros(1 << p,
                                                             np.uint8)
    return hll_estimate(regs)


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005): frequency estimation
# ---------------------------------------------------------------------------

CMS_W = 4096   # buckets per row
CMS_D = 4      # hash rows — all four carved from ONE md5 digest


def hll_intersect(ds, col: str, side_col: str, left, right,
                  p: int = 14) -> tuple[int, int, int]:
    """Sketch-based SET-INTERSECTION cardinality via inclusion-
    exclusion: ``|A∩B| ≈ |A| + |B| − |A∪B|`` where all three
    cardinalities come from HyperLogLog registers and the UNION
    sketch is free (register-wise max of A and B — the property that
    makes HLL mergeable). The audience-overlap / shared-vocabulary
    estimate with NO shuffle and no value materialization; error grows
    when the true intersection is small relative to the sets (the
    known inclusion-exclusion caveat — callers wanting guarantees
    route to the exact ``set_op`` intersect).

    ONE streaming pass emits one register partial per (block, side);
    the driver max-merges per side and floors each estimate before
    differencing (matching the SQL twin's integer arithmetic).
    Returns (est_left, est_right, est_inter)."""

    def partial(batch: pa.Table) -> pa.Table:
        sides = np.asarray(batch[side_col].to_pylist(), dtype=object)
        out_s, out_r = [], []
        for tag, want in ((0, left), (1, right)):
            m = sides == want
            if not m.any():
                continue
            vals = batch[col].filter(pa.array(m))
            h = _md5_hash64(vals.to_pylist())
            out_s.append(tag)
            out_r.append(hll_partial(h, p))
        if not out_s:
            return pa.table({"side": pa.array([], pa.int64()),
                             "r": pa.array([], pa.list_(pa.uint8()))})
        return pa.table({"side": pa.array(out_s, pa.int64()),
                         "r": pa.array([r.tolist() for r in out_r],
                                       pa.list_(pa.uint8()))})

    regs = {0: np.zeros(1 << p, np.uint8), 1: np.zeros(1 << p, np.uint8)}
    for t in ds.select_columns([col, side_col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for s, r in zip(t["side"].to_numpy(),
                        t["r"].to_numpy(zero_copy_only=False)):
            np.maximum(regs[int(s)], np.asarray(r, np.uint8),
                       out=regs[int(s)])
    ra, rb = regs[0], regs[1]
    ru = np.maximum(ra, rb)
    ea = int(np.floor(hll_estimate(ra)))
    eb = int(np.floor(hll_estimate(rb)))
    eu = int(np.floor(hll_estimate(ru)))
    return ea, eb, ea + eb - eu


def cms_buckets(token: str, w: int = CMS_W, d: int = CMS_D) -> list[int]:
    """The d bucket indices for a token: bytes [4j, 4j+4) of its md5
    digest mod w — the SQL twin is
    ``('0x' || substr(md5(token), 1 + 8*j, 8))::UBIGINT % w``."""
    dig = hashlib.md5(token.encode("utf8")).digest()
    return [int.from_bytes(dig[4 * j:4 * j + 4], "big") % w
            for j in range(d)]


def cms_partial(tokens, counts, w: int = CMS_W,
                d: int = CMS_D) -> np.ndarray:
    """Fold (token, count) pairs into a fresh d×w int64 register
    matrix. Callers pass value_counts output so each DISTINCT token is
    hashed once per block regardless of its frequency."""
    regs = np.zeros((d, w), np.int64)
    for tok, c in zip(tokens, counts):
        c = int(c)
        for j, b in enumerate(cms_buckets(str(tok), w, d)):
            regs[j, b] += c
    return regs


def cms_build(ds, text_col: str = "text", w: int = CMS_W,
              d: int = CMS_D) -> np.ndarray:
    """Distributed CMS over the whitespace-token stream of a text
    column: per-block partial register matrices (counts are additive,
    so the merge is a plain sum — d*w int64 = 128 KiB moves per block,
    never the tokens), driver sum. One streaming pass; the register
    estimate for any token then costs O(d) lookups with NO access to
    the corpus — the frequency-oracle shape for vocabularies too large
    to groupby (CCNet's per-shard counts, Gopher's repetition stats)."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch[text_col]))
        s = toks.to_pandas()
        s = s[s != ""]
        vc = s.value_counts()
        regs = cms_partial(vc.index.to_numpy(), vc.to_numpy(), w, d)
        return pa.table({"r": pa.array(regs.ravel(), pa.int64())})

    regs = np.zeros(d * w, np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        arr = t["r"].to_numpy()
        if len(arr):
            regs += arr.reshape(-1, d * w).sum(axis=0)
    return regs.reshape(d, w)


def cms_estimate(regs: np.ndarray, tokens, w: int = CMS_W,
                 d: int = CMS_D) -> np.ndarray:
    """Point-frequency estimates: min over the d rows — always an
    OVER-estimate of the true count (collisions only add)."""
    return np.array(
        [min(regs[j, b] for j, b in enumerate(cms_buckets(str(t), w, d)))
         for t in tokens], dtype=np.int64)


def cms_f2_join_size(ds, key_col: str, w: int = CMS_W,
                     d: int = CMS_D) -> tuple[int, int]:
    """Self-join cardinality / second frequency moment from the CMS
    registers (the AMS-style inner-product estimate, Cormode &
    Muthukrishnan 2005, public method): ``est = min_j Σ_b regs[j,b]²``
    over-estimates ``F2 = Σ_k c_k²`` (hash collisions only add cross
    terms) — the join-size / skew planner statistic that needs NO
    shuffle: per-block 128 KiB register partials, additive merge, one
    driver reduction. The exact F2 rides a native ``groupby(key)``
    count (key-cardinality result) for the side-by-side answer.
    Returns (est, exact)."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch[key_col].to_pandas()
        vc = s.value_counts()
        regs = cms_partial(vc.index.to_numpy(), vc.to_numpy(), w, d)
        return pa.table({"r": pa.array(regs.ravel(), pa.int64())})

    regs = np.zeros(d * w, np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        arr = t["r"].to_numpy()
        if len(arr):
            regs += arr.reshape(-1, d * w).sum(axis=0)
    R = regs.reshape(d, w)
    est = int(min(int((row * row).sum()) for row in R))
    exact = 0
    for t in ds.groupby(key_col).count() \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        c = t["count()"].to_numpy().astype(np.int64)
        exact += int((c * c).sum())
    return est, exact


def hll_count_distinct_grouped(ds, group_col: str, col: str, p: int = 14,
                               hash: str = "md5"):
    """Per-group approximate COUNT(DISTINCT col): one streaming pass
    emitting (group, 2^p-register) partials per block, driver
    max-merge keyed by the group, closed-form estimate per group.

    Scale contract: the driver combine is n_groups x 2^p bytes —
    sized for LOW-CARDINALITY groups (event types, languages, shards);
    high-cardinality keys should use ``relational
    .grouped_count_distinct``'s exact exchange instead. Values never
    leave their block; the exchange payload is registers only."""
    import pandas as pd

    if hash == "fast":
        from .relational import _key_hash64

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        col_arr = batch[col]
        valid = pc.is_valid(col_arr).to_numpy(zero_copy_only=False)
        if hash == "md5":
            h_all = _md5_hash64(col_arr.to_pylist())
        else:
            h_all = _key_hash64(col_arr.combine_chunks()
                                if hasattr(col_arr, "combine_chunks")
                                else col_arr)
        gs, rs = [], []
        for gv in pd.unique(g):
            mask = (g == gv) & valid
            gs.append(gv)
            rs.append(hll_partial(h_all[mask], p))
        return pa.table({
            group_col: pa.array(gs),
            "r": pa.array([r.tolist() for r in rs],
                          pa.list_(pa.uint8()))})

    acc: dict = {}
    for t in ds.select_columns([group_col, col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        gs = t[group_col].to_pylist()
        rs = t["r"].to_numpy(zero_copy_only=False)
        for gv, r in zip(gs, rs):
            r = np.asarray(r, np.uint8)
            prev = acc.get(gv)
            acc[gv] = np.maximum(prev, r) if prev is not None else r.copy()

    rows = [(gv, int(np.floor(hll_estimate(acc[gv])))) for gv in sorted(acc)]
    return pd.DataFrame(rows, columns=[group_col, "est_distinct"])


def quantile_sketch_partial(v: np.ndarray, k: int) -> tuple:
    """One block's equi-weight quantile summary: the k order statistics
    at ranks ceil((j+1/2)·n/k), each carrying weight n/k. Per-block
    rank error ≤ n_block/(2k); summed over a weighted merge the total
    rank error stays ≤ n/(2k) (Munro-Paterson-style deterministic
    summary — no RNG, so retries agree)."""
    n = len(v)
    if n == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    s = np.sort(v.astype(np.float64))
    if n <= k:
        return s, np.ones(n, np.float64)
    idx = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
    return s[np.minimum(idx, n - 1)], np.full(k, n / k, np.float64)


def weighted_resummarize(v: np.ndarray, w: np.ndarray, k: int) -> tuple:
    """Collapse a WEIGHTED point set back to k equi-weight points (the
    tree-merge level for ``quantile_sketch``): sort, pick the values at
    cumulative-weight targets (j+1/2)·W/k, each carrying W/k. Adds at
    most W/(2k) rank error per application."""
    if len(v) == 0:
        return v.astype(np.float64), w.astype(np.float64)
    order = np.argsort(v, kind="stable")
    sv, sw = v[order].astype(np.float64), w[order].astype(np.float64)
    if len(sv) <= k:
        return sv, sw
    cum = np.cumsum(sw)
    total = cum[-1]
    targets = (np.arange(k) + 0.5) * total / k
    idx = np.minimum(np.searchsorted(cum, targets), len(sv) - 1)
    return sv[idx], np.full(k, total / k, np.float64)


def quantile_sketch(ds, col: str, qs, k: int = 1024,
                    levels: int = 1, fan_in: int = 32) -> dict:
    """ONE-PASS approximate quantiles over an UNBOUNDED value domain —
    the streaming counterpart of ``relational.quantile_unbounded``
    (exact, but three passes): each block ships a k-point equi-weight
    summary (16 KiB), the driver computes weighted quantiles over the
    merged summaries. Deterministic given the block layout; rank error
    ≤ 1/(2k) of n per block summary (≈0.05% at k=1024). The driver
    holds O(blocks·k) points; ``levels=2`` inserts a TREE-MERGE pass
    (coalesce ~``fan_in`` summaries per block, ``weighted_resummarize``
    back to k points) so the driver sees O(blocks/fan_in · k) instead —
    each level adds ≤ W/(2k) rank error. The Spark approxQuantile /
    telemetry-latency shape. Returns {q: value}."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        pts, w = quantile_sketch_partial(v, k)
        return pa.table({"v": pa.array(pts, pa.float64()),
                         "w": pa.array(w, pa.float64())})

    sums = ds.map_batches(partial, batch_format="pyarrow")
    try:  # lazy Datasets can't report block counts; estimate is fine
        nblk = ds.num_blocks()
    except Exception:
        nblk = fan_in * fan_in

    def collapse(batch: pa.Table) -> pa.Table:
        pts, w = weighted_resummarize(batch["v"].to_numpy(),
                                      batch["w"].to_numpy(), k)
        return pa.table({"v": pa.array(pts, pa.float64()),
                         "w": pa.array(w, pa.float64())})

    for _ in range(max(0, levels - 1)):
        nblk = max(1, nblk // fan_in)
        sums = sums.repartition(nblk).map_batches(
            collapse, batch_format="pyarrow", batch_size=None)

    vs, ws = [], []
    for t in sums.iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            vs.append(t["v"].to_numpy())
            ws.append(t["w"].to_numpy())
    qs = [qs] if isinstance(qs, (int, float)) else list(qs)
    if not vs:
        return {q: float("nan") for q in qs}
    v = np.concatenate(vs)
    w = np.concatenate(ws)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = {}
    for q in qs:
        pos = int(np.searchsorted(cum, q * total))
        out[q] = float(v[min(pos, len(v) - 1)])
    return out


def fixed_histogram(ds, col: str, lo: float, width: float, n_bins: int):
    """Exact fixed-bin histogram as a register combine — the
    distribution-profile / dataset-card primitive. Each block folds its
    values into an (n_bins+2)-slot int64 count vector with one
    np.bincount (slot 0 = below lo, slot n_bins+1 = at/above
    lo + n_bins*width), the driver sums the tiny per-block vectors —
    n_bins integers move per block, never the values. Bin assignment is
    floor((v - lo)/width), identical double arithmetic to the SQL twin,
    so the counts are exact, not approximate.

    The reference has no distribution operators; this is a graft
    addition (training-data profiling family, same combine shape as
    ``hll_count_distinct``). Returns a pa.Table (bin, lo, n) with one
    row per non-empty slot; bin is -1 for underflow, n_bins for
    overflow."""
    nb = int(n_bins)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.floor((v - lo) / width)
        idx = np.clip(idx, -1, nb).astype(np.int64) + 1
        counts = np.bincount(idx, minlength=nb + 2)
        return pa.table({"slot": pa.array(np.arange(nb + 2), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    total = np.zeros(nb + 2, dtype=np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            total[t["slot"].to_numpy()] += t["n"].to_numpy()
    keep = np.flatnonzero(total)
    bins = keep - 1
    return pa.table({
        "bin": pa.array(bins, pa.int64()),
        "bin_lo": pa.array(lo + bins * width, pa.float64()),
        "n": pa.array(total[keep], pa.int64())})


def fixed_histogram_2d(ds, x_col: str, y_col: str,
                       x_lo: float, x_width: float, x_bins: int,
                       y_lo: float, y_width: float, y_bins: int):
    """Exact 2-D fixed-bin histogram as a register combine — the joint
    distribution profile (length x quality, size x aspect) of a
    dataset card. One composite np.bincount per block over
    (x_bin, y_bin) with under/overflow slots on both axes
    ((x_bins+2) x (y_bins+2) int64 registers move per block, never
    rows); bin rule is the same exact double floor((v-lo)/width) as
    ``fixed_histogram``. Returns (x_bin, y_bin, n) for non-empty
    cells; -1 / n_bins mark under/overflow."""
    nx, ny = int(x_bins), int(y_bins)
    W = ny + 2

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xi = np.clip(np.floor((x - x_lo) / x_width), -1, nx) \
            .astype(np.int64) + 1
        yi = np.clip(np.floor((y - y_lo) / y_width), -1, ny) \
            .astype(np.int64) + 1
        counts = np.bincount(xi * W + yi, minlength=(nx + 2) * W)
        return pa.table({"slot": pa.array(np.arange((nx + 2) * W),
                                          pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    total = np.zeros((nx + 2) * W, dtype=np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            total[t["slot"].to_numpy()] += t["n"].to_numpy()
    keep = np.flatnonzero(total)
    return pa.table({
        "x_bin": pa.array(keep // W - 1, pa.int64()),
        "y_bin": pa.array(keep % W - 1, pa.int64()),
        "n": pa.array(total[keep], pa.int64())})


def psi_drift(ds, col: str, side_col: str, lo: float, width: float,
              n_bins: int):
    """Population Stability Index between two slices of one stream —
    the distribution-drift monitor of a curation loop (new crawl batch
    vs reference corpus, train vs validation): per bin,
    ``(p - q) * ln(p / q)`` with add-1-smoothed bin shares p (side 0)
    and q (side 1). ONE streaming pass: each block folds its values
    into TWO (n_bins+2)-slot int64 count registers (side-selected
    bincount, same exact double bin rule as ``fixed_histogram``); the
    driver sums registers and emits per-bin integer micro
    contributions — each bin rounds independently, so the output is
    order-free and SQL-exact; the scalar PSI is the downstream sum.
    Returns pa.Table (bin, n_ref, n_cur, psi_micro) for bins with any
    mass."""
    nb = int(n_bins)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        side = batch[side_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.floor((v - lo) / width)
        idx = np.clip(idx, -1, nb).astype(np.int64) + 1
        slots = side * (nb + 2) + idx
        counts = np.bincount(slots, minlength=2 * (nb + 2))
        return pa.table({"slot": pa.array(np.arange(2 * (nb + 2)),
                                          pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    total = np.zeros(2 * (nb + 2), dtype=np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            total[t["slot"].to_numpy()] += t["n"].to_numpy()
    n_ref, n_cur = total[:nb + 2], total[nb + 2:]
    keep = np.flatnonzero(n_ref + n_cur)
    d_ref = float(n_ref.sum() + nb + 2)
    d_cur = float(n_cur.sum() + nb + 2)
    p = (n_ref[keep] + 1.0) / d_ref
    q = (n_cur[keep] + 1.0) / d_cur
    micro = np.round((p - q) * np.log(p / q) * 1e6).astype(np.int64)
    return pa.table({
        "bin": pa.array(keep - 1, pa.int64()),
        "n_ref": pa.array(n_ref[keep], pa.int64()),
        "n_cur": pa.array(n_cur[keep], pa.int64()),
        "psi_micro": pa.array(micro, pa.int64())})


def profile_columns(ds, spec: dict):
    """Dataset-card column profiler: ONE streaming pass computes per
    column (n_rows, n_null, min_v, max_v) as a register combine — each
    block ships one tiny row per column, the driver merges. ``spec``
    maps column -> kind: 'num' profiles the value, 'str' the character
    LENGTH (numeric, so every profile row has one clean schema), 'ts'
    the floor-epoch-seconds — all exact and SQL-twin-reproducible.
    Returns a pandas DataFrame (col, n_rows, n_null, min_v, max_v)
    sorted by col; min/max are NaN for all-null columns."""
    import pandas as pd
    import pyarrow.compute as _pc

    cols = sorted(spec)

    def partial(batch: pa.Table) -> pa.Table:
        names, nr, nn, mns, mxs = [], [], [], [], []
        for c in cols:
            arr = batch[c]
            kind = spec[c]
            if kind == "str":
                v = _pc.utf8_length(arr).cast(pa.float64())
            elif kind == "ts":
                # floor(us/1e6) in double == SQL floor(epoch(ts)): the
                # quotient error is < ulp and cannot cross the integer
                # boundary for exact-µs inputs; nulls propagate
                us = arr.cast(pa.timestamp("us")).cast(pa.int64())
                v = _pc.floor(_pc.divide(us.cast(pa.float64()), 1e6))
            else:
                v = arr.cast(pa.float64())
            mm = _pc.min_max(v)  # skips nulls
            names.append(c)
            nr.append(len(batch))
            nn.append(arr.null_count)
            mns.append(mm["min"].as_py())
            mxs.append(mm["max"].as_py())
        return pa.table({"col": pa.array(names, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "n_null": pa.array(nn, pa.int64()),
                         "min_v": pa.array(mns, pa.float64()),
                         "max_v": pa.array(mxs, pa.float64())})

    parts = [t.to_pandas() for t in ds.map_batches(
        partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None) if len(t)]
    df = pd.concat(parts)
    out = df.groupby("col", as_index=False).agg(
        n_rows=("n_rows", "sum"), n_null=("n_null", "sum"),
        min_v=("min_v", "min"), max_v=("max_v", "max"))
    return out.sort_values("col").reset_index(drop=True)


def kmv_jaccard_pairs(ds, group_col: str, text_col: str = "text",
                      k: int = 128, shingle_k: int = 3) -> pa.Table:
    """Pairwise set-similarity between GROUPS (sources, languages,
    snapshots) via bottom-k / KMV sketches (Bar-Yossef et al. 2002;
    Beyer et al. SIGMOD 2007 — the public k-minimum-values estimator):
    each group's distinct word-``shingle_k``-gram md5 hashes reduce to
    the k smallest, and for every group pair the Jaccard estimate is

        |K_a ∩ K_b ∩ bottom_k(K_a ∪ K_b)| / min(k, |K_a ∪ K_b|)

    emitted integer-exact as ``jaccard_ppm = 10^6 * inter // k_eff`` —
    so the whole sketch pipeline (hashing, bottom-k reduction, pair
    estimate) oracle-checks against DuckDB row_number() twins.

    Scale shape — the register-combine pattern (HLL above): each block
    folds its rows into per-group bottom-k partials (one vectorized
    np.unique + partition per group run), the driver merges O(blocks x
    groups_per_block) k-vectors and does the G^2/2 pairwise estimates
    over G groups (corpus sources/shards: G <= 10^3, trivially
    driver-sized; the corpus itself never moves). Returns
    (group_a, group_b, k_eff, inter, jaccard_ppm) sorted."""
    from .dedup import word_shingles

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "h": pa.array([], pa.uint64())})
        groups = np.asarray(batch[group_col].to_pylist(), dtype=object)
        texts = batch[text_col].to_pylist()
        out_g: list = []
        out_h: list = []
        # fold rows group-locally: distinct gram hashes, keep k smallest
        order = np.argsort(groups, kind="stable")
        g_s = groups[order]
        run_starts = np.flatnonzero(
            np.concatenate(([True], g_s[1:] != g_s[:-1])))
        bounds = np.append(run_starts, len(g_s))
        for i, s in enumerate(run_starts):
            e = bounds[i + 1]
            # strict windowed grams == the SQL UNNEST(range(...)) twin;
            # md5 runs once per DISTINCT gram (memoized per worker)
            hs = [word_shingles(texts[j], shingle_k, strict=True)
                  for j in order[s:e]]
            hs = [x for x in hs if len(x)]
            if not hs:
                continue
            kk = np.unique(np.concatenate(hs))[:k]
            out_g.extend([str(g_s[s])] * len(kk))
            out_h.append(kk)
        return pa.table({
            group_col: pa.array(out_g, pa.string()),
            "h": pa.array(np.concatenate(out_h) if out_h else
                          np.empty(0, np.uint64), pa.uint64())})

    sketches: dict[str, np.ndarray] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        gs = np.asarray(t[group_col].to_pylist(), dtype=object)
        hs = t["h"].to_numpy()
        for g in np.unique(gs):
            cur = hs[gs == g]
            prev = sketches.get(str(g))
            merged = cur if prev is None else np.concatenate((prev, cur))
            sketches[str(g)] = np.unique(merged)[:k]

    names = sorted(sketches)
    rows_a, rows_b, keffs, inters, ppms = [], [], [], [], []
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            ka, kb = sketches[ga], sketches[gb]
            union = np.unique(np.concatenate((ka, kb)))[:k]
            k_eff = len(union)
            # inter = |bottom_k(union) ∩ K_a ∩ K_b|
            inter = int((np.isin(union, ka) & np.isin(union, kb)).sum())
            rows_a.append(ga)
            rows_b.append(gb)
            keffs.append(k_eff)
            inters.append(inter)
            ppms.append((1_000_000 * inter) // k_eff if k_eff else 0)
    return pa.table({
        "group_a": pa.array(rows_a, pa.string()),
        "group_b": pa.array(rows_b, pa.string()),
        "k_eff": pa.array(keffs, pa.int64()),
        "inter": pa.array(inters, pa.int64()),
        "jaccard_ppm": pa.array(ppms, pa.int64())})


def _merge_runs(key: np.ndarray, first: np.ndarray, last: np.ndarray,
                w: int):
    """Coalesce per-key timestamp runs: a point t answers window ends
    in [t, t + w], so two runs of the same key merge when the next
    first is <= prev max(last) + w + 1 (overlap-or-adjacent on integer
    ends). Vectorized interval merge: sort by (key, first), segmented
    exclusive cummax of ``last`` (offset trick, overflow-safe after
    rebasing ts to the observed span), boundary where a first clears
    the running max by more than w + 1. Returns merged
    (key, first, last)."""
    if len(key) == 0:
        return key, first, last
    order = np.lexsort((first, key))
    k, f, l = key[order], first[order], last[order]
    newseg = np.concatenate(([True], k[1:] != k[:-1]))
    seg = np.cumsum(newseg) - 1
    base = int(min(f[0], l.min()))
    off = int(l.max()) - base + int(w) + 2
    cm = np.maximum.accumulate(l - base + seg * off) - seg * off + base
    cm_prev = np.concatenate(([base], cm[:-1]))  # exclusive running max
    newrun = newseg | (f > cm_prev + w + 1)
    starts = np.flatnonzero(newrun)
    return k[starts], f[starts], np.maximum.reduceat(l, starts)


def hll_sliding(ds, col: str, ts_col: str, ends_us, window_us: int,
                p: int = 14):
    """Timestamped (sliding-window) HyperLogLog — the streaming upgrade
    of ``hll_count_distinct`` for "distinct users in the LAST w hours"
    reads without re-scanning history per query (public technique:
    sliding HLL / LPFM lists, Fusy & Giroire; Chabchoub & Hebrail).
    The sketch stores, per (register, rho) pair, the gap-coalesced
    RUNS of event timestamps (runs closer than window_us merge — see
    ``_merge_runs``). Because a pair answers "was rho observed in
    [end - w, end]" iff some run satisfies first <= end <= last + w,
    the coalesced staircase is LOSSLESS for the fixed width w: ANY
    window end (past or trailing) estimates exactly as a from-scratch
    replay — a max-stamp-only sketch would mask an in-window
    observation re-seen after the window end and bias past-end reads
    low.

    Scale shape: per-block partials coalesce locally (a combiner: run
    merge is associative); the driver merges run-sized partials —
    bounded by 2^p x (64 - p + 1) pairs x (span / w + 1) runs, never
    by rows — and answers every requested window from the one merged
    sketch. Exact companion per window for the oracle's benefit is the
    caller's job (count DISTINCT over the window filter).

    Returns a list of (end_us, est_distinct:int) per requested end."""
    import pyarrow.compute as pc

    ends_us = [int(e) for e in ends_us]
    w_us = int(window_us)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"idx": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.int64()),
                          "first_ts": pa.array([], pa.int64()),
                          "last_ts": pa.array([], pa.int64())})
        col_arr = batch[col]
        if col_arr.null_count:
            keep = pc.is_valid(col_arr)
            batch = batch.filter(keep)
            col_arr = batch[col]
        if len(batch) == 0:
            return empty
        h = _md5_hash64(col_arr.to_pylist())
        ts = batch[ts_col].to_numpy().astype(np.int64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        # exact for any p (frexp would misrank near 2^k once 64-p > 53)
        bitlen = _bit_length_u64(w)
        rho = ((64 - p) - bitlen + 1).astype(np.int64)
        key = idx * 64 + rho
        mk, mf, ml = _merge_runs(key, ts, ts, w_us)
        return pa.table({
            "idx": pa.array(mk // 64, pa.int64()),
            "rho": pa.array(mk % 64, pa.int64()),
            "first_ts": pa.array(mf, pa.int64()),
            "last_ts": pa.array(ml, pa.int64())})

    parts = [t for t in ds.select_columns([col, ts_col])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if len(t)]
    if not parts:
        return [(e, 0) for e in ends_us]
    allp = pa.concat_tables(parts)
    key = allp["idx"].to_numpy() * 64 + allp["rho"].to_numpy()
    mk, mf, ml = _merge_runs(key, allp["first_ts"].to_numpy(),
                             allp["last_ts"].to_numpy(), w_us)
    sidx, srho = mk // 64, mk % 64
    out = []
    for end in ends_us:
        live = (mf <= end) & (end <= ml + w_us)
        regs = np.zeros(1 << p, np.uint8)
        np.maximum.at(regs, sidx[live], srho[live].astype(np.uint8))
        out.append((end, int(np.floor(hll_estimate(regs)))))
    return out


def pcsa_distinct(ds, col: str, n_regs: int = 64):
    """Flajolet-Martin PCSA (Probabilistic Counting with Stochastic
    Averaging, 1985 — the original distinct-count sketch, predating
    HLL): ``n_regs`` BITMAPS instead of max-rho registers; item ->
    register = hash mod n_regs, sets bit rho (leading-zero rank of the
    remaining hash bits); registers OR-merge (associative, idempotent —
    a combiner). Estimate = n_regs / 0.77351 * 2^(mean lowest-UNSET-bit
    index). Kept beside HLL because the bitmap design answers "was a
    rho ever seen" exactly, which max-registers cannot.

    Bit-reproducible: hashes are md5-top-64 (the SQL twin replays every
    bitmap with bit_or and the trailing-ones trick lowest_unset(b) =
    bit_count(xor(b, b+1)) - 1). Returns (est_distinct:int, bitmaps as
    int64 list) — driver-side sketch is n_regs x 8 bytes."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch[col]
        if col_arr.null_count:
            col_arr = col_arr.filter(pc.is_valid(col_arr))
        regs = np.zeros(n_regs, np.uint64)
        if len(col_arr):
            h = _md5_hash64(col_arr.to_pylist())
            idx = (h % np.uint64(n_regs)).astype(np.int64)
            w = h // np.uint64(n_regs)
            # w < 2^58 exceeds float53 precision: integer bit length
            # (matches the SQL twin's length(bin(w)) exactly; frexp
            # would report 58 for 2^57-1 and wrap rho at 2^58 bounds)
            bitlen = _bit_length_u64(w)
            rho = (58 - bitlen).astype(np.uint64)       # leading-zero rank
            rho = np.minimum(rho, np.uint64(63))
            np.bitwise_or.at(regs, idx, np.uint64(1) << rho)
        return pa.table({"r": pa.array(regs.view(np.int64), pa.int64())})

    parts = [t["r"].to_numpy().view(np.uint64)
             for t in ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)]
    regs = (np.bitwise_or.reduce(np.stack(parts), axis=0)
            if parts else np.zeros(n_regs, np.uint64))
    # lowest unset bit via the trailing-ones identity, vectorized
    x = regs ^ (regs + np.uint64(1))
    low_unset = np.array([int(v).bit_count() - 1 for v in x], np.int64)
    est = n_regs / 0.77351 * (2.0 ** (low_unset.mean()))
    return int(np.floor(est)), regs.view(np.int64)


def ams_f2(ds, col: str, n_sketches: int = 16):
    """AMS second-moment (F2) sketch (Alon-Matias-Szegedy 1996, public
    classic): K independent +-1 hash projections Z_k = sum_v s_k(v) f_v
    estimate F2 = sum_v f_v^2 as mean(Z_k^2) (each Z_k^2 is unbiased).
    Signs are md5 bits (bit k of md5(value)), so every Z_k is an exact
    integer and the SQL twin hash-matches; the sketch is a combiner
    (Z_k sums across blocks).

    Returns (f2_est:int, z:int64[K]) — the self-join F2 the sketch
    replaces costs a full value-frequency exchange; the sketch is one
    streaming pass and K ints."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch[col]
        if col_arr.null_count:
            col_arr = col_arr.filter(pc.is_valid(col_arr))
        z = np.zeros(n_sketches, np.int64)
        if len(col_arr):
            h = _md5_hash64(col_arr.to_pylist())
            bits = ((h[None, :] >> np.arange(n_sketches,
                                             dtype=np.uint64)[:, None])
                    & np.uint64(1)).astype(np.int64)
            z = (1 - 2 * bits).sum(axis=1)
        return pa.table({"z": pa.array(z, pa.int64())})

    z = np.zeros(n_sketches, np.int64)
    for t in ds.select_columns([col]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        z += t["z"].to_numpy()
    f2 = int((z.astype(object) ** 2).sum() // n_sketches)
    return f2, z
