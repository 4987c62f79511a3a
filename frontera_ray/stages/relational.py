"""Relational / shaping operators expressed Ray-Data-first.

These are the generic pieces the crawl engine and training-data
pipelines share: broadcast hash-join (small side via ray.put, no
shuffle), per-key top-k / per-key caps (the broad-crawl batch-shaping
primitive, hbase/__init__.py:198-296 semantics), global top-k,
gap-based sessionization and an AS-OF join.

Keyed operators run a run-aware vectorized kernel behind ONE keyed
exchange (``keyed_exchange``): sort-based groupby by default (cheap at
moderate key counts — each hash exchange costs ~1-2 s fixed on this
box), or ``exchange='hash'`` — key-hash repartition + one kernel call
per PARTITION — when per-key UDF-call overhead (10^9 users) or the
sort itself becomes the scaling wall. Same kernel both ways.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def cluster_cpus(default: int = 8) -> int:
    """Logical CPU count of the (local) cluster, for sizing actor
    pools / exchanges to the node; ``default`` when Ray is not up."""
    import ray

    return (int(ray.cluster_resources().get("CPU", default))
            if ray.is_initialized() else default)


# Measured crossover for exchange choice (the ONE shared scale knob —
# every query that picks an exchange strategy routes through
# ``choose_exchange`` instead of re-encoding a CPU literal). Below this
# CPU count the fixed setup cost of a parallel exchange wave (the
# two-stage task shuffle's fan-out, or Ray 2.49's hash-aggregator actor
# wave — seconds, see COVERAGE.md §hash-exchange-stall) exceeds the
# sort-based groupby it replaces; at or above it the parallel exchange
# wins and keeps winning as cpus grow (task/hash exchanges scale with
# partition count; the sort is a global barrier). A 256-core cluster
# therefore inherits the right branch automatically — the knob marks
# the SMALL-cluster cutoff, not a tuned-for-32-cores setting. Override
# per deployment via FRONTERA_RAY_EXCHANGE_CROSSOVER if a different
# box measures a different break-even.
EXCHANGE_CPU_CROSSOVER = int(
    __import__("os").environ.get("FRONTERA_RAY_EXCHANGE_CROSSOVER", "16"))


def choose_exchange(parallel: str = "tasks", small: str = "groups",
                    cpus: int | None = None) -> str:
    """Pick the keyed-exchange strategy from the cluster size:
    ``parallel`` ('tasks' or 'hash') at >= EXCHANGE_CPU_CROSSOVER
    logical CPUs, else ``small`` (sort-groupby). See the crossover
    comment above for the measurement and scaling argument."""
    c = cpus if cpus is not None else cluster_cpus()
    return parallel if c >= EXCHANGE_CPU_CROSSOVER else small


def partial_groupby_agg(ds, keys, aggs: dict):
    """Combiner-style aggregate for LOW-CARDINALITY keys: per-block
    pandas groupby inside map_batches (the partial/combine step), then a
    driver-side merge of the tiny partials — no all-to-all shuffle.
    ~6x faster than the hash-shuffle groupby on small group counts;
    high-cardinality keys (e.g. per-document dedup) should keep
    ``ds.groupby()`` instead.

    ``aggs``: {out_col: (in_col, fn)} with fn in
    {'sum','count','min','max'}. Returns a pandas DataFrame."""
    import pandas as pd

    keys = [keys] if isinstance(keys, str) else list(keys)
    spec = {out: (col, fn) for out, (col, fn) in aggs.items()}

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        named = {
            out: pd.NamedAgg(column=col, aggfunc="size" if fn == "count" else fn)
            for out, (col, fn) in spec.items()
        }
        g = df.groupby(keys, as_index=False).agg(**named)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = pa.concat_tables(
        list(ds.map_batches(partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    df = parts.to_pandas()
    final = {
        out: pd.NamedAgg(column=out, aggfunc="sum" if fn == "count" else fn)
        for out, (col, fn) in spec.items()
    }
    return df.groupby(keys, as_index=False).agg(**final)


def rollup_from_finest(df, levels, value_cols, all_label: str = "<all>"):
    """GROUP BY ROLLUP derived from the finest-level aggregate: for
    levels (a, b, ...) emit the grouping sets (a, b, ...), (a, ...),
    ..., () by re-summing the FINEST frame, with rolled-up label
    columns set to ``all_label`` (COALESCE presentation of SQL's
    rollup NULLs).

    Scale contract: ``df`` is the OUTPUT of a distributed partial
    aggregate (combiner-small by construction — e.g. 25 nations); the
    coarser sets are then a driver-side re-sum over that small frame,
    never a second pass over base rows. Only additive aggregates
    (sum / count) roll up this way — min/max do too, but averages
    must be carried as (sum, count) pairs."""
    import pandas as pd

    levels = list(levels)
    value_cols = list(value_cols)
    pieces = [df.copy()]
    for i in range(len(levels) - 1, -1, -1):
        keep = levels[:i]
        if keep:
            g = df.groupby(keep, as_index=False)[value_cols].sum()
        else:
            g = df[value_cols].sum().to_frame().T
        for col in levels[i:]:
            g[col] = all_label
        pieces.append(g)
    out = pd.concat(pieces, ignore_index=True)[list(df.columns)]
    for c in value_cols:
        out[c] = out[c].astype(df[c].dtype)
    return out


def cube_from_finest(df, levels, value_cols, all_label: str = "<all>"):
    """GROUP BY CUBE derived from the finest-level aggregate: every
    subset of ``levels`` (all 2^n grouping sets) re-summed from the
    finest frame, rolled-up label columns set to ``all_label``. Same
    scale contract as ``rollup_from_finest`` — ``df`` is the small
    output of a distributed partial aggregate, so the extra grouping
    sets never touch base rows; only additive aggregates roll up."""
    import itertools

    import pandas as pd

    levels = list(levels)
    value_cols = list(value_cols)
    pieces = [df.copy()]
    for r in range(len(levels) - 1, -1, -1):
        for keep in itertools.combinations(levels, r):
            if keep:
                g = df.groupby(list(keep), as_index=False)[value_cols].sum()
            else:
                g = df[value_cols].sum().to_frame().T
            for col in levels:
                if col not in keep:
                    g[col] = all_label
            pieces.append(g)
    out = pd.concat(pieces, ignore_index=True)[list(df.columns)]
    for c in value_cols:
        out[c] = out[c].astype(df[c].dtype)
    return out


def grouping_sets_from_finest(df, levels, sets, value_cols,
                              all_label: str = "<all>"):
    """GROUP BY GROUPING SETS derived from the finest-level aggregate:
    each requested set (a subset of ``levels``, possibly ()) re-summed
    from the finest frame, absent label columns set to ``all_label``.
    The general form of rollup/cube (which are the prefix chain and
    the full powerset respectively); same scale contract — ``df`` is
    the small output of a distributed partial aggregate, base rows are
    never re-scanned, only additive aggregates roll up. A set equal to
    ``levels`` itself passes ``df`` through unchanged, so the finest
    rows appear exactly once however the caller orders ``sets``."""
    import pandas as pd

    levels = list(levels)
    value_cols = list(value_cols)
    pieces = []
    for keep in sets:
        keep = [c for c in levels if c in set(keep)]  # canonical order
        if keep == levels:
            pieces.append(df.copy())
            continue
        if keep:
            g = df.groupby(keep, as_index=False)[value_cols].sum()
        else:
            g = df[value_cols].sum().to_frame().T
        for col in levels:
            if col not in keep:
                g[col] = all_label
        pieces.append(g)
    out = pd.concat(pieces, ignore_index=True)[list(df.columns)]
    for c in value_cols:
        out[c] = out[c].astype(df[c].dtype)
    return out


def per_key_lag_delta(ds, key_col: str, order_col: str,
                      out_col: str = "delta", tiebreak: str | None = None,
                      exchange: str | None = None):
    """LAG window delta: ``order_col`` minus the previous row's value
    within the key (ordered by ``order_col`` then ``tiebreak``); NULL
    for each key's first row — SQL's
    ``x - lag(x) OVER (PARTITION BY key ORDER BY x, tb)``.
    One keyed exchange + one lexsort; deltas are a run-aware
    ``np.diff`` with run starts masked NULL. ``order_col`` must be an
    integer column (convert timestamps to epoch units upstream)."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, vals, keys))
        else:
            order = np.lexsort((vals, keys))
        sk, sv = keys[order], vals[order]
        delta = np.empty(len(sv), np.int64)
        delta[0] = 0
        delta[1:] = sv[1:] - sv[:-1]
        first = np.concatenate(([True], sk[1:] != sk[:-1]))
        out = batch.take(pa.array(order))
        return out.append_column(
            out_col, pa.array(delta, pa.int64(), mask=first))

    return keyed_exchange(ds, key_col, kern, exchange)


def transition_counts(ds, key_col: str, order_col: str, val_col: str,
                      tiebreak: str | None = None,
                      exchange: str | None = None):
    """Markov transition counts: per key ordered by ``order_col``,
    count consecutive (prev ``val_col`` -> ``val_col``) pairs across
    the whole dataset. One keyed exchange; the kernel emits
    PRE-AGGREGATED ``(from_val, to_val, n)`` partials per batch (the
    pair vocabulary is tiny relative to rows), merged by the caller
    (driver pandas sum over the small partial frames)."""
    import pandas as pd

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({"from_val": pa.array([], pa.string()),
                          "to_val": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        vals = batch[val_col].to_numpy(zero_copy_only=False)[order]
        same = sk[1:] == sk[:-1]
        if not same.any():
            return empty
        g = (pd.DataFrame({"from_val": vals[:-1][same],
                           "to_val": vals[1:][same]})
             .groupby(["from_val", "to_val"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.table({"from_val": pa.array(g["from_val"], pa.string()),
                         "to_val": pa.array(g["to_val"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    parts = pa.concat_tables(
        list(keyed_exchange(ds, key_col, kern, exchange)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    return (parts.to_pandas()
            .groupby(["from_val", "to_val"], as_index=False)["n"].sum())


def broadcast_join(ds, small_table: pa.Table, key: str, columns=None,
                   small_prefix: str = ""):
    """Hash-join a Dataset against a small in-memory table without a
    shuffle: the small side is ray.put once and each task builds (and
    caches) the lookup. Inner join semantics; unmatched rows dropped."""
    import ray

    import pandas as pd

    if columns:
        small_table = small_table.select([key] + list(columns))
    ref = ray.put(small_table)
    cache: dict[str, tuple] = {}

    def join_batch(batch: pa.Table) -> pa.Table:
        k = ref.hex()
        if k not in cache:
            st = ray.get(ref)
            # vectorized hash index (pandas) — built once per worker
            cache[k] = (st, pd.Index(st[key].to_pandas()))
        st, index = cache[k]
        rows = index.get_indexer(batch[key].to_pandas())
        mask = rows >= 0
        batch = batch.filter(pa.array(mask))
        taken = st.take(pa.array(rows[mask]))
        for name in st.column_names:
            if name == key:
                continue
            batch = batch.append_column(small_prefix + name, taken[name])
        return batch

    return ds.map_batches(join_batch, batch_format="pyarrow")


_NUM_KEY_PARTITIONS = 16


def hash_partitioned(ds, key: str, num_blocks: int = _NUM_KEY_PARTITIONS):
    """Key-hash repartition (no sort): every key's rows land whole in
    exactly one block, so a whole-block map_batches kernel can process
    complete groups vectorized — one Python call per PARTITION instead
    of one per group (groupby().map_groups pays a call per key, which
    is the scaling wall at 10^9 keys). Requires the hash-shuffle
    strategy; enabled on the dataset's own context copy (inherited by
    derived datasets), so other pipelines keep the default."""
    from .dedup import _enable_hash_shuffle

    return _enable_hash_shuffle(ds.repartition(num_blocks=num_blocks,
                                               keys=[key]))


def _arrow_types(ds) -> dict:
    """name -> pyarrow type for a Dataset, tolerating pandas-backed
    blocks (whose schema carries numpy dtypes instead of a pa.Schema)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out = {}
    for name, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            t = (pa.string() if getattr(t, "kind", "") in ("O", "U")
                 else pa.from_numpy_dtype(t))
        out[name] = t
    return out


def _group_codes(arr: np.ndarray) -> np.ndarray:
    """Sortable int codes for a (possibly string) key column."""
    if arr.dtype == object:
        import pandas as pd

        return pd.factorize(arr)[0]
    return arr


def keyed_exchange(ds, key: str, kernel, exchange: str | None = None):
    """Run a run-aware vectorized kernel over complete key groups.

    The kernel must handle a batch containing ANY number of complete key
    groups (it sorts by key and walks runs), so all exchanges feed it:

    - ``'groups'`` (default): sort-based ``groupby(key).map_groups`` —
      one kernel call per key, but no hash-shuffle aggregator actors;
      the cheap choice up to ~1e5 keys (measured: each hash exchange
      costs ~1-2 s fixed on this box).
    - ``'hash'``: key-hash repartition into a fixed block count — one
      kernel call per PARTITION; the scale path when per-key UDF-call
      overhead (1e9 keys) or the sort itself dominates.
    - ``'tasks'``: the same partitioning contract implemented as a
      classic two-stage raw-task shuffle (``task_exchange``) — no
      shuffle-aggregator actors at all; measured 2-5x faster than
      ``'hash'`` on this box for the join family (Ray 2.49's aggregator
      wave costs seconds fixed and can wedge under CPU starvation —
      see COVERAGE.md §hash-exchange-stall)."""
    if exchange is None:
        # policy default: the raw-task shuffle at cluster scale
        # (measured 2-4x over both alternatives across the suite),
        # sort-groupby in small sessions (see choose_exchange)
        exchange = choose_exchange("tasks")
    if exchange == "tasks":
        return task_exchange(ds, key, kernel)
    if exchange == "hash":
        return hash_partitioned(ds, key).map_batches(
            kernel, batch_format="pyarrow", batch_size=None)
    if exchange == "groups":
        return ds.groupby(key).map_groups(kernel, batch_format="pyarrow")
    raise ValueError(
        f"exchange must be 'groups', 'hash' or 'tasks', got {exchange!r}")


def _task_partition_ids(col, P: int) -> np.ndarray:
    """Deterministic partition id per row for ``task_exchange``: the
    key column is first canonicalized (dictionary decoded; any integer
    width -> int64; floats -> float64; everything else -> string;
    NULLs -> the type's zero sentinel) so a key VALUE hashes
    identically regardless of the per-block dtype it arrived in (an
    int64 block and a null-carrying block that numpy would degrade to
    float64 must still co-locate). NULL keys all land in one partition
    (shared with the sentinel's real-value rows — a balance detail,
    not a correctness one: kernels see actual column values and handle
    multi-key batches by contract). The hash is pandas'
    ``hash_array`` (fixed-key siphash — stable across processes)."""
    import pandas as pd

    t = col.type
    if pa.types.is_dictionary(t):
        col = pc.cast(col, t.value_type)
        t = col.type
    if pa.types.is_unsigned_integer(t) and t.bit_width == 64:
        # uint64 keys (hash columns) overflow an int64 CAST for values
        # >= 2^63: reinterpret the bit pattern instead — same identity,
        # same hash, no range error
        arr = pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.uint64).view(np.int64)
    elif pa.types.is_integer(t) or pa.types.is_boolean(t):
        arr = pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy()
    elif pa.types.is_floating(t):
        arr = pc.fill_null(pc.cast(col, pa.float64()), 0.0).to_numpy()
    else:
        arr = pc.fill_null(pc.cast(col, pa.string()), "").to_numpy(
            zero_copy_only=False)
    h = pd.util.hash_array(np.ascontiguousarray(arr))
    return (h % P).astype(np.int64)


def task_exchange(ds, key: str, kernel, num_partitions: int | None = None,
                  fanin: int = 128):
    """Classic two-stage shuffle as raw Ray tasks — the keyed exchange
    without Ray Data's shuffle machinery. Map side: one task per input
    block splits its rows by key hash into ``P`` shards
    (``num_returns=P`` — each shard is its own object, so a reduce
    task fetches only its column of the B x P shard matrix). Reduce
    side: one task per partition concatenates its B shards and runs
    the whole-block ``kernel`` on complete key groups; the outputs
    become a Dataset again via ``from_arrow_refs`` (zero-copy).

    Scale notes: the B-way fan-in per reduce task is the same shape as
    any two-stage shuffle's reduce; when B exceeds ``fanin`` the
    shards are pre-combined in a tree round (concat-only tasks over
    ``fanin``-sized chunks) so no task ever takes more than ``fanin``
    arguments. The materialize() barrier is intrinsic to an
    all-to-all (Ray Data's own shuffles plan the same barrier).
    ``P`` defaults to the cluster CPU count, capped at 64 locally —
    on a real cluster size it to cores so every reduce slot is busy."""
    import ray

    P = num_partitions or max(8, min(64, cluster_cpus()))

    def _split(tbl: pa.Table):
        if len(tbl) == 0:
            e = tbl.slice(0, 0)
            return tuple([e] * P) if P > 1 else e
        pid = _task_partition_ids(tbl[key], P)
        order = np.argsort(pid, kind="stable")
        st = tbl.take(pa.array(order))
        cnt = np.bincount(pid, minlength=P)
        offs = np.concatenate(([0], np.cumsum(cnt)))
        outs = tuple(st.slice(int(offs[i]), int(cnt[i])) for i in range(P))
        return outs if P > 1 else outs[0]

    def _concat(*shards):
        ts = [s for s in shards if len(s)]
        return pa.concat_tables(ts) if ts else shards[0]

    def _reduce(*shards):
        ts = [s for s in shards if len(s)]
        t = (pa.concat_tables(ts).combine_chunks() if ts
             else shards[0])
        out = kernel(t)
        return out if isinstance(out, pa.Table) else pa.table(out)

    split = ray.remote(num_returns=P)(_split)
    concat = ray.remote(_concat)
    reduce = ray.remote(_reduce)

    refs = ds.materialize().to_arrow_refs()
    # shard matrix: cols[p] = the per-block shards of partition p
    cols = [[] for _ in range(P)]
    for r in refs:
        out = split.remote(r)
        if P == 1:
            cols[0].append(out)
        else:
            for p in range(P):
                cols[p].append(out[p])
    # tree-combine so no reduce task exceeds the fan-in bound
    while any(len(c) > fanin for c in cols):
        cols = [[concat.remote(*c[i:i + fanin])
                 for i in range(0, len(c), fanin)] if len(c) > fanin else c
                for c in cols]
    outs = [reduce.remote(*c) for c in cols]
    return ray.data.from_arrow_refs(outs)


def per_key_topk(ds, key: str, order_col: str, k: int, descending: bool = True,
                 tiebreak: str | None = None, exchange: str | None = None):
    """Top-k rows per key — the per-host cap / batch-shaping primitive.
    One keyed exchange (see ``keyed_exchange``); each batch keeps
    rank<k per key run with one vectorized lexsort."""

    def block_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        keys = _group_codes(batch[key].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        primary = -vals if descending else vals
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, primary, keys))
        else:
            order = np.lexsort((primary, keys))
        sk = keys[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(sk)) - starts[run_id]
        return batch.take(pa.array(order[rank < k]))

    return keyed_exchange(ds, key, block_topk, exchange)


def per_key_rank(ds, key: str, order_col: str, k: int,
                 descending: bool = True, tiebreak: str | None = None,
                 rank_col: str = "rn", exchange: str | None = None):
    """Per-key ROW_NUMBER window: every surviving row carries its
    1-based rank within its key (ordered by ``order_col`` then
    ``tiebreak``), rows with rank > k dropped. Same single keyed
    exchange + one vectorized lexsort as ``per_key_topk`` — the
    ranking-window-function primitive (ROW_NUMBER ... QUALIFY rn<=k),
    distinct from the cap in that the rank itself is an output."""

    def block_rank(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(rank_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        primary = -vals if descending else vals
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, primary, keys))
        else:
            order = np.lexsort((primary, keys))
        sk = keys[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(sk)) - starts[run_id]
        keep = rank < k
        out = batch.take(pa.array(order[keep]))
        return out.append_column(rank_col,
                                 pa.array(rank[keep] + 1, pa.int64()))

    return keyed_exchange(ds, key, block_rank, exchange)


def per_key_dense_rank(ds, key_col: str, order_col: str,
                       out_col: str = "drank", descending: bool = True,
                       exchange: str | None = None):
    """Per-key DENSE_RANK window: ties share a rank and ranks stay
    consecutive (no gaps) — distinct from ROW_NUMBER (``per_key_rank``,
    ties broken) and RANK (``per_key_percent_rank``'s tie semantics,
    gaps after ties). Same single keyed exchange + one vectorized
    lexsort as the other ranking windows; the rank is the cumulative
    count of DISTINCT order values inside the key run (cumsum of
    value-change flags, rebased at each run start)."""

    def block_dr(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        primary = -vals if descending else vals
        order = np.lexsort((primary, keys))
        sk, sv = keys[order], primary[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        changed = np.concatenate(([True], (sv[1:] != sv[:-1]) | new_run[1:]))
        cum = np.cumsum(changed)
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        drank = cum - cum[starts][run_id] + 1
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(drank, pa.int64()))

    return keyed_exchange(ds, key_col, block_dr, exchange)


def grouped_moments(ds, key_cols, x_col: str, y_col: str):
    """Integer-exact per-group second moments (the VAR_SAMP / COVAR
    numerators) via the combiner pattern: a map_batches partial emits
    per-block int64 sums of (n, x, x², y, y², xy) per key, the tiny
    partials merge on the driver (#groups rows — low-cardinality keys
    only, like ``partial_groupby_agg``), and the FINAL big products
    (n·Σx² − (Σx)², n·Σxy − ΣxΣy, …) are computed in arbitrary-
    precision Python ints so nothing ever rounds. No all-to-all
    shuffle; the wide input never leaves its blocks.

    Input columns must already be int64 (callers round cents/percent
    upstream). Returns a pandas DataFrame with exact int64 columns:
    n_rows, sum_x, var_x_num (= n·Σx²−(Σx)²), var_y_num,
    cov_xy_num (= n·Σxy−ΣxΣy) and var_x_ppm
    (= ⌊var_x_num·10⁶ / (n·(n−1))⌋, the VAR_SAMP value in ppm)."""
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # int64 is exact only while a BLOCK's Σx² fits; guard loudly
        # instead of wrapping silently (the big-int step below only
        # protects the cross-block merge and the final products)
        if len(x):
            mx = max(int(np.abs(x).max()), int(np.abs(y).max()), 1)
            assert len(x) * mx * mx < (1 << 62), (
                f"block moment overflow risk: {len(x)} rows x max|v|="
                f"{mx} — rescale the inputs or shrink the block size")
        df = pd.DataFrame({k: batch[k].to_numpy(zero_copy_only=False)
                           for k in keys})
        df["n"] = 1
        df["sx"], df["sxx"] = x, x * x
        df["sy"], df["syy"] = y, y * y
        df["sxy"] = x * y
        g = df.groupby(keys, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # cross-block merge in PYTHON ints (pandas int64 sums would wrap
    # on corpus-scale Σx² long before the final products do)
    acc: dict[tuple, list] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t) == 0:
            continue
        kcols = [t[k].to_pylist() for k in keys]
        cols = [t[c].to_pylist() for c in ("n", "sx", "sxx",
                                           "sy", "syy", "sxy")]
        for i in range(len(t)):
            kk = tuple(kc[i] for kc in kcols)
            row = acc.setdefault(kk, [0] * 6)
            for j in range(6):
                row[j] += int(cols[j][i])
    items = sorted(acc.items())
    g = pd.DataFrame([list(k) for k, _ in items], columns=keys)
    n = [v[0] for _, v in items]
    sx, sxx = [v[1] for _, v in items], [v[2] for _, v in items]
    sy, syy = [v[3] for _, v in items], [v[4] for _, v in items]
    sxy = [v[5] for _, v in items]
    out = g[keys].copy()
    out["n_rows"] = n
    out["sum_x"] = sx
    out["var_x_num"] = [ni * a - b * b for ni, a, b in zip(n, sxx, sx)]
    out["var_y_num"] = [ni * a - b * b for ni, a, b in zip(n, syy, sy)]
    out["cov_xy_num"] = [ni * a - b * c
                         for ni, a, b, c in zip(n, sxy, sx, sy)]
    out["var_x_ppm"] = [vn * 1_000_000 // (ni * (ni - 1)) if ni > 1 else 0
                        for vn, ni in zip(out["var_x_num"], n)]
    for c in ("n_rows", "sum_x", "var_x_num", "var_y_num",
              "cov_xy_num", "var_x_ppm"):
        out[c] = out[c].astype("int64")
    return out


def grouped_higher_moments(ds, key_cols, x_col: str):
    """Integer-exact per-group SKEWNESS / excess KURTOSIS via the same
    no-shuffle combiner as ``grouped_moments``, extended to 3rd/4th
    power sums: per-block int64 partials of (n, Σx, Σx², Σx³, Σx⁴) per
    key (block overflow guarded loudly), driver big-int merge, then the
    exact central-moment numerators

        B = n·Σx² − (Σx)²                      (= n²·m2)
        A = n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³        (= n³·m3)
        C = n³·Σx⁴ − 4n²·Σx·Σx³ + 6n(Σx)²Σx² − 3(Σx)⁴   (= n⁴·m4)

    in arbitrary-precision ints — the n powers cancel so population
    skewness = A/B^{3/2} and excess kurtosis = C/B² − 3 exactly. The
    float step is ONE micro-rounded expression (A/(B·√B), C/(B·B)−3,
    sqrt is correctly-rounded IEEE) op-matched to the SQL twin, so the
    int64 outputs hash bit-for-bit. Input must be small-domain int64
    (x⁴ sums must fit a block's int64 — quantity-like columns; rescale
    cents upstream). Returns (keys..., n_rows, skew_micro,
    kurt_micro); a zero-variance group emits 0 for both."""
    import math

    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            mx = max(int(np.abs(x).max()), 1)
            assert len(x) * mx ** 4 < (1 << 62), (
                f"block 4th-moment overflow risk: {len(x)} rows x "
                f"max|v|={mx} — rescale the inputs or shrink the block")
        df = pd.DataFrame({k: batch[k].to_numpy(zero_copy_only=False)
                           for k in keys})
        df["n"] = 1
        x2 = x * x
        df["s1"], df["s2"] = x, x2
        df["s3"], df["s4"] = x2 * x, x2 * x2
        g = df.groupby(keys, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    acc: dict[tuple, list] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t) == 0:
            continue
        kcols = [t[k].to_pylist() for k in keys]
        cols = [t[c].to_pylist() for c in ("n", "s1", "s2", "s3", "s4")]
        for i in range(len(t)):
            kk = tuple(kc[i] for kc in kcols)
            row = acc.setdefault(kk, [0] * 5)
            for j in range(5):
                row[j] += int(cols[j][i])
    rows = []
    for kk, (n, s1, s2, s3, s4) in sorted(acc.items()):
        b = n * s2 - s1 * s1
        a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        c = (n ** 3 * s4 - 4 * n * n * s1 * s3
             + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        if b == 0:
            sk_u = ku_u = 0
        else:
            fb, fa, fc = float(b), float(a), float(c)
            sk_u = math.floor(fa / (fb * math.sqrt(fb)) * 1e6 + 0.5)
            ku_u = math.floor((fc / (fb * fb) - 3.0) * 1e6 + 0.5)
        rows.append(list(kk) + [n, sk_u, ku_u])
    out = pd.DataFrame(rows, columns=keys + ["n_rows", "skew_micro",
                                             "kurt_micro"])
    for col in ("n_rows", "skew_micro", "kurt_micro"):
        out[col] = out[col].astype("int64")
    return out


def per_key_percent_rank(ds, key_col: str, order_col: str,
                         out_col: str = "pr_micro",
                         exchange: str | None = None):
    """Per-key PERCENT_RANK window: every row gains
    floor((rank-1)/(n-1) * 1e6 + 0.5) with SQL RANK tie semantics
    (equal order values share a rank; single-row partitions get 0).
    One keyed exchange + one vectorized lexsort; rank-with-ties is a
    cummax over value-change positions — no per-key Python."""

    def block_pr(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        sk, sv = keys[order], vals[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        sizes = np.diff(np.append(starts, len(sk)))[run_id]
        new_val = new_run | np.concatenate(([True], sv[1:] != sv[:-1]))
        vstart = np.maximum.accumulate(
            np.where(new_val, np.arange(len(sk)), 0))
        rank0 = (vstart - starts[run_id]).astype(np.float64)
        denom = sizes - 1
        pr = np.zeros(len(sk), np.float64)
        nz = denom > 0
        pr[nz] = rank0[nz] / denom[nz]
        micro = np.floor(pr * 1e6 + 0.5).astype(np.int64)
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(micro, pa.int64()))

    return keyed_exchange(ds, key_col, block_pr, exchange)


def per_key_cume_dist(ds, key_col: str, order_col: str,
                      out_col: str = "cd_micro",
                      exchange: str | None = None):
    """Per-key CUME_DIST window: floor(cume_dist * 1e6 + 0.5) with SQL
    peer-group semantics (rows with equal order values share the
    distribution point of the LAST peer). Same one-exchange one-lexsort
    shape as ``per_key_percent_rank``; the peer-group end index is the
    next value-change position minus one — no per-key Python. The
    double arithmetic (divide, scale, round) matches the SQL twin
    op-for-op, so the micro values are bit-identical."""

    def block_cd(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        sk, sv = keys[order], vals[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        sizes = np.diff(np.append(starts, len(sk)))[run_id]
        new_val = new_run | np.concatenate(([True], sv[1:] != sv[:-1]))
        vstarts = np.flatnonzero(new_val)
        v_run_id = np.cumsum(new_val) - 1
        vends = np.append(vstarts[1:], len(sk)) - 1
        le = (vends[v_run_id] - starts[run_id] + 1).astype(np.float64)
        micro = np.floor(le / sizes * 1e6 + 0.5).astype(np.int64)
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(micro, pa.int64()))

    return keyed_exchange(ds, key_col, block_cd, exchange)


def per_key_ntile(ds, key_col: str, order_col: str, n_tiles: int,
                  tiebreak: str | None = None, out_col: str = "tile",
                  exchange: str | None = None):
    """Per-key NTILE(n): rows of each key split into ``n_tiles``
    buckets by ROW_NUMBER order with SQL's remainder rule (the first
    ``n % tiles`` buckets get the extra row). One keyed exchange +
    one vectorized lexsort — the quantile-bucketing / stratified-split
    window primitive."""

    def block_ntile(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, vals, keys))
        else:
            order = np.lexsort((vals, keys))
        sk = keys[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rn0 = np.arange(len(sk)) - starts[run_id]
        n = np.diff(np.append(starts, len(sk)))[run_id]
        size = n // n_tiles
        rem = n % n_tiles
        big = rem * (size + 1)          # rows living in size+1 buckets
        in_big = rn0 < big
        tile = np.where(
            in_big,
            rn0 // np.maximum(size + 1, 1),
            rem + (rn0 - big) // np.maximum(size, 1)) + 1
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(tile, pa.int64()))

    return keyed_exchange(ds, key_col, block_ntile, exchange)


def per_key_minmax_norm(ds, key_col: str, val_col: str,
                        out_col: str = "norm_ppm",
                        exchange: str | None = None):
    """Per-key min-max normalization in parts-per-million, integer
    exact: floor((x - min) * 1e6 / (max - min)) within the key, 0 when
    the key is constant — the feature-scaling window
    (MIN/MAX OVER PARTITION) without floats. One keyed exchange; run
    min/max via np.minimum/maximum.reduceat, broadcast back with
    np.repeat. ``val_col`` must be int64 (convert upstream; products
    stay < 2^63 for values < ~9e12)."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(keys, kind="stable")
        sk, sv = keys[order], vals[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sk[1:] != sk[:-1])))
        counts = np.diff(np.concatenate((starts, [len(sk)])))
        mn = np.repeat(np.minimum.reduceat(sv, starts), counts)
        mx = np.repeat(np.maximum.reduceat(sv, starts), counts)
        rng = mx - mn
        norm = np.zeros(len(sv), np.int64)
        nz = rng > 0
        norm[nz] = (sv[nz] - mn[nz]) * 1_000_000 // rng[nz]
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(norm, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_first_last(ds, key_col: str, order_col: str, val_col: str,
                       tiebreak: str | None = None,
                       exchange: str | None = None):
    """FIRST_VALUE / LAST_VALUE window collapsed to one row per key:
    emits (key, first_<val>, last_<val>) where first/last follow
    (order_col, tiebreak) order — the customer-lifecycle shape (first
    vs latest purchase). One keyed exchange + one lexsort; run heads
    and tails are two index gathers."""
    out_first, out_last = f"first_{val_col}", f"last_{val_col}"

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        val_t = batch[val_col].type
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], key_t),
                             out_first: pa.array([], val_t),
                             out_last: pa.array([], val_t)})
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sk[1:] != sk[:-1])))
        ends = np.append(starts[1:], len(sk)) - 1
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[starts])),
            out_first: batch[val_col].take(pa.array(order[starts])),
            out_last: batch[val_col].take(pa.array(order[ends])),
        })

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_share(ds, key_col: str, val_col: str,
                  out_col: str = "share_ppm",
                  exchange: str | None = None):
    """RATIO_TO_REPORT window, integer exact: each row's ppm share of
    its key's total — floor(v * 1e6 / sum_per_key) (``val_col`` must
    be non-negative int64; products stay < 2^63 for values < ~9e12).
    One keyed exchange; run sums via np.add.reduceat broadcast back
    with np.repeat."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(keys, kind="stable")
        sk, sv = keys[order], vals[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sk[1:] != sk[:-1])))
        counts = np.diff(np.concatenate((starts, [len(sk)])))
        tot = np.repeat(np.add.reduceat(sv, starts), counts)
        share = np.zeros(len(sv), np.int64)
        nz = tot > 0
        share[nz] = sv[nz] * 1_000_000 // tot[nz]
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(share, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_moving_sum(ds, key_col: str, order_col: str, val_col: str,
                       window: int, tiebreak: str | None = None,
                       out_col: str = "win_sum",
                       exchange: str | None = None):
    """Windowed-FRAME aggregate: SQL's
    ``sum(v) OVER (PARTITION BY key ORDER BY o, tb
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — the moving
    sum/rolling feature. One keyed exchange + one lexsort; the frame
    sums are two reads of a zero-padded cumsum (frame start clamped to
    the key run's start), no per-row Python."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        sv = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        pos = np.arange(len(sk)) - starts[run_id]
        lo = np.arange(len(sk)) - np.minimum(pos, window - 1)
        c0 = np.concatenate(([0], np.cumsum(sv)))
        win = c0[np.arange(1, len(sk) + 1)] - c0[lo]
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(win, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_range_sum(ds, key_col: str, order_col: str, val_col: str,
                      window: int, out_col: str = "range_sum",
                      exchange: str | None = None):
    """Value-RANGE windowed-frame aggregate: SQL's
    ``sum(v) OVER (PARTITION BY key ORDER BY o
    RANGE BETWEEN window PRECEDING AND CURRENT ROW)`` — the
    trailing-time-window rolling feature (requests in the last hour,
    spend in the last 30 days), which the ROWS-based
    ``per_key_moving_sum`` cannot express when event spacing varies.
    Exact SQL RANGE semantics incl. peers: the frame is every row of
    the key whose order value lies in [o_i − window, o_i] — ties AT
    o_i are all included regardless of physical position.

    One keyed exchange + vectorized merge passes (the range_join
    trick): hi_i = rows at-or-before the END of i's tie group; lo_i =
    rows strictly before (o_i − window), computed for every row at
    once by lexsorting shifted 'query' rows against 'data' rows with
    a side tiebreak (queries first, so a row at exactly o_i − window
    stays inside the inclusive frame). Earlier-key rows cancel in
    hi − lo, so frames never cross key runs. No per-row Python."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vv = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ov, keys))
        sk, so, sv = keys[order], ov[order], vv[order]
        n = len(sk)
        c0 = np.concatenate(([0], np.cumsum(sv)))
        # hi: end of each row's tie group (peers included)
        tie_new = np.concatenate(
            ([True], (sk[1:] != sk[:-1]) | (so[1:] != so[:-1])))
        tie_id = np.cumsum(tie_new) - 1
        tie_start = np.flatnonzero(tie_new)
        tie_end = np.concatenate((tie_start[1:], [n]))
        hi = tie_end[tie_id]
        # lo: data rows strictly before (key, o_i - window); merge the
        # shifted query stream against the data stream — queries sort
        # FIRST at equal value so a row at exactly o_i - window is NOT
        # counted below the frame (inclusive lower bound)
        m_o = np.concatenate((so - window, so))
        m_key = np.concatenate((sk, sk))
        m_side = np.concatenate((np.zeros(n, np.int8),
                                 np.ones(n, np.int8)))
        m_order = np.lexsort((m_side, m_o, m_key))
        cum_data = np.cumsum(m_side[m_order])
        qpos = np.flatnonzero(m_side[m_order] == 0)
        # queries appear in (key, o) order == sorted row order (stable)
        lo = cum_data[qpos]
        win = c0[hi] - c0[lo]
        out = batch.take(pa.array(order))
        return out.append_column(out_col, pa.array(win, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str],
                 prefix: str = "n_"):
    """PIVOT: one wide row per key with a count column per pivot
    value (long -> wide reshape). The pivot domain ``values`` must be
    known/bounded (collect it with a tiny distinct pass upstream);
    the reshape is a per-block vectorized bincount over
    (key, value-code) pairs — the partial/combiner step — and the
    combine is ONE hash-shuffle groupby-sum on the key, so the
    all-to-all ships pre-aggregated wide rows, never events."""
    values = list(values)
    cols = [f"{prefix}{v}" for v in values]

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keys = batch[key_col].to_numpy(zero_copy_only=False)
        pv = batch[pivot_col].to_numpy(zero_copy_only=False)
        uk, kinv = np.unique(keys, return_inverse=True)
        vcode = pd.Categorical(pv, categories=values).codes.astype(np.int64)
        ok = vcode >= 0
        flat = np.zeros(len(uk) * len(values), np.int64)
        np.add.at(flat, kinv[ok] * len(values) + vcode[ok], 1)
        mat = flat.reshape(len(uk), len(values))
        out = {key_col: pa.array(uk)}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)

    wide = ds.select_columns([key_col, pivot_col]).map_batches(
        partial, batch_format="pyarrow")
    agg = wide.groupby(key_col).sum(cols)
    return agg.map_batches(
        lambda b: pa.table({key_col: b[key_col],
                            **{c: b[f"sum({c})"].cast(pa.int64())
                               for c in cols}}),
        batch_format="pyarrow")


def global_topk(ds, order_col: str, k: int, descending: bool = True,
                tiebreak: str | None = None) -> pa.Table:
    """Exact global top-k: per-block partial top-k then driver merge —
    avoids a full sort shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        primary = -vals if descending else vals
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, primary))[:k]
        else:
            order = np.argsort(primary, kind="stable")[:k]
        return batch.take(pa.array(order))

    parts = pa.concat_tables(
        list(ds.map_batches(partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    vals = parts[order_col].to_numpy(zero_copy_only=False)
    primary = -vals if descending else vals
    if tiebreak is not None:
        tb = parts[tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, primary))[:k]
    else:
        order = np.argsort(primary, kind="stable")[:k]
    return parts.take(pa.array(order))


def compaction_plan(ds, order_col: str, size_col: str,
                    target: int) -> pa.Table:
    """Ordered bin-packing of a sized item stream into target-size
    output files — the compaction / small-file-coalescing planner every
    lakehouse maintenance job runs (and the shape the crawl sink's
    round fragments need when merging into read-optimized partitions;
    reference frontera's HBase batch writer buffers to a comparable
    mutation budget, contrib/backends/hbase/__init__.py).

    item i (in ``order_col`` order) lands in
    ``file_id = prev_cumsum(size) // target`` — the classic
    cumulative-sum packing, so files fill to >= target bytes except the
    last. Returns one row per planned file: (file_id, n_docs, bytes).

    Scale shape — a DISTRIBUTED PREFIX SUM (scan), no driver rows:

    1. ``ds.sort(order_col)`` — the one (range-partitioned) all-to-all;
       the stream then stays block-sorted and is materialized so both
       passes see identical blocks.
    2. Pass 1: ONE (first_key, block_sum) row per block; the driver
       sorts O(blocks) partials by first key and prefix-sums them into
       per-block starting offsets (keyed by the block's first key —
       ``order_col`` must therefore be globally unique).
    3. Pass 2: every block re-derives its rows' global prev-cumsum from
       its broadcast offset, assigns file ids, and emits per-file
       PARTIAL (file_id, n, bytes) rows — O(files touched) per block.
    4. Driver merge of the partials is bounded by the plan size
       (total_bytes/target + blocks rows — 100 TB at a 1 GB target is
       ~10⁵ rows), never the item count.
    """
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "block_sum": pa.array([], pa.int64())})
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        sizes = batch[size_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "first_key": pa.array([int(keys[0])], pa.int64()),
            "block_sum": pa.array([int(sizes.sum())], pa.int64())})

    metas = pa.concat_tables(
        list(sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                                   batch_size=None)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    fk = metas["first_key"].to_numpy()
    bs = metas["block_sum"].to_numpy()
    order = np.argsort(fk, kind="stable")
    fk, bs = fk[order], bs[order]
    offs = np.concatenate(([0], np.cumsum(bs)[:-1]))
    off_ref = ray.put(dict(zip(fk.tolist(), offs.tolist())))

    def assign_files(batch: pa.Table, _o=off_ref) -> pa.Table:
        empty = pa.table({"file_id": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64()),
                          "bytes": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        sizes = batch[size_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        off = ray.get(_o)[int(keys[0])]
        prev = off + np.cumsum(sizes) - sizes
        fid = prev // target
        uf = np.concatenate(([True], fid[1:] != fid[:-1]))
        starts = np.flatnonzero(uf)
        n = np.diff(np.append(starts, len(fid)))
        byts = np.add.reduceat(sizes, starts)
        return pa.table({
            "file_id": pa.array(fid[starts], pa.int64()),
            "n_docs": pa.array(n.astype(np.int64), pa.int64()),
            "bytes": pa.array(byts.astype(np.int64), pa.int64())})

    parts = pa.concat_tables(
        list(sorted_ds.map_batches(assign_files, batch_format="pyarrow",
                                   batch_size=None)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    fid = parts["file_id"].to_numpy()
    order = np.argsort(fid, kind="stable")
    fid = fid[order]
    nd = parts["n_docs"].to_numpy()[order]
    by = parts["bytes"].to_numpy()[order]
    new = np.concatenate(([True], fid[1:] != fid[:-1]))
    starts = np.flatnonzero(new)
    return pa.table({
        "file_id": pa.array(fid[starts], pa.int64()),
        "n_docs": pa.array(np.add.reduceat(nd, starts).astype(np.int64),
                           pa.int64()),
        "bytes": pa.array(np.add.reduceat(by, starts).astype(np.int64),
                          pa.int64())})


def grouped_int_sum(ds, key_col: str, val_col: str,
                    exchange: str | None = None):
    """Distributed integer sum per key: per-block ``np.unique`` partial
    combine, then ONE keyed exchange segment-summing the partials —
    the combiner-before-shuffle shape for ANY key cardinality (unlike
    ``partial_groupby_agg``, which collects partials on the driver and
    is only right for low-cardinality keys). Returns a Dataset of
    (key_col, val_col) rows."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             val_col: pa.array([], pa.int64())})
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        new = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(new)
        return pa.table({
            key_col: pa.array(k[starts], pa.int64()),
            val_col: pa.array(np.add.reduceat(v, starts).astype(np.int64),
                              pa.int64())})

    return keyed_exchange(ds.map_batches(partial, batch_format="pyarrow"),
                          key_col, partial, exchange)


def largest_remainder_alloc(ds, key_col: str, weight_col: str,
                            budget: int) -> pa.Table:
    """EXACT integer proportional allocation of a global budget across
    keys — the largest-remainder (Hamilton) method: every key gets
    ``floor(budget * w / W)`` and the ``budget - Σfloor`` leftover units
    go to the largest fractional remainders (ties: smaller key first).
    This is the crawl-budget allocator (give each host a page budget
    proportional to its quality mass — the batch twin of the frontier's
    per-domain caps and slot budgets, reference frontera's
    BC_MAX_REQUESTS_PER_HOST / queue budget flow,
    frontera/settings/default_settings.py:7-9) and the quota step of
    any stratified sampling plan. Σalloc == budget exactly.

    Scale shape: ``ds`` is a (key, weight) stream (already aggregated —
    see ``grouped_int_sum``), materialized once and read in three
    streaming register passes (total weight W → floor-sum → output map);
    the remainder cutoff comes from ``global_topk`` over the R leftover
    units, so the driver holds O(R) ids, R < #keys (at 10⁸-host scale
    with R large, swap the topk for a distributed quantile threshold on
    the remainder — same semantics, documented fallback).
    """
    import ray

    ds = ds.materialize()

    def reg(col_expr):
        def p(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"s": pa.array([], pa.int64())})
            return pa.table({"s": pa.array(
                [int(col_expr(batch).sum())], pa.int64())})
        total = 0
        for t in ds.map_batches(p, batch_format="pyarrow",
                                batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            total += int(t["s"].to_numpy().sum())
        return total

    W = reg(lambda b: b[weight_col].to_numpy().astype(np.int64))
    if W <= 0:
        raise ValueError("largest_remainder_alloc: total weight must be > 0")
    B = int(budget)
    floor_sum = reg(
        lambda b: B * b[weight_col].to_numpy().astype(np.int64) // W)
    r_units = B - floor_sum

    def with_rem(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            key_col: batch[key_col],
            "rem": pa.array((B * w) % W, pa.int64())})

    bonus_keys = np.empty(0, np.int64)
    if r_units > 0:
        top = global_topk(ds.map_batches(with_rem, batch_format="pyarrow"),
                          "rem", r_units, descending=True,
                          tiebreak=key_col)
        bonus_keys = np.sort(top[key_col].to_numpy())
    bonus_ref = ray.put(bonus_keys)

    def alloc(batch: pa.Table, _b=bonus_ref) -> pa.Table:
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64()),
                             "alloc": pa.array([], pa.int64())})
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        base = B * w // W
        bonus = np.isin(k, ray.get(_b))
        return pa.table({
            key_col: pa.array(k, pa.int64()),
            "weight": pa.array(w, pa.int64()),
            "alloc": pa.array(base + bonus, pa.int64())})

    out = pa.concat_tables(
        [t for t in ds.map_batches(alloc, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None) if len(t)])
    return out.sort_by(key_col)


def snapshot_diff(old_ds, new_ds, key_col: str, hash_col: str,
                  exchange: str | None = None):
    """Content diff between two corpus SNAPSHOTS keyed by content hash:
    emits one (key, status) row per key whose content differs —
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    hash mismatch); unchanged keys are NOT emitted, so the output is
    DELTA-scale — the incremental-recrawl / incremental-ingest
    primitive (what changed since the last crawl of this partition;
    the batch twin of the frontier's revisit scheduling).

    Scale shape: tag each side with a literal column, ``union`` the two
    streams (zero-copy block concat, no data movement), then ONE keyed
    exchange on the key; each run is 1-2 rows (key unique per side,
    enforced by construction upstream) and classification is a
    vectorized run-length pass. No driver rows.
    """

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "k": batch[key_col].cast(pa.int64()),
                "h": batch[hash_col],
                "side": pa.array(np.full(len(batch), side, np.int8),
                                 pa.int8())})
        return f

    both = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow"))

    def classify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "status": pa.array([], pa.string())})
        if len(batch) == 0:
            return empty
        k = batch["k"].to_numpy()
        side = batch["side"].to_numpy()
        h = np.asarray(batch["h"].to_pylist(), dtype=object)
        order = np.lexsort((side, k))
        k, side, h = k[order], side[order], h[order]
        new_run = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(k)))
        out_k, out_s = [], []
        one = starts[lens == 1]
        out_k.append(k[one])
        out_s.append(np.where(side[one] == 0, "removed", "added"))
        two = starts[lens == 2]
        if len(two):
            diff = h[two] != h[two + 1]
            out_k.append(k[two][diff])
            out_s.append(np.full(int(diff.sum()), "changed", object))
        kk = np.concatenate(out_k)
        ss = np.concatenate([np.asarray(s, object) for s in out_s])
        return pa.table({"k": pa.array(kk, pa.int64()),
                         "status": pa.array(ss.tolist(), pa.string())})

    return keyed_exchange(both, "k", classify, exchange)


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of ``v`` to the even bit positions of a
    32-bit lane (the classic Morton magic-mask ladder, public domain
    bit-twiddling)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def zorder_cells(ds, x_col: str, y_col: str,
                 cell_shift: int = 20) -> pa.Table:
    """Z-order (Morton) data-layout zone map: interleave two 16-bit
    dimension columns into a 32-bit z-value, bucket rows into z-cells
    (``zval >> cell_shift``) and report each cell's count + per-
    dimension min/max — the clustering key + zone-map statistics a
    lakehouse layout optimizer computes so range predicates on EITHER
    dimension can skip files (the multi-dimensional generalization of
    the crawl sink's per-partition pruning).

    Scale shape: the Morton interleave is pure vectorized bit math in
    ``map_batches``; the zone map itself is a REGISTER COMBINE — the
    cell universe is bounded by construction (2^(32-cell_shift) cells,
    4096 at the default shift), so each block emits one partial
    (cell, n, min/max) table after an in-block ``np.unique`` and the
    driver merges O(blocks x cells-touched) partials. NO shuffle.
    Inputs are masked to 16 bits (callers pre-scale real coordinates).
    """
    shift = np.uint64(cell_shift)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "cell": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "min_x": pa.array([], pa.int64()),
            "max_x": pa.array([], pa.int64()),
            "min_y": pa.array([], pa.int64()),
            "max_y": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        x = batch[x_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64) & 0xFFFF
        y = batch[y_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64) & 0xFFFF
        z = _spread16(x) | (_spread16(y) << np.uint64(1))
        cell = (z >> shift).astype(np.int64)
        order = np.argsort(cell, kind="stable")
        cell, x, y = cell[order], x[order], y[order]
        new = np.concatenate(([True], cell[1:] != cell[:-1]))
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(cell))
        return pa.table({
            "cell": pa.array(cell[starts], pa.int64()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "min_x": pa.array(np.minimum.reduceat(x, starts), pa.int64()),
            "max_x": pa.array(np.maximum.reduceat(x, starts), pa.int64()),
            "min_y": pa.array(np.minimum.reduceat(y, starts), pa.int64()),
            "max_y": pa.array(np.maximum.reduceat(y, starts), pa.int64())})

    parts = pa.concat_tables(
        [t for t in ds.map_batches(partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if len(t)])
    if parts.num_rows == 0:
        return parts
    cell = parts["cell"].to_numpy()
    order = np.argsort(cell, kind="stable")
    cell = cell[order]
    new = np.concatenate(([True], cell[1:] != cell[:-1]))
    starts = np.flatnonzero(new)

    def merge(col, red):
        return red.reduceat(parts[col].to_numpy()[order], starts) \
            .astype(np.int64)

    return pa.table({
        "cell": pa.array(cell[starts], pa.int64()),
        "n": pa.array(merge("n", np.add), pa.int64()),
        "min_x": pa.array(merge("min_x", np.minimum), pa.int64()),
        "max_x": pa.array(merge("max_x", np.maximum), pa.int64()),
        "min_y": pa.array(merge("min_y", np.minimum), pa.int64()),
        "max_y": pa.array(merge("max_y", np.maximum), pa.int64())})


def global_row_ids(ds, key_col: str) -> "object":
    """Global dense row numbering in ``key_col`` order (the
    zipWithIndex / ROW_NUMBER-over-everything primitive every
    contiguous-id assignment step needs — e.g. giving crawl-discovered
    documents stable training-shard offsets). Returns a Dataset of the
    input columns plus ``row_id`` (0-based rank of ``key_col``).

    Same distributed-prefix-sum shape as ``compaction_plan`` with unit
    sizes: one sort exchange, one O(blocks) count-metadata collect, one
    offset-broadcast re-map. ``key_col`` must be globally unique int64
    (the offset map is keyed by each block's first key)."""
    import ray

    sorted_ds = ds.sort(key_col).materialize()

    def meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return pa.table({"first_key": pa.array([int(keys[0])], pa.int64()),
                         "n": pa.array([len(batch)], pa.int64())})

    metas = pa.concat_tables(
        list(sorted_ds.map_batches(meta, batch_format="pyarrow",
                                   batch_size=None)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    fk = metas["first_key"].to_numpy()
    ns = metas["n"].to_numpy()
    order = np.argsort(fk, kind="stable")
    fk, ns = fk[order], ns[order]
    offs = np.concatenate(([0], np.cumsum(ns)[:-1]))
    off_ref = ray.put(dict(zip(fk.tolist(), offs.tolist())))

    def number(batch: pa.Table, _o=off_ref) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("row_id", pa.array([], pa.int64()))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        off = ray.get(_o)[int(keys[0])]
        return batch.append_column(
            "row_id", pa.array(off + np.arange(len(batch), dtype=np.int64),
                               pa.int64()))

    return sorted_ds.map_batches(number, batch_format="pyarrow",
                                 batch_size=None)


def tumbling_window_counts(ds, ts_col: str = "ts", window_s: int = 3600,
                           keys=()):
    """Tumbling-window aggregate: count events per (window_start, *keys).
    Window assignment is a vectorized epoch truncation inside
    map_batches; the combine is a partial aggregate (no shuffle for
    low-cardinality windows)."""

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        win = (ts // (window_s * 1_000_000)) * window_s  # epoch seconds
        out = {"window_start": pa.array(win, pa.int64())}
        for k in keys:
            out[k] = batch[k]
        return pa.table(out)

    return partial_groupby_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["window_start", *keys],
        {"n": ("window_start", "count")},
    ).sort_values(["window_start", *keys]).reset_index(drop=True)


def grouped_quantile_disc(ds, key_col: str, value_col: str, q,
                          scale: int = 1):
    """Exact per-group discrete quantile(s) over a BOUNDED value
    domain: per-block (key, value) histograms combine like any partial
    aggregate (no all-to-all — the histogram, not the data, moves), and
    each quantile is read off the merged counts as the value at 1-based
    position ceil(q*n) (the percentile_disc definition). ``q`` may be a
    float or a list — every requested quantile reads off the SAME
    one-pass histogram. ``scale`` quantizes float values to integers
    (e.g. 100 = cents) so counts are exact. This is the scale shape for
    quantiles over quantities, ratings, token counts etc.; UNBOUNDED
    domains (raw prices, floats) should route to a sampling or sketch
    path instead — the histogram degenerates to the data itself
    there."""
    import math

    import pandas as pd

    qs = [q] if isinstance(q, (int, float)) else list(q)
    hist = partial_groupby_agg(
        ds.map_batches(
            lambda b: pa.table({
                key_col: b[key_col],
                "_v": pa.array(
                    np.round(b[value_col].to_numpy(zero_copy_only=False)
                             * scale).astype(np.int64), pa.int64()),
            }), batch_format="pyarrow"),
        [key_col, "_v"], {"n": ("_v", "count")})
    rows = []
    for key, g in hist.groupby(key_col):
        g = g.sort_values("_v")
        cum = g["n"].cumsum().to_numpy()
        vals = g["_v"].to_numpy()
        n = int(cum[-1])
        # epsilon guard: q*n that is mathematically integral can land a
        # hair ABOVE the integer in IEEE doubles (0.07*100 -> 7.000…01),
        # which would ceil to the wrong 1-based position
        rows.append([key] + [
            int(vals[np.searchsorted(cum, math.ceil(qq * n - 1e-9))])
            for qq in qs])
    return pd.DataFrame(
        rows, columns=[key_col] + [f"q{int(qq * 100)}_scaled" for qq in qs]
    ).sort_values(key_col).reset_index(drop=True)


def per_key_validity_intervals(ds, key_col: str, ts_col: str,
                               cols=(), exchange: str | None = None):
    """SCD2 / validity-interval assembly: per key ordered by time,
    every row gains ``valid_from`` (its own timestamp) and
    ``valid_to`` (the NEXT row's timestamp in the key run; -1 for the
    current/last version) — the LEAD window re-expressed as the
    warehouse pattern it exists for (turning a change log into
    point-in-time queryable history). One keyed exchange + one
    lexsort; valid_to is a single shifted gather, runs closed with a
    vectorized run-tail mask."""
    cols = list(cols)

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            out = batch.select([key_col] + cols)
            out = out.append_column("valid_from", pa.array([], pa.int64()))
            return out.append_column("valid_to", pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, keys))
        sk, st = keys[order], ts[order]
        nxt = np.empty(len(st), np.int64)
        nxt[:-1] = st[1:]
        nxt[-1] = -1
        run_tail = np.concatenate((sk[1:] != sk[:-1], [True]))
        nxt[run_tail] = -1
        out = batch.take(pa.array(order)).select([key_col] + cols)
        out = out.append_column("valid_from",
                                pa.array(st.astype(np.int64), pa.int64()))
        return out.append_column("valid_to", pa.array(nxt, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_locf(ds, key_col: str, order_col: str, val_col: str,
                 out_col: str = "filled", tiebreak: str | None = None,
                 sentinel: int = -1, exchange: str | None = None):
    """LOCF / forward-fill imputation: each row gets the key's last
    non-null ``val_col`` at or before it — SQL's
    ``last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY o, tb
    ROWS UNBOUNDED PRECEDING)``; rows before a key's first observation
    get ``sentinel``. The sparse-observation → dense-feature shape
    (sensor carry-forward, latest-price attachment). One keyed
    exchange + one lexsort; the fill is a run-rebased
    ``np.maximum.accumulate`` over observation indices (indices from
    earlier keys sit below the run start and are masked), no per-row
    Python. ``val_col`` must be integer-typed (NULL = missing);
    ``order_col`` integer (epoch units upstream)."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        col = batch[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = ~np.asarray(col.is_null())
        vals = np.asarray(pc.fill_null(col, 0)).astype(np.int64)
        sk, sval, svalid = keys[order], vals[order], valid[order]
        n = len(sk)
        idx = np.where(svalid, np.arange(n), -1)
        ff = np.maximum.accumulate(idx)
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        run_start = np.flatnonzero(new_run)[np.cumsum(new_run) - 1]
        has = ff >= run_start
        out_vals = np.where(has, sval[np.clip(ff, 0, None)], sentinel)
        return batch.take(pa.array(order)).append_column(
            out_col, pa.array(out_vals, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def gap_fill_counts(ds, key_col: str, ts_col: str, window_s: int = 3600,
                    max_dense_rows: int = 50_000_000,
                    exchange: str | None = None):
    """Dense time-series resample: per-key event counts per tumbling
    window INCLUDING the empty windows between the key's first and
    last event — the gap-filling step before rolling features / LOCF
    (sparse groupby output has no rows for silent hours). Per-block
    (key, window) partial counts bound the exchange by keys x ACTIVE
    windows (raw rows never move); the kernel merges partials per run
    and scatters them into the dense [min..max] grid built by one
    global arange — no join against a generated series. A loud guard
    trips if a batch would densify past ``max_dense_rows`` (a key
    spanning years at second granularity is a pipeline bug, not a
    reason to spill)."""
    import pandas as pd

    def pre(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        win = ts // (window_s * 1_000_000)
        df = (pd.DataFrame({key_col: batch[key_col].to_numpy(), "w": win})
              .groupby([key_col, "w"], as_index=False).size()
              .rename(columns={"size": "n"}))
        return pa.table({key_col: pa.array(df[key_col].to_numpy()),
                         "w": pa.array(df["w"].to_numpy(), pa.int64()),
                         "n": pa.array(df["n"].to_numpy(), pa.int64())})

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], batch[key_col].type
                                            if len(batch.schema) else pa.int64()),
                          "window_start": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        codes = _group_codes(keys)
        w = batch["w"].to_numpy()
        n_part = batch["n"].to_numpy()
        order = np.lexsort((w, codes))
        sk, sw, sn = codes[order], w[order], n_part[order]
        # merge same-(key, window) partials
        new_cell = np.concatenate(([True], (sk[1:] != sk[:-1])
                                   | (sw[1:] != sw[:-1])))
        cs = np.flatnonzero(new_cell)
        mk, mw = sk[cs], sw[cs]
        mn_ = np.add.reduceat(sn, cs)
        morig = order[cs]  # a representative row per cell (for key value)
        # per-key dense spans over the merged cells
        new_run = np.concatenate(([True], mk[1:] != mk[:-1]))
        rs = np.flatnonzero(new_run)
        re_ = np.concatenate((rs[1:], [len(mk)]))
        mins, maxs = mw[rs], mw[re_ - 1]
        span = maxs - mins + 1
        total = int(span.sum())
        assert total <= max_dense_rows, (
            f"gap_fill: dense grid of {total} rows exceeds "
            f"{max_dense_rows}; widen window_s or split the key range")
        offsets = np.concatenate(([0], np.cumsum(span)[:-1]))
        run_id = np.cumsum(new_run) - 1
        # dense window values: one global arange rebased per run
        base = np.repeat(offsets - mins, span)
        dense_w = np.arange(total) - base
        dense_n = np.zeros(total, np.int64)
        dense_n[offsets[run_id] + (mw - mins[run_id])] = mn_
        key_vals = batch[key_col].take(pa.array(morig[rs]))
        dense_keys = key_vals.take(pa.array(np.repeat(
            np.arange(len(rs)), span)))
        return pa.table({key_col: dense_keys,
                         "window_start": pa.array(dense_w * window_s,
                                                  pa.int64()),
                         "n": pa.array(dense_n, pa.int64())})

    return keyed_exchange(ds.map_batches(pre, batch_format="pyarrow"),
                          key_col, kern, exchange)


def per_key_time_weighted(ds, key_col: str, ts_col: str, val_col: str,
                          tiebreak: str | None = None,
                          gap_scale: int = 1000,
                          exchange: str | None = None):
    """Time-weighted value aggregate (the TWAP shape): per key, each
    observation's value is weighted by how long it held (the gap to
    the NEXT observation, ordered by ts then tiebreak; the last
    observation holds for zero time). Returns integer-exact
    (key, n_gaps, wsum, dur): ``wsum = Σ val·gap``, ``dur = Σ gap``
    with gaps floor-divided by ``gap_scale`` (us → ms at the default —
    keeps val×gap inside int64; the mean is wsum/dur downstream).
    Keys with < 2 observations have no held interval and are absent.
    One keyed exchange + one lexsort + run-aware diff/reduceat."""

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], batch[key_col].type
                                            if len(batch.schema) else pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "wsum": pa.array([], pa.int64()),
                          "dur": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ts, keys))
        else:
            order = np.lexsort((ts, keys))
        sk, st, sv = keys[order], ts[order], vals[order]
        n = len(sk)
        same = sk[1:] == sk[:-1]  # gap i -> i+1 valid within a run
        if not same.any():
            return empty
        gap = (st[1:] - st[:-1]) // gap_scale
        w = sv[:-1] * gap
        # per-run sums over the valid gap positions
        run_starts = np.flatnonzero(
            np.concatenate(([True], ~same)))  # first row of each run
        run_id = np.cumsum(np.concatenate(([True], ~same))) - 1
        g_run = run_id[:-1][same]
        nrun = len(run_starts)
        wsum = np.zeros(nrun, np.int64)
        dur = np.zeros(nrun, np.int64)
        cnt = np.zeros(nrun, np.int64)
        np.add.at(wsum, g_run, w[same])
        np.add.at(dur, g_run, gap[same])
        np.add.at(cnt, g_run, 1)
        keep = cnt > 0
        key_vals = batch[key_col].take(pa.array(order[run_starts[keep]]))
        return pa.table({key_col: key_vals,
                         "n_gaps": pa.array(cnt[keep], pa.int64()),
                         "wsum": pa.array(wsum[keep], pa.int64()),
                         "dur": pa.array(dur[keep], pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def retention_cohorts(ds, key_col: str, ts_col: str,
                      period_s: int = 7 * 86400,
                      exchange: str | None = None):
    """Cohort retention matrix: cohort = the period of a key's FIRST
    event; for every later period the key is active in, one
    (cohort, periods_since) cell increments — the activation/retention
    triangle of event analytics. One keyed exchange of per-block
    (key, period) pre-deduped partials (raw rows never move), a
    run-aware kernel emits each key's distinct (cohort, delta) pairs,
    and a tiny combiner aggregate counts keys per cell. Returns pandas
    (cohort_period, periods_since, n_active) — cells are
    period-granular, bounded by cohorts x horizon."""
    import pandas as pd

    def pre(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        per = ts // (period_s * 1_000_000)
        df = (pd.DataFrame({key_col: batch[key_col].to_numpy(), "p": per})
              .drop_duplicates())
        return pa.table({key_col: pa.array(df[key_col].to_numpy()),
                         "p": pa.array(df["p"].to_numpy(), pa.int64())})

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_period": pa.array([], pa.int64()),
                          "periods_since": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        p = batch["p"].to_numpy()
        order = np.lexsort((p, keys))
        sk, sp = keys[order], p[order]
        # drop duplicate (key, period) rows surviving across blocks
        keep = np.concatenate(([True], (sk[1:] != sk[:-1])
                               | (sp[1:] != sp[:-1])))
        sk, sp = sk[keep], sp[keep]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        cohort = sp[starts][run_id]
        return pa.table({
            "cohort_period": pa.array(cohort, pa.int64()),
            "periods_since": pa.array(sp - cohort, pa.int64())})

    cells = keyed_exchange(ds.map_batches(pre, batch_format="pyarrow"),
                           key_col, kern, exchange)
    return partial_groupby_agg(
        cells, ["cohort_period", "periods_since"],
        {"n_active": ("periods_since", "count")}) \
        .sort_values(["cohort_period", "periods_since"]) \
        .reset_index(drop=True)


def per_key_running_distinct(ds, key_col: str, order_col: str,
                             val_col: str, out_col: str = "n_distinct",
                             tiebreak: str | None = None,
                             exchange: str | None = None):
    """Running COUNT(DISTINCT val) per key in event order — the
    novelty / exploration curve (how many distinct event types, pages,
    products has this key touched so far): SQL's
    ``sum(first_occurrence_flag) OVER (PARTITION BY key ORDER BY o)``.
    One keyed exchange; the kernel is two lexsorts — mark each
    (key, val)'s earliest row, scatter the flags back to time order,
    run-rebased cumsum. No per-row Python, no per-key state."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = _group_codes(batch[val_col].to_numpy(zero_copy_only=False))
        tb = (batch[tiebreak].to_numpy(zero_copy_only=False)
              if tiebreak is not None else np.arange(len(keys)))
        # earliest row of each (key, val)
        o1 = np.lexsort((tb, ov, vals, keys))
        k1, v1 = keys[o1], vals[o1]
        first = np.concatenate(
            ([True], (k1[1:] != k1[:-1]) | (v1[1:] != v1[:-1])))
        flags = np.empty(len(keys), np.int64)
        flags[o1] = first.astype(np.int64)
        # time order within key: run-rebased cumsum of the flags
        o2 = np.lexsort((tb, ov, keys))
        k2, f2 = keys[o2], flags[o2]
        cs = np.cumsum(f2)
        new_run = np.concatenate(([True], k2[1:] != k2[:-1]))
        starts = np.flatnonzero(new_run)
        base = np.concatenate(([0], cs[starts[1:] - 1]))
        run_id = np.cumsum(new_run) - 1
        out_vals = cs - base[run_id]
        return batch.take(pa.array(o2)).append_column(
            out_col, pa.array(out_vals, pa.int64()))

    return keyed_exchange(ds, key_col, kern, exchange)


def interval_merge(ds, key_col: str, lo_col: str, hi_col: str,
                   tiebreak: str | None = None, exchange: str | None = None):
    """Merge overlapping/touching intervals per key and report the
    union coverage — the session-stitching / availability-coverage
    reduction (how much wall time do a key's intervals actually
    cover once overlaps collapse). Per key ordered by (lo, tiebreak):
    an interval starts a NEW merged group iff its lo exceeds the
    running max hi of everything before it; group count and covered
    length fall out of one segment-cummax + reduceat — no per-row
    Python, one keyed exchange. Touching intervals (lo == prev hi)
    merge. Returns (key, n_intervals, n_merged, covered) with
    ``covered = Σ (group max hi - group min lo)``; integer columns."""

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], batch[key_col].type
                                            if len(batch.schema) else pa.int64()),
                          "n_intervals": pa.array([], pa.int64()),
                          "n_merged": pa.array([], pa.int64()),
                          "covered": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        lo = batch[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = batch[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, lo, keys))
        else:
            order = np.lexsort((lo, keys))
        sk, sl, sh = keys[order], lo[order], hi[order]
        n = len(sk)
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        run_id = np.cumsum(new_run) - 1
        # segment cummax of hi: shift each run into its own band so a
        # global maximum.accumulate cannot leak across keys
        band = (int(sh.max()) - int(sh.min()) + 1) if n else 1
        cm = np.maximum.accumulate(sh + run_id * band) - run_id * band
        prev_cm = np.empty(n, np.int64)
        prev_cm[0] = 0
        prev_cm[1:] = cm[:-1]
        new_grp = new_run | (sl > prev_cm)
        grp_id = np.cumsum(new_grp) - 1
        gs = np.flatnonzero(new_grp)
        grp_lo = sl[gs]
        ge = np.concatenate((gs[1:], [n]))
        grp_hi = cm[ge - 1]  # segment cummax at group end = group max hi
        grp_run = run_id[gs]
        rs = np.flatnonzero(np.concatenate(
            ([True], grp_run[1:] != grp_run[:-1])))
        covered = np.add.reduceat(grp_hi - grp_lo, rs)
        n_merged = np.diff(np.concatenate((rs, [len(gs)])))
        n_int = np.diff(np.concatenate(
            (np.flatnonzero(new_run), [n])))
        key_vals = batch[key_col].take(pa.array(order[np.flatnonzero(new_run)]))
        return pa.table({key_col: key_vals,
                         "n_intervals": pa.array(n_int, pa.int64()),
                         "n_merged": pa.array(n_merged, pa.int64()),
                         "covered": pa.array(covered, pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def windowed_dedup(ds, key_col: str, ts_col: str, window_us: int,
                   tiebreak: str | None = None, exchange: str | None = None):
    """Time-windowed duplicate suppression: keep a row iff NO earlier
    row with the same key lies within ``window_us`` of it — the
    telemetry / retry / at-least-once-ingest dedup shape where only
    repeats inside a TTL window count as duplicates (unlike exact
    dedup, the same key is legitimate again once the window passes).
    "Earlier" is total-ordered by (ts, tiebreak). One keyed exchange +
    one lexsort; the nearest earlier row is the sorted predecessor, so
    the keep mask is a run-aware ``np.diff`` against the window — no
    self-join. ``ts_col`` must be integer epoch-us upstream."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ts, keys))
        else:
            order = np.lexsort((ts, keys))
        sk, st = keys[order], ts[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        gap = np.empty(len(st), np.int64)
        gap[0] = 0
        gap[1:] = st[1:] - st[:-1]
        keep = new_run | (gap > window_us)
        return batch.take(pa.array(order[keep]))

    return keyed_exchange(ds, key_col, kern, exchange)


def target_encode_loo(ds, cat_col: str, val_col: str, id_col: str):
    """Leave-one-out target encoding: each row gets its category's
    target mean computed WITHOUT the row itself — the leakage-safe
    categorical encoder (plain per-category means leak each row's own
    label into its feature). Per-category (sum, count) is a combiner
    aggregate (category-cardinality result, no shuffle of raw rows)
    broadcast once via ray.put; the encode pass is one vectorized
    lookup emitting the EXACT integer pair ``loo_num = sum - v``,
    ``loo_den = n - 1`` (the mean is downstream — integers keep the
    oracle bit-exact; singleton categories get den 0). Returns a
    streaming Dataset (id, cat, loo_num, loo_den)."""
    import ray

    import pandas as pd

    agg = partial_groupby_agg(ds.select_columns([cat_col, val_col]),
                              [cat_col],
                              {"s": (val_col, "sum"),
                               "n": (val_col, "count")})
    ref = ray.put((pd.Index(agg[cat_col]),
                   agg["s"].to_numpy().astype(np.int64),
                   agg["n"].to_numpy().astype(np.int64)))
    cache: dict = {}

    def encode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             cat_col: batch[cat_col],
                             "loo_num": pa.array([], pa.int64()),
                             "loo_den": pa.array([], pa.int64())})
        key = ref.hex()
        if key not in cache:
            cache[key] = ray.get(ref)
        index, sums, cnts = cache[key]
        pos = index.get_indexer(batch[cat_col].to_pandas())
        v = batch[val_col].to_numpy().astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            cat_col: batch[cat_col],
            "loo_num": pa.array(sums[pos] - v, pa.int64()),
            "loo_den": pa.array(cnts[pos] - 1, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")


def corr_matrix(ds, cols: list[str]):
    """Pairwise Pearson correlation matrix over k integer feature
    columns in ONE streaming pass — the feature-redundancy /
    leakage-screen profile of a dataset card, generalizing
    ``grouped_moments`` to all k(k-1)/2 pairs at once. Each block
    ships one register row (n, Σx per column, Σx_i·x_j per pair — all
    int64, with a loud per-block overflow guard); the driver sums the
    handful of rows and finalizes
    ``corr = cov_num / sqrt(var_x_num * var_y_num)`` (the sample-size
    factors cancel), micro-rounded. Numerators must fit float64
    exactly (< 2^53) for SQL corr() parity — scale the inputs down,
    not up. Returns pandas (col_x, col_y, n_rows, corr_micro),
    pairs in column-list order."""
    import math

    import pandas as pd

    k = len(cols)
    pairs = [(i, j) for i in range(k) for j in range(i, k)]

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"r": pa.array([], pa.list_(pa.int64()))})
        X = np.stack([batch[c].to_numpy().astype(np.int64) for c in cols])
        mx = np.abs(X).max(axis=1).astype(np.float64)
        mx[mx == 0] = 1.0
        for i, j in pairs:
            assert len(batch) * mx[i] * mx[j] < 2 ** 62, (
                f"corr_matrix: block cross-product sum for "
                f"({cols[i]}, {cols[j]}) may overflow int64; scale the "
                f"inputs down or shrink blocks")
        reg = np.concatenate((
            [len(batch)], X.sum(axis=1),
            [(X[i] * X[j]).sum() for i, j in pairs]))
        return pa.table({"r": pa.array([reg], pa.list_(pa.int64()))})

    acc = None
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in t["r"].to_pylist():
            arr = np.asarray(row, dtype=np.int64)
            acc = arr if acc is None else acc + arr
    if acc is None:
        raise ValueError("corr_matrix: empty input")
    n = int(acc[0])
    s = acc[1:1 + k]
    xy = {p: int(v) for p, v in zip(pairs, acc[1 + k:])}
    var_num = {i: n * xy[(i, i)] - int(s[i]) * int(s[i]) for i in range(k)}
    out = []
    for i in range(k):
        for j in range(i + 1, k):
            cov = n * xy[(i, j)] - int(s[i]) * int(s[j])
            vx, vy = var_num[i], var_num[j]
            micro = (int(round(cov / math.sqrt(vx * vy) * 1e6))
                     if vx > 0 and vy > 0 else 0)
            out.append((cols[i], cols[j], n, micro))
    return pd.DataFrame(out, columns=["col_x", "col_y", "n_rows",
                                      "corr_micro"])


def grouped_mad(ds, key_col: str, value_col: str, scale: int = 1):
    """Exact per-group MEDIAN ABSOLUTE DEVIATION (PERCENTILE_DISC
    semantics at both levels) — the robust dispersion statistic an
    outlier gate wants when means/variances are skew-poisoned. Two
    histogram combines over the bounded value domain (the
    ``grouped_quantile_disc`` shape: histograms move, data doesn't;
    no all-to-all), with the tiny per-key median table broadcast into
    the second pass closure. Returns a pandas DataFrame
    (key, med_scaled, mad_scaled), integer-exact."""
    med_df = grouped_quantile_disc(ds, key_col, value_col, 0.5, scale)
    med = dict(zip(med_df[key_col], med_df["q50_scaled"]))

    def dev(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        v = np.round(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        mvals = np.fromiter((med[k] for k in uk), np.int64, len(uk))
        return pa.table({key_col: pa.array(keys),
                         "absdev": pa.array(np.abs(v - mvals[inv]),
                                            pa.int64())})

    mad_df = grouped_quantile_disc(
        ds.map_batches(dev, batch_format="pyarrow"),
        key_col, "absdev", 0.5, scale=1).rename(
        columns={"q50_scaled": "mad_scaled"})
    out = med_df.rename(columns={"q50_scaled": "med_scaled"}).merge(
        mad_df, on=key_col)
    return out.sort_values(key_col).reset_index(drop=True)


def grouped_count_distinct(ds, key_col: str, distinct_col: str,
                           combine: str = "shuffle"):
    """Exact per-key count-distinct: per-block drop_duplicates
    pre-shrinks the pair stream (the combiner step), then either

    - ``combine='shuffle'`` (default, the scale path): one sort
      exchange on the (key, value) composite collapses global
      duplicates, and a partial aggregate counts survivors per key —
      the only all-to-all moves already-deduplicated pairs; or
    - ``combine='driver'``: concatenate the per-block distinct pairs
      and dedup once on the driver — ~1 s cheaper per call when the
      DISTINCT PAIR domain is known-small (e.g. 5 types x 1.5k users),
      but wrong at unbounded pair cardinality."""
    import pandas as pd

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, distinct_col]).to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    per_block = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    if combine == "tasks":
        # two-stage raw-task shuffle on the key: each partition holds
        # complete key groups, so one pandas dedup+count per partition
        # finishes the job (measured faster than the native sort
        # exchange at >= 16 cpus, same contract as keyed_exchange)
        def kern(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({key_col: pa.array([], batch[key_col].type)
                                 if batch.num_columns else pa.array([]),
                                 "n_distinct": pa.array([], pa.int64())})
            df = batch.to_pandas().drop_duplicates()
            out = (df.groupby(key_col, as_index=False)[distinct_col]
                   .count().rename(columns={distinct_col: "n_distinct"}))
            return pa.Table.from_pandas(out, preserve_index=False)

        rows = task_exchange(per_block, key_col, kern)
        parts = [t.to_pandas() for t in rows.iter_batches(
            batch_format="pyarrow", batch_size=None) if len(t)]
        out = pd.concat(parts) if parts else pd.DataFrame(
            {key_col: [], "n_distinct": []})
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return out.sort_values(key_col).reset_index(drop=True)
    if combine == "driver":
        parts = pa.concat_tables(list(per_block.iter_batches(
            batch_format="pyarrow", batch_size=None)))
        df = parts.to_pandas().drop_duplicates()
        out = (df.groupby(key_col, as_index=False)[distinct_col]
               .count().rename(columns={distinct_col: "n_distinct"}))
        return out.sort_values(key_col).reset_index(drop=True)
    pairs = per_block.groupby([key_col, distinct_col]).count()
    return partial_groupby_agg(
        pairs, [key_col], {"n_distinct": (distinct_col, "count")}
    ).sort_values(key_col).reset_index(drop=True)


def grouped_entropy(ds, key_col: str, cat_col: str,
                    out_col: str = "entropy_micro",
                    exchange: str | None = None):
    """Per-key Shannon entropy (micro-nats) of the category
    distribution — the bot-/template-detection signal of a curation
    pass (a host or user whose event mix has near-zero entropy is a
    machine; a document source with abnormally high token entropy is
    noise). Scale shape: a per-block pandas combiner first collapses
    the stream to (key, cat, n) partial-count rows (the only rows
    that move), then ONE keyed exchange on ``key_col`` feeds a
    run-aware vectorized kernel that merges duplicate (key, cat)
    partials with reduceat and finalizes
    H = ln(total) − Σ n·ln(n) / total per key. No all-to-all over raw
    rows; kernel output is one row per key.

    Reference analogue: frontera's per-host stats rollups
    (``handlers/recording.py`` stats counters) never compute a
    distribution statistic — this is part of the training-data
    extension surface. Returns (key_col, entropy_micro, n_events)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: batch[key_col].to_numpy(zero_copy_only=False),
            cat_col: batch[cat_col].to_numpy(zero_copy_only=False)})
        df["n"] = 1
        g = df.groupby([key_col, cat_col], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def kernel(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], batch[key_col].type),
                             out_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        k = batch[key_col].to_numpy(zero_copy_only=False)
        kc = _group_codes(k)
        cc = _group_codes(batch[cat_col].to_numpy(zero_copy_only=False))
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((cc, kc))
        sk, sc, sn = kc[order], cc[order], n[order]
        # merge duplicate (key, cat) partial rows from different blocks
        new_pair = np.concatenate(
            ([True], (sk[1:] != sk[:-1]) | (sc[1:] != sc[:-1])))
        pstarts = np.flatnonzero(new_pair)
        cnt = np.add.reduceat(sn, pstarts).astype(np.float64)
        pk = sk[pstarts]
        new_key = np.concatenate(([True], pk[1:] != pk[:-1]))
        kstarts = np.flatnonzero(new_key)
        tot = np.add.reduceat(cnt, kstarts)
        clnc = np.add.reduceat(cnt * np.log(cnt), kstarts)
        ent = np.log(tot) - clnc / tot
        keys_out = k[order][pstarts][kstarts]
        return pa.table({
            key_col: pa.array(keys_out, batch[key_col].type),
            out_col: pa.array(np.round(ent * 1e6).astype(np.int64),
                              pa.int64()),
            "n_events": pa.array(tot.astype(np.int64), pa.int64())})

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    return keyed_exchange(pairs, key_col, kernel, exchange)


def hopping_window_counts(ds, ts_col: str = "ts", window_s: int = 3600,
                          hop_s: int = 900, keys=()):
    """Hopping (sliding) window aggregate: windows of ``window_s``
    seconds starting every ``hop_s`` seconds; each event lands in
    exactly window_s/hop_s overlapping windows (hop must divide
    window). The expansion is a vectorized repeat+tile inside
    map_batches — output rows = input x (window/hop) — and the count
    combine is the same partial aggregate as the tumbling variant
    (low-cardinality window keys, no shuffle)."""
    if window_s % hop_s:
        raise ValueError("hop_s must divide window_s")
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        base = (ts // hop_us) * hop_s  # epoch-second start of newest window
        offs = np.arange(k, dtype=np.int64) * hop_s
        win = np.repeat(base, k) - np.tile(offs, len(ts))
        out = {"window_start": pa.array(win, pa.int64())}
        for kc in keys:
            out[kc] = batch[kc].take(pa.array(np.repeat(np.arange(len(ts)), k)))
        return pa.table(out)

    return partial_groupby_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["window_start", *keys],
        {"n": ("window_start", "count")},
    ).sort_values(["window_start", *keys]).reset_index(drop=True)


def asof_join_latest(ds, key_col: str, ts_col: str, type_col: str,
                     left_type: str, right_type: str, value_col: str,
                     id_col: str = "event_id", exchange: str | None = None):
    """Per-key AS-OF join: for every ``left_type`` event, attach the
    most recent earlier-or-equal ``right_type`` event's value (-1 when
    none). A custom operator Ray Data lacks — ONE hash exchange by the
    join key, then a fully vectorized whole-block kernel: sort by
    (key, ts, right-before-left), forward-fill the last right-event
    index with np.maximum.accumulate, invalidate fills that cross key
    runs. No per-key Python calls."""

    def join_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # empty blocks happen under exchange='hash' (repartition can
            # yield empty partitions); schema must match non-empty output
            # including the key/id column TYPES (string keys would
            # otherwise emit mismatched int64 blocks)
            return pa.table({key_col: pa.array([], batch[key_col].type),
                             id_col: pa.array([], batch[id_col].type),
                             "asof_value": pa.array([], pa.float64())})
        keys_raw = batch[key_col].to_numpy(zero_copy_only=False)
        keys = _group_codes(keys_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        types = np.asarray(batch[type_col].to_pylist(), dtype=object)
        # right events sort before left at equal ts so "earlier-or-
        # equal" matches them (searchsorted side='right' parity)
        type_rank = np.where(types == right_type, 0, 1)
        order = np.lexsort((type_rank, ts, keys))
        k_s, ts_s = keys[order], ts[order]
        types_s = types[order]
        vals_s = batch[value_col].to_numpy(zero_copy_only=False)[order]
        ids_s = batch[id_col].to_numpy()[order]
        n = len(order)
        is_right = types_s == right_type
        idx = np.where(is_right, np.arange(n), -1)
        filled = np.maximum.accumulate(idx)  # last right index so far
        new_run = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        run_start = np.flatnonzero(new_run)[np.cumsum(new_run) - 1]
        matched = filled >= run_start  # right event within this key run
        out_vals = np.where(matched, vals_s[np.clip(filled, 0, None)], -1.0)
        left_m = types_s == left_type
        return pa.table({
            key_col: pa.array(keys_raw[order][left_m],
                              batch[key_col].type),
            id_col: pa.array(ids_s[left_m]),
            "asof_value": pa.array(out_vals[left_m], pa.float64()),
        })

    return keyed_exchange(ds, key_col, join_block, exchange)


def _table_sweep(tbl: pa.Table, fn):
    """Raw-task trampoline: apply fn to one materialized block."""
    return fn(tbl)


def quantile_unbounded(ds, col: str, qs, bins: int = 4096,
                       collect_cap: int = 1 << 16,
                       max_depth: int = 8, ranks_fn=None) -> dict:
    """EXACT discrete quantiles (PERCENTILE_DISC semantics: the element
    at 1-based rank ceil(q*n)) of a CONTINUOUS / unbounded column —
    no sort shuffle, no bounded-domain assumption (that case is
    ``grouped_quantile_disc``'s histogram combine):

    - pass A: per-block (count, min, max) partials, driver merge;
    - pass B: per-block equi-width histogram (one np.bincount), driver
      merge; the cumulative histogram locates each target rank's bin;
    - pass C: ONE filter pass collects the handful of target bins
      (expected n/bins values each); the exact rank is read off the
      sorted collected values.

    A bin holding more than ``collect_cap`` values (heavy value skew)
    recurses: re-histogram INSIDE that bin's range instead of
    collecting it; a bin whose float range collapses to a point is a
    run of duplicates and answers immediately. Deterministic and
    exact, so it oracle-checks against DuckDB quantile_disc.

    Returns {q: value}."""
    import ray

    qs = [qs] if isinstance(qs, (int, float)) else list(qs)
    # ONE Dataset execution total: the bisection's A/B/C passes (and
    # any skew recursions) run as raw tasks over the materialized
    # column blocks — each extra pass would otherwise pay Ray Data's
    # per-execution planning cost on top of re-reading parquet.
    blocks = ds.select_columns([col]).materialize().to_arrow_refs()
    sweep = ray.remote(_table_sweep)

    def stats_partial(batch: pa.Table):
        if batch.num_rows == 0 or col not in batch.column_names:
            return (0, np.inf, -np.inf)
        v = batch[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
        if len(v) == 0:
            return (0, np.inf, -np.inf)
        return (len(v), float(v.min()), float(v.max()))

    parts = ray.get([sweep.remote(b, stats_partial) for b in blocks])
    n = int(sum(p[0] for p in parts))
    if n == 0:
        return {q: None for q in qs}
    lo = float(min(p[1] for p in parts))
    hi = float(max(p[2] for p in parts))
    import math

    if ranks_fn is not None:
        # caller supplies arbitrary 1-based ranks keyed however it
        # likes (percentile_cont needs the floor AND ceil order
        # statistics of the same q); receives n through the call
        ranks = ranks_fn(n)
    else:
        # DuckDB quantile_disc rank = ceil(q*n), with the same epsilon
        # guard as grouped_quantile_disc (q*n can land 1 ulp above an
        # integer in IEEE doubles); verified against DuckDB for n in
        # {2,3,4,10,1500} x q in {.25,.5,.75,.9,.99}
        ranks = {q: max(1, int(math.ceil(q * n - 1e-9))) for q in qs}

    def rank_in_range(r_lo: float, r_hi: float, ks: dict,
                      depth: int) -> dict:
        """ks: {q: rank within values of [r_lo, r_hi]} -> {q: value}."""
        if r_lo == r_hi:
            return {q: r_lo for q in ks}
        width = (r_hi - r_lo) / bins

        def hist_partial(batch: pa.Table) -> np.ndarray:
            if batch.num_rows == 0 or col not in batch.column_names:
                return np.zeros(bins, np.int64)
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[(v >= r_lo) & (v <= r_hi)]
            idx = np.minimum((v - r_lo) / width, bins - 1).astype(np.int64)
            return np.bincount(idx, minlength=bins).astype(np.int64)

        hist = np.zeros(bins, np.int64)
        for h in ray.get([sweep.remote(b, hist_partial) for b in blocks]):
            hist += h
        cum = np.cumsum(hist)
        # bin index per target rank + ranks remaining inside the bin
        per_bin: dict[int, dict] = {}
        for q, k in ks.items():
            b = int(np.searchsorted(cum, k))
            prev = int(cum[b - 1]) if b else 0
            per_bin.setdefault(b, {})[q] = k - prev
        out: dict = {}
        small = {b: sub for b, sub in per_bin.items()
                 if hist[b] <= collect_cap or depth >= max_depth}
        if small:
            ivals = {b: (r_lo + b * width,
                         r_hi if b == bins - 1 else r_lo + (b + 1) * width)
                     for b in small}

            def collect(batch: pa.Table) -> np.ndarray:
                if batch.num_rows == 0 or col not in batch.column_names:
                    return np.zeros(0, np.float64)
                v = batch[col].to_numpy(zero_copy_only=False).astype(
                    np.float64)
                keep = np.zeros(len(v), dtype=bool)
                for b, (blo, bhi) in ivals.items():
                    inb = (v >= blo) & ((v < bhi) | ((b == bins - 1)
                                                     & (v <= r_hi)))
                    keep |= inb
                return v[keep]

            vals = np.sort(np.concatenate(
                ray.get([sweep.remote(b, collect) for b in blocks])
                + [np.zeros(0)]))
            for b, sub in small.items():
                blo, bhi = ivals[b]
                right_open = b < bins - 1
                inb = vals[(vals >= blo)
                           & ((vals < bhi) if right_open else (vals <= bhi))]
                for q, kk in sub.items():
                    out[q] = float(inb[kk - 1])
        for b, sub in per_bin.items():
            if b in small:
                continue
            blo = r_lo + b * width
            bhi = r_hi if b == bins - 1 else np.nextafter(
                r_lo + (b + 1) * width, -np.inf)
            out.update(rank_in_range(blo, bhi, sub, depth + 1))
        return out

    resolved = rank_in_range(lo, hi, ranks, 0)
    if ranks_fn is not None:
        return resolved
    return {q: resolved[q] for q in qs}


def percentile_cont_unbounded(ds, col: str, qs, **kw) -> dict:
    """EXACT interpolated quantiles (SQL PERCENTILE_CONT semantics:
    pos = q*(n-1) zero-based; linear interpolation between the
    order statistics at floor(pos) and ceil(pos)) over a continuous /
    unbounded column — the same three-streaming-pass histogram
    bisection as ``quantile_unbounded`` (no sort shuffle, no
    bounded-domain assumption), resolving BOTH neighboring order
    statistics of every q in ONE shared bisection (shared pass A/B,
    bins holding two target ranks collect once).

    The interpolation expression tree (pos as a double product, frac
    = pos - floor(pos), lo + (hi - lo) * frac, left-assoc doubles) is
    written identically in the SQL oracle, so micro-rounded results
    hash bit-for-bit. Returns {q: interpolated value} (None on empty
    input)."""
    import math

    qs = [qs] if isinstance(qs, (int, float)) else list(qs)
    cell: dict = {}

    def ranks_fn(n: int) -> dict:
        cell["n"] = n
        r: dict = {}
        for q in qs:
            pos = q * (n - 1)
            r[(q, "lo")] = int(math.floor(pos)) + 1
            r[(q, "hi")] = int(math.ceil(pos)) + 1
        return r

    resolved = quantile_unbounded(ds, col, qs, ranks_fn=ranks_fn, **kw)
    if "n" not in cell:  # empty input
        return {q: None for q in qs}
    n = cell["n"]
    out: dict = {}
    for q in qs:
        pos = q * (n - 1)
        frac = pos - math.floor(pos)
        v_lo, v_hi = resolved[(q, "lo")], resolved[(q, "hi")]
        out[q] = v_lo + (v_hi - v_lo) * frac
    return out


def equi_join(left_ds, right_ds, key: str, left_cols, right_cols,
              exchange: str | None = None, how: str = "inner"):
    """Large-large inner equi-join: BOTH sides move through one keyed
    exchange (the broadcast join covers the small-side case; this is
    the shape when neither side fits in memory). The two inputs are
    tagged, schema-aligned with typed nulls and unioned, so a single
    exchange co-locates each key's rows; the whole-block kernel then
    expands matches vectorized across keys with the same
    cumulative-count merge as ``range_join`` (per left row, its
    matching right rows are a contiguous [lo, hi) slice of the
    key-sorted right rows — no per-key Python, no pandas merge).
    Column name collisions between the payload lists are the caller's
    responsibility (rename upstream).

    Ray 2.49 ships an experimental ``Dataset.join`` (hash-shuffle
    based); this operator exists so the join shares the repo's keyed
    exchange (sort default / hash opt-in with the documented
    small-session wedge guard) and stays oracle-testable on both
    paths with one kernel.

    ``how='left'``: LEFT OUTER — every left row survives; unmatched
    left rows emit typed nulls for the right payload (null take
    indices — Arrow's take yields nulls for them natively). NULL join
    keys still never MATCH (SQL semantics), but under 'left' they are
    routed through the exchange and emitted unmatched rather than
    dropped.

    ``how='full'``: FULL OUTER — additionally every unmatched RIGHT
    row is emitted once with typed nulls for the left payload (its
    key comes from the right side, i.e. the output key column is
    SQL's COALESCE(l.key, r.key)). NULL-key right rows are likewise
    kept unmatched (split off inside the kernel before group coding,
    so any key type is safe). The right-unmatched block reuses the
    kernel's two existing lexsorts — still no per-key Python.

    Exchange note: NULL keys in a STRING key column require
    ``exchange='hash'`` under 'left'/'full' (Ray 2.49's sort-based
    groupby partitioner calls np.searchsorted on the object column
    and None is unordered vs str; typed-null int/float keys sort
    fine on both exchanges)."""
    assert how in ("inner", "left", "full")
    left_cols, right_cols = list(left_cols), list(right_cols)
    l_types = _arrow_types(left_ds)
    r_types = _arrow_types(right_ds)

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            # NULL keys never match (NULL = NULL is false) — drop them
            # before the exchange, except rows the outer semantics must
            # still emit unmatched (left rows under 'left'/'full',
            # right rows under 'full')
            if (side == 1 and how != "full") or how == "inner":
                batch = batch.filter(pc.is_valid(batch[key]))
            n = len(batch)
            own = set(batch.column_names)
            cols = {key: batch[key],
                    "_side": pa.array(np.full(n, side, np.int8), pa.int8())}
            # canonical column order on BOTH sides so the union blocks
            # share one schema (typed nulls for the absent side)
            for c in left_cols:
                cols[c] = batch[c] if c in own else pa.nulls(n, l_types[c])
            for c in right_cols:
                cols[c] = batch[c] if c in own else pa.nulls(n, r_types[c])
            return pa.table(cols)
        return fn

    tagged = (left_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(right_ds.map_batches(tag(1), batch_format="pyarrow")))

    out_schema = ([(key, l_types[key])]
                  + [(c, l_types[c]) for c in left_cols]
                  + [(c, r_types[c]) for c in right_cols])

    def join_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], t) for c, t in out_schema})
        if len(batch) == 0:
            return empty
        pieces = []
        if how == "full":
            # NULL keys never match: every NULL-key row (either side)
            # is emitted once, unmatched. tag() already null-padded the
            # other side's payload, so a column select is the emission.
            validmask = pc.is_valid(batch[key])
            nulls = batch.filter(pc.invert(validmask))
            if len(nulls):
                pieces.append(pa.table({c: nulls[c] for c, _ in out_schema}))
            batch = batch.filter(validmask)
            if len(batch) == 0:
                return pieces[0] if pieces else empty
        side = batch["_side"].to_numpy()
        keys = _group_codes(batch[key].to_numpy(zero_copy_only=False))
        is_r = side == 1
        # hi: right rows sort before left within a key group; lo: after.
        # Only consistency of the code ordering matters — earlier-group
        # right counts cancel in hi - lo.
        order_hi = np.lexsort((np.where(is_r, 0, 1), keys))
        cum_hi = np.cumsum(is_r[order_hi])
        left_pos = np.flatnonzero(~is_r[order_hi])
        hi = cum_hi[left_pos]
        order_lo = np.lexsort((np.where(is_r, 1, 0), keys))
        lo = np.cumsum(is_r[order_lo])[np.flatnonzero(~is_r[order_lo])]
        counts = hi - lo
        # LEFT/FULL OUTER: unmatched left rows emit exactly one
        # null-padded output row (null take indices -> Arrow take
        # yields nulls natively)
        emit = np.maximum(counts, 1) if how in ("left", "full") else counts
        total = int(emit.sum())
        right_idx_sorted = np.flatnonzero(is_r)[
            np.argsort(keys[is_r], kind="stable")]
        if how == "full" and len(right_idx_sorted):
            # FULL OUTER: right rows whose key group holds no left row
            # are emitted once, unmatched. The per-right-row left count
            # reuses the two lexsorts above: order_lo sorts left rows
            # before right within a key (cum of left rows at a right
            # position = left rows in own + earlier groups), order_hi
            # sorts them after (= earlier groups only); the difference
            # is the own-group left count, aligned to right_idx_sorted
            # by lexsort stability.
            hi_l = np.cumsum(~is_r[order_lo])[np.flatnonzero(is_r[order_lo])]
            lo_l = np.cumsum(~is_r[order_hi])[np.flatnonzero(is_r[order_hi])]
            unmatched_r = right_idx_sorted[(hi_l - lo_l) == 0]
            if len(unmatched_r):
                sub = batch.take(pa.array(unmatched_r))
                pieces.append(pa.table({c: sub[c] for c, _ in out_schema}))
        if total == 0:
            if not pieces:
                return empty
            return pieces[0] if len(pieces) == 1 else pa.concat_tables(pieces)
        left_idx_sorted = np.flatnonzero(~is_r)[
            np.argsort(keys[~is_r], kind="stable")]
        rep = np.repeat(np.arange(len(emit)), emit)
        cum0 = np.concatenate(([0], np.cumsum(emit)[:-1]))
        ridx = np.repeat(lo, emit) + (np.arange(total)
                                      - np.repeat(cum0, emit))
        l_take = pa.array(left_idx_sorted[rep])
        if how in ("left", "full"):
            unmatched = np.repeat(counts == 0, emit)
            safe = np.where(unmatched, 0, ridx)
            r_take = pa.array(
                right_idx_sorted[safe] if len(right_idx_sorted)
                else np.zeros(total, np.int64), mask=unmatched)
        else:
            r_take = pa.array(right_idx_sorted[ridx])
        cols = {key: batch[key].take(l_take)}
        for c in left_cols:
            cols[c] = batch[c].take(l_take)
        for c in right_cols:
            cols[c] = batch[c].take(r_take)
        pieces.insert(0, pa.table(cols))
        return pieces[0] if len(pieces) == 1 else pa.concat_tables(pieces)

    return keyed_exchange(tagged, key, join_block, exchange)


def semi_anti_join(left_ds, right_ds, key: str, left_cols,
                   anti: bool = False, exchange: str | None = None):
    """Large-large semi-join (``anti=False``: keep left rows with >= 1
    right match) / anti-join (``anti=True``: keep left rows with NO
    right match) — the EXISTS / NOT EXISTS primitive an incremental
    dedup ("drop docs already in the previous snapshot") needs when
    BOTH sides are corpus-sized. Same tagged-union keyed exchange as
    ``equi_join``, but the right side ships ONLY its key column and
    each surviving left row is emitted exactly once (no expansion), so
    the exchange payload is the minimum possible for the semantics.

    NULL semantics follow SQL EXISTS: a NULL key never matches, so
    NULL-key left rows are dropped by semi and kept by anti (right
    NULLs are always dropped). NULL-key left rows bypass group coding
    inside the kernel, so any key type works."""
    left_cols = list(left_cols)
    l_types = _arrow_types(left_ds)

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {key: batch[key],
                "_side": pa.array(np.zeros(n, np.int8), pa.int8())}
        for c in left_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[key]))
        n = len(batch)
        cols = {key: batch[key].cast(l_types[key]),
                "_side": pa.array(np.ones(n, np.int8), pa.int8())}
        for c in left_cols:
            cols[c] = pa.nulls(n, l_types[c])
        return pa.table(cols)

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow")
              .union(right_ds.select_columns([key])
                     .map_batches(tag_right, batch_format="pyarrow")))

    out_schema = ([(key, l_types[key])]
                  + [(c, l_types[c]) for c in left_cols])

    def filter_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({c: pa.array([], t) for c, t in out_schema})
        side = batch["_side"].to_numpy()
        valid = pc.is_valid(batch[key]).to_numpy(zero_copy_only=False)
        is_r = side == 1
        left_idx = np.flatnonzero(~is_r)
        lv = valid[left_idx]
        # valid-key rows: one bincount of right rows per key group
        # answers EXISTS for every left row at once
        vi = np.flatnonzero(valid)
        keys = _group_codes(
            batch[key].take(pa.array(vi)).to_numpy(zero_copy_only=False))
        has_r = np.bincount(keys[is_r[vi]],
                            minlength=int(keys.max()) + 1 if len(keys) else 0
                            ).astype(bool)
        # map valid left rows back into the coded space
        pos_of = np.full(len(batch), -1, np.int64)
        pos_of[vi] = np.arange(len(vi))
        matched = np.zeros(len(left_idx), dtype=bool)
        matched[lv] = has_r[keys[pos_of[left_idx[lv]]]]
        keep_valid = ~matched if anti else matched
        keep = keep_valid & (lv | anti)  # NULL-key left: anti keeps
        take = pa.array(left_idx[keep])
        cols = {key: batch[key].take(take)}
        for c in left_cols:
            cols[c] = batch[c].take(take)
        return pa.table(cols)

    return keyed_exchange(tagged, key, filter_block, exchange)


def hot_keys(ds, key: str, min_count: int,
             per_block_top: int = 64) -> set:
    """Approximate heavy-hitter detection for skew handling: each block
    emits its ``per_block_top`` most frequent keys with local counts
    (one pandas value_counts per block); the driver sums the tiny
    partials and keeps keys whose summed count >= ``min_count``. A
    truly hot key dominates the blocks it appears in, so it always
    surfaces; a key can only be undercounted when it is scattered below
    every block's top list — exactly the keys that are NOT
    skew-dangerous. Misclassification is safe by construction: in
    ``skew_join`` the hot/cold split only picks which of two correct
    paths a key takes."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        vc = (batch[key].to_pandas().value_counts()
              .iloc[:per_block_top])
        return pa.table({key: pa.array(vc.index.to_numpy(),
                                       batch[key].type),
                         "_n": pa.array(vc.to_numpy(), pa.int64())})

    parts = pa.concat_tables(
        list(ds.select_columns([key])
               .map_batches(partial, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow", batch_size=None)))
    df = parts.to_pandas().groupby(key, as_index=False)["_n"].sum()
    return set(df.loc[df["_n"] >= min_count, key].tolist())


def skew_join(left_ds, right_ds, key: str, left_cols, right_cols,
              hot_count: int = 10_000, exchange: str | None = None,
              max_hot_right_rows: int = 2_000_000):
    """Skew-aware hybrid inner equi-join — the hot-key mitigation the
    north rule names (salted/broadcast handling of Zipf-head keys)
    applied to the large-large join: heavy-hitter LEFT keys (detected
    by ``hot_keys``; a Zipf-head host/user whose row count would stall
    one exchange partition) NEVER enter the all-to-all. Their right
    rows are collected once (bounded by ``max_hot_right_rows`` —
    O(hot keys x right rows per key), small because hot keys are few
    by definition) and broadcast-joined against the hot left rows as a
    streaming map; every other key flows through the normal tagged
    keyed exchange (``equi_join``). The union of the two paths is
    exactly the inner join for ANY hot-set choice, so the approximate
    detector can never change answers — only which path a key rides."""
    import ray

    hot = hot_keys(left_ds, key, hot_count)
    if not hot:
        return equi_join(left_ds, right_ds, key, left_cols, right_cols,
                         exchange=exchange)
    hot_ref = ray.put(np.array(sorted(hot)))

    def split(want_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            arr = batch[key].to_numpy(zero_copy_only=False)
            m = np.isin(arr, ray.get(hot_ref))
            return batch.filter(pa.array(m if want_hot else ~m))
        return fn

    right_hot_tbl = pa.concat_tables(list(
        right_ds.select_columns([key] + list(right_cols))
        .map_batches(split(True), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert len(right_hot_tbl) <= max_hot_right_rows, (
        f"hot-key right side {len(right_hot_tbl)} rows exceeds the "
        f"broadcast bound {max_hot_right_rows}; raise hot_count")
    # the hot-path merge tolerates DUPLICATE right keys (unlike
    # broadcast_join's unique hash index): ray.put once, per-worker
    # cached pandas frame, vectorized many-to-many merge per batch
    r_ref = ray.put(right_hot_tbl)
    order = [key] + list(left_cols) + list(right_cols)
    l_types = _arrow_types(left_ds)
    r_t = {f.name: f.type for f in right_hot_tbl.schema}
    tgt = pa.schema([(key, l_types[key])]
                    + [(c, l_types[c]) for c in left_cols]
                    + [(c, r_t[c]) for c in right_cols])
    _cache: dict[str, object] = {}

    def hot_merge(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811 — worker-side import

        h = r_ref.hex()
        if h not in _cache:
            _cache[h] = ray.get(r_ref).to_pandas()
        out = batch.to_pandas().merge(_cache[h], on=key, how="inner")
        # explicit schema: an empty merge must not degrade string
        # columns to pa.null (union with the cold path needs one schema)
        return pa.Table.from_pandas(out[order], schema=tgt,
                                    preserve_index=False)

    hot_out = (left_ds.select_columns([key] + list(left_cols))
               .map_batches(split(True), batch_format="pyarrow")
               .map_batches(hot_merge, batch_format="pyarrow"))
    cold_out = equi_join(
        left_ds.map_batches(split(False), batch_format="pyarrow"),
        right_ds.map_batches(split(False), batch_format="pyarrow"),
        key, left_cols, right_cols, exchange=exchange)
    return hot_out.union(cold_out)


def set_op(left_ds, right_ds, key: str, op: str = "intersect",
           exchange: str | None = None):
    """Distributed INTERSECT / EXCEPT / UNION with SQL DISTINCT set
    semantics
    on a key column: both sides ship ONLY the key through one tagged
    keyed exchange; the kernel emits each distinct key once iff it is
    present on both sides (``intersect``) / on the left only
    (``except``). Unlike joins, SQL set ops treat NULLs as EQUAL —
    all NULL rows co-locate in one partition of the exchange, so the
    kernel's local NULL-presence test is globally correct. (String
    NULL keys need ``exchange='hash'`` — see ``equi_join``.)

    ``intersect_all`` / ``except_all`` use SQL bag semantics over the
    same keys-only exchange: each key is emitted min(count_l, count_r)
    / max(count_l - count_r, 0) times — per-side multiplicities are
    two bincounts over the local key codes, the output is one
    ``np.repeat``."""
    assert op in ("intersect", "except", "union",
                  "intersect_all", "except_all")
    bag = op.endswith("_all")
    l_t = _arrow_types(left_ds)[key]

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            k = batch[key] if side == 0 else batch[key].cast(l_t)
            return pa.table({key: k, "_side": pa.array(
                np.full(n, side, np.int8), pa.int8())})
        return fn

    tagged = (left_ds.select_columns([key])
              .map_batches(tag(0), batch_format="pyarrow")
              .union(right_ds.select_columns([key])
                     .map_batches(tag(1), batch_format="pyarrow")))

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], l_t)})
        if len(batch) == 0:
            return empty
        side = batch["_side"].to_numpy()
        valid = pc.is_valid(batch[key]).to_numpy(zero_copy_only=False)
        is_r = side == 1
        pieces = []
        vi = np.flatnonzero(valid)
        if len(vi):
            arr = batch[key].take(pa.array(vi)) \
                .to_numpy(zero_copy_only=False)
            uniq, codes = np.unique(arr, return_inverse=True)
            ng = int(codes.max()) + 1
            cnt_l = np.bincount(codes[~is_r[vi]], minlength=ng)
            cnt_r = np.bincount(codes[is_r[vi]], minlength=ng)
            if bag:
                mult = (np.minimum(cnt_l, cnt_r)
                        if op == "intersect_all"
                        else np.maximum(cnt_l - cnt_r, 0))
                if mult.any():
                    pieces.append(pa.table(
                        {key: pa.array(np.repeat(uniq, mult), l_t)}))
            else:
                has_l, has_r = cnt_l.astype(bool), cnt_r.astype(bool)
                want = (has_l & has_r if op == "intersect"
                        else has_l & ~has_r if op == "except"
                        else has_l | has_r)
                # one representative row per selected key (left
                # preferred; union falls back to a right row)
                lmask = ~is_r[vi]
                first = np.full(ng, -1, np.int64)
                first[codes[lmask][::-1]] = vi[lmask][::-1]
                if op == "union":
                    first_r = np.full(ng, -1, np.int64)
                    first_r[codes[is_r[vi]][::-1]] = vi[is_r[vi]][::-1]
                    first = np.where(first >= 0, first, first_r)
                sel = first[np.flatnonzero(want)]
                if len(sel):
                    pieces.append(pa.table(
                        {key: batch[key].take(pa.array(np.sort(sel)))}))
        n_nl = int(np.sum(~valid & ~is_r))
        n_nr = int(np.sum(~valid & is_r))
        if bag:
            n_null = (min(n_nl, n_nr) if op == "intersect_all"
                      else max(n_nl - n_nr, 0))
            if n_null:
                pieces.append(pa.table({key: pa.nulls(n_null, l_t)}))
        elif (op == "union" and (n_nl or n_nr)) or (
                n_nl and (n_nr if op == "intersect" else not n_nr)):
            pieces.append(pa.table({key: pa.nulls(1, l_t)}))
        if not pieces:
            return empty
        return pieces[0] if len(pieces) == 1 else pa.concat_tables(pieces)

    return keyed_exchange(tagged, key, kern, exchange)


def range_join(ds, key_col: str, ts_col: str, type_col: str,
               build_type: str, probe_type: str, window_us: int,
               id_col: str = "event_id", exchange: str | None = None):
    """Per-key interval (range) join — the windowed-attribution
    primitive Ray Data lacks: for every ``build_type`` row, pair it
    with every ``probe_type`` row of the SAME key whose timestamp falls
    in ``[build_ts, build_ts + window_us]`` (inclusive both ends).
    Emits (key, build_id, probe_id) pairs.

    One keyed exchange (see ``keyed_exchange``), then a whole-block
    kernel that is vectorized ACROSS keys — no per-key Python even on
    the hash path. The trick is two merge passes over the union of
    sides: with builds sorted by (key, ts), a probe's matching builds
    are the contiguous global slice [lo, hi) where

    - hi = #builds at-or-before (key, probe_ts)   (builds win ties), and
    - lo = #builds strictly before (key, probe_ts - window)
      (probes win ties, so a build at exactly probe_ts - window stays in),

    both computed for every probe at once as a cumulative build count
    over a single lexsort. Earlier-key builds cancel in hi - lo, so the
    slice never crosses a key boundary. Pair expansion is the standard
    repeat + arange-offset trick."""

    def pairs_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], batch[key_col].type if batch.num_columns
                              else pa.int64()),
            "build_id": pa.array([], pa.int64()),
            "probe_id": pa.array([], pa.int64()),
        })
        if len(batch) == 0:
            return empty
        types = np.asarray(batch[type_col].to_pylist(), dtype=object)
        side_m = (types == build_type) | (types == probe_type)
        # null keys never match (SQL join semantics)
        side_m &= np.asarray(pc.is_valid(batch[key_col]).to_pylist())
        batch = batch.filter(pa.array(side_m))
        if len(batch) == 0:
            return empty
        types = types[side_m]
        keys_raw = batch[key_col].to_numpy(zero_copy_only=False)
        keys = _group_codes(keys_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        ids = batch[id_col].to_numpy()
        is_build = types == build_type
        # hi: builds sort before probes at equal ts -> inclusive upper end
        order_hi = np.lexsort((np.where(is_build, 0, 1), ts, keys))
        cumb_hi = np.cumsum(is_build[order_hi])
        probe_pos_hi = np.flatnonzero(~is_build[order_hi])
        hi = cumb_hi[probe_pos_hi]
        # lo: probe ts shifted back by the window; probes sort before
        # builds at equal ts -> build at exactly (probe_ts - window) is
        # NOT counted below, i.e. stays inside the inclusive window
        ts_lo = np.where(is_build, ts, ts - window_us)
        order_lo = np.lexsort((np.where(is_build, 1, 0), ts_lo, keys))
        cumb_lo = np.cumsum(is_build[order_lo])
        lo = cumb_lo[np.flatnonzero(~is_build[order_lo])]
        # both merges enumerate probes in the same (key, ts, stable)
        # order: the lo shift is constant per probe, lexsort is stable
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        build_order = np.lexsort((ts[is_build], keys[is_build]))
        build_ids = ids[is_build][build_order]
        probe_ids = ids[order_hi][probe_pos_hi]
        probe_keys = keys_raw[order_hi][probe_pos_hi]
        rep = np.repeat(np.arange(len(counts)), counts)
        cum0 = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bidx = np.repeat(lo, counts) + (np.arange(total)
                                        - np.repeat(cum0, counts))
        return pa.table({
            key_col: pa.array(probe_keys[rep], batch[key_col].type),
            "build_id": pa.array(build_ids[bidx], pa.int64()),
            "probe_id": pa.array(probe_ids[rep], pa.int64()),
        })

    return keyed_exchange(ds, key_col, pairs_block, exchange)


def interval_overlap_join(ds, lo_col: str, hi_col: str, type_col: str,
                          left_type: str, right_type: str,
                          id_col: str = "event_id", bucket_w: int = 1024,
                          exchange: str | None = None,
                          max_block_pairs: int = 16_000_000):
    """Distributed interval-OVERLAP join — the sessions×incidents /
    availability-window primitive (``range_join`` is point-in-interval;
    this is interval-against-interval): emit (a, b) for every
    ``left_type`` interval [lo, hi] that overlaps a ``right_type``
    interval (inclusive ends: l.lo <= r.hi AND r.lo <= l.hi).

    Scale shape: each interval is replicated into the fixed-width time
    buckets it covers (replication factor = len/bucket_w + 1 — size
    ``bucket_w`` to the typical interval length), ONE keyed exchange on
    the bucket id co-locates candidates, and a fully vectorized kernel
    crosses lefts×rights per bucket run (repeat/arange expansion, no
    per-bucket Python). A pair overlapping in several buckets is
    emitted exactly once: only by the bucket that owns
    floor(max(l.lo, r.lo) / bucket_w) — the standard owner-bucket rule,
    so no second dedup exchange is needed. The cross-product guard
    fails loudly if a block's candidate pairs exceed
    ``max_block_pairs`` (pathological time skew — shrink bucket_w)."""

    def replicate(batch: pa.Table) -> pa.Table:
        empty = pa.table({"_bucket": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.int64()),
                          "_id": pa.array([], pa.int64()),
                          "_lo": pa.array([], pa.int64()),
                          "_hi": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        types = np.asarray(batch[type_col].to_pylist(), dtype=object)
        m = (types == left_type) | (types == right_type)
        if not m.any():
            return empty
        side = (types[m] == right_type).astype(np.int64)
        lo = batch[lo_col].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        hi = batch[hi_col].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        b0, b1 = lo // bucket_w, hi // bucket_w
        nb = (b1 - b0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(nb)), nb)
        cum0 = np.concatenate(([0], np.cumsum(nb)[:-1]))
        off = np.arange(int(nb.sum())) - np.repeat(cum0, nb)
        return pa.table({
            "_bucket": pa.array(b0[rep] + off, pa.int64()),
            "_side": pa.array(side[rep], pa.int64()),
            "_id": pa.array(ids[rep], pa.int64()),
            "_lo": pa.array(lo[rep], pa.int64()),
            "_hi": pa.array(hi[rep], pa.int64())})

    def cross_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        b = batch["_bucket"].to_numpy()
        side = batch["_side"].to_numpy()
        ids = batch["_id"].to_numpy()
        lo = batch["_lo"].to_numpy()
        hi = batch["_hi"].to_numpy()
        order = np.lexsort((side, b))
        sb, ss = b[order], side[order]
        new_run = np.concatenate(([True], sb[1:] != sb[:-1]))
        starts = np.flatnonzero(new_run)
        ends = np.concatenate((starts[1:], [len(sb)]))
        # lefts sort first within a run; count sides per run
        nl = np.add.reduceat(ss == 0, starts).astype(np.int64)
        # reduceat over an empty trailing slice repeats the start element;
        # run lengths are >= 1 here so ends-starts is safe
        nrun = ends - starts
        nr = nrun - nl
        npairs = nl * nr
        total = int(npairs.sum())
        if total == 0:
            return empty
        assert total <= max_block_pairs, (
            f"interval_overlap_join: {total} candidate pairs in one "
            f"block exceeds max_block_pairs={max_block_pairs} — time "
            f"skew; shrink bucket_w or raise the cap")
        run_of = np.repeat(np.arange(len(starts)), npairs)
        cum0 = np.concatenate(([0], np.cumsum(npairs)[:-1]))
        within = np.arange(total) - np.repeat(cum0, npairs)
        li = starts[run_of] + within // nr[run_of]
        ri = starts[run_of] + nl[run_of] + within % nr[run_of]
        gl, gr = order[li], order[ri]
        keep = ((lo[gl] <= hi[gr]) & (lo[gr] <= hi[gl])
                & (np.maximum(lo[gl], lo[gr]) // bucket_w == sb[li]))
        return pa.table({"a": pa.array(ids[gl][keep], pa.int64()),
                         "b": pa.array(ids[gr][keep], pa.int64())})

    rep = ds.map_batches(replicate, batch_format="pyarrow")
    return keyed_exchange(rep, "_bucket", cross_block, exchange)


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_us: int = 30 * 60 * 1_000_000, exchange: str | None = None):
    """Per-user gap sessionization: events sorted by time; a gap larger
    than ``gap_us`` starts a new session. Emits per-user aggregates
    (n_sessions, n_events). Partitioned by user — the groupby is the
    one shuffle, keyed uniformly."""

    def sess_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"user_id": pa.array([], batch[user_col].type),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        uid_raw = batch[user_col].to_numpy(zero_copy_only=False)
        uid = _group_codes(uid_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, uid))
        u_s, t_s = uid[order], ts[order]
        new_user = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        gap = np.concatenate(([0], np.diff(t_s)))
        new_sess = new_user | (gap > gap_us)
        starts = np.flatnonzero(new_user)
        n_sessions = np.add.reduceat(new_sess.astype(np.int64), starts)
        n_events = np.diff(np.concatenate((starts, [len(u_s)])))
        return pa.table(
            {
                "user_id": pa.array(uid_raw[order][starts],
                                    batch[user_col].type),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
            }
        )

    return keyed_exchange(ds, user_col, sess_block, exchange)


def session_spans(ds, user_col: str = "user_id", ts_col: str = "ts",
                  gap_us: int = 30 * 60 * 1_000_000,
                  exchange: str | None = None):
    """Per-SESSION rows from gap sessionization (``sessionize`` emits
    per-user aggregates; this emits one row per session with its span)
    — the input to dwell-time / engagement-distribution analyses.
    Same one keyed exchange; session boundaries and spans fall out of
    one lexsort + reduceat. Returns a streaming Dataset
    (user_id, n_events, dur_us)."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"user_id": pa.array([], batch[user_col].type
                                                 if len(batch.schema)
                                                 else pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "dur_us": pa.array([], pa.int64())})
        uid_raw = batch[user_col].to_numpy(zero_copy_only=False)
        uid = _group_codes(uid_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, uid))
        u_s, t_s = uid[order], ts[order]
        new_user = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        gap = np.concatenate(([0], np.diff(t_s)))
        new_sess = new_user | (gap > gap_us)
        ss = np.flatnonzero(new_sess)
        se = np.concatenate((ss[1:], [len(u_s)]))
        return pa.table({
            "user_id": pa.array(uid_raw[order][ss], batch[user_col].type),
            "n_events": pa.array(se - ss, pa.int64()),
            "dur_us": pa.array(t_s[se - 1] - t_s[ss], pa.int64())})

    return keyed_exchange(ds, user_col, kern, exchange)


def window_scan(ds, key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value",
                exchange: str | None = None):
    """Per-key ordered window SCAN (the running-total / lag family of
    window functions): one keyed exchange, then a single vectorized
    pass per complete key run ordered by (ts, id) computing

    - ``run_n``     — cumulative event count (``count(*) OVER w``),
    - ``run_cents`` — cumulative integer-cents sum of ``value_col``
      (``sum(cents) OVER w``; per-row cents = ``floor(v*100 + 0.5)``
      so the Ray and SQL sides round identically in IEEE double),
    - ``gap_us``    — microseconds since the key's previous event
      (``lag`` delta; -1 on each run's first row).

    Unlike ``sessionize`` (which reduces each key to one row), this
    emits one row per input row — the shape of cumulative metrics,
    inter-arrival/dwell-time features and per-host fetch pacing
    analysis. Cumsums never cross run boundaries (run-start offsets
    are subtracted), so any number of complete keys per block is fine
    — both exchanges feed the same kernel (see ``keyed_exchange``)."""

    def scan_block(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], key_t),
                             id_col: pa.array([], pa.int64()),
                             "run_n": pa.array([], pa.int64()),
                             "run_cents": pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        key_raw = batch[key_col].to_numpy(zero_copy_only=False)
        keys = _group_codes(key_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch[value_col].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        order = np.lexsort((ids, ts, keys))
        k_s, t_s = keys[order], ts[order]
        new_run = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        pos = np.arange(len(k_s))
        run_n = pos - starts[run_id] + 1
        csum = np.cumsum(cents[order])
        before_start = np.concatenate(([0], csum[:-1]))[starts]
        run_cents = csum - before_start[run_id]
        gap = np.concatenate(([0], np.diff(t_s)))
        gap[new_run] = -1
        return pa.table({key_col: pa.array(key_raw[order], key_t),
                         id_col: pa.array(ids[order], pa.int64()),
                         "run_n": pa.array(run_n, pa.int64()),
                         "run_cents": pa.array(run_cents, pa.int64()),
                         "gap_us": pa.array(gap, pa.int64())})

    return keyed_exchange(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col, scan_block, exchange)


def per_key_drawdown(ds, key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id", value_col: str = "value",
                     exchange: str | None = None):
    """Per-key maximum drawdown over the (ts, id)-ordered value series:
    for each key, max over time of (running peak cents - current cents)
    — the monitoring/alerting reduction for any per-entity metric
    stream (per-host fetch-rate sag, per-source quality decay, account
    balance risk). Emits one row per key: (key, n_events,
    peak_cents, max_drawdown_cents).

    One keyed exchange; the kernel is vectorized ACROSS keys: a single
    ``np.maximum.accumulate`` computes every run's running peak at once
    (runs are isolated by adding run_id * 2^40 before the accumulate —
    valid while |cents| < 2^40), and per-run maxima come from one
    ``np.maximum.reduceat``. No per-key Python."""
    _RUN_OFFSET = np.int64(1) << 40

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "n_events": pa.array([], pa.int64()),
                             "peak_cents": pa.array([], pa.int64()),
                             "max_drawdown_cents": pa.array([], pa.int64())})
        key_raw = batch[key_col].to_numpy(zero_copy_only=False)
        keys = _group_codes(key_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch[value_col].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        assert np.abs(cents).max(initial=0) < _RUN_OFFSET
        order = np.lexsort((ids, ts, keys))
        k_s, c_s = keys[order], cents[order]
        new_run = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = (np.cumsum(new_run) - 1).astype(np.int64)
        peak = np.maximum.accumulate(c_s + run_id * _RUN_OFFSET) \
            - run_id * _RUN_OFFSET
        dd = peak - c_s
        counts = np.diff(np.append(starts, len(k_s))).astype(np.int64)
        return pa.table({
            key_col: pa.array(key_raw[order][starts], key_t),
            "n_events": pa.array(counts, pa.int64()),
            "peak_cents": pa.array(np.maximum.reduceat(c_s, starts),
                                   pa.int64()),
            "max_drawdown_cents": pa.array(np.maximum.reduceat(dd, starts),
                                           pa.int64()),
        })

    return keyed_exchange(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col, kern, exchange)


def funnel_depth(ds, key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 steps: tuple = ("view", "click", "purchase"),
                 exchange: str | None = None):
    """Ordered-funnel analysis: how far each key progresses through
    ``steps`` where step k+1 must occur STRICTLY AFTER the first
    qualifying step-k event (the classic conversion-funnel semantics).
    Emits (key, depth) with depth in [0, len(steps)].

    One keyed exchange; the kernel is vectorized ACROSS keys — each
    step is one masked ``np.minimum.reduceat`` over the run-sorted
    block (rows failing the step mask contribute +inf), so cost is
    O(steps × rows) with no per-key Python. The sequential dependency
    (t_{k+1} needs t_k) lives in the broadcast of the per-run minimum
    back to rows, not in a scan."""

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "depth": pa.array([], pa.int64())})
        key_raw = batch[key_col].to_numpy(zero_copy_only=False)
        keys = _group_codes(key_raw)
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy().astype(np.float64)
        types = batch[type_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, keys))
        k_s, t_s, ty_s = keys[order], ts[order], types[order]
        new_run = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1

        depth = np.zeros(len(starts), np.int64)
        prev_t = np.full(len(starts), -np.inf)
        for step in steps:
            cand = np.where((ty_s == step) & (t_s > prev_t[run_id]),
                            t_s, np.inf)
            t_k = np.minimum.reduceat(cand, starts)
            hit = np.isfinite(t_k)
            depth += hit
            prev_t = np.where(hit, t_k, np.inf)  # inf blocks later steps

        return pa.table({
            key_col: pa.array(key_raw[order][starts], key_t),
            "depth": pa.array(depth, pa.int64()),
        })

    return keyed_exchange(
        ds.select_columns([key_col, ts_col, type_col]),
        key_col, kern, exchange)


def concat_groups(ds, key_col: str, order_col: str, text_col: str,
                  sep: str = "", exchange: str | None = None):
    """Ordered per-key string concatenation (document reassembly from
    chunks — the inverse of sequence chunking): one keyed exchange,
    chunks sorted by (key, order) and joined per run. Emits
    (key, text). The join is per-GROUP pandas C machinery, not
    per-row Python; at 10^9 keys pass ``exchange='hash'``."""
    import pandas as pd

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "text": pa.array([], pa.string())})
        df = batch.select([key_col, order_col, text_col]).to_pandas()
        df = df.sort_values([key_col, order_col])
        agg = df.groupby(key_col, sort=True)[text_col].agg(sep.join)
        return pa.table({key_col: pa.array(agg.index.to_numpy()),
                         "text": pa.array(agg.to_numpy(), pa.string())})

    return keyed_exchange(
        ds.select_columns([key_col, order_col, text_col]),
        key_col, kern, exchange)


def grouped_mode(ds, key_col: str, val_col: str,
                 exchange: str | None = None):
    """Most frequent value per key (deterministic: count desc, value
    asc tie-break) — the categorical argmax aggregate. Per-block
    (key, val, n) pre-aggregation shrinks the exchange to distinct
    pairs (the combiner move: rows shipped are bounded by
    keys × distinct values, not events); the keyed exchange then sums
    pair counts and takes the first row per key run."""
    import pandas as pd

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        vc = df.groupby([key_col, val_col], sort=False).size()
        out = vc.reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    def mode_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], batch[key_col].type),
                             "top_val": pa.array([], batch[val_col].type),
                             "n": pa.array([], pa.int64())})
        df = batch.to_pandas()
        df = df.groupby([key_col, val_col], as_index=False)["n"].sum()
        df = df.sort_values([key_col, "n", val_col],
                            ascending=[True, False, True])
        top = df.drop_duplicates(key_col, keep="first")
        return pa.table({key_col: pa.array(top[key_col].to_numpy()),
                         "top_val": pa.array(top[val_col].to_numpy()),
                         "n": pa.array(top["n"].to_numpy(), pa.int64())})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    return keyed_exchange(pre_ds, key_col, mode_block, exchange)


def _key_hash64(arr) -> np.ndarray:
    """Deterministic 64-bit hash per key for bloom indexing. Integer
    keys: splitmix64 finalizer, fully vectorized. String keys: md5 top
    8 bytes (per-row, but bloom builds hash each key once per block).
    Null positions return 0 — callers mask them out first."""
    if pa.types.is_integer(arr.type):
        x = pc.fill_null(arr.cast(pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))
    import hashlib
    vals = arr.to_pylist()
    return np.fromiter(
        (0 if v is None else
         int.from_bytes(hashlib.md5(str(v).encode("utf8")).digest()[:8],
                        "big") for v in vals),
        dtype=np.uint64, count=len(vals))


def _bloom_positions(h: np.ndarray, m_bits: int, k_hashes: int):
    """k double-hashed bit positions per key (h1 + i*h2 mod m; h2 odd
    so a power-of-two m is fully covered). Yields one position array
    per hash to keep peak memory O(n), not O(n*k)."""
    h1 = h % np.uint64(m_bits)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(m_bits)
    for i in range(k_hashes):
        yield (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def build_bloom(ds, key: str, m_bits: int = 1 << 20,
                k_hashes: int = 5) -> np.ndarray:
    """Distributed Bloom filter over a key column: each block sets its
    keys' bits into a local m-bit word array (one `np.bitwise_or.at`
    per hash), the driver ORs the per-block partials — m/8 bytes move
    per block, never the keys. m=2^20 is 128 KiB; size m ~ 10-15 bits
    per expected distinct key for ~1% false positives."""
    assert m_bits % 64 == 0

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, np.uint64)
        col = batch[key]
        if len(col):
            col = col.combine_chunks() if hasattr(col, "combine_chunks") \
                else col
            col = col.filter(pc.is_valid(col)) if col.null_count else col
            h = _key_hash64(col)
            for pos in _bloom_positions(h, m_bits, k_hashes):
                np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(
                    np.int64), np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"w": pa.array(words.view(np.int64), pa.int64())})

    words = np.zeros(m_bits // 64, np.uint64)
    for t in ds.select_columns([key]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        part = t["w"].to_numpy().view(np.uint64)
        words |= np.bitwise_or.reduce(
            part.reshape(-1, m_bits // 64), axis=0)
    return words


def bloom_semi_join(left_ds, right_ds, key: str, left_cols,
                    anti: bool = False, m_bits: int = 1 << 20,
                    k_hashes: int = 5, exchange: str | None = None):
    """EXACT semi/anti join with a Bloom prefilter — the standard
    100-TB exchange reducer: when the right side's distinct keys are
    too many to broadcast raw but their Bloom filter fits (10^9 keys
    ~= 1.2 GiB at 1% fp), broadcast the filter, drop definite
    non-matches from the left WITHOUT any shuffle, and run the exact
    ``semi_anti_join`` exchange only over the surviving candidates.

    - semi: bloom 'absent' is definitive -> only candidates (true
      matches + ~fp-rate false positives) enter the exchange;
    - anti: bloom-absent left rows (and NULL keys, which never match)
      are emitted immediately as a streaming definite-keep Dataset,
      and only candidates go through the exact anti confirm; the
      result is their union.

    False positives are removed by the exact confirm, so output ==
    SQL EXISTS / NOT EXISTS regardless of m/k. Left payload through
    the all-to-all shrinks by the left's non-matching fraction
    (e.g. a 1%-selective right side cuts ~99% of left bytes)."""
    import ray

    words_ref = ray.put(build_bloom(right_ds, key, m_bits, k_hashes))
    cache: dict = {}

    def might_match(batch: pa.Table) -> np.ndarray:
        wkey = words_ref.hex()
        if wkey not in cache:
            cache[wkey] = ray.get(words_ref)
        words = cache[wkey]
        valid = pc.is_valid(batch[key]).to_numpy(zero_copy_only=False)
        h = _key_hash64(batch[key])
        hit = valid.copy()
        for pos in _bloom_positions(h, m_bits, k_hashes):
            hit &= ((words[(pos >> np.uint64(6)).astype(np.int64)]
                     >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
        return hit

    cols = [key] + list(left_cols)

    def candidates(batch: pa.Table) -> pa.Table:
        return batch.select(cols).filter(pa.array(might_match(batch)))

    cand = left_ds.map_batches(candidates, batch_format="pyarrow")
    confirmed = semi_anti_join(cand, right_ds, key, list(left_cols),
                               anti=anti, exchange=exchange)
    if not anti:
        return confirmed

    def definite(batch: pa.Table) -> pa.Table:
        return batch.select(cols).filter(pa.array(~might_match(batch)))

    return left_ds.map_batches(definite, batch_format="pyarrow") \
        .union(confirmed)


def unpivot(ds, id_cols, value_cols, var_col: str = "name",
            val_col: str = "value"):
    """UNPIVOT / melt: turn ``value_cols`` into (name, value) rows —
    the wide→long reshape feeding generic per-metric pipelines (one
    quality-signal column family → a single (doc, signal, value)
    stream). Pure per-block transform: each batch emits one slice per
    value column (id columns reused zero-copy, the name column is a
    constant, values cast double) — no shuffle, no Python per row;
    the inverse of ``pivot_counts``."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    vals = list(value_cols)

    def melt(batch: pa.Table) -> pa.Table:
        slices = []
        for c in vals:
            cols = {i: batch[i] for i in ids}
            cols[var_col] = pa.array([c] * len(batch), pa.string())
            cols[val_col] = batch[c].cast(pa.float64())
            slices.append(pa.table(cols))
        return pa.concat_tables(slices)

    return ds.map_batches(melt, batch_format="pyarrow")


def cdc_merge(ds, key_col: str, ts_col: str, op_col: str,
              delete_op: str, tiebreak: str | None = None,
              exchange: str | None = None):
    """Lakehouse CDC MERGE compaction: apply a change stream to
    nothing-but-the-stream — per key the LATEST row wins (max
    ``ts_col``, ``tiebreak`` ascending on ties), and a key whose
    winning row is a ``delete_op`` disappears entirely (the
    upsert+delete semantics of Delta/Iceberg MERGE; ``latest_events``
    is the delete-free special case). One keyed exchange
    (``per_key_topk`` k=1) + a streaming filter; the winner decision
    and the delete decision are the same row, so no second pass."""

    latest = per_key_topk(ds, key_col, ts_col, 1, descending=True,
                          tiebreak=tiebreak, exchange=exchange)

    def drop_deleted(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch[op_col], delete_op))

    return latest.map_batches(drop_deleted, batch_format="pyarrow")


def ks_2sample(ds, value_col: str, side_col: str,
               scale: int = 100) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov statistic, INTEGER-EXACT — the
    distribution-drift test between two cohorts (train/val splits,
    A/B variants, snapshot versions; the nonparametric complement of
    the binned ``psi_drift``):

        D = max_v |F_a(v) - F_b(v)|  over pooled distinct values
          = ks_num / ks_den,  ks_num = max|ca(v)·nb - cb(v)·na|,
            ks_den = na·nb

    ``side_col`` must be int8/bool-like (0 = cohort a, 1 = cohort b);
    values are discretized to ``value*scale`` rounded (exact for
    cents-style decimals), so D is a ratio of exact integers and the
    whole statistic oracle-checks.

    Scale shape: one ``map_batches`` pass folds each block into
    (value, na, nb) count partials (np.unique register rows — the
    partial-combine shape); the driver merges distinct-value-scale
    partials, prefix-sums, and takes the max. The bounded-value-domain
    assumption is the same as ``grouped_quantile_disc``'s histogram
    combine; an unbounded domain routes through the sort-exchange
    prefix-sum (``compaction_plan``'s scan) instead. Returns one row
    (n_a, n_b, ks_num, ks_den, ks_micro)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        # floor(v*scale + 0.5): the repo's exact cents discretization
        # (window_scan) — identical in numpy and SQL, no half-even snag
        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        side = batch[side_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        a = np.bincount(inv, weights=(side == 0), minlength=len(uv))
        b = np.bincount(inv, weights=(side == 1), minlength=len(uv))
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "a": pa.array(a.astype(np.int64), pa.int64()),
                         "b": pa.array(b.astype(np.int64), pa.int64())})

    acc: dict[int, list[int]] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for v, a, b in zip(t["v"].to_numpy(), t["a"].to_numpy(),
                           t["b"].to_numpy()):
            cur = acc.setdefault(int(v), [0, 0])
            cur[0] += int(a)
            cur[1] += int(b)
    if not acc:
        return pa.table({"n_a": pa.array([0], pa.int64()),
                         "n_b": pa.array([0], pa.int64()),
                         "ks_num": pa.array([0], pa.int64()),
                         "ks_den": pa.array([0], pa.int64()),
                         "ks_micro": pa.array([0], pa.int64())})
    vs = np.array(sorted(acc), dtype=np.int64)
    a = np.array([acc[int(v)][0] for v in vs], dtype=np.int64)
    b = np.array([acc[int(v)][1] for v in vs], dtype=np.int64)
    ca, cb = np.cumsum(a), np.cumsum(b)
    na, nb = int(ca[-1]), int(cb[-1])
    num = int(np.abs(ca * nb - cb * na).max())
    den = na * nb
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "ks_num": pa.array([num], pa.int64()),
        "ks_den": pa.array([den], pa.int64()),
        "ks_micro": pa.array([(1_000_000 * num) // den if den else 0],
                             pa.int64())})


def weighted_quantile_disc(ds, value_col: str, weight_col: str,
                           qs_ppt, scale: int = 100) -> pa.Table:
    """EXACT weighted discrete quantiles: for each q (in PERMILLE,
    integer), the smallest value v whose cumulative weight reaches
    q/1000 of the total — weighted PERCENTILE_DISC (the
    quantity-weighted median price, the bytes-weighted p95 latency).
    All-integer rank arithmetic (1000*cumw >= q*totw), so the whole
    operator oracle-checks.

    Scale shape: same bounded-value-domain register combine as
    ``ks_2sample`` / ``grouped_quantile_disc`` — per-block
    (value, weight-sum) partials via one np.unique pass, driver merges
    distinct-value-scale registers and reads ranks off the cumulative;
    unbounded domains route through ``quantile_unbounded``'s histogram
    bisection with weighted bin counts. Returns (q_ppt, value)."""
    qs_ppt = [qs_ppt] if isinstance(qs_ppt, int) else list(qs_ppt)

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        w = np.floor(batch[weight_col].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        ws = np.bincount(inv, weights=w, minlength=len(uv))
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "w": pa.array(ws.astype(np.int64), pa.int64())})

    acc: dict[int, int] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for v, w in zip(t["v"].to_numpy(), t["w"].to_numpy()):
            acc[int(v)] = acc.get(int(v), 0) + int(w)
    vs = np.array(sorted(acc), dtype=np.int64)
    ws = np.array([acc[int(v)] for v in vs], dtype=np.int64)
    cumw = np.cumsum(ws)
    totw = int(cumw[-1]) if len(cumw) else 0
    out_q, out_v = [], []
    for q in qs_ppt:
        out_q.append(int(q))
        if totw == 0:
            out_v.append(0)
            continue
        idx = int(np.searchsorted(1000 * cumw, q * totw, side="left"))
        out_v.append(int(vs[min(idx, len(vs) - 1)]))
    return pa.table({"q_ppt": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def watermark_lateness(ds, order_col: str, ts_col: str,
                       lateness_us: int, day_us: int = 86_400_000_000
                       ) -> pa.Table:
    """Streaming watermark / late-data accounting: in ARRIVAL order
    (``order_col``, globally unique), a row is LATE when its event time
    trails the running maximum of all earlier arrivals by more than
    ``lateness_us`` — the out-of-orderness audit run before choosing a
    streaming pipeline's allowed-lateness bound (the reference's
    "late/lost data" concern, docs/source/topics/frontier-at-scale,
    measured as a batch statistic). Returns per-day
    (day, n_total, n_late, late_ppm), integer-exact.

    Scale shape — a distributed PREFIX-MAX scan (``compaction_plan``'s
    prefix-sum with a max combine): one sort exchange on arrival order,
    pass 1 emits (first_key, block_max_ts) per block, the driver
    prefix-maxes O(blocks) registers into per-block seeds, pass 2
    re-derives each row's exclusive running max block-locally and folds
    per-day (total, late) partials. No driver rows beyond the
    registers."""
    import ray

    sorted_ds = ds.sort(order_col).materialize()
    NEG = np.int64(np.iinfo(np.int64).min)

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "block_max": pa.array([], pa.int64())})
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "first_key": pa.array([int(keys[0])], pa.int64()),
            "block_max": pa.array([int(ts.max())], pa.int64())})

    metas = pa.concat_tables(list(
        sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                              batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    fk = metas["first_key"].to_numpy()
    bm = metas["block_max"].to_numpy()
    order = np.argsort(fk, kind="stable")
    fk, bm = fk[order], bm[order]
    seeds = np.concatenate((
        [NEG], np.maximum.accumulate(bm)[:-1])).astype(np.int64)
    seed_ref = ray.put(dict(zip(fk.tolist(), seeds.tolist())))
    cache: dict = {}

    def late_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "late": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        if "s" not in cache:
            cache["s"] = ray.get(seed_ref)
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seed = np.int64(cache["s"][int(keys[0])])
        # exclusive running max: seed for row 0, shifted inclusive-max
        run = np.maximum.accumulate(np.maximum(ts, seed))
        wm = np.concatenate(([seed], run[:-1]))
        late = (wm != NEG) & (ts < wm - np.int64(lateness_us))
        day = ts // np.int64(day_us)
        ud, inv = np.unique(day, return_inverse=True)
        n = np.bincount(inv, minlength=len(ud))
        nl = np.bincount(inv, weights=late, minlength=len(ud))
        return pa.table({"day": pa.array(ud, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64()),
                         "late": pa.array(nl.astype(np.int64),
                                          pa.int64())})

    acc: dict[int, list[int]] = {}
    for t in sorted_ds.map_batches(late_partial, batch_format="pyarrow",
                                   batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for d, n, l in zip(t["day"].to_numpy(), t["n"].to_numpy(),
                           t["late"].to_numpy()):
            cur = acc.setdefault(int(d), [0, 0])
            cur[0] += int(n)
            cur[1] += int(l)
    days = sorted(acc)
    return pa.table({
        "day": pa.array(days, pa.int64()),
        "n_total": pa.array([acc[d][0] for d in days], pa.int64()),
        "n_late": pa.array([acc[d][1] for d in days], pa.int64()),
        "late_ppm": pa.array(
            [(1_000_000 * acc[d][1]) // acc[d][0] for d in days],
            pa.int64())})


def grouped_ols_trend(ds, key_col: str, t_col: str, y_col: str):
    """Per-key ordinary-least-squares trend with EXACT INTEGER
    numerator/denominator: for integer series (t, y) per key,

        trend_num = n·Σty − Σt·Σy,   trend_den = n·Σtt − (Σt)²

    so slope = trend_num / trend_den is one division away and the
    operator hash-checks (the per-host traffic/quality trend detector
    — frontera's revisit scoring wants exactly this drift signal).
    One combiner aggregate over five integer registers per key
    (``partial_groupby_agg`` — bounded key spaces; the five-sum shape
    maps to ``grouped_int_sum`` per register for unbounded keys).
    Returns a pandas DataFrame (key, n, trend_num, trend_den)."""

    def derive(batch: pa.Table) -> pa.Table:
        t = batch[t_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key_col: batch[key_col],
            "one": pa.array(np.ones(len(t), np.int64), pa.int64()),
            "st": pa.array(t, pa.int64()),
            "sy": pa.array(y, pa.int64()),
            "stt": pa.array(t * t, pa.int64()),
            "sty": pa.array(t * y, pa.int64())})

    g = partial_groupby_agg(
        ds.map_batches(derive, batch_format="pyarrow"), key_col,
        {"n": ("one", "sum"), "st": ("st", "sum"), "sy": ("sy", "sum"),
         "stt": ("stt", "sum"), "sty": ("sty", "sum")})
    n = g["n"].to_numpy().astype(np.int64)
    st = g["st"].to_numpy().astype(np.int64)
    sy = g["sy"].to_numpy().astype(np.int64)
    stt = g["stt"].to_numpy().astype(np.int64)
    sty = g["sty"].to_numpy().astype(np.int64)
    out = g[[key_col]].copy()
    out["n"] = n
    out["trend_num"] = n * sty - st * sy
    out["trend_den"] = n * stt - st * st
    return out.sort_values(key_col).reset_index(drop=True)


def roc_auc_binary(ds, score_col: str, label_col: str) -> pa.Table:
    """EXACT ROC AUC for a binary label over an integer score column —
    the threshold-free ranking-quality number for any learned gate
    (quality classifier, near-dup scorer, langid confidence). Uses the
    Mann-Whitney rank identity with midrank tie handling, kept fully
    integer so the statistic hash-checks:

        auc_num2 = Σ_s pos(s)·(2·cum_neg(<s) + neg(s))
        auc_den2 = 2·P·N,   AUC = auc_num2 / auc_den2

    Scale shape: the same value-count register pass as ``ks_2sample``
    (per-block (score, pos, neg) partials via np.unique/bincount; the
    driver merges distinct-SCORE-scale partials and prefix-sums) —
    the corpus never moves, only the bounded score domain does.
    ``score_col`` must already be integer (discretize upstream with
    the exact-cents floor); ``label_col`` is 0/1. Returns one row
    (n_pos, n_neg, auc_num2, auc_den2, auc_ppm)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"s": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        us, inv = np.unique(s, return_inverse=True)
        p = np.bincount(inv, weights=lab, minlength=len(us))
        n = np.bincount(inv, weights=1 - lab, minlength=len(us))
        return pa.table({"s": pa.array(us, pa.int64()),
                         "p": pa.array(p.astype(np.int64), pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    acc: dict[int, list[int]] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for s, p, n in zip(t["s"].to_numpy(), t["p"].to_numpy(),
                           t["n"].to_numpy()):
            cur = acc.setdefault(int(s), [0, 0])
            cur[0] += int(p)
            cur[1] += int(n)
    if not acc:
        return pa.table({"n_pos": pa.array([0], pa.int64()),
                         "n_neg": pa.array([0], pa.int64()),
                         "auc_num2": pa.array([0], pa.int64()),
                         "auc_den2": pa.array([0], pa.int64()),
                         "auc_ppm": pa.array([0], pa.int64())})
    ss = np.array(sorted(acc), dtype=np.int64)
    p = np.array([acc[int(s)][0] for s in ss], dtype=np.int64)
    n = np.array([acc[int(s)][1] for s in ss], dtype=np.int64)
    cum_neg_before = np.concatenate(([0], np.cumsum(n)[:-1]))
    num2 = int((p * (2 * cum_neg_before + n)).sum())
    P, N = int(p.sum()), int(n.sum())
    den2 = 2 * P * N
    return pa.table({
        "n_pos": pa.array([P], pa.int64()),
        "n_neg": pa.array([N], pa.int64()),
        "auc_num2": pa.array([num2], pa.int64()),
        "auc_den2": pa.array([den2], pa.int64()),
        "auc_ppm": pa.array([(1_000_000 * num2) // den2 if den2 else 0],
                            pa.int64())})


def calibration_table(ds, conf_col: str, label_col: str,
                      n_bins: int = 10, conf_max: int = 100):
    """Reliability-diagram bins for a binary label vs an integer
    confidence column (cents in [0, conf_max]) — the is-the-model-
    calibrated read behind any score-thresholded gate. Per bin
    (confidence // (conf_max/n_bins), clamped): row count, positives
    and the exact integer confidence sum, plus acc_ppm / conf_ppm —
    every column integer so the table hash-checks. One combiner
    aggregate over the bounded bin space (``partial_groupby_agg``).
    Returns a pandas DataFrame (bin, n, n_pos, conf_sum_c, acc_ppm,
    conf_ppm)."""
    width = conf_max // n_bins

    def derive(batch: pa.Table) -> pa.Table:
        c = batch[conf_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(c // width, n_bins - 1)
        return pa.table({"bin": pa.array(b, pa.int64()),
                         "one": pa.array(np.ones(len(b), np.int64)),
                         "lab": pa.array(lab, pa.int64()),
                         "conf": pa.array(c, pa.int64())})

    g = partial_groupby_agg(
        ds.map_batches(derive, batch_format="pyarrow"), "bin",
        {"n": ("one", "sum"), "n_pos": ("lab", "sum"),
         "conf_sum_c": ("conf", "sum")})
    n = g["n"].to_numpy().astype(np.int64)
    g["acc_ppm"] = (1_000_000 * g["n_pos"].to_numpy().astype(np.int64)) // n
    g["conf_ppm"] = (1_000_000 * g["conf_sum_c"].to_numpy().astype(
        np.int64)) // (conf_max * n)
    return g.sort_values("bin").reset_index(drop=True)


def per_key_cusum(ds, key_col: str, order_col: str, val_col: str,
                  tiebreak: str | None = None,
                  exchange: str | None = None) -> "object":
    """Per-key CUSUM changepoint magnitude, INTEGER-EXACT: for each
    key's ordered integer series v_1..v_n,

        cusum_max = max_i |n·prefix_i − i·total|

    (the mean-shift CUSUM statistic scaled by n to stay integral —
    divide by n·σ̂ downstream to normalize). A large value flags a
    level shift mid-series: the per-host yield-drop / drift detector
    that complements ``grouped_ols_trend``'s monotone slope. ONE keyed
    exchange; the run-aware kernel lexsorts (tiebreak, order, key) and
    folds each run with vectorized cumsum + reduceat. Emits one row
    per key (key, n, total, cusum_max)."""

    def block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({key_col: pa.array([], batch[key_col].type),
                             "n": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64()),
                             "cusum_max": pa.array([], pa.int64())})
        keyv = batch[key_col].to_numpy(zero_copy_only=False)
        keys = _group_codes(keyv)
        o = batch[order_col].to_numpy(zero_copy_only=False)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, o, keys))
        else:
            order = np.lexsort((o, keys))
        sk, sv = keys[order], v[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        counts = np.diff(np.append(starts, len(sk)))
        csum = np.cumsum(sv)
        base = np.concatenate(([0], csum[starts[1:] - 1]))
        prefix = csum - base[run_id]               # within-run cumsum
        i = np.arange(len(sk), dtype=np.int64) - starts[run_id] + 1
        total = prefix[np.append(starts[1:], len(sk)) - 1]
        n_run = counts.astype(np.int64)
        dev = np.abs(n_run[run_id] * prefix - i * total[run_id])
        cmax = np.maximum.reduceat(dev, starts)
        return pa.table({key_col: pa.array(keyv[order][starts]),
                         "n": pa.array(n_run, pa.int64()),
                         "total": pa.array(total, pa.int64()),
                         "cusum_max": pa.array(cmax.astype(np.int64),
                                               pa.int64())})

    return keyed_exchange(ds, key_col, block, exchange)


# ---------------------------------------------------------------------------
# Poisson bootstrap (deterministic, SQL-twin-exact)
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds in ppm, PINNED literals shared with the
# DuckDB twin (pmf ppm 367879/367879/183940/61313/15328/3066/511/73/
# 9/1): a uniform ppm draw below threshold k maps to weight k.
POISSON1_CDF_PPM = np.asarray(
    [367879, 735758, 919698, 981011, 996339, 999405, 999916, 999989,
     999998, 999999], dtype=np.int64)


def _bootstrap_mix_ppm(u32: np.ndarray, b: int) -> np.ndarray:
    """Per-(row, replicate) uniform ppm draw from one md5 per row: a
    32-bit xorshift-multiply mix seeded by replicate id — every step
    stays below 2^63 so the DuckDB twin runs the identical expression
    on UBIGINTs with no overflow."""
    m32 = np.uint64(0xFFFFFFFF)
    v = u32 ^ ((np.uint64(b) * np.uint64(2654435761)) & m32)
    v = (v * np.uint64(69069)) & m32
    v ^= v >> np.uint64(16)
    v = (v * np.uint64(40503)) & m32
    v ^= v >> np.uint64(13)
    return (v % np.uint64(1_000_000)).astype(np.int64)


def poisson_bootstrap_means(ds, key_col: str, val_col: str,
                            replicates: int = 32):
    """Bootstrap replicate table for the mean of ``val_col`` (integer
    units): the Poisson(1)-weight resampling trick that turns a
    B-replicate bootstrap into ONE streaming pass — each row draws a
    deterministic hash-derived weight per replicate (no RNG object, no
    sampling shuffle), blocks emit B-row partials, and a combiner
    rollup yields per-replicate (n_w, sum_w) with exact integer means.
    The CI read (spread of the B means) is a trivial driver-side scan.
    This is how planet-scale A/B systems bootstrap (Poisson bootstrap,
    Chamandy et al. 2012) — no per-replicate pass, no materialized
    resamples. Returns a pandas DataFrame (b, n_w, sum_w, mean_val)."""
    import hashlib

    _md5 = hashlib.md5

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[val_col].to_numpy().astype(np.int64)
        u32 = np.fromiter(
            (int.from_bytes(_md5(str(k).encode("utf8")).digest()[:8],
                            "big") for k in keys),
            dtype=np.uint64, count=len(keys)) & np.uint64(0xFFFFFFFF)
        bs = np.empty(replicates, dtype=np.int64)
        ns = np.empty(replicates, dtype=np.int64)
        ss = np.empty(replicates, dtype=np.int64)
        for b in range(replicates):
            ppm = _bootstrap_mix_ppm(u32, b)
            w = np.searchsorted(POISSON1_CDF_PPM, ppm, side="right")
            bs[b] = b
            ns[b] = int(w.sum())
            ss[b] = int((w * vals).sum())
        return pa.table({"b": pa.array(bs, pa.int64()),
                         "n_w": pa.array(ns, pa.int64()),
                         "sum_w": pa.array(ss, pa.int64())})

    out = partial_groupby_agg(ds.map_batches(partial,
                                             batch_format="pyarrow"),
                              ["b"], {"n_w": ("n_w", "sum"),
                                      "sum_w": ("sum_w", "sum")})
    out["mean_val"] = out["sum_w"] // out["n_w"].clip(lower=1)
    return out.sort_values("b").reset_index(drop=True)


# ---------------------------------------------------------------------------
# 2-D Pareto front (distributed skyline)
# ---------------------------------------------------------------------------

def _pareto_front_2d_block(ids: np.ndarray, a: np.ndarray,
                           b: np.ndarray) -> np.ndarray:
    """Indices of the maximization Pareto front (keep p unless some q
    has q.a >= p.a, q.b >= p.b with one strict). Identical duplicate
    points all survive. Vectorized sort-scan."""
    order = np.lexsort((-b, -a))
    sa, sb = a[order], b[order]
    new_a = np.concatenate(([True], sa[1:] != sa[:-1]))
    grp = np.cumsum(new_a) - 1
    gmax = np.maximum.reduceat(sb, np.flatnonzero(new_a))
    # best b among STRICTLY larger a values, per group
    best_prev = np.concatenate(([np.iinfo(np.int64).min],
                                np.maximum.accumulate(gmax)[:-1]))
    keep = (sb == gmax[grp]) & (sb > best_prev[grp])
    return order[keep]


def pareto_front_2d(ds, id_col: str, a_col: str, b_col: str):
    """Distributed skyline: per-block local fronts (a dominated point
    is dominated within its own block), then the exact global front of
    the unioned local fronts on the driver — fronts are bounded by the
    distinct-a count, never corpus-sized. The data-selection frontier
    read (e.g. lexical richness vs length: which documents are not
    strictly worse than another on both axes)."""
    import ray

    def block(batch: pa.Table) -> pa.Table:
        idx = _pareto_front_2d_block(
            batch[id_col].to_numpy(), batch[a_col].to_numpy(),
            batch[b_col].to_numpy())
        return batch.select([id_col, a_col, b_col]).take(pa.array(idx))

    parts = pa.concat_tables(
        ray.get(ds.map_batches(block, batch_format="pyarrow")
                .to_arrow_refs()))
    idx = _pareto_front_2d_block(parts[id_col].to_numpy(),
                                 parts[a_col].to_numpy(),
                                 parts[b_col].to_numpy())
    out = parts.take(pa.array(np.sort(idx))).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


def wasserstein1_2sample(ds, value_col: str, side_col: str,
                         scale: int = 100) -> pa.Table:
    """Two-sample 1-Wasserstein (earth-mover) distance, INTEGER-EXACT
    — the MAGNITUDE complement of ``ks_2sample``'s max-gap statistic
    (KS sees the worst point; W1 integrates total transport, the drift
    number distribution-shift monitoring actually alerts on):

        W1 = Σ_i |F_a(v_i) - F_b(v_i)| · (v_{i+1} - v_i)
           = w1_num / w1_den,
        w1_num = Σ |ca_i·nb - cb_i·na| · Δv_i  (Python bigints),
        w1_den = na·nb,

    over the pooled distinct discretized values (value·scale rounded).
    Same partial-combine register pass as ks_2sample; the driver folds
    distinct-value-scale partials only. Returns one row (n_a, n_b,
    w1_num as micro-scaled w1_micro over the den, plus the raw den)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        side = batch[side_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        a = np.bincount(inv, weights=(side == 0), minlength=len(uv))
        b = np.bincount(inv, weights=(side == 1), minlength=len(uv))
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "a": pa.array(a.astype(np.int64), pa.int64()),
                         "b": pa.array(b.astype(np.int64), pa.int64())})

    acc: dict[int, list[int]] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for v, a, b in zip(t["v"].to_numpy(), t["a"].to_numpy(),
                           t["b"].to_numpy()):
            cur = acc.setdefault(int(v), [0, 0])
            cur[0] += int(a)
            cur[1] += int(b)
    if not acc:
        return pa.table({"n_a": pa.array([0], pa.int64()),
                         "n_b": pa.array([0], pa.int64()),
                         "w1_den": pa.array([0], pa.int64()),
                         "w1_micro": pa.array([0], pa.int64())})
    vs = np.array(sorted(acc), dtype=np.int64)
    a = np.array([acc[int(v)][0] for v in vs], dtype=np.int64)
    b = np.array([acc[int(v)][1] for v in vs], dtype=np.int64)
    na, nb = int(a.sum()), int(b.sum())
    ca, cb = np.cumsum(a)[:-1], np.cumsum(b)[:-1]
    dv = np.diff(vs)
    # Python bigints: |ca·nb - cb·na|·Δv can exceed int64 at scale
    num = sum(abs(int(x) * nb - int(y) * na) * int(d)
              for x, y, d in zip(ca, cb, dv))
    den = na * nb
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "w1_den": pa.array([den], pa.int64()),
        "w1_micro": pa.array([(1_000_000 * num) // den if den else 0],
                             pa.int64())})


def isqrt_exact(n: np.ndarray) -> np.ndarray:
    """Exact floor(sqrt(n)) for int64 arrays via float sqrt + ±1
    correction — the same expression the DuckDB twin runs, so
    temperature-scaled weights stay oracle-exact."""
    s = np.floor(np.sqrt(n.astype(np.float64))).astype(np.int64)
    s -= (s * s > n).astype(np.int64)
    s += ((s + 1) * (s + 1) <= n).astype(np.int64)
    return s


def hamilton_alloc(w: np.ndarray, budget: int,
                   tie_order: np.ndarray) -> np.ndarray:
    """Hamilton apportionment of ``budget`` units proportional to
    integer weights ``w``: base = floor(B·w/W), the leftover units go
    to the largest remainders (ties broken by ``tie_order`` ascending)
    — deterministic, Σalloc == budget exactly."""
    W = int(w.sum())
    if W == 0:
        return np.zeros(len(w), dtype=np.int64)
    base = (budget * w) // W
    rem = (budget * w) % W
    leftover = budget - int(base.sum())
    order = np.lexsort((tie_order, -rem))
    rank = np.empty(len(w), dtype=np.int64)
    rank[order] = np.arange(len(w))
    return base + (rank < leftover)


def sigma_breach_table(ds, key_col: str, value_col: str,
                       scale: int = 100, z: int = 2):
    """Per-key z-sigma breach census (the outlier-rate read behind
    '3-sigma rule' monitors), EXACT with no square root anywhere:
    |x - mu| > z*sigma  <=>  (n*x - S)^2 * (n-1) > z^2 * n * (n*SS - S^2),
    and since d^2 is an integer, d^2 > R  <=>  d^2 > floor(R) — so the
    driver folds the per-key registers (one combiner pass), computes
    floor(R) in Python bigints, broadcasts the tiny (key -> n, S, R)
    map, and a second streaming pass counts breaches with pure int64
    comparisons. The SQL twin uses the direct HUGEINT inequality —
    provably the same predicate. Returns pandas (key, n, breaches,
    breach_ppm)."""
    import pandas as pd

    def regs(batch: pa.Table) -> pa.Table:
        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        return pa.table({
            key_col: batch[key_col],
            "x": pa.array(v, pa.int64()),
            "xx": pa.array(v * v, pa.int64()),
            "one": pa.array(np.ones(len(v), np.int64), pa.int64())})

    keyed = ds.map_batches(regs, batch_format="pyarrow")
    g = partial_groupby_agg(keyed, [key_col],
                            {"n": ("one", "sum"), "s": ("x", "sum"),
                             "ss": ("xx", "sum")}) \
        .sort_values(key_col).reset_index(drop=True)
    bound = {}
    for _, row in g.iterrows():
        n, s, ss = int(row["n"]), int(row["s"]), int(row["ss"])
        r = ((z * z * n * (n * ss - s * s)) // (n - 1)) if n > 1 else -1
        bound[row[key_col]] = (n, s, min(r, (1 << 62)))

    import ray
    bref = ray.put(bound)

    def breach(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        hit = np.zeros(len(v), dtype=np.int64)
        for k, (n, s, r) in b.items():
            m = keys == k
            d = n * v[m] - s
            hit[m] = (d * d > r).astype(np.int64)
        return pa.table({key_col: batch[key_col],
                         "hit": pa.array(hit, pa.int64()),
                         "one": pa.array(np.ones(len(v), np.int64),
                                         pa.int64())})

    out = partial_groupby_agg(ds.map_batches(breach,
                                             batch_format="pyarrow"),
                              [key_col], {"n": ("one", "sum"),
                                          "breaches": ("hit", "sum")})
    out["breach_ppm"] = (1_000_000 * out["breaches"]) // out["n"]
    return out.sort_values(key_col).reset_index(drop=True)


def otsu_threshold(ds, value_col: str, scale: int = 100):
    """Otsu's histogram threshold (Otsu 1979 — the classic image
    binarization / gate-picking rule): the split t maximizing
    between-class variance, EXACT via bigint cross-multiplication over
    the pooled value-count registers:

        score(t) = (S0·c1 − S1·c0)² // (c0·c1)    (floor both engines)

    argmax with smallest-t ties. Same bounded-support register pass as
    ks_2sample; the driver folds distinct-value partials only. Returns
    one row (t_cents, c0, c1)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    acc: dict[int, int] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for v, c in zip(t["v"].to_numpy(), t["c"].to_numpy()):
            acc[int(v)] = acc.get(int(v), 0) + int(c)
    vs = sorted(acc)
    n_tot = sum(acc.values())
    s_tot = sum(v * c for v, c in acc.items())
    best = None
    c0 = s0 = 0
    for v in vs[:-1]:
        c0 += acc[v]
        s0 += v * acc[v]
        c1 = n_tot - c0
        score = (s0 * c1 - (s_tot - s0) * c0) ** 2 // (c0 * c1)
        if best is None or score > best[0]:
            best = (score, v, c0, c1)
    if best is None:
        return pd.DataFrame([{"t_cents": 0, "c0": 0, "c1": 0}]) \
            .astype("int64")
    return pd.DataFrame([{"t_cents": best[1], "c0": best[2],
                          "c1": best[3]}]).astype("int64")


def pointer_double_resolve(ds, src_col: str = "src", dst_col: str = "dst",
                           hops_col: str = "hops", done_col: str = "done",
                           rounds: int = 16, exchange: str = "hash",
                           local_compress: bool = True):
    """Distributed pointer doubling (pointer jumping) over a functional
    successor graph — the redirect-chain / alias-chain resolver: every
    row (src, dst, hops, done) is advanced to (src, f^(2^k)(src),
    total hops, terminal?) in ``rounds`` rounds, each ONE keyed
    exchange of 2n slim rows (build side keyed by src, probe side by
    dst), so a chain of length L resolves in ceil(log2 L) exchanges —
    at a 10^10-node frontier with redirect probability p the longest
    chain is ~log_{1/p}(n) ≈ 20-30, i.e. 5 rounds, never a
    length-L sequential walk. State is materialized per round (it is
    referenced twice — lazy reuse would re-execute the lineage).
    Every dst MUST exist as some row's src (self-rows for terminals).

    Reference semantics: frontera resolves redirect chains to the
    canonical request before dedup/scheduling (frontera/core/models.py
    Request.meta[b'redirect_urls'] carrying the full chain).

    ``local_compress`` runs a shuffle-free pre-pass: each block
    pointer-doubles IN MEMORY against the successors it already holds
    (the standard local-contraction step before global pointer
    jumping). Input blocks are range-contiguous (parquet order), and
    redirect graphs are local by nature (most redirects stay on-host /
    nearby in key space), so the pre-pass resolves almost every chain
    and the global loop typically runs 0-2 exchanges instead of
    ceil(log2 L) — each global round costs a full keyed exchange, the
    dominant fixed cost. Worst case (no locality) it is one wasted
    streaming pass and the doubling rounds proceed unchanged."""

    def compress_block(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        src = b[src_col].to_numpy(zero_copy_only=False)
        dst = b[dst_col].to_numpy(zero_copy_only=False).copy()
        hops = b[hops_col].to_numpy(zero_copy_only=False).copy()
        done = b[done_col].to_numpy(zero_copy_only=False).copy()
        order = np.argsort(src, kind="stable")
        ssrc = src[order]
        m = len(ssrc)
        for _ in range(64):  # ceil(log2 L) synchronous doubling passes
            nd = ~done
            if not nd.any():
                break
            pos = np.minimum(np.searchsorted(ssrc, dst), m - 1)
            j = order[pos]
            ok = nd & (ssrc[pos] == dst) & (j != np.arange(len(src)))
            if not ok.any():
                break
            # Jacobi step: read the pre-step state of the target row,
            # so each pass composes two 2^(k-1) jumps into one 2^k jump
            pdst, phops, pdone = dst[j[ok]], hops[j[ok]], done[j[ok]]
            # rows in `ok` are all not-done, so movement = pointer
            # advanced or done acquired from the target
            moved = (dst[ok] != pdst) | pdone
            dst[ok] = pdst
            hops[ok] = hops[ok] + phops
            done[ok] = pdone
            if not moved.any():
                break
        out = b.drop_columns([dst_col, hops_col, done_col])
        return (out.append_column(dst_col, pa.array(dst, pa.int64()))
                   .append_column(hops_col, pa.array(hops, pa.int64()))
                   .append_column(done_col, pa.array(done, pa.bool_())))

    def tag_both(b: pa.Table) -> pa.Table:
        """Emit the build copy (key=src) and the probe copy (key=dst,
        or src for already-done rows) in ONE pass over J — no union,
        no second scan, block count stays fixed."""
        done = b[done_col].to_numpy(zero_copy_only=False)
        src = b[src_col].to_numpy(zero_copy_only=False)
        dst = b[dst_col].to_numpy(zero_copy_only=False)
        n = len(b)
        key = np.concatenate([src, np.where(done, src, dst)])
        role = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        both = pa.concat_tables([b, b])
        return (both.append_column("key", pa.array(key, pa.int64()))
                    .append_column("role", pa.array(role)))

    def kern(batch: pa.Table) -> pa.Table:
        empty = pa.table({src_col: pa.array([], pa.int64()),
                          dst_col: pa.array([], pa.int64()),
                          hops_col: pa.array([], pa.int64()),
                          done_col: pa.array([], pa.bool_())})
        if len(batch) == 0:
            return empty
        key = batch["key"].to_numpy(zero_copy_only=False)
        role = batch["role"].to_numpy(zero_copy_only=False)
        src = batch[src_col].to_numpy(zero_copy_only=False)
        dst = batch[dst_col].to_numpy(zero_copy_only=False)
        hops = batch[hops_col].to_numpy(zero_copy_only=False)
        done = batch[done_col].to_numpy(zero_copy_only=False)
        b = role == 0
        p = ~b
        if not p.any():
            return empty
        order = np.argsort(key[b], kind="stable")
        bk = key[b][order]
        bdst = dst[b][order]
        bhops = hops[b][order]
        bdone = done[b][order]
        pos = np.searchsorted(bk, key[p])
        assert len(bk) and (bk[np.minimum(pos, len(bk) - 1)]
                            == key[p]).all(), "dangling pointer key"
        nd = ~done[p]
        return pa.table({
            src_col: pa.array(src[p], pa.int64()),
            dst_col: pa.array(np.where(nd, bdst[pos], dst[p]), pa.int64()),
            hops_col: pa.array(np.where(nd, hops[p] + bhops[pos], hops[p]),
                               pa.int64()),
            done_col: pa.array(np.where(nd, bdone[pos], True), pa.bool_())})

    def _unresolved(Jm) -> int:
        rows = Jm.map_batches(
            lambda b: pa.table({"n": pa.array(
                [int((~b[done_col].to_numpy(zero_copy_only=False)).sum())],
                pa.int64())}),
            batch_format="pyarrow").take_all()
        return sum(r["n"] for r in rows)

    if local_compress:
        ds = ds.map_batches(compress_block, batch_format="pyarrow")
    J = ds.materialize()
    for k in range(rounds):
        # with local compression the remainder is usually empty, so
        # probe from round 0; without it, chains of length >= 2 always
        # exist in practice — skip the probe for two rounds (it costs
        # a pass)
        if (k >= 2 or local_compress) and _unresolved(J) == 0:
            break
        u = J.map_batches(tag_both, batch_format="pyarrow")
        J = keyed_exchange(u, "key", kern, exchange).materialize()
    return J


def per_key_quantile_disc(ds, key_col: str, val_col: str, q: float = 0.95,
                          out_col: str = "q_value",
                          exchange: str | None = None):
    """PERCENTILE_DISC(q) WITHIN GROUP per key — the per-segment tail
    statistic (p95 latency per endpoint, p95 order value per
    priority class) that a global quantile hides: ONE keyed exchange,
    then a single vectorized lexsort per block selects each key run's
    order statistic at 1-based rank ceil(q·n) (the DuckDB
    quantile_disc convention, same 1e-9 epsilon guard as
    ``grouped_quantile_disc``). No per-key Python; emits
    (key, n, value) — the value is SELECTED, never interpolated, so
    the float column round-trips exactly."""
    import math

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                key_col: pa.array([], batch[key_col].type),
                "n": pa.array([], pa.int64()),
                out_col: pa.array([], batch[val_col].type)})
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        vals = batch[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        sk = keys[order]
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(sk))
        n = ends - starts
        rank = np.maximum(1, np.ceil(q * n - 1e-9).astype(np.int64))
        idx = order[starts + rank - 1]
        return pa.table({
            key_col: batch[key_col].take(pa.array(idx)),
            "n": pa.array(n, pa.int64()),
            out_col: batch[val_col].take(pa.array(idx))})

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_burst(ds, key_col: str, ts_col: str, window_us: int,
                  exchange: str | None = None):
    """Max events per key inside ANY sliding ``window_us`` window —
    the burst / rate-spike read (bot detection on users, hot-host
    detection on a frontier) that fixed tumbling buckets understate
    when a burst straddles a boundary. ONE keyed exchange; the kernel
    is fully vectorized ACROSS keys: each key run's timestamps get a
    run-index offset larger than any in-run span, making the
    composite array GLOBALLY sorted so one pair of np.searchsorted
    calls answers every row's inclusive [t, t+W] occupancy at once
    (no per-key Python); per-run max via maximum.reduceat. Window
    endpoints inclusive — op-matched to SQL RANGE BETWEEN CURRENT ROW
    AND INTERVAL FOLLOWING (duplicate timestamps are peers)."""

    def kern(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                key_col: pa.array([], batch[key_col].type),
                "n_events": pa.array([], pa.int64()),
                "burst": pa.array([], pa.int64())})
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts = ts.astype("datetime64[us]").astype(np.int64) \
            if ts.dtype.kind == "M" else ts.astype(np.int64)
        order = np.lexsort((ts, keys))
        sk, st = keys[order], ts[order]
        # offset each run beyond any reachable window: composite is
        # globally sorted and windows cannot cross runs
        span = np.int64(int(st.max()) - int(st.min())
                        + int(window_us) + 1) if len(st) else np.int64(1)
        comp = (st - st.min()) + sk * span
        hi = np.searchsorted(comp, comp + np.int64(window_us),
                             side="right")
        lo = np.searchsorted(comp, comp, side="left")
        counts = hi - lo
        new_run = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(sk))
        burst = np.maximum.reduceat(counts, starts)
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[starts])),
            "n_events": pa.array(ends - starts, pa.int64()),
            "burst": pa.array(burst.astype(np.int64), pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def grouped_w1_vs_global(ds, value_col: str, group_col: str,
                         scale: int = 100) -> pa.Table:
    """t-closeness audit (Li et al. 2007): per group (the
    quasi-identifier equivalence class) the EXACT-INTEGER 1-Wasserstein
    distance between the group's sensitive-value distribution and the
    GLOBAL distribution — the privacy read beyond k-anonymity /
    l-diversity: a class whose value distribution diverges from the
    table-wide one leaks attribute information even when it is large
    and diverse. Same value-count register shape as
    ``wasserstein1_2sample``: one partial (group, value, count) census
    per block, driver folds O(groups · distinct-scaled-values)
    registers (bounded by the value discretization, not by rows), then
    per group

        t_w1_micro = 10^6 · Σ_i |cg_i·N − C_i·n_g| · Δv_i // (n_g·N)

    over the pooled distinct values (Python bigints; the twin's
    HUGEINT). Flags the worst class."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        import pandas as pd

        v = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale + 0.5).astype(np.int64)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "v": v}).groupby(
            ["g", "v"], as_index=False).size()
        return pa.table({"g": pa.array(df["g"].astype(object),
                                       pa.string()),
                         "v": pa.array(df["v"].to_numpy(np.int64)),
                         "c": pa.array(df["size"].to_numpy(np.int64))})

    acc: dict[str, dict[int, int]] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for g, v, c in zip(t["g"].to_pylist(), t["v"].to_numpy(),
                           t["c"].to_numpy()):
            cur = acc.setdefault(g, {})
            cur[int(v)] = cur.get(int(v), 0) + int(c)
    vals = np.array(sorted({v for d in acc.values() for v in d}),
                    dtype=np.int64)
    glob = np.array([sum(d.get(int(v), 0) for d in acc.values())
                     for v in vals], dtype=np.int64)
    N = int(glob.sum())
    C = np.cumsum(glob)[:-1]
    dv = np.diff(vals)
    groups = sorted(acc)
    ns, micros = [], []
    for g in groups:
        cg = np.array([acc[g].get(int(v), 0) for v in vals],
                      dtype=np.int64)
        ng = int(cg.sum())
        cgc = np.cumsum(cg)[:-1]
        num = sum(abs(int(x) * N - int(y) * ng) * int(d)
                  for x, y, d in zip(cgc, C, dv))
        ns.append(ng)
        micros.append((1_000_000 * num) // (ng * N) if ng * N else 0)
    worst = max(micros) if micros else 0
    return pa.table({
        group_col: pa.array(groups, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "t_w1_micro": pa.array(micros, pa.int64()),
        "is_worst": pa.array([m == worst for m in micros], pa.bool_())})


def watermark_ooo_percentiles(ds, order_col: str, ts_col: str,
                              unit_us: int = 1000) -> pa.Table:
    """Allowed-lateness PLANNING read — the other half of
    ``watermark_lateness`` (which AUDITS a chosen bound, this one
    CHOOSES it): in arrival order, each row's out-of-orderness is how
    far its event time trails the exclusive running max of earlier
    arrivals; report the p50/p95/p99/max of that distribution (in
    ``unit_us`` units, DuckDB quantile_disc rank convention) — p99 is
    the allowed-lateness a streaming pipeline configures to bound
    dropped-late-data to 1%.

    Scale shape: the same distributed PREFIX-MAX scan as
    watermark_lateness (per-block (first_key, max) registers, driver
    prefix-max O(blocks), pass-2 block-local re-derivation), then a
    bounded (ooo_unit, count) census fold — the census domain is the
    lateness range, not the row count."""
    import ray

    sorted_ds = ds.sort(order_col).materialize()
    NEG = np.int64(np.iinfo(np.int64).min)

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "block_max": pa.array([], pa.int64())})
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "first_key": pa.array([int(keys[0])], pa.int64()),
            "block_max": pa.array([int(ts.max())], pa.int64())})

    metas = pa.concat_tables(list(
        sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                              batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    fk = metas["first_key"].to_numpy()
    bm = metas["block_max"].to_numpy()
    order = np.argsort(fk, kind="stable")
    fk, bm = fk[order], bm[order]
    seeds = np.concatenate((
        [NEG], np.maximum.accumulate(bm)[:-1])).astype(np.int64)
    seed_ref = ray.put(dict(zip(fk.tolist(), seeds.tolist())))
    cache: dict = {}

    def ooo_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"ooo": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        if "s" not in cache:
            cache["s"] = ray.get(seed_ref)
        keys = batch[order_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seed = np.int64(cache["s"][int(keys[0])])
        run = np.maximum.accumulate(np.maximum(ts, seed))
        wm = np.concatenate(([seed], run[:-1]))
        ooo = np.where(wm == NEG, np.int64(0),
                       np.maximum(wm - ts, 0)) // np.int64(unit_us)
        uo, inv = np.unique(ooo, return_inverse=True)
        c = np.bincount(inv, minlength=len(uo))
        return pa.table({"ooo": pa.array(uo, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    acc: dict[int, int] = {}
    for t in sorted_ds.map_batches(ooo_partial, batch_format="pyarrow",
                                   batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for o, c in zip(t["ooo"].to_numpy(), t["c"].to_numpy()):
            acc[int(o)] = acc.get(int(o), 0) + int(c)
    vals = np.array(sorted(acc), dtype=np.int64)
    cnt = np.array([acc[int(v)] for v in vals], dtype=np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)

    def disc(q: float) -> int:
        rank = max(1, int(np.ceil(q * n - 1e-9)))
        return int(vals[np.searchsorted(cum, rank, side="left")])

    return pa.table({
        "n": pa.array([n], pa.int64()),
        "p50": pa.array([disc(0.50)], pa.int64()),
        "p95": pa.array([disc(0.95)], pa.int64()),
        "p99": pa.array([disc(0.99)], pa.int64()),
        "max_ooo": pa.array([int(vals[-1]) if n else 0], pa.int64())})


def per_key_floor_ewma(ds, key_col: str, order_col: str, val_col: str,
                       tiebreak: str | None = None,
                       exchange: str | None = None) -> pa.Table:
    """Integer floor-EWMA anomaly register per key (α = 1/2): in
    ``order_col`` order within each key,

        e_1 = v_1,   e_t = (e_{t-1} + v_t) // 2   (floor),
        resid_t = v_t − e_{t-1},

    emitting per key (n, ewma_final, max_abs_resid) — the smoothed
    per-host request-rate tracker with its worst spike (the adaptive
    politeness / rate-anomaly read). The floor recurrence keeps every
    state integer-EXACT (no float half-life drift), so the DuckDB twin
    replays it with a recursive CTE and hash-matches.

    Scale shape: ONE keyed exchange; the sequential recurrence is
    vectorized ACROSS keys — one numpy sweep per within-key POSITION
    (bounded by the longest key run, not the row count), all keys
    advancing together."""

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        empty = pa.table({key_col: pa.array([], key_t),
                          "n": pa.array([], pa.int64()),
                          "ewma_final": pa.array([], pa.int64()),
                          "max_abs_resid": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        v = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order]
        start = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(start)
        idx = np.arange(len(sk))
        pos = idx - np.repeat(starts, np.diff(np.append(starts, len(sk))))
        e = v.copy()
        resid = np.zeros(len(sk), np.int64)
        max_pos = int(pos.max())
        for s in range(1, max_pos + 1):
            sel = np.flatnonzero(pos == s)
            resid[sel] = v[sel] - e[sel - 1]
            e[sel] = (e[sel - 1] + v[sel]) // 2
        ends = np.append(starts[1:], len(sk)) - 1
        n = ends - starts + 1
        max_abs = np.zeros(len(starts), np.int64)
        np.maximum.at(max_abs, np.repeat(np.arange(len(starts)),
                                         np.diff(np.append(starts,
                                                           len(sk)))),
                      np.abs(resid))
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[starts])),
            "n": pa.array(n, pa.int64()),
            "ewma_final": pa.array(e[ends], pa.int64()),
            "max_abs_resid": pa.array(max_abs, pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_holt_linear(ds, key_col: str, order_col: str, val_col: str,
                        tiebreak: str | None = None,
                        exchange: str | None = None) -> pa.Table:
    """Integer floor Holt linear (double-exponential) smoother per key
    — the trend-aware upgrade of ``per_key_floor_ewma`` (a host whose
    request rate is RISING needs the forecast, not the average). Fixed
    rational gains α = 1/2, β = 1/4; in ``order_col`` order within a
    key, with l = level, b = trend:

        l_1 = v_1,  b_1 = 0
        l_t = floor((v_t + l_{t-1} + b_{t-1}) / 2)
        b_t = floor((l_t - l_{t-1} + 3 * b_{t-1}) / 4)

    emitting per key (n, level_final, trend_final, forecast_next =
    level + trend). Floor (not truncate-toward-zero) keeps negative
    trend states exact, so the recursive-CTE DuckDB twin replays the
    state sequence bit-for-bit via floor(x / 2.0).

    Scale shape: identical to ``per_key_floor_ewma`` — ONE keyed
    exchange, the recurrence vectorized ACROSS keys, one numpy sweep
    per within-key position."""

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        empty = pa.table({key_col: pa.array([], key_t),
                          "n": pa.array([], pa.int64()),
                          "level_final": pa.array([], pa.int64()),
                          "trend_final": pa.array([], pa.int64()),
                          "forecast_next": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        v = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order]
        start = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(start)
        idx = np.arange(len(sk))
        pos = idx - np.repeat(starts, np.diff(np.append(starts, len(sk))))
        lvl = v.copy()
        trend = np.zeros(len(sk), np.int64)
        max_pos = int(pos.max())
        for s in range(1, max_pos + 1):
            sel = np.flatnonzero(pos == s)
            prev_l, prev_b = lvl[sel - 1], trend[sel - 1]
            lvl[sel] = (v[sel] + prev_l + prev_b) // 2
            trend[sel] = (lvl[sel] - prev_l + 3 * prev_b) // 4
        ends = np.append(starts[1:], len(sk)) - 1
        n = ends - starts + 1
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[starts])),
            "n": pa.array(n, pa.int64()),
            "level_final": pa.array(lvl[ends], pa.int64()),
            "trend_final": pa.array(trend[ends], pa.int64()),
            "forecast_next": pa.array(lvl[ends] + trend[ends],
                                      pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def per_key_error_backoff(ds, key_col: str, order_col: str,
                          flag_col: str, tiebreak: str | None = None,
                          cap: int = 6, exchange: str | None = None):
    """Exponential-backoff accounting per key: in ``order_col`` order,
    consecutive flagged rows (fetch errors) form runs; the i-th error
    of a run (0-based, capped at ``cap``) costs 2^min(i, cap) seconds
    of backoff — the retry-budget read a polite fetcher runs per host
    (how much schedule headroom do error-prone hosts burn?). Emits per
    key with ≥1 error: (n_err, n_err_runs, backoff_total_s, max_run).
    ONE keyed exchange; run positions are a vectorized
    change-point/accumulate sweep (no per-key Python)."""

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        empty = pa.table({key_col: pa.array([], key_t),
                          "n_err": pa.array([], pa.int64()),
                          "n_err_runs": pa.array([], pa.int64()),
                          "backoff_total_s": pa.array([], pa.int64()),
                          "max_run": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        err = batch[flag_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order]
        idx = np.arange(len(sk))
        change = np.concatenate(([True], (sk[1:] != sk[:-1])
                                 | (err[1:] != err[:-1])))
        run_start = np.maximum.accumulate(np.where(change, idx, -1))
        pos = idx - run_start
        sel = err == 1
        if not sel.any():
            return empty
        ek, ep = sk[sel], pos[sel]
        delay = np.int64(1) << np.minimum(ep, cap)
        uk, inv = np.unique(ek, return_inverse=True)
        n_err = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        n_runs = np.bincount(inv, weights=(ep == 0),
                             minlength=len(uk)).astype(np.int64)
        total = np.bincount(inv, weights=delay,
                            minlength=len(uk)).astype(np.int64)
        mx = np.zeros(len(uk), np.int64)
        np.maximum.at(mx, inv, ep + 1)
        # map unique codes back to original key values: take the first
        # sorted row of each selected key (ek is key-sorted)
        sel_idx = np.flatnonzero(sel)
        firsts = sel_idx[np.searchsorted(ek, uk, side="left")]
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[firsts])),
            "n_err": pa.array(n_err, pa.int64()),
            "n_err_runs": pa.array(n_runs, pa.int64()),
            "backoff_total_s": pa.array(total, pa.int64()),
            "max_run": pa.array(mx, pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def quantile_normalize_buckets(ds, key_col: str, val_col: str,
                               id_col: str, n_buckets: int = 10,
                               exchange: str | None = None):
    """Quantile normalization across groups (the microarray /
    batch-effect-removal classic): each row's value is replaced by the
    cross-group mean of its within-group quantile BUCKET — groups with
    different value scales become comparable while each group's
    ordering is preserved. Within each group rows rank by (value, id);
    bucket = ((2·rank − 1) · B) // (2 · n) (midpoint rule, exact
    integers); the reference value per bucket is the exact milli mean
    of raw values across the whole table. ONE keyed exchange for the
    rank pass, a B-row census rollup, then a broadcast map join —
    nothing corpus-sized leaves the workers. Emits
    (id, key, bucket, qn_milli)."""
    import pandas as pd

    def rank_kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key_col: pa.array([], key_t),
                             "val": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        v = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v, keys))
        sk = keys[order]
        start = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(start)
        lens = np.diff(np.append(starts, len(sk)))
        rank = np.arange(len(sk)) - np.repeat(starts, lens) + 1
        n = np.repeat(lens, lens)
        bucket = ((2 * rank - 1) * n_buckets) // (2 * n)
        out = batch.take(pa.array(order))
        return pa.table({id_col: out[id_col], key_col: out[key_col],
                         "val": pa.array(v[order], pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    ranked = keyed_exchange(ds, key_col, rank_kern, exchange)
    sums = partial_groupby_agg(ranked, ["bucket"],
                               {"s": ("val", "sum"),
                                "c": ("val", "count")})
    ref = {int(b): (1000 * int(s)) // int(c)
           for b, s, c in zip(sums["bucket"], sums["s"], sums["c"])}

    def attach(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("qn_milli",
                                       pa.array([], pa.int64()))
        b = batch["bucket"].to_numpy()
        qn = np.array([ref[int(x)] for x in b], np.int64)
        return batch.append_column("qn_milli", pa.array(qn, pa.int64()))

    return ranked.map_batches(attach, batch_format="pyarrow") \
        .drop_columns(["val"])


def per_key_runs_test(ds, key_col: str, order_col: str, val_col: str,
                      tiebreak: str | None = None,
                      exchange: str | None = None) -> pa.Table:
    """Wald–Wolfowitz runs test per key: in ``order_col`` order, each
    key's integer values are dichotomized around the key's own
    PERCENTILE_DISC(0.5) median (ties AT the median dropped, the
    classic convention), runs of consecutive same-side values are
    counted, and the normal-approximation z-score is reported in milli
    — the is-this-sequence-random read (trending or oscillating
    event values fail it; a politeness scheduler uses it to spot
    synchronized/bursty hosts). Registers (n_above, n_below, n_runs)
    are exact integers; z = (R − μ)/σ with μ = 2ab/(a+b) + 1 and
    σ² = 2ab(2ab − a − b)/((a+b)²(a+b−1)) evaluated with the identical
    IEEE double expression as the DuckDB twin (all inputs ≤ 2^53).
    ONE keyed exchange, run-aware vectorized kernel."""

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        empty = pa.table({key_col: pa.array([], key_t),
                          "n_above": pa.array([], pa.int64()),
                          "n_below": pa.array([], pa.int64()),
                          "n_runs": pa.array([], pa.int64()),
                          "z_milli": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk, sv = keys[order], v[order]
        start = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(start)
        lens = np.diff(np.append(starts, len(sk)))
        # per-key median (quantile_disc 0.5 over VALUE order)
        vorder = np.lexsort((sv, sk))
        rank = np.maximum(1, np.ceil(0.5 * lens - 1e-9).astype(np.int64))
        med = sv[vorder][starts + rank - 1]
        med_per_row = np.repeat(med, lens)
        keep = sv != med_per_row
        kk, kv = sk[keep], sv[keep]
        side = (kv > med_per_row[keep]).astype(np.int64)
        change = np.concatenate(([True], (kk[1:] != kk[:-1])
                                 | (side[1:] != side[:-1]))) \
            if len(kk) else np.zeros(0, bool)
        uk = np.unique(kk)
        inv = np.searchsorted(uk, kk)
        a = np.bincount(inv, weights=side, minlength=len(uk)) \
            .astype(np.int64)
        b = np.bincount(inv, weights=1 - side, minlength=len(uk)) \
            .astype(np.int64)
        r = np.bincount(inv, weights=change, minlength=len(uk)) \
            .astype(np.int64)
        n = a + b
        nf = n.astype(np.float64)
        mu = 2.0 * a * b / nf + 1.0
        var = (2.0 * a * b * (2.0 * a * b - a - b)
               / (nf * nf * (nf - 1.0)))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(var > 0,
                         np.floor(1000.0 * (r - mu) / np.sqrt(var) + 0.5),
                         0.0).astype(np.int64)
        first_rows = np.flatnonzero(keep)[np.searchsorted(kk, uk)]
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[first_rows])),
            "n_above": pa.array(a, pa.int64()),
            "n_below": pa.array(b, pa.int64()),
            "n_runs": pa.array(r, pa.int64()),
            "z_milli": pa.array(z, pa.int64())})

    return keyed_exchange(ds, key_col, kern, exchange)


def stump_split_best(ds, val_col: str, cls_col: str,
                     scale_pico: int = 10 ** 12) -> pa.Table:
    """Best decision-stump threshold by Gini impurity, EXACT: over the
    (value, class) census, splitting at v ≤ t minimizes weighted Gini
    ⟺ maximizes (A_l·n_r + A_r·n_l)/(n_l·n_r) with A = Σ_c count_c² —
    the one-feature CART primitive (and the feature-usefulness read
    beside gini_split's categorical version). One distributed
    (value, class) census (domain bounded by the value discretization,
    not rows), driver prefix sums, Python-bigint scores floored at
    pico scale (the twin's HUGEINT), deterministic min-threshold
    tie-break. Returns ONE row (threshold, n_left, n_right,
    score_pico)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        import pandas as pd

        df = pd.DataFrame({
            "v": batch[val_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "c": batch[cls_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).groupby(["v", "c"], as_index=False).size()
        return pa.table({"v": pa.array(df["v"].to_numpy(np.int64)),
                         "c": pa.array(df["c"].to_numpy(np.int64)),
                         "n": pa.array(df["size"].to_numpy(np.int64))})

    acc: dict[tuple[int, int], int] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for v, c, n in zip(t["v"].to_numpy(), t["c"].to_numpy(),
                           t["n"].to_numpy()):
            k = (int(v), int(c))
            acc[k] = acc.get(k, 0) + int(n)
    vals = np.array(sorted({v for v, _ in acc}), dtype=np.int64)
    n0 = np.array([acc.get((int(v), 0), 0) for v in vals], np.int64)
    n1 = np.array([acc.get((int(v), 1), 0) for v in vals], np.int64)
    c0, c1 = np.cumsum(n0), np.cumsum(n1)
    N0, N1 = int(c0[-1]), int(c1[-1])
    best = None
    for i in range(len(vals) - 1):  # right side must be nonempty
        l0, l1 = int(c0[i]), int(c1[i])
        r0, r1 = N0 - l0, N1 - l1
        nl, nr = l0 + l1, r0 + r1
        al = l0 * l0 + l1 * l1
        ar = r0 * r0 + r1 * r1
        score = (scale_pico * (al * nr + ar * nl)) // (nl * nr)
        if best is None or score > best[3]:
            best = (int(vals[i]), nl, nr, score)
    if best is None:
        best = (0, 0, 0, 0)
    return pa.table({
        "threshold": pa.array([best[0]], pa.int64()),
        "n_left": pa.array([best[1]], pa.int64()),
        "n_right": pa.array([best[2]], pa.int64()),
        "score_pico": pa.array([best[3]], pa.int64())})


def sign_flip_paired_test(ds, key_col: str, order_col: str,
                          val_col: str, tiebreak: str | None = None,
                          n_flips: int = 64,
                          exchange: str | None = None):
    """Hash-seeded sign-flip permutation test (the nonparametric
    paired-difference test the parametric family — ab_ztest / welch_t —
    can't replace when the d_i distribution is arbitrary): per key,
    split its ordered rows at ceil(n/2) and take d = sum(after) -
    sum(before); under H0 (no before/after shift) each d_i's sign is
    exchangeable, so the null distribution is sampled by flipping signs.
    Flips are DETERMINISTIC — flip k for key u is bit k of
    md5(u), giving ``n_flips`` (<= 64) reproducible sign patterns and
    an integer-exact test: T_k = sum_i s_{k,i} d_i, and the p-value
    numerator is #{k : |T_k| >= |T_obs|} (both sides replay the same
    bits, so the whole test hash-matches in SQL).

    Scale shape: ONE keyed exchange computes per-key (d_i, md5 bits);
    the driver reduction is a (n_flips x keys) +-1 matmul over the
    key-universe-bounded d vector (the item-count-broadcast shape).
    Returns a 1-row pandas (n_keys, t_obs, n_flips_ge, p_milli)."""
    import pandas as pd

    from .sketches import _md5_hash64

    def kern(batch: pa.Table) -> pa.Table:
        key_t = batch[key_col].type
        empty = pa.table({key_col: pa.array([], key_t),
                          "d": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        keys = _group_codes(batch[key_col].to_numpy(zero_copy_only=False))
        ov = batch[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if tiebreak is not None:
            tb = batch[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, ov, keys))
        else:
            order = np.lexsort((ov, keys))
        sk = keys[order]
        v = batch[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sk[1:] != sk[:-1])))
        lens = np.diff(np.append(starts, len(sk)))
        pos = np.arange(len(sk)) - np.repeat(starts, lens)
        nrep = np.repeat(lens, lens)
        after = pos >= (nrep + 1) // 2           # before = first ceil(n/2)
        signed = np.where(after, v, -v)
        d = np.zeros(len(starts), np.int64)
        np.add.at(d, np.repeat(np.arange(len(starts)), lens), signed)
        return pa.table({
            key_col: batch[key_col].take(pa.array(order[starts])),
            "d": pa.array(d, pa.int64())})

    rows = keyed_exchange(ds, key_col, kern, exchange)
    parts = [t for t in rows.iter_batches(batch_format="pyarrow",
                                          batch_size=None) if len(t)]
    if not parts:
        return pd.DataFrame([{"n_keys": 0, "t_obs": 0,
                              "n_flips_ge": n_flips,
                              "p_milli": 1000}])
    allp = pa.concat_tables(parts)
    keys = allp[key_col].to_pylist()
    d = allp["d"].to_numpy().astype(np.int64)
    h = _md5_hash64(keys)
    bits = ((h[None, :] >> np.arange(n_flips, dtype=np.uint64)[:, None])
            & np.uint64(1)).astype(np.int64)       # (n_flips, keys)
    signs = 1 - 2 * bits
    t_obs = int(d.sum())
    t_k = signs @ d                                # (n_flips,)
    n_ge = int((np.abs(t_k) >= abs(t_obs)).sum())
    return pd.DataFrame([{
        "n_keys": int(len(d)),
        "t_obs": t_obs,
        "n_flips_ge": n_ge,
        "p_milli": 1000 * n_ge // n_flips}])
