"""Frequent item-pair mining (market-basket / co-purchase) with
support and lift — the first A-priori pass a recommendation or
co-occurrence-analysis pipeline runs over transaction logs, and the
batch cousin of the crawl's capped set-union domain metadata (which
hosts co-appear in a crawl round; reference frontera's DomainMetadata
tracks exactly this kind of co-occurrence state per domain).

Scale shape
-----------
- Exchange 1 (keyed on the GROUP/basket id): each basket's rows land
  whole in one kernel call, so per-basket distinct items and i<j pair
  generation are run-local and fully vectorized (the dedup.py
  ``_run_pair_indices`` template). The kernel emits slim COUNTED
  partial rows, three kinds multiplexed on one packed int64 key:

    pk >= 0        pair (a, b), pk = a * n_items + b  (a < b)
    pk == -1       basket marker (c = number of baskets in the block)
    pk <= -2       item presence, pk = -(item + 2)

  Within-block ``np.unique`` pre-aggregation collapses repeats before
  anything ships (the combiner-before-shuffle rule).
- Exchange 2 (keyed on pk): segment-sum of the partial counts — the
  ONLY all-to-all over pair space, and the pair stream is already
  basket-deduped + block-combined so its volume is O(distinct pairs
  per block), never O(rows²).
- The candidate output (count >= min_pair) is output-scale by
  construction; item counts + the basket total are BOUNDED by the item
  universe (like the pagerank node vector: 10⁸ items = one 800 MB
  int64 vector on the driver, broadcast once) — pairs NEVER collect.

Integer-exact metrics so the whole operator oracle-checks in SQL::

    support_ppm = pair_n * 10⁶            // N_baskets
    lift_ppm    = pair_n * N_baskets * 10⁶ // (cnt_a * cnt_b)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pair_lift(ds, group_col: str, item_col: str, n_items: int,
              min_pair: int = 2, exchange: str | None = None) -> pa.Table:
    """Mine item pairs co-occurring in >= ``min_pair`` groups; returns
    a pyarrow Table (a, b, pair_n, support_ppm, lift_ppm) sorted by
    (a, b). ``n_items`` bounds the item id space (pair key packs as
    a * n_items + b, collision-free for ids < n_items)."""
    import ray

    from .dedup import _run_pair_indices
    from .relational import keyed_exchange

    n = int(n_items)

    def emit_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = batch[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, g))
        gg, ii = g[order], it[order]
        uniq = np.ones(len(gg), dtype=bool)
        uniq[1:] = (np.diff(gg) != 0) | (np.diff(ii) != 0)
        gg, ii = gg[uniq], ii[uniq]
        new_run = np.concatenate(([True], gg[1:] != gg[:-1]))
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(gg))
        pi, pj = _run_pair_indices(starts, ends)
        pair_pk = ii[pi] * n + ii[pj]
        item_pk = -(ii + 2)
        pks = np.concatenate((pair_pk, item_pk))
        upk, cnt = np.unique(pks, return_counts=True)
        pk = np.concatenate((upk, [-1]))
        c = np.concatenate((cnt, [len(starts)]))
        return pa.table({"pk": pa.array(pk, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    def sum_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        pk = batch["pk"].to_numpy()
        c = batch["c"].to_numpy()
        order = np.argsort(pk, kind="stable")
        spk, sc = pk[order], c[order]
        new_run = np.concatenate(([True], spk[1:] != spk[:-1]))
        starts = np.flatnonzero(new_run)
        sums = np.add.reduceat(sc, starts)
        return pa.table({"pk": pa.array(spk[starts], pa.int64()),
                         "n": pa.array(sums.astype(np.int64), pa.int64())})

    partials = keyed_exchange(ds, group_col, emit_partials, exchange)
    counted = keyed_exchange(partials, "pk", sum_counts, exchange) \
        .materialize()

    # negatives: item counts (bounded by the item universe) + N baskets
    item_cnt = np.zeros(n, np.int64)
    n_baskets = 0
    import pyarrow.compute as pc
    neg = counted.map_batches(
        lambda b: b.filter(pc.less(b["pk"], 0)), batch_format="pyarrow")
    for t in neg.iter_batches(batch_format="pyarrow", batch_size=None):
        pk = t["pk"].to_numpy()
        cn = t["n"].to_numpy()
        m = pk == -1
        n_baskets += int(cn[m].sum())
        items = -(pk[~m]) - 2
        item_cnt[items] += cn[~m]
    if n_baskets == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "pair_n": pa.array([], pa.int64()),
                         "support_ppm": pa.array([], pa.int64()),
                         "lift_ppm": pa.array([], pa.int64())})
    cnt_ref = ray.put(item_cnt)
    nb = n_baskets

    def to_metrics(batch: pa.Table, _c=cnt_ref) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "pair_n": pa.array([], pa.int64()),
                          "support_ppm": pa.array([], pa.int64()),
                          "lift_ppm": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        pk = batch["pk"].to_numpy()
        pn = batch["n"].to_numpy()
        keep = (pk >= 0) & (pn >= min_pair)
        pk, pn = pk[keep], pn[keep]
        if len(pk) == 0:
            return empty
        cnts = ray.get(_c)
        a, b = pk // n, pk % n
        return pa.table({
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "pair_n": pa.array(pn, pa.int64()),
            "support_ppm": pa.array(pn * 1_000_000 // nb, pa.int64()),
            "lift_ppm": pa.array(
                pn * nb * 1_000_000 // (cnts[a] * cnts[b]), pa.int64()),
        })

    out = counted.map_batches(to_metrics, batch_format="pyarrow")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    return tbl.sort_by([("a", "ascending"), ("b", "ascending")])
