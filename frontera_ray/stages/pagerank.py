"""Fixed-iteration PageRank over an edge Dataset (bounded node space).

Link-analysis scoring is the batch cousin of the crawl's online OPIC
cash flow (reference frontera docs/source/topics/own_crawling_strategy
— scores steer the frontier): this stage computes the stationary-ish
rank of every node after ``iters`` synchronous power iterations with
damping, the way a periodic re-scoring job would over a crawled link
graph.

Scale shape
-----------
- The EDGE set streams: every iteration is one ``map_batches`` pass
  emitting per-block partial dense contribution vectors; edges are
  never collected on the driver. Edge dedup (multi-edges must not
  double-count) is one keyed exchange over the packed (src,dst) key.
- The NODE vector is dense float64, broadcast once per iteration via
  ``ray.put`` — the right trade while ``n_nodes`` fits a worker heap
  (10^8 nodes = 800 MB; web-scale host graphs fit long before URL
  graphs do). Beyond that the JOIN PATH (``pagerank_join`` /
  ``hits_join``) holds rank shards hash-partitioned by node and runs
  the ranks⋈edges recurrence as one pre-aggregated keyed all-to-all
  per iteration — no O(n_nodes) allocation anywhere; ``pagerank()``
  and ``hits()`` auto-route via ``_choose_node_space``
  (PAGERANK_DENSE_MAX_NODES). Same math, so one oracle covers both.
- Partial combine is the register-combine pattern (sketches.py HLL):
  each block returns one n_nodes-long float64 column; the driver sums
  a handful of dense vectors, never rows.

Recurrence (mass-leaking variant, no dangling redistribution —
dangling nodes absorb; matches the SQL oracle exactly)::

    r0(v)     = 1/N                     for v in nodes (src ∪ dst)
    r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u) / outdeg(u)

Float determinism: addition order differs between numpy's ``np.add.at``
and the oracle's SQL SUM, so callers should round final ranks (1e-9 is
~6 orders above the drift after 5 iterations).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dedup_edges(ds, src_col: str = "src", dst_col: str = "dst",
                n_nodes: int = 0, exchange: str | None = None):
    """Distinct (src,dst) pairs via ONE keyed exchange on the packed
    64-bit edge key — multi-edges land whole in one block and collapse
    with a vectorized ``np.unique``. ``n_nodes`` bounds the id space
    (pack = src * n_nodes + dst, collision-free)."""
    from .relational import keyed_exchange

    n = int(n_nodes)

    def pack(batch: pa.Table) -> pa.Table:
        src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # pre-collapse within the block before the exchange ships rows
        pk = np.unique(src * n + dst)
        return pa.table({"pk": pa.array(pk, pa.int64())})

    def unique_block(batch: pa.Table) -> pa.Table:
        pk = np.unique(batch["pk"].to_numpy()) if len(batch) else \
            np.empty(0, np.int64)
        return pa.table({src_col: pa.array(pk // n, pa.int64()),
                         dst_col: pa.array(pk % n, pa.int64())})

    packed = ds.map_batches(pack, batch_format="pyarrow")
    return keyed_exchange(packed, "pk", unique_block, exchange)


def _sweep_edge_block(tbl: pa.Table, fn) -> np.ndarray:
    """One edge block's dense register: fn(src, dst) -> float64[n].
    Empty blocks off a raw exchange can carry an EMPTY schema (no
    src/dst fields) — map_batches used to shield kernels from them."""
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        e = np.zeros(0, np.int64)
        return fn(e, e)
    return fn(tbl["src"].to_numpy(), tbl["dst"].to_numpy())


def _concat_edge_blocks(*ts) -> pa.Table:
    good = [t for t in ts if t.num_rows and "src" in t.column_names]
    if not good:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    return pa.concat_tables(good)


def _edge_block_refs(edges, min_rows_per_block: int = 65536) -> list:
    """Materialized Arrow block refs for an edge set — accepts a
    Dataset (materialized once) or an already-built ref list, so
    iterative callers hoist the single Dataset execution out of their
    loops and every subsequent sweep is raw tasks over zero-copy
    object-store blocks.

    Small edge sets are coalesced to ~``min_rows_per_block`` rows per
    block (one one-time concat round): the dedup exchange leaves P ≈
    num_cpus partitions, and an iterative caller otherwise pays P
    near-empty task launches per sweep × 2 sweeps × iters — pure
    overhead when the whole graph is a few thousand rows (measured:
    hits at sf0.1 0.54 s → 0.36 s). Full blocks at real scale are
    untouched, so sweep parallelism is preserved exactly where it
    pays."""
    if isinstance(edges, list):
        return edges
    import ray

    mat = edges.materialize()
    refs = mat.to_arrow_refs()
    rows = mat.count()
    target = max(1, min(len(refs),
                        -(-int(rows) // int(min_rows_per_block))))
    if target >= len(refs):
        return refs
    concat = ray.remote(_concat_edge_blocks)
    chunk = -(-len(refs) // target)
    return [concat.remote(*refs[i:i + chunk])
            for i in range(0, len(refs), chunk)]


def _dense_partials(edges, fn, n_nodes: int) -> np.ndarray:
    """Run ``fn(src, dst) -> float64[n_nodes]`` over every edge block,
    sum the per-block dense partials on the driver (register-combine;
    the driver sees O(blocks) vectors, not O(edges) rows). The sweep
    is RAW Ray tasks over materialized block refs — iterative callers
    (pagerank / HITS power iterations) otherwise pay Ray Data's
    per-execution planning cost (~0.3-0.6 s) once per iteration."""
    import ray

    task = ray.remote(_sweep_edge_block)
    out = np.zeros(n_nodes, np.float64)
    for acc in ray.get([task.remote(b, fn)
                        for b in _edge_block_refs(edges)]):
        out += acc
    return out


def _choose_node_space(n_nodes: int, teleport) -> str:
    """Policy twin of relational.choose_exchange for link analysis:
    'dense' (broadcast float64 node vector — fastest while n_nodes
    fits a worker heap) vs 'join' (hash-partitioned rank shards +
    per-iteration keyed all-to-all — the 10^10-URL-graph route).
    Crossover defaults to 1e8 nodes (~800 MB dense vector);
    PAGERANK_DENSE_MAX_NODES overrides. Personalized teleport vectors
    are themselves dense, so PPR stays on the dense path."""
    import os

    if teleport is not None:
        return "dense"
    cap = int(os.environ.get("PAGERANK_DENSE_MAX_NODES", 100_000_000))
    return "dense" if int(n_nodes) <= cap else "join"


def pagerank(edges_ds, n_nodes: int, iters: int = 5,
             damping: float = 0.85,
             dedup: bool = True, exchange: str | None = None,
             teleport: "np.ndarray | None" = None,
             node_space: str | None = None) -> pa.Table:
    """PageRank after ``iters`` power iterations; returns a small
    (node, rank) table for the nodes present in the graph (src ∪ dst).

    One pass computes outdegree + node presence; then one streaming
    pass per iteration accumulates contributions against the
    broadcast rank vector. ``edges_ds`` is materialized once after
    dedup so the repeated passes re-read object-store blocks, not
    parquet (at 100 TB: persist the deduped edges instead).

    ``teleport`` personalizes the walk (PPR, Haveliwala 2002 /
    Jeh-Widom 2003): a length-``n_nodes`` restart distribution (will
    be masked to present nodes and renormalized) replacing the
    uniform jump — both the initial rank and the per-iteration
    restart mass concentrate on its support, so rank measures
    proximity to the seed set (the crawl-focus / related-host read).
    ``None`` keeps the classic uniform restart.

    ``node_space`` picks the execution shape ('dense' | 'join');
    ``None`` applies ``_choose_node_space`` — the join path (see
    ``pagerank_join``) never materializes an O(n_nodes) vector, so
    node universes beyond worker heap route there automatically."""
    import ray

    if (node_space or _choose_node_space(n_nodes, teleport)) == "join":
        if teleport is not None:
            # never silently drop personalization: the join path takes
            # a seed LIST, not a dense vector (auto-routing already
            # keeps teleport callers dense — this guards the explicit
            # node_space='join' combination)
            raise ValueError(
                "dense teleport vectors are not supported on the join "
                "path — call pagerank_join(seed_teleport=[...]) with "
                "the seed node ids instead")
        return pagerank_join(edges_ds, iters=iters, damping=damping,
                             dedup=dedup)
    if dedup:
        edges_ds = dedup_edges(edges_ds, n_nodes=n_nodes,
                               exchange=exchange)
    edges_ds = _edge_block_refs(edges_ds)

    def deg_and_indeg(src, dst):
        # one pass, two stacked registers: [outdeg ‖ indeg]
        return np.concatenate((
            np.bincount(src, minlength=n_nodes).astype(np.float64),
            np.bincount(dst, minlength=n_nodes).astype(np.float64)))

    mixed = _dense_partials(edges_ds, deg_and_indeg, 2 * n_nodes)
    outdeg, indeg = mixed[:n_nodes], mixed[n_nodes:]
    present = (outdeg > 0) | (indeg > 0)
    n_present = int(present.sum())
    if n_present == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})

    inv_deg = np.zeros(n_nodes, np.float64)
    nz = outdeg > 0
    inv_deg[nz] = 1.0 / outdeg[nz]

    if teleport is None:
        base = np.where(present, (1.0 - damping) / n_present, 0.0)
        r = np.where(present, 1.0 / n_present, 0.0)
    else:
        t = np.where(present, np.asarray(teleport, np.float64), 0.0)
        mass = t.sum()
        if mass <= 0:
            raise ValueError("teleport has no mass on present nodes")
        t = t / mass
        base = (1.0 - damping) * t
        r = t.copy()
    for _ in range(iters):
        r_ref = ray.put(r * inv_deg)  # broadcast once per iteration

        def contrib(src, dst, _w=r_ref):
            w = ray.get(_w)
            acc = np.zeros(n_nodes, np.float64)
            np.add.at(acc, dst, w[src])
            return acc

        agg = _dense_partials(edges_ds, contrib, n_nodes)
        r = np.where(present, base + damping * agg, 0.0)

    nodes = np.flatnonzero(present)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(r[nodes], pa.float64())})


def _node_pids(arr: np.ndarray, P: int) -> np.ndarray:
    """Stable node-id -> partition hash (same siphash family as
    relational._task_partition_ids, so ranks-by-node and edges-by-src
    co-locate across build and iteration tasks)."""
    import pandas as pd

    return (pd.util.hash_array(arr.astype(np.int64, copy=False))
            % np.uint64(P)).astype(np.int64)


def _pr_split_block(tbl: pa.Table, src_col: str, dst_col: str, P: int,
                    w_col: str | None = None):
    """Map side of the ONE edge exchange: shard a raw edge block into
    P (src,dst[,w]) shards by hash(src) plus P distinct-dst shards by
    hash(dst) (the dst universe must reach the partition that will own
    that node's rank). 2P outputs so a build task fetches only its
    column of the shard matrix."""
    if tbl.num_rows == 0 or src_col not in tbl.column_names:
        z = np.empty(0, np.int64)
        e = {"src": pa.array(z), "dst": pa.array(z)}
        if w_col is not None:
            e["w"] = pa.array(np.empty(0, np.float64), pa.float64())
        e = pa.table(e)
        d = pa.table({"dst": pa.array(z)})
        return tuple([e] * P + [d] * P)
    src = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
    w = (tbl[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
         if w_col is not None else None)
    out = []
    pid = _node_pids(src, P)
    order = np.argsort(pid, kind="stable")
    cnt = np.bincount(pid, minlength=P)
    offs = np.concatenate(([0], np.cumsum(cnt)))
    ss, dd = src[order], dst[order]
    ww = w[order] if w is not None else None
    for p in range(P):
        sl = slice(int(offs[p]), int(offs[p + 1]))
        cols = {"src": pa.array(ss[sl], pa.int64()),
                "dst": pa.array(dd[sl], pa.int64())}
        if ww is not None:
            cols["w"] = pa.array(ww[sl], pa.float64())
        out.append(pa.table(cols))
    u = np.unique(dst)  # pre-collapse the node shard within the block
    pid = _node_pids(u, P)
    order = np.argsort(pid, kind="stable")
    cnt = np.bincount(pid, minlength=P)
    offs = np.concatenate(([0], np.cumsum(cnt)))
    uu = u[order]
    for p in range(P):
        out.append(pa.table({"dst": pa.array(
            uu[int(offs[p]):int(offs[p + 1])], pa.int64())}))
    return tuple(out)


def _pr_build_partition(P: int, dedup: bool, *shards):
    """Reduce side, once per partition: its B edge shards + B dst-node
    shards -> the static per-partition iteration state. Because ALL
    edges of a src co-locate here, distinct-(src,dst) dedup (lexsort +
    consecutive diff — no id-range packing needed) and the GLOBAL
    outdegree both fall out of this one exchange. Precomputes every
    index the per-iteration kernels reuse:

    - ``nodes``: sorted rank universe owned by this partition
      (srcs hashing here ∪ dsts hashing here)
    - ``psrc_pos`` / ``inv_outdeg``: local srcs as positions into
      ``nodes`` + their 1/outdeg
    - ``src_code_by_dst`` / ``dst_starts``: edges grouped by dst for a
      single reduceat per iteration
    - ``dorder`` / ``offs``: the per-dst sums reordered into
      destination-partition slices
    Returns P + 3 objects: state, nodes, n_nodes(scalar), and the P
    STATIC outbox dst-id arrays (shipped once; iterations move only
    float sums)."""
    B = len(shards) // 2
    etabs = [s for s in shards[:B] if len(s)]
    ntabs = [s for s in shards[B:] if len(s)]
    weighted = bool(etabs) and "w" in etabs[0].column_names
    if etabs:
        et = pa.concat_tables(etabs)
        src = et["src"].to_numpy().astype(np.int64)
        dst = et["dst"].to_numpy().astype(np.int64)
        w = et["w"].to_numpy().astype(np.float64) if weighted else None
    else:
        src = dst = np.empty(0, np.int64)
        w = None
    if len(src):
        # always src-sorted (the src-run reduceat below relies on it)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        if w is not None:
            w = w[order]
        if dedup:
            keep = np.ones(len(src), dtype=bool)
            keep[1:] = (np.diff(src) != 0) | (np.diff(dst) != 0)
            if w is not None:
                # parallel-edge weights SUM into the surviving row
                # (standard multigraph collapse; np.add.reduceat over
                # the duplicate runs)
                starts = np.flatnonzero(keep)
                w = np.add.reduceat(w, starts)
            src, dst = src[keep], dst[keep]
    psrc, src_code, outdeg = (np.unique(src, return_inverse=True,
                                        return_counts=True)
                              if len(src) else
                              (np.empty(0, np.int64),) * 3)
    if weighted and len(psrc):
        # out-WEIGHT replaces out-degree in the rank denominator:
        # Σ w per src (src-sorted runs; outdeg COUNTS stay intact —
        # they index the src runs below)
        outw = np.add.reduceat(
            w, np.concatenate(([0], np.cumsum(outdeg)))[:-1].astype(
                np.int64))
    else:
        outw = None
    own_dst = (np.unique(np.concatenate(
        [t["dst"].to_numpy() for t in ntabs])).astype(np.int64)
        if ntabs else np.empty(0, np.int64))
    nodes = np.union1d(psrc, own_dst)
    psrc_pos = np.searchsorted(nodes, psrc)
    # weighted graphs divide by out-WEIGHT (positive weights assumed)
    inv_outdeg = (1.0 / (outw if outw is not None
                         else outdeg.astype(np.float64))
                  if len(psrc) else np.empty(0, np.float64))
    # group local edges by dst once; iterations are one reduceat
    dorder_e = np.argsort(dst, kind="stable")
    dst_sorted = dst[dorder_e]
    new_dst = np.concatenate(([True], dst_sorted[1:] != dst_sorted[:-1])) \
        if len(dst_sorted) else np.empty(0, bool)
    dst_starts = np.flatnonzero(new_dst)
    dst_unique = dst_sorted[dst_starts]
    src_code_by_dst = src_code[dorder_e]
    # static outbox layout: per-dst sums -> destination partitions
    pid = _node_pids(dst_unique, P)
    dorder = np.argsort(pid, kind="stable")
    cnt = np.bincount(pid, minlength=P)
    offs = np.concatenate(([0], np.cumsum(cnt))).astype(np.int64)
    out_ids = dst_unique[dorder]
    # src-run view for the REVERSE sweep (HITS hub update): edges are
    # src-sorted, so src runs + each edge's dst as a code into
    # dst_unique give h(u) = Σ a(dst) as one reduceat once the a
    # values for dst_unique arrive along the (static) outbox routes
    src_starts = np.concatenate(
        ([0], np.cumsum(outdeg)))[:-1].astype(np.int64) \
        if len(psrc) else np.empty(0, np.int64)
    dst_code_by_src = np.searchsorted(dst_unique, dst) \
        if len(dst) else np.empty(0, np.int64)
    inv_dorder = np.argsort(dorder, kind="stable")
    # per-edge weight in dst order (None unweighted): the forward
    # contribution multiplies (PageRank) or adds (min-plus SSSP) each
    # edge's weight; w_by_src is the same weights in the src-sorted
    # edge order the REVERSE sweep walks
    w_by_dst = w[dorder_e] if weighted and len(dst) else None
    w_by_src = w if weighted and len(dst) else None
    state = (psrc_pos, inv_outdeg, src_code_by_dst, dst_starts,
             dorder, offs, src_starts, dst_code_by_src, inv_dorder,
             w_by_dst, w_by_src)
    return (state, nodes, int(len(nodes)),
            *[out_ids[int(offs[q]):int(offs[q + 1])] for q in range(P)])


def _pr_contrib(state, r, P: int, weight_outdeg: bool = True,
                scale: float = 1.0):
    """One partition's forward half-iteration: per-dst partial
    contribution sums (pre-aggregated BEFORE the shuffle — the
    combiner), already sliced into destination-partition order. Moves
    only float64 sums; the matching dst ids shipped once at build.
    ``weight_outdeg`` divides by outdegree (PageRank); HITS' authority
    update passes False. ``scale`` folds a pending normalization."""
    (psrc_pos, inv_outdeg, src_code_by_dst, dst_starts, dorder, offs,
     _ss, _dc, _inv, w_by_dst, _ws) = state
    if len(src_code_by_dst) == 0:
        z = np.empty(0, np.float64)
        return tuple([z] * P) if P > 1 else z
    rv = r[psrc_pos] * scale
    if weight_outdeg:
        rv = rv * inv_outdeg
    edge_vals = rv[src_code_by_dst]
    if w_by_dst is not None:
        edge_vals = edge_vals * w_by_dst
    sums = np.add.reduceat(edge_vals, dst_starts)[dorder]
    outs = tuple(sums[int(offs[q]):int(offs[q + 1])] for q in range(P))
    return outs if P > 1 else outs[0]


def _pr_accumulate(nodes, base, damping: float, *ids_then_sums):
    """Other half-iteration, at the partition owning the dst ranks:
    fold the P inbound (static ids, fresh sums) pairs into the new
    rank vector: r = base + d * total inbound contribution. ``base``
    is a scalar (uniform restart) or this partition's sparse restart
    vector (PPR seed set). Args are flat (P id arrays then P sum
    arrays) — Ray resolves only top-level ObjectRef arguments, never
    refs nested in lists."""
    half = len(ids_then_sums) // 2
    contrib = np.zeros(len(nodes), np.float64)
    for ids, sums in zip(ids_then_sums[:half], ids_then_sums[half:]):
        if len(ids):
            np.add.at(contrib, np.searchsorted(nodes, ids), sums)
    return base + damping * contrib


def _pr_partition_graph(edges_ds, dedup: bool,
                        num_partitions: int | None,
                        src_col: str, dst_col: str,
                        w_col: str | None = None):
    """Shared build phase of the join-path link analyzers: ONE edge
    exchange by hash(src) + dst-universe routing, then per-partition
    static state (see ``_pr_build_partition``). Returns
    (P, states, nodes, counts, outbox) where everything but the int
    list ``counts`` stays in the object store as refs."""
    import ray

    from .relational import cluster_cpus

    P = num_partitions or max(8, min(64, cluster_cpus()))
    # P >= 2 always: every iteration task uses num_returns=P, and Ray
    # returns a BARE ref (not a list) for num_returns=1 — a single
    # requested partition executes as 2 (partition-count invariant,
    # covered by the parity suite) instead of crashing the indexing
    P = max(2, int(P))
    split = ray.remote(num_returns=2 * P)(_pr_split_block)
    build = ray.remote(num_returns=P + 3)(_pr_build_partition)

    cols = [src_col, dst_col] + ([w_col] if w_col else [])
    refs = edges_ds.select_columns(cols) \
        .materialize().to_arrow_refs()
    ecols = [[] for _ in range(P)]
    ncols = [[] for _ in range(P)]
    for r in refs:
        out = split.remote(r, src_col, dst_col, P, w_col)
        for p in range(P):
            ecols[p].append(out[p])
            ncols[p].append(out[P + p])
    built = [build.remote(P, dedup, *ecols[p], *ncols[p])
             for p in range(P)]
    states = [b[0] for b in built]
    nodes = [b[1] for b in built]
    counts = ray.get([b[2] for b in built])
    outbox = [[built[p][3 + q] for q in range(P)] for p in range(P)]
    return P, states, nodes, counts, outbox


def pagerank_join(edges_ds, iters: int = 5, damping: float = 0.85,
                  dedup: bool = True, num_partitions: int | None = None,
                  src_col: str = "src", dst_col: str = "dst",
                  seed_teleport=None, weight_col: str | None = None
                  ) -> pa.Table:
    """PageRank via the JOIN PATH — no dense node vector anywhere, so
    the node space is bounded per PARTITION, not per worker heap: the
    scale route for URL-graph node counts (10^10 nodes = 80 GB dense —
    a stopper for ``pagerank``'s broadcast vector; here each of P
    partitions owns ~n/P ranks).

    Same mass-leaking recurrence and float path as ``pagerank`` (the
    one SQL oracle covers both): r' = (1-d)/N + d * Σ r(u)/outdeg(u).

    Scale shape — ONE partitioning key (node hash) reused everywhere:
    - ONE edge exchange by hash(src) at build; all iteration state
      (dedup, outdegree, dst grouping, outbox slices) precomputed per
      partition and pinned in the object store.
    - Each iteration is P contribution tasks (vectorized reduceat
      against the partition's OWN rank shard — ranks and their
      out-edges co-locate by construction, so the ranks⋈edges join is
      partition-local) + P accumulate tasks fed by the pre-aggregated
      (dst, contrib) all-to-all. Wire traffic per iteration is one
      float per (src-partition, distinct dst) pair — the combiner
      bound — never per edge, never O(n_nodes).
    - The driver holds only P object refs and scalar counts.
    ``seed_teleport`` (a node-id list) personalizes the walk with a
    uniform-over-seeds restart (PPR) entirely within the partitioned
    shape — the focused-crawl scoring read at URL-graph scale. (The
    dense path's ARBITRARY teleport vector is itself O(n_nodes) and
    stays dense-only.) ``weight_col`` makes the walk WEIGHTED
    (anchor-weight link analysis): contribution w(u,v)/W_out(u) per
    edge, parallel-edge weights summed in the dedup collapse; positive
    weights assumed.

    Returns the same small (node, rank) table as ``pagerank`` (at real
    scale: write per-partition parquet instead of driver concat)."""
    import ray

    P, states, nodes, counts, outbox = _pr_partition_graph(
        edges_ds, dedup, num_partitions, src_col, dst_col,
        w_col=weight_col)
    contrib = ray.remote(num_returns=P)(_pr_contrib)
    accum = ray.remote(_pr_accumulate)
    n_present = int(sum(counts))
    if n_present == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})

    @ray.remote
    def init_rank(n: int, r0: float):
        return np.full(n, r0, np.float64)

    if seed_teleport is None:
        base = (1.0 - damping) / n_present
        ranks = [init_rank.remote(counts[p], 1.0 / n_present)
                 for p in range(P)]
    else:
        # sparse PPR restart (uniform over the seed set) — the dense
        # path's arbitrary teleport VECTOR is itself O(n_nodes), so the
        # join path takes the seed-list form a focused crawl actually
        # uses; base becomes a per-partition sparse vector
        sd = np.unique(np.asarray(list(seed_teleport), np.int64))
        sd_ref = ray.put(sd)

        @ray.remote(num_returns=2)
        def seed_pos(nds, s):
            pos = np.searchsorted(nds, s)
            ok = pos < len(nds)
            ok[ok] &= nds[pos[ok]] == s[ok]
            return pos[ok], int(ok.sum())

        sp = [seed_pos.remote(nodes[p], sd_ref) for p in range(P)]
        n_seed = int(sum(ray.get([s[1] for s in sp])))
        if n_seed == 0:
            raise ValueError("teleport has no mass on present nodes")

        @ray.remote
        def sparse_vec(n: int, pos, v: float):
            out = np.zeros(n, np.float64)
            out[pos] = v
            return out

        base = None  # per-partition refs below
        base_refs = [sparse_vec.remote(counts[p], sp[p][0],
                                       (1.0 - damping) / n_seed)
                     for p in range(P)]
        ranks = [sparse_vec.remote(counts[p], sp[p][0], 1.0 / n_seed)
                 for p in range(P)]
    for _ in range(iters):
        sums = [contrib.remote(states[p], ranks[p], P) for p in range(P)]
        if P == 1:
            sums = [[s] for s in sums]
        ranks = [accum.remote(nodes[q],
                              base if base is not None else base_refs[q],
                              damping,
                              *[outbox[p][q] for p in range(P)],
                              *[sums[p][q] for p in range(P)])
                 for q in range(P)]
    node_parts = ray.get(nodes)
    rank_parts = ray.get(ranks)
    all_nodes = np.concatenate(node_parts) if node_parts else \
        np.empty(0, np.int64)
    all_ranks = np.concatenate(rank_parts) if rank_parts else \
        np.empty(0, np.float64)
    order = np.argsort(all_nodes)
    return pa.table({"node": pa.array(all_nodes[order], pa.int64()),
                     "rank": pa.array(all_ranks[order], pa.float64())})


def _pr_accum_norm(nodes, *ids_then_sums):
    """HITS authority fold: inbound (static ids, fresh sums) pairs ->
    the unnormalized authority vector + its L1 partial (the driver
    sums P scalars to normalize — never a vector)."""
    half = len(ids_then_sums) // 2
    vec = np.zeros(len(nodes), np.float64)
    for ids, sums in zip(ids_then_sums[:half], ids_then_sums[half:]):
        if len(ids):
            np.add.at(vec, np.searchsorted(nodes, ids), sums)
    return vec, float(vec.sum())


def _pr_gather(nodes, vec, scale, P: int, *id_lists):
    """Reverse-route value fetch: this partition OWNS ``vec`` (aligned
    to ``nodes``); serve each requester its values (a pending
    normalization folded in via ``scale``; None skips scaling and
    preserves integer dtypes) along the same static outbox id routes
    the forward sweep uses — wire traffic is again one value per
    (partition, distinct dst) pair."""
    outs = []
    for ids in id_lists:
        if not len(ids):
            outs.append(np.empty(0, vec.dtype))
            continue
        vals = vec[np.searchsorted(nodes, ids)]
        outs.append(vals if scale is None else vals * scale)
    outs = tuple(outs)
    return outs if P > 1 else outs[0]


def _pr_hub(state, n_nodes_p: int, *avals):
    """HITS hub fold at the src-owning partition: reassemble the
    authority values for the local dst universe from the P inbound
    slices (outbox order -> dst_unique order via the precomputed
    inverse), then h(u) = Σ a(dst) as one reduceat over the src-sorted
    edges. Returns (hub vector aligned to nodes, L1 partial)."""
    (psrc_pos, _inv_outdeg, _scbd, _dsts, _dorder, _offs,
     src_starts, dst_code_by_src, inv_dorder, _w, _ws) = state
    h = np.zeros(n_nodes_p, np.float64)
    if len(src_starts):
        a_by_dstu = np.concatenate(avals)[inv_dorder] if len(inv_dorder) \
            else np.empty(0, np.float64)
        h[psrc_pos] = np.add.reduceat(a_by_dstu[dst_code_by_src],
                                      src_starts)
    return h, float(h.sum())


def hits_join(edges_ds, iters: int = 4, dedup: bool = True,
              num_partitions: int | None = None,
              src_col: str = "src", dst_col: str = "dst") -> pa.Table:
    """HITS via the JOIN PATH — same recurrence and float path as
    ``hits`` but no O(n_nodes) vector anywhere (see ``pagerank_join``
    for the partitioning story; one SQL oracle covers both).

    Per iteration, two keyed half-sweeps over the SAME static routes:
    - authority: forward (dst, Σ h(src)) all-to-all (``_pr_contrib``
      without the outdegree weight), folded + L1-partialed at the
      node-owning partitions (``_pr_accum_norm``);
    - hub: the REVERSE route — each partition serves its freshly
      normalized authority values for the dst ids requested at build
      (``_pr_gather``), and the src-owning partition reduces
      h(u) = Σ a(dst) partition-locally (``_pr_hub``).
    The driver only ever reduces P scalar L1 partials per half-step;
    normalizations ride the next sweep as folded scale factors."""
    import ray

    P, states, nodes, counts, outbox = _pr_partition_graph(
        edges_ds, dedup, num_partitions, src_col, dst_col)
    contrib = ray.remote(num_returns=P)(_pr_contrib)
    accum = ray.remote(num_returns=2)(_pr_accum_norm)
    gather = ray.remote(num_returns=P)(_pr_gather)
    hub = ray.remote(num_returns=2)(_pr_hub)
    n_present = int(sum(counts))
    if n_present == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "hub": pa.array([], pa.float64()),
                         "authority": pa.array([], pa.float64())})

    @ray.remote
    def init_vec(n: int, v0: float):
        return np.full(n, v0, np.float64)

    h = [init_vec.remote(counts[p], 1.0 / n_present) for p in range(P)]
    h_scale = 1.0
    # iters=0 parity with the dense path: uniform hubs, zero authority
    a = [init_vec.remote(counts[p], 0.0) for p in range(P)]
    a_scale = 1.0
    for _ in range(iters):
        sums = [contrib.remote(states[p], h[p], P, False, h_scale)
                for p in range(P)]
        acc = [accum.remote(nodes[q],
                            *[outbox[p][q] for p in range(P)],
                            *[sums[p][q] for p in range(P)])
               for q in range(P)]
        a = [acc[q][0] for q in range(P)]
        s_a = sum(ray.get([acc[q][1] for q in range(P)]))
        a_scale = 1.0 / s_a if s_a else 0.0
        gat = [gather.remote(nodes[q], a[q], a_scale, P,
                             *[outbox[p][q] for p in range(P)])
               for q in range(P)]
        hb = [hub.remote(states[p], counts[p],
                         *[gat[q][p] for q in range(P)])
              for p in range(P)]
        h = [hb[p][0] for p in range(P)]
        s_h = sum(ray.get([hb[p][1] for p in range(P)]))
        h_scale = 1.0 / s_h if s_h else 0.0
    node_parts = ray.get(nodes)
    h_parts = ray.get(h)
    a_parts = ray.get(a)
    all_nodes = np.concatenate(node_parts)
    all_h = np.concatenate(h_parts) * h_scale
    all_a = np.concatenate(a_parts) * a_scale
    order = np.argsort(all_nodes)
    return pa.table({"node": pa.array(all_nodes[order], pa.int64()),
                     "hub": pa.array(all_h[order], pa.float64()),
                     "authority": pa.array(all_a[order], pa.float64())})


def _cc_contrib(state, lab, P: int, hop: int = 0):
    """Min-label forward half-sweep: per-dst MIN of the src labels
    (pre-combined before the shuffle — min is idempotent), sliced into
    the static outbox order. ``hop`` adds a per-edge increment (0 for
    CC labels, 1 for BFS levels — the min-plus recurrence)."""
    (psrc_pos, _inv, src_code_by_dst, dst_starts, dorder, offs,
     _ss, _dc, _invd, _w, _ws) = state
    if len(src_code_by_dst) == 0:
        z = np.empty(0, np.int64)
        return tuple([z] * P) if P > 1 else z
    rv = lab[psrc_pos] + hop
    mins = np.minimum.reduceat(rv[src_code_by_dst], dst_starts)[dorder]
    outs = tuple(mins[int(offs[q]):int(offs[q + 1])] for q in range(P))
    return outs if P > 1 else outs[0]


def _cc_combine(state, nodes, lab, P: int, hop: int, *fwd_ids_mins_rev):
    """One synchronous min-label/min-plus round at the node-owning
    partition: new_lab = elementwise min of (old lab, inbound per-dst
    src-label mins, this partition's src-side min over its dsts' OLD
    labels + ``hop`` — reassembled from the reverse gather). All reads
    are OLD labels, so the round is synchronous and matches the dense
    recurrence exactly (integer math — no float drift). Flat args: P
    fwd id arrays, P fwd min arrays, P reverse-gathered label
    slices."""
    (psrc_pos, _inv, _scbd, _dsts, _dorder, _offs,
     src_starts, dst_code_by_src, inv_dorder, _w, _ws) = state
    new = lab.copy()
    fwd_ids = fwd_ids_mins_rev[:P]
    fwd_mins = fwd_ids_mins_rev[P:2 * P]
    rev = fwd_ids_mins_rev[2 * P:]
    for ids, mins in zip(fwd_ids, fwd_mins):
        if len(ids):
            np.minimum.at(new, np.searchsorted(nodes, ids), mins)
    if len(src_starts):
        lab_by_dstu = np.concatenate(rev)[inv_dorder]
        np.minimum.at(new, psrc_pos,
                      np.minimum.reduceat(
                          lab_by_dstu[dst_code_by_src],
                          src_starts) + hop)
    return new


def min_label_prop_join(edges_ds, iters: int = 4,
                        num_partitions: int | None = None,
                        src_col: str = "src",
                        dst_col: str = "dst") -> pa.Table:
    """Min-label propagation via the JOIN PATH — identical synchronous
    recurrence to ``min_label_prop`` (integer min, so results match
    EXACTLY) with labels hash-partitioned by node instead of a dense
    n_nodes register: per round, the forward (dst, min src-label)
    all-to-all plus the reverse label gather along the same static
    routes (see ``pagerank_join``); the undirected neighbor min folds
    at the node-owning partitions. Memory is bounded per PARTITION —
    the connected-components route for URL-graph node universes."""
    import ray

    P, states, nodes, counts, outbox = _pr_partition_graph(
        edges_ds, True, num_partitions, src_col, dst_col)
    contrib = ray.remote(num_returns=P)(_cc_contrib)
    gather = ray.remote(num_returns=P)(_pr_gather)
    combine = ray.remote(_cc_combine)
    if int(sum(counts)) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "lbl": pa.array([], pa.int64())})

    @ray.remote
    def init_labels(nds):
        return nds.astype(np.int64, copy=True)

    lab = [init_labels.remote(nodes[p]) for p in range(P)]
    for _ in range(iters):
        fwd = [contrib.remote(states[p], lab[p], P) for p in range(P)]
        gat = [gather.remote(nodes[q], lab[q], None, P,
                             *[outbox[p][q] for p in range(P)])
               for q in range(P)]
        lab = [combine.remote(states[q], nodes[q], lab[q], P, 0,
                              *[outbox[p][q] for p in range(P)],
                              *[fwd[p][q] for p in range(P)],
                              *[gat[r][q] for r in range(P)])
               for q in range(P)]
    node_parts = ray.get(nodes)
    lab_parts = ray.get(lab)
    all_nodes = np.concatenate(node_parts)
    all_lab = np.concatenate(lab_parts)
    order = np.argsort(all_nodes)
    return pa.table({"node": pa.array(all_nodes[order], pa.int64()),
                     "lbl": pa.array(all_lab[order], pa.int64())})


_BFS_INF = np.int64(1) << 40  # min-plus sentinel: +1 per hop never wraps


def bfs_levels_join(edges_ds, seeds, max_depth: int = 4,
                    num_partitions: int | None = None,
                    src_col: str = "src",
                    dst_col: str = "dst") -> pa.Table:
    """Bounded-depth multi-source BFS via the JOIN PATH — the min-PLUS
    twin of ``min_label_prop_join`` (level(v) = min over undirected
    neighbors of level(u) + 1; seeds start at 0, everything else at a
    sentinel): ``max_depth`` synchronous rounds label every node at
    distance d by round d, so the result equals ``bfs_levels`` EXACTLY
    (integer math). No dense level register and no O(n/8) frontier
    bitset broadcast — the route when even the packed bitset
    (1.25 GB at 10^10 nodes) outgrows a comfortable per-level
    broadcast. Returns (node, lvl) for nodes within ``max_depth``."""
    import ray

    P, states, nodes, counts, outbox = _pr_partition_graph(
        edges_ds, True, num_partitions, src_col, dst_col)
    contrib = ray.remote(num_returns=P)(_cc_contrib)
    gather = ray.remote(num_returns=P)(_pr_gather)
    combine = ray.remote(_cc_combine)
    if int(sum(counts)) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "lvl": pa.array([], pa.int64())})
    seeds = np.asarray(list(seeds), np.int64)
    seeds = seeds[seeds >= 0]  # dense-path parity (no upper bound
    # here: the join path's id space is unbounded by design)
    seeds_ref = ray.put(np.unique(seeds))

    @ray.remote
    def init_levels(nds, sref):
        lab = np.full(len(nds), _BFS_INF, np.int64)
        s = ray.get(sref) if not isinstance(sref, np.ndarray) else sref
        pos = np.searchsorted(nds, s)
        ok = (pos < len(nds))
        ok[ok] &= nds[pos[ok]] == s[ok]
        lab[pos[ok]] = 0
        return lab

    lab = [init_levels.remote(nodes[p], seeds_ref) for p in range(P)]
    for _ in range(max_depth):
        fwd = [contrib.remote(states[p], lab[p], P, 1) for p in range(P)]
        gat = [gather.remote(nodes[q], lab[q], None, P,
                             *[outbox[p][q] for p in range(P)])
               for q in range(P)]
        lab = [combine.remote(states[q], nodes[q], lab[q], P, 1,
                              *[outbox[p][q] for p in range(P)],
                              *[fwd[p][q] for p in range(P)],
                              *[gat[r][q] for r in range(P)])
               for q in range(P)]
    node_parts = ray.get(nodes)
    lab_parts = ray.get(lab)
    all_nodes = np.concatenate(node_parts)
    all_lab = np.concatenate(lab_parts)
    keep = all_lab <= max_depth
    all_nodes, all_lab = all_nodes[keep], all_lab[keep]
    # dense parity: seeds isolated from the edge graph still report
    # level 0 (the dense register covers the whole id space)
    iso = np.setdiff1d(np.unique(seeds), all_nodes)
    if len(iso):
        all_nodes = np.concatenate((all_nodes, iso))
        all_lab = np.concatenate((all_lab,
                                  np.zeros(len(iso), np.int64)))
    order = np.argsort(all_nodes)
    return pa.table({"node": pa.array(all_nodes[order], pa.int64()),
                     "lvl": pa.array(all_lab[order], pa.int64())})


def _cc_combine_count(state, nodes, lab, P: int, hop: int,
                      *fwd_ids_mins_rev):
    """``_cc_combine`` + the number of labels that changed this round —
    the per-partition convergence signal (the driver sums P ints)."""
    new = _cc_combine(state, nodes, lab, P, hop, *fwd_ids_mins_rev)
    return new, int((new != lab).sum())


def _cc_shortcut_req(lab, P: int):
    """Pointer-jumping request split: the partition's DISTINCT label
    values routed to their owning partitions (labels are node ids, so
    ownership is the same node hash). Returns P id slices + the
    reassembly indices (inverse of unique, inverse of the route
    permutation)."""
    U, inv = np.unique(lab, return_inverse=True)
    pid = _node_pids(U, P)
    order = np.argsort(pid, kind="stable")
    cnt = np.bincount(pid, minlength=P)
    offs = np.concatenate(([0], np.cumsum(cnt))).astype(np.int64)
    Uo = U[order]
    slices = tuple(Uo[int(offs[r]):int(offs[r + 1])] for r in range(P))
    return (*slices, inv, np.argsort(order, kind="stable"))


def _cc_shortcut_fold(lab, inv, invorder, *val_slices):
    """Apply label(label): lab' = min(lab, L(L)) — halves pointer-chain
    depth per round (classic shortcutting), so convergence is
    O(log diameter) rounds instead of O(diameter). Returns (new lab,
    change count)."""
    lol_u = np.concatenate(val_slices)[invorder] if len(invorder) else \
        np.empty(0, np.int64)
    new = np.minimum(lab, lol_u[inv]) if len(lab) else lab
    return new, int((new != lab).sum())


def _sssp_contrib(state, lab, P: int):
    """Min-PLUS forward half-sweep with per-edge weights: per-dst MIN
    of (dist[src] + w) — synchronous Bellman-Ford relaxation, parallel
    edges collapsing naturally under the min."""
    (psrc_pos, _inv, src_code_by_dst, dst_starts, dorder, offs,
     _ss, _dc, _invd, w_by_dst, _ws) = state
    if len(src_code_by_dst) == 0:
        z = np.empty(0, np.float64)
        return tuple([z] * P) if P > 1 else z
    vals = lab[psrc_pos][src_code_by_dst] + w_by_dst
    mins = np.minimum.reduceat(vals, dst_starts)[dorder]
    outs = tuple(mins[int(offs[q]):int(offs[q + 1])] for q in range(P))
    return outs if P > 1 else outs[0]


def _sssp_combine(state, nodes, lab, P: int, *fwd_ids_mins_rev):
    """One synchronous weighted min-plus round (both edge directions —
    undirected distances): new = min(old, inbound per-dst mins,
    src-side min over (dist[dst] + w)). All reads are OLD distances;
    integer-valued float64 weights keep every sum exact."""
    (psrc_pos, _inv, _scbd, _dsts, _dorder, _offs,
     src_starts, dst_code_by_src, inv_dorder, _w, w_by_src) = state
    new = lab.copy()
    fwd_ids = fwd_ids_mins_rev[:P]
    fwd_mins = fwd_ids_mins_rev[P:2 * P]
    rev = fwd_ids_mins_rev[2 * P:]
    for ids, mins in zip(fwd_ids, fwd_mins):
        if len(ids):
            np.minimum.at(new, np.searchsorted(nodes, ids), mins)
    if len(src_starts):
        lab_by_dstu = np.concatenate(rev)[inv_dorder]
        np.minimum.at(new, psrc_pos,
                      np.minimum.reduceat(
                          lab_by_dstu[dst_code_by_src] + w_by_src,
                          src_starts))
    return new


_SSSP_INF = float(1 << 52)  # min-plus sentinel, exact in float64


def sssp_rounds_join(edges_ds, sources, weight_col: str = "w",
                     rounds: int = 4,
                     num_partitions: int | None = None,
                     src_col: str = "src",
                     dst_col: str = "dst") -> pa.Table:
    """Bounded-hop weighted shortest paths on the join path:
    ``rounds`` synchronous Bellman-Ford relaxations over UNDIRECTED
    weighted edges from a source set — dist(v) after round k is
    EXACTLY the min weight over paths of <= k hops (the synchronous
    min-plus property), which is what a recursive SQL twin with a hop
    bound computes, so the operator is oracle-able without the
    cyclic-graph non-termination an unbounded recursive relaxation
    hits. The weighted generalization of ``bfs_levels_join`` (crawl
    click-distance with per-link costs); parallel edges collapse under
    the min (``dedup=False`` keeps them all), integer-valued weights
    stay float-exact. Returns (node, dist:int64) for nodes reached
    within ``rounds`` hops."""
    import ray

    P, states, nodes, counts, outbox = _pr_partition_graph(
        edges_ds, False, num_partitions, src_col, dst_col,
        w_col=weight_col)
    contrib = ray.remote(num_returns=P)(_sssp_contrib)
    gather = ray.remote(num_returns=P)(_pr_gather)
    combine = ray.remote(_sssp_combine)
    if int(sum(counts)) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    sources = np.asarray(list(sources), np.int64)
    sources = np.unique(sources[sources >= 0])
    s_ref = ray.put(sources)

    @ray.remote
    def init_dist(nds, sref):
        lab = np.full(len(nds), _SSSP_INF, np.float64)
        s = sref
        pos = np.searchsorted(nds, s)
        ok = pos < len(nds)
        ok[ok] &= nds[pos[ok]] == s[ok]
        lab[pos[ok]] = 0.0
        return lab

    lab = [init_dist.remote(nodes[p], s_ref) for p in range(P)]
    for _ in range(rounds):
        fwd = [contrib.remote(states[p], lab[p], P) for p in range(P)]
        gat = [gather.remote(nodes[q], lab[q], None, P,
                             *[outbox[p][q] for p in range(P)])
               for q in range(P)]
        lab = [combine.remote(states[q], nodes[q], lab[q], P,
                              *[outbox[p][q] for p in range(P)],
                              *[fwd[p][q] for p in range(P)],
                              *[gat[r][q] for r in range(P)])
               for q in range(P)]
    node_parts = ray.get(nodes)
    lab_parts = ray.get(lab)
    all_nodes = np.concatenate(node_parts)
    all_lab = np.concatenate(lab_parts)
    keep = all_lab < _SSSP_INF
    all_nodes, all_lab = all_nodes[keep], all_lab[keep]
    iso = np.setdiff1d(sources, all_nodes)
    if len(iso):  # sources absent from the edge graph: dist 0
        all_nodes = np.concatenate((all_nodes, iso))
        all_lab = np.concatenate((all_lab, np.zeros(len(iso))))
    order = np.argsort(all_nodes)
    return pa.table({"node": pa.array(all_nodes[order], pa.int64()),
                     "dist": pa.array(
                         all_lab[order].astype(np.int64), pa.int64())})


def connected_components_join(edges_ds, max_iters: int = 64,
                              num_partitions: int | None = None,
                              src_col: str = "src",
                              dst_col: str = "dst") -> pa.Table:
    """Connected components to CONVERGENCE on the join path: min-label
    rounds (see ``min_label_prop_join``) repeated until a round changes
    no label anywhere — the fixpoint where every node's label IS its
    component's minimum id. Each round is one edge relaxation (the
    min-label sweep) plus one pointer-jumping SHORTCUT — lab' =
    min(lab, label(label)), routed by the same node hash since labels
    are node ids — the classic hash-to-min contraction, so convergence
    takes O(log diameter) rounds instead of O(diameter). Termination
    is detected distributively (each step returns its change count;
    the driver sums P ints per round — never a vector). ``max_iters``
    is a runaway bound only. Returns (node, lbl = component min)."""
    import ray

    P, states, nodes, counts, outbox = _pr_partition_graph(
        edges_ds, True, num_partitions, src_col, dst_col)
    contrib = ray.remote(num_returns=P)(_cc_contrib)
    gather = ray.remote(num_returns=P)(_pr_gather)
    combine = ray.remote(num_returns=2)(_cc_combine_count)
    screq = ray.remote(num_returns=P + 2)(_cc_shortcut_req)
    scfold = ray.remote(num_returns=2)(_cc_shortcut_fold)
    if int(sum(counts)) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "lbl": pa.array([], pa.int64())})

    @ray.remote
    def init_labels(nds):
        return nds.astype(np.int64, copy=True)

    lab = [init_labels.remote(nodes[p]) for p in range(P)]
    for _ in range(max_iters):
        fwd = [contrib.remote(states[p], lab[p], P) for p in range(P)]
        gat = [gather.remote(nodes[q], lab[q], None, P,
                             *[outbox[p][q] for p in range(P)])
               for q in range(P)]
        res = [combine.remote(states[q], nodes[q], lab[q], P, 0,
                              *[outbox[p][q] for p in range(P)],
                              *[fwd[p][q] for p in range(P)],
                              *[gat[r][q] for r in range(P)])
               for q in range(P)]
        lab = [res[q][0] for q in range(P)]
        # pointer-jumping shortcut on the freshly relaxed labels
        req = [screq.remote(lab[q], P) for q in range(P)]
        serve = [gather.remote(nodes[r], lab[r], None, P,
                               *[req[q][r] for q in range(P)])
                 for r in range(P)]
        sc = [scfold.remote(lab[q], req[q][P], req[q][P + 1],
                            *[serve[r][q] for r in range(P)])
              for q in range(P)]
        lab = [sc[q][0] for q in range(P)]
        changed = (sum(ray.get([res[q][1] for q in range(P)]))
                   + sum(ray.get([sc[q][1] for q in range(P)])))
        if changed == 0:
            break
    node_parts = ray.get(nodes)
    lab_parts = ray.get(lab)
    all_nodes = np.concatenate(node_parts)
    all_lab = np.concatenate(lab_parts)
    order = np.argsort(all_nodes)
    return pa.table({"node": pa.array(all_nodes[order], pa.int64()),
                     "lbl": pa.array(all_lab[order], pa.int64())})


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       n_nodes: int | None = None,
                       exchange: str | None = None):
    """Undirected co-occurrence edges: (u, v) with u < v iff both items
    appear in the same group (suppliers in an order, hosts in a session,
    entities in a document). ONE keyed exchange on the group, then a
    fully vectorized within-run kernel: sort + consecutive-dedup gives
    each group's distinct items, ``_run_pair_indices`` (the dedup.py
    pair template) emits every i<j pair with no per-group Python.
    Multi-edges across groups remain — collapse with ``dedup_edges``.
    ``n_nodes`` is accepted for caller symmetry with the downstream
    bitset stages; the kernel itself is id-range-free."""
    from .dedup import _run_pair_indices
    from .relational import keyed_exchange

    def pair_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = batch[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (group, item) via lexsort + consecutive-diff — NOT a
        # packed g*n+it key, which overflows int64 for 64-bit group ids
        # (session/url hashes) and silently decodes cross-group pairs
        order = np.lexsort((it, g))
        gg, ii = g[order], it[order]
        uniq = np.ones(len(gg), dtype=bool)
        uniq[1:] = (np.diff(gg) != 0) | (np.diff(ii) != 0)
        gg, ii = gg[uniq], ii[uniq]
        new_run = np.concatenate(([True], gg[1:] != gg[:-1]))
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(gg))
        pi, pj = _run_pair_indices(starts, ends)
        if len(pi) == 0:
            return empty
        return pa.table({"src": pa.array(ii[pi], pa.int64()),
                         "dst": pa.array(ii[pj], pa.int64())})

    return keyed_exchange(ds, group_col, pair_block, exchange)


_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _bitset_adjacency(edges_ds, n: int) -> np.ndarray:
    """Packed-bit undirected adjacency (n x ceil(n/8) uint8) from a
    possibly-duplicated (src, dst) pair stream: one ``iter_batches``
    pass, bit-OR is idempotent so no dedup exchange is needed. Shared
    by ``triangle_count`` and ``node_clustering``."""
    nbytes = (n + 7) // 8
    adj = np.zeros((n, nbytes), dtype=np.uint8)
    for t in edges_ds.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        if len(t) == 0:
            continue
        u = t["src"].to_numpy()
        v = t["dst"].to_numpy()
        # unbuffered |= : plain fancy assignment would drop edges that
        # land in the same (row, byte) slot within one batch
        np.bitwise_or.at(adj, (u, v // 8),
                         np.uint8(1) << (v % 8).astype(np.uint8))
        np.bitwise_or.at(adj, (v, u // 8),
                         np.uint8(1) << (u % 8).astype(np.uint8))
    return adj


def triangle_count(edges_ds, n_nodes: int, num_blocks: int = 32) -> dict:
    """EXACT triangle count by forward counting over a broadcast bitset
    adjacency — each triangle u<v<w is counted exactly once, at its
    (u, v) edge, as a popcount of ``adj[u] & adj[v] & {w : w > v}``.

    ``edges_ds`` is an UNDIRECTED pair stream (src, dst); duplicates
    and orientation don't matter — the bit-OR adjacency build is
    idempotent, so NO dedup exchange is needed upstream (feed raw
    ``cooccurrence_edges`` output straight in).

    Scale shape: the memory is bounded by the NODE universe (an entity
    graph — suppliers, hosts, users — not the corpus): one packed bit
    table of n²/8 bytes (n = 10⁵ nodes → 1.25 GB, broadcast once via
    ``ray.put`` and shared read-only by every task on a node). The
    EDGE stream is consumed once (``iter_batches`` bit-set pass, never
    a row collect); the counting pass fans out over NODE ranges
    (``ray.data.range``): each task re-derives its range's deduped
    upper edges from the broadcast adjacency (np.nonzero over unpacked
    bits) and reduces them with a vectorized AND+popcount — one int64
    partial per block, no shuffle anywhere. Beyond bitset reach, the
    same forward count maps to the sorted-adjacency-intersection
    exchange (edges ⋈ edges on the shared endpoint) — same math,
    heavier all-to-all; this is the documented partitioning assumption.

    Returns {"n_nodes_seen": ..., "n_edges": ..., "n_triangles": ...}
    with n_edges the DEDUPED undirected edge count.
    """
    import ray

    n = int(n_nodes)
    nbytes = (n + 7) // 8
    adj = _bitset_adjacency(edges_ds, n)
    # non-zero test, not a popcount: _POPCOUNT8[adj] would transiently
    # allocate an int64 array 8x the (node-bounded) bitset
    seen = int((adj != 0).any(axis=1).sum())
    adj_ref = ray.put(adj)

    def count_range(batch) -> pa.Table:
        ids = batch["id"].to_numpy() if len(batch["id"]) else \
            np.empty(0, np.int64)
        if len(ids) == 0:
            return pa.table({"tri": pa.array([], pa.int64()),
                             "edges": pa.array([], pa.int64())})
        a = ray.get(adj_ref)
        # this range's deduped upper edges, straight off the bitset
        # (np.unpackbits is LSB-relative via bitorder='little')
        bits = np.unpackbits(a[ids], axis=1, bitorder="little")[:, :n]
        upper = bits.astype(bool) & (np.arange(n)[None, :] > ids[:, None])
        ui, v = np.nonzero(upper)
        u = ids[ui]
        if len(u) == 0:
            return pa.table({"tri": pa.array([0], pa.int64()),
                             "edges": pa.array([0], pa.int64())})
        # strict-upper mask per edge, built on the fly (no n²/8 table):
        # bytes past v's byte are all-ones, v's own byte keeps only the
        # bits strictly above v%8, earlier bytes are zero. Adjacency
        # bits are LSB-first (bit w%8 = 1 << (w%8)), so "above v%8"
        # is the all-ones byte shifted LEFT by v%8+1.
        byte_idx = np.arange(nbytes, dtype=np.int64)[None, :]
        vb = (v // 8)[:, None]
        edge_byte = ((np.uint16(0xFF) << ((v % 8) + 1).astype(np.uint16))
                     & np.uint16(0xFF)).astype(np.uint8)[:, None]
        mask = np.where(byte_idx > vb, np.uint8(0xFF),
                        np.where(byte_idx == vb, edge_byte,
                                 np.uint8(0))).astype(np.uint8)
        common = a[u] & a[v] & mask
        tri = int(_POPCOUNT8[common].sum())
        return pa.table({"tri": pa.array([tri], pa.int64()),
                         "edges": pa.array([len(u)], pa.int64())})

    total, n_edges = 0, 0
    nodes = ray.data.range(n, override_num_blocks=num_blocks)
    for t in nodes.map_batches(count_range, batch_format="pyarrow",
                               batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            total += int(t["tri"].to_numpy().sum())
            n_edges += int(t["edges"].to_numpy().sum())
    return {"n_nodes_seen": seen, "n_edges": n_edges,
            "n_triangles": total}


def node_clustering(edges_ds, n_nodes: int, num_blocks: int = 32):
    """Per-node triangle count, degree and LOCAL CLUSTERING COEFFICIENT
    (lcc_ppm = ⌊2·tri·10⁶ / (deg·(deg−1))⌋, integer-exact) — the
    per-entity community-density feature. Same broadcast-bitset shape
    as ``triangle_count`` (accepts the raw undirected multi-edge
    stream; bit-OR is idempotent): the counting pass fans out over
    node ranges, and each node's triangle count is the popcount of
    ``adj[neighbor] & adj[node]`` summed over its neighbors, halved
    (each incident triangle is seen from both neighbor endpoints).
    Nodes with deg < 2 are omitted (coefficient undefined).
    Returns a pyarrow Table (node, deg, tri, lcc_ppm) sorted by node.
    """
    import ray

    n = int(n_nodes)
    adj = _bitset_adjacency(edges_ds, n)
    adj_ref = ray.put(adj)

    def lcc_range(batch) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64()),
                          "tri": pa.array([], pa.int64()),
                          "lcc_ppm": pa.array([], pa.int64())})
        ids = batch["id"].to_numpy() if len(batch["id"]) else \
            np.empty(0, np.int64)
        if len(ids) == 0:
            return empty
        a = ray.get(adj_ref)
        degs = _POPCOUNT8[a[ids]].sum(axis=1).astype(np.int64)
        keep = degs >= 2
        ids, degs = ids[keep], degs[keep]
        if len(ids) == 0:
            return empty
        bits = np.unpackbits(a[ids], axis=1, bitorder="little")[:, :n]
        tri = np.empty(len(ids), np.int64)
        for i, u in enumerate(ids):  # per node; inner work vectorized
            nbrs = np.flatnonzero(bits[i])
            tri[i] = int(_POPCOUNT8[a[nbrs] & a[u]].sum()) // 2
        lcc = 2 * tri * 1_000_000 // (degs * (degs - 1))
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "deg": pa.array(degs, pa.int64()),
                         "tri": pa.array(tri, pa.int64()),
                         "lcc_ppm": pa.array(lcc, pa.int64())})

    nodes = ray.data.range(n, override_num_blocks=num_blocks)
    parts = list(nodes.map_batches(lcc_range, batch_format="pyarrow",
                                   batch_size=None)
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    out = pa.concat_tables([p for p in parts if len(p)]) if parts else \
        pa.table({"node": pa.array([], pa.int64()),
                  "deg": pa.array([], pa.int64()),
                  "tri": pa.array([], pa.int64()),
                  "lcc_ppm": pa.array([], pa.int64())})
    return out.sort_by("node")


def min_label_prop(edges_ds, n_nodes: int, iters: int = 4) -> pa.Table:
    """``iters`` synchronous rounds of MIN-LABEL propagation over an
    undirected edge stream — the hash-to-min connected-components
    recurrence (labels start as node ids; each round every node takes
    the min of its own and its neighbors' labels). After enough rounds
    labels equal component minima; a FIXED iteration count keeps the
    operator deterministic and SQL-oracle-able (k unrolled CTE steps),
    and is how the distributed CC loop runs in practice (iterate until
    a no-change round; the round itself is this function's body).

    Scale shape: same register-combine as ``pagerank`` — per round, ONE
    streaming edge pass against the broadcast label vector; each block
    returns a dense int64 min-register (``np.minimum.at``), the driver
    folds O(blocks) vectors. Memory bounded by the NODE universe; edges
    never collect. Multi-edges are harmless (min is idempotent).
    Returns (node, lbl) for nodes present in the graph (src ∪ dst).
    Node universes past the dense ceiling auto-route to the join path
    (``min_label_prop_join`` — exact integer parity).
    """
    import ray

    if _choose_node_space(n_nodes, None) == "join":
        return min_label_prop_join(edges_ds, iters=iters)
    n = int(n_nodes)
    # raw-task sweeps over the one-time-materialized block refs (the
    # _dense_partials pattern): no per-iteration Dataset execution
    blocks = _edge_block_refs(edges_ds)

    def presence_block(tbl: pa.Table) -> np.ndarray:
        p = np.zeros(n, bool)
        if tbl.num_rows and "src" in tbl.column_names:
            p[tbl["src"].to_numpy()] = True
            p[tbl["dst"].to_numpy()] = True
        return np.packbits(p, bitorder="little")

    pres_task = ray.remote(presence_block)
    present = np.zeros(n, bool)
    for bits in ray.get([pres_task.remote(b) for b in blocks]):
        present |= np.unpackbits(bits, bitorder="little")[:n].astype(bool)

    SENTINEL = np.int64(np.iinfo(np.int64).max)

    def min_reg_block(tbl: pa.Table, lab: np.ndarray) -> np.ndarray:
        reg = np.full(n, SENTINEL, np.int64)
        if tbl.num_rows and "src" in tbl.column_names:
            src = tbl["src"].to_numpy()
            dst = tbl["dst"].to_numpy()
            np.minimum.at(reg, dst, lab[src])
            np.minimum.at(reg, src, lab[dst])
        return reg

    min_task = ray.remote(min_reg_block)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(int(iters)):
        l_ref = ray.put(labels)
        merged = np.full(n, SENTINEL, np.int64)
        for reg in ray.get([min_task.remote(b, l_ref) for b in blocks]):
            merged = np.minimum(merged, reg)
        labels = np.minimum(labels, merged)

    nodes = np.flatnonzero(present)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "lbl": pa.array(labels[nodes], pa.int64())})


def _bfs_reach_block(tbl: pa.Table, f_packed: np.ndarray, n: int
                     ) -> np.ndarray:
    """One edge block's reach register: unpack the broadcast frontier
    bitset, mark every neighbor of a frontier node, return packed."""
    fr = np.unpackbits(f_packed, bitorder="little")[:n].astype(bool)
    out = np.zeros(n, bool)
    if tbl.num_rows and "src" in tbl.column_names:
        src = tbl["src"].to_numpy()
        dst = tbl["dst"].to_numpy()
        out[dst[fr[src]]] = True
        out[src[fr[dst]]] = True
    return np.packbits(out, bitorder="little")


def bfs_levels(edges_ds, n_nodes: int, seeds, max_depth: int = 4) -> pa.Table:
    """Bounded-depth multi-source BFS over an UNDIRECTED edge stream —
    the crawl-depth / reachability primitive (the batch twin of the
    crawl frontier's per-link ``depth + 1`` flow; reference frontera's
    BFS strategy scores by exactly this hop count,
    frontera/strategy/depth.py:25-37). Returns (node, lvl) for
    every node within ``max_depth`` hops of the seed set, lvl = exact
    BFS level (min hops).

    Scale shape: per level, ONE streaming ``map_batches`` pass over the
    edge blocks — no shuffle anywhere. The frontier ships as a PACKED
    bitset broadcast (``ray.put``, n/8 bytes = 12.5 MB at 10⁸ nodes)
    and every block returns one packed reached-bitset register
    (the ``_dense_partials`` register-combine pattern, bit-packed:
    the driver ORs O(blocks) bitsets per level, never rows). Edges are
    materialized once and re-read from the object store each level;
    multi-edges are harmless (reach is idempotent), so the raw
    ``cooccurrence_edges`` stream feeds straight in. Memory is bounded
    by the NODE universe like the other bitset stages; beyond the
    dense ceiling the call auto-routes to ``bfs_levels_join`` (the
    min-plus join path — one all-to-all per level, exact parity).
    """
    import ray

    if _choose_node_space(n_nodes, None) == "join":
        return bfs_levels_join(edges_ds, seeds, max_depth=max_depth)
    n = int(n_nodes)
    nb = (n + 7) // 8
    # The per-level sweep runs as RAW Ray tasks over the materialized
    # Arrow block refs (zero-copy from the object store): one Dataset
    # execution total instead of one per level — Ray Data's
    # per-execution planning cost (~0.3-0.6 s) otherwise dominates a
    # ~10-level BFS. Iterative algorithms with a driver-held register
    # are the documented raw-task exception.
    reach_task = ray.remote(num_returns=1)(_bfs_reach_block)
    blocks = edges_ds.materialize().to_arrow_refs()
    level = np.full(n, -1, np.int32)
    seeds = np.asarray(seeds, np.int64)
    seeds = seeds[(seeds >= 0) & (seeds < n)]
    level[seeds] = 0
    frontier = np.zeros(n, bool)
    frontier[seeds] = True

    for d in range(1, max_depth + 1):
        if not frontier.any():
            break
        f_ref = ray.put(np.packbits(frontier, bitorder="little"))
        futs = [reach_task.remote(b, f_ref, n) for b in blocks]
        reached = np.zeros(nb, np.uint8)
        for bits in ray.get(futs):
            reached |= bits
        new = np.unpackbits(reached, bitorder="little")[:n].astype(bool)
        new &= level < 0
        if not new.any():
            break
        level[new] = d
        frontier = new

    nodes = np.flatnonzero(level >= 0)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "lvl": pa.array(level[nodes].astype(np.int64),
                                     pa.int64())})


def hits(edges_ds, n_nodes: int, iters: int = 4,
         dedup: bool = True, exchange: str | None = None,
         node_space: str | None = None) -> pa.Table:
    """HITS hubs & authorities (Kleinberg 1999, public algorithm) after
    ``iters`` synchronous iterations — the link-analysis twin of
    ``pagerank`` that separates "points at good pages" (hub) from "is
    pointed at by good hubs" (authority); a crawl re-scoring job uses
    the hub score to prioritize index/seed pages and the authority
    score for content pages.

    Same scale shape as ``pagerank``: the deduped edge set streams once
    per half-iteration, emitting per-block dense partial vectors
    against the ``ray.put``-broadcast score vector; the driver sums
    O(blocks) registers and L1-normalizes. Recurrence::

        h0(v) = 1/|present|
        a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u);  a_k /= Σ a_k
        h_k(u) = Σ_{(u,v)∈E} a_k(v);      h_k /= Σ h_k

    Float determinism: numpy's dense-vector sum and SQL SUM order
    differ by ~1e-15 relative per normalization; callers round final
    scores (1e-9 guard, same as ``pagerank``)."""
    import ray

    if (node_space or _choose_node_space(n_nodes, None)) == "join":
        return hits_join(edges_ds, iters=iters, dedup=dedup)
    if dedup:
        edges_ds = dedup_edges(edges_ds, n_nodes=n_nodes,
                               exchange=exchange)
    edges_ds = _edge_block_refs(edges_ds)

    def deg_pass(src, dst):
        return np.concatenate((
            np.bincount(src, minlength=n_nodes).astype(np.float64),
            np.bincount(dst, minlength=n_nodes).astype(np.float64)))

    mixed = _dense_partials(edges_ds, deg_pass, 2 * n_nodes)
    present = (mixed[:n_nodes] > 0) | (mixed[n_nodes:] > 0)
    n_present = int(present.sum())
    if n_present == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "hub": pa.array([], pa.float64()),
                         "authority": pa.array([], pa.float64())})

    h = np.where(present, 1.0 / n_present, 0.0)
    a = np.zeros(n_nodes, np.float64)
    for _ in range(iters):
        h_ref = ray.put(h)

        def auth_contrib(src, dst, _w=h_ref):
            w = ray.get(_w)
            acc = np.zeros(n_nodes, np.float64)
            np.add.at(acc, dst, w[src])
            return acc

        a = _dense_partials(edges_ds, auth_contrib, n_nodes)
        s = a.sum()
        if s > 0:
            a = a / s
        a_ref = ray.put(a)

        def hub_contrib(src, dst, _w=a_ref):
            w = ray.get(_w)
            acc = np.zeros(n_nodes, np.float64)
            np.add.at(acc, src, w[dst])
            return acc

        h = _dense_partials(edges_ds, hub_contrib, n_nodes)
        s = h.sum()
        if s > 0:
            h = h / s

    nodes = np.flatnonzero(present)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "hub": pa.array(h[nodes], pa.float64()),
                     "authority": pa.array(a[nodes], pa.float64())})


def degree_histogram(edges_ds, n_nodes: int, dedup: bool = True,
                     exchange: str | None = None) -> pa.Table:
    """Degree distribution of the distinct-edge graph — (side, deg,
    n_nodes) rows for side in ('out', 'in'): how many nodes have each
    out-/in-degree. The first observability read on any crawled link
    graph (power-law slope, supernode detection — the skew signal that
    decides salting before a per-node shuffle).

    ONE streaming edge pass (stacked out‖in bincount registers), then
    two tiny ``np.unique`` folds on the driver — NO shuffle; output is
    distinct-degree-scale."""
    if dedup:
        edges_ds = dedup_edges(edges_ds, n_nodes=n_nodes,
                               exchange=exchange)

    def deg_pass(src, dst):
        return np.concatenate((
            np.bincount(src, minlength=n_nodes).astype(np.float64),
            np.bincount(dst, minlength=n_nodes).astype(np.float64)))

    mixed = _dense_partials(edges_ds, deg_pass, 2 * n_nodes)
    outdeg = mixed[:n_nodes].astype(np.int64)
    indeg = mixed[n_nodes:].astype(np.int64)
    sides, degs, ns = [], [], []
    for side, d in (("in", indeg), ("out", outdeg)):
        u, c = np.unique(d[d > 0], return_counts=True)
        sides.extend([side] * len(u))
        degs.append(u)
        ns.append(c.astype(np.int64))
    return pa.table({
        "side": pa.array(sides, pa.string()),
        "deg": pa.array(np.concatenate(degs) if degs else
                        np.empty(0, np.int64), pa.int64()),
        "n_nodes": pa.array(np.concatenate(ns) if ns else
                            np.empty(0, np.int64), pa.int64())})


def kcore(edges_ds, n_nodes: int, k: int = 3, rounds: int = 4) -> pa.Table:
    """Fixed-round k-core peeling (Seidman 1983, the standard cohesion
    decomposition): repeatedly drop nodes with fewer than ``k``
    neighbors among the still-alive nodes — the link-ring / spam-farm
    core detector on a crawled web graph (densely interlinked sets
    survive, tendrils peel away). A FIXED round count keeps the
    operator deterministic and SQL-oracle-able (unrolled MATERIALIZED
    CTE rounds); callers iterate to a no-change round in practice.

    Scale shape — the ``triangle_count`` bitset pattern, NOT an edge
    exchange: the undirected adjacency builds in ONE idempotent-OR
    ``iter_batches`` pass (duplicates and orientation are free — no
    dedup exchange, which at distinct-edge-key cardinality would pay a
    per-key map_groups wall), memory bounded by the NODE universe
    (n²/8 bits packed); each peel round is then one vectorized
    popcount of ``adj & alive`` per row. Rows shard over node ranges
    exactly like ``triangle_count.count_range`` when n outgrows one
    heap — same math, documented path. Returns (node, core_deg) for
    survivors, core_deg = degree within the final surviving set."""
    n = int(n_nodes)
    adj = _bitset_adjacency(edges_ds, n)
    # clear self-loop bits: they never count toward core degree
    ids = np.arange(n)
    adj[ids, ids // 8] &= ~(np.uint8(1) << (ids % 8).astype(np.uint8))

    alive = (adj != 0).any(axis=1)
    deg = np.zeros(n, np.int64)
    nb = adj.shape[1]
    for r in range(int(rounds) + 1):  # +1: final reporting degrees
        alive_packed = np.packbits(alive, bitorder="little")
        masked = adj & alive_packed[None, :nb]
        deg = _POPCOUNT8[masked].sum(axis=1).astype(np.int64)
        if r == rounds:
            break
        alive &= deg >= k

    nodes = np.flatnonzero(alive)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "core_deg": pa.array(deg[nodes], pa.int64())})


def ktruss(edges_ds, n_nodes: int, k: int = 4,
           rounds: int = 3) -> pa.Table:
    """Fixed-round k-truss peeling (Cohen 2008, public algorithm —
    the EDGE-cohesion decomposition one level up from k-core): each
    round drops every edge whose support (# triangles containing it)
    is below k-2, synchronously; densely interwoven link farms /
    communities survive, bridges and tendrils peel away. A FIXED
    round count keeps the operator deterministic and SQL-oracle-able
    (unrolled support+filter CTE rounds); callers iterate to a
    no-change round in practice (the loop breaks early when a round
    peels nothing).

    Scale shape — the ``kcore`` bitset pattern: adjacency from ONE
    idempotent-OR pass (no dedup exchange), memory bounded by the NODE
    universe; per round each surviving edge's support is one popcount
    of ``adj[u] & adj[v]`` (chunked rows, vectorized), then the
    adjacency rebuilds from survivors. Entity graphs only (suppliers /
    hosts / users), like the rest of the bitset family. Returns the
    surviving edges (u < v) with their FINAL support."""
    n = int(n_nodes)
    adj = _bitset_adjacency(edges_ds, n)
    ids = np.arange(n)
    adj[ids, ids // 8] &= ~(np.uint8(1) << (ids % 8).astype(np.uint8))
    # distinct u<v edge list straight from the stream (bounded by the
    # entity-graph edge count; packed-key unique, self-loops dropped)
    keys = []
    for t in edges_ds.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        if len(t) == 0 or "src" not in t.column_names:
            continue
        a = t["src"].to_numpy().astype(np.int64)
        b = t["dst"].to_numpy().astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        keys.append(np.unique(lo[m] * n + hi[m]))
    ek = np.unique(np.concatenate(keys)) if keys else \
        np.empty(0, np.int64)
    u, v = ek // n, ek % n

    def supports(uu, vv):
        sup = np.empty(len(uu), np.int64)
        for s in range(0, len(uu), 4096):
            e = slice(s, s + 4096)
            sup[e] = _POPCOUNT8[adj[uu[e]] & adj[vv[e]]].sum(axis=1)
        return sup

    for _ in range(int(rounds)):
        if len(u) == 0:
            break
        sup = supports(u, v)
        keep = sup >= k - 2
        if keep.all():
            break
        u, v = u[keep], v[keep]
        adj = np.zeros_like(adj)
        np.bitwise_or.at(adj, (u, v // 8),
                         np.uint8(1) << (v % 8).astype(np.uint8))
        np.bitwise_or.at(adj, (v, u // 8),
                         np.uint8(1) << (u % 8).astype(np.uint8))
    sup = supports(u, v) if len(u) else np.empty(0, np.int64)
    return pa.table({"u": pa.array(u, pa.int64()),
                     "v": pa.array(v, pa.int64()),
                     "sup": pa.array(sup, pa.int64())})


def assortativity_sums(edges_ds, n_nodes: int,
                       num_blocks: int = 32) -> pa.Table:
    """Degree-assortativity moment sums (Newman 2002's mixing
    coefficient) over the undirected graph, ALL-INTEGER: across ordered
    adjacent pairs (u, v), with x = deg(u), y = deg(v),

        m = Σ 1 = 2E,  s1 = Σ x,  sxx = Σ x²,  sxy = Σ x·y

    (by symmetry Σy = s1 and Σy² = sxx, so r =
    (m·sxy − s1²) / (m·sxx − s1²) is fully determined). Emitting the
    exact integer sums instead of the float r keeps the operator
    hash-exact; r itself is one division away (pytest asserts the
    assembled r against networkx-free brute).

    Scale shape: the ``triangle_count`` broadcast-bitset pattern —
    adjacency from ONE idempotent-OR pass, degrees are row popcounts,
    and the pair sums fan out over node ranges (each task computes its
    rows' neighbor-degree dot products via one unpacked-bits matmul);
    one 4-integer register per block, no shuffle."""
    import ray

    n = int(n_nodes)
    adj = _bitset_adjacency(edges_ds, n)
    ids_all = np.arange(n)
    adj[ids_all, ids_all // 8] &= ~(np.uint8(1)
                                    << (ids_all % 8).astype(np.uint8))
    deg = _POPCOUNT8[adj].sum(axis=1).astype(np.int64)
    adj_ref = ray.put(adj)
    deg_ref = ray.put(deg)
    cache: dict = {}

    def part(batch) -> pa.Table:
        ids = batch["id"].to_numpy() if len(batch["id"]) else \
            np.empty(0, np.int64)
        if len(ids) == 0:
            return pa.table({"m": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.int64()),
                             "sxx": pa.array([], pa.int64()),
                             "sxy": pa.array([], pa.int64())})
        if "a" not in cache:
            cache["a"] = ray.get(adj_ref)
            cache["d"] = ray.get(deg_ref)
        a, d = cache["a"], cache["d"]
        x = d[ids]
        bits = np.unpackbits(a[ids], axis=1, bitorder="little")[:, :n]
        nbr_deg = bits.astype(np.int64) @ d  # Σ_{v∈N(u)} deg(v)
        return pa.table({
            "m": pa.array([int(x.sum())], pa.int64()),
            "s1": pa.array([int((x * x).sum())], pa.int64()),
            "sxx": pa.array([int((x * x * x).sum())], pa.int64()),
            "sxy": pa.array([int((x * nbr_deg).sum())], pa.int64())})

    tot = np.zeros(4, np.int64)
    nodes = ray.data.range(n, override_num_blocks=num_blocks)
    for t in nodes.map_batches(part, batch_format="pyarrow",
                               batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            tot += np.array([int(t["m"].to_numpy().sum()),
                             int(t["s1"].to_numpy().sum()),
                             int(t["sxx"].to_numpy().sum()),
                             int(t["sxy"].to_numpy().sum())], np.int64)
    return pa.table({"m_pairs": pa.array([int(tot[0])], pa.int64()),
                     "s1": pa.array([int(tot[1])], pa.int64()),
                     "sxx": pa.array([int(tot[2])], pa.int64()),
                     "sxy": pa.array([int(tot[3])], pa.int64())})


def link_prediction_edges(edges_ds, n_nodes: int,
                          num_blocks: int = 32) -> pa.Table:
    """Neighborhood-similarity link-prediction indices for every
    distinct edge (u < v), ALL-INTEGER so the operator hash-checks:

    - ``cn``       — common-neighbor count |N(u) ∩ N(v)|
                     (Newman 2001's baseline index),
    - ``ra_micro`` — resource-allocation index Σ_z 10^6 // deg(z)
                     over common neighbors z (Zhou, Lü & Zhang 2009 —
                     the AA/RA family member that stays integer-exact;
                     Adamic-Adar's 1/ln(deg) weight is one float map
                     away),
    - ``jac_ppm``  — neighborhood Jaccard
                     10^6·cn // (deg(u) + deg(v) − cn).

    On an edge stream these score EMBEDDEDNESS (how clique-like each
    link is — link-ring/community structure, the tie-strength feature
    a spam or recommendation model consumes); on a candidate non-edge
    stream the same kernel ranks missing-link likelihood.

    Scale shape: the bitset adjacency builds from ONE idempotent-OR
    pass (no dedup exchange, the ``triangle_count`` pattern); degree
    and the 10^6//deg weight vector are node-bounded, broadcast once
    via ``ray.put``. Edge enumeration + scoring fan out over node
    ranges against the broadcast bitset: per range, common-neighbor
    bitsets reduce with popcount (cn) and an unpacked-bits × weight
    matmul (ra) — vectorized, never per-edge Python. Output is
    edge-scale; node ranges shard it evenly."""
    import ray

    n = int(n_nodes)
    adj = _bitset_adjacency(edges_ds, n)
    deg = _POPCOUNT8[adj].sum(axis=1).astype(np.int64)
    w = np.zeros(n, dtype=np.int64)
    nz = deg > 0
    w[nz] = 1_000_000 // deg[nz]
    adj_ref = ray.put(adj)
    deg_ref = ray.put(deg)
    w_ref = ray.put(w)

    def score_range(batch) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "cn": pa.array([], pa.int64()),
                          "ra_micro": pa.array([], pa.int64()),
                          "jac_ppm": pa.array([], pa.int64())})
        ids = batch["id"].to_numpy() if len(batch["id"]) else \
            np.empty(0, np.int64)
        if len(ids) == 0:
            return empty
        a = ray.get(adj_ref)
        dg = ray.get(deg_ref)
        wt = ray.get(w_ref)
        # this range's deduped upper edges, straight off the bitset
        bits = np.unpackbits(a[ids], axis=1, bitorder="little")[:, :n]
        upper = bits.astype(bool) & (np.arange(n)[None, :] > ids[:, None])
        ui, v = np.nonzero(upper)
        u = ids[ui]
        if len(u) == 0:
            return empty
        common = a[u] & a[v]
        cn = _POPCOUNT8[common].sum(axis=1).astype(np.int64)
        cbits = np.unpackbits(common, axis=1, bitorder="little")[:, :n]
        ra = cbits.astype(np.int64) @ wt
        den = dg[u] + dg[v] - cn
        jac = (1_000_000 * cn) // den
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "cn": pa.array(cn, pa.int64()),
                         "ra_micro": pa.array(ra, pa.int64()),
                         "jac_ppm": pa.array(jac, pa.int64())})

    nodes = ray.data.range(n, override_num_blocks=num_blocks)
    parts = [t for t in nodes.map_batches(
        score_range, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if len(t)]
    if not parts:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "cn": pa.array([], pa.int64()),
                         "ra_micro": pa.array([], pa.int64()),
                         "jac_ppm": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


def two_hop_reach(edges_ds, n_nodes: int, num_blocks: int = 32) -> pa.Table:
    """Exact 2-hop neighborhood size per node: |{w != v : dist(v,w) <= 2}|
    — the neighborhood-expansion read (how fast does influence spread
    from this host; the 2-step cousin of degree, and the quantity ANF /
    HyperBall approximate at higher radii). ALL-INTEGER output
    (node, deg, reach2) for nodes with deg > 0.

    Scale shape: bitset adjacency from ONE idempotent-OR pass (the
    ``triangle_count`` pattern), broadcast once; node ranges fan out and
    each node's reach bitset is the OR-reduction of its neighbors'
    adjacency rows plus its own (vectorized ``np.bitwise_or.reduce``
    over a deg-row slice — per-node work O(deg·n/8), never per-bit
    Python), self-bit cleared, popcount. Output is node-bounded."""
    import ray

    n = int(n_nodes)
    adj = _bitset_adjacency(edges_ds, n)
    deg = _POPCOUNT8[adj].sum(axis=1).astype(np.int64)
    adj_ref = ray.put(adj)
    deg_ref = ray.put(deg)

    def reach_range(batch) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64()),
                          "reach2": pa.array([], pa.int64())})
        ids = batch["id"].to_numpy() if len(batch["id"]) else \
            np.empty(0, np.int64)
        if len(ids) == 0:
            return empty
        a = ray.get(adj_ref)
        dg = ray.get(deg_ref)
        ids = ids[dg[ids] > 0]
        if len(ids) == 0:
            return empty
        out = np.zeros(len(ids), dtype=np.int64)
        for j, u in enumerate(ids):
            row = np.unpackbits(a[u], bitorder="little")[:n]
            nbrs = np.flatnonzero(row)
            reach = np.bitwise_or.reduce(a[nbrs], axis=0) | a[u]
            reach[u // 8] &= np.uint8(~(1 << (u % 8)) & 0xFF)
            out[j] = int(_POPCOUNT8[reach].sum())
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "deg": pa.array(dg[ids], pa.int64()),
                         "reach2": pa.array(out, pa.int64())})

    nodes = ray.data.range(n, override_num_blocks=num_blocks)
    parts = [t for t in nodes.map_batches(
        reach_range, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None) if len(t)]
    if not parts:
        return pa.table({"node": pa.array([], pa.int64()),
                         "deg": pa.array([], pa.int64()),
                         "reach2": pa.array([], pa.int64())})
    return pa.concat_tables(parts)
