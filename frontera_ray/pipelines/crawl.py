"""Distributed crawl driver: Ray Data rounds over actor-held frontier state.

Architecture (SURVEY.md §3.4): the continuous frontera loop becomes BSP
supersteps. Per round, ONE streaming Dataset execution:

    queue shards ──pop──▶ Dataset of due requests (Arrow refs, zero-copy)
        │ map_batches(fetch_and_sink)   fetch + encode; writes the round's
        │                               page fragments (image+caption rows)
        ▼ outlink rows (url, parent depth/seq)
        │ map_batches(process_links)    explode → canonicalize → fp64 →
        ▼                               host/crc32 → score   (vectorized)
        │ map_batches(route_links)      splits each batch by fp-shard and
        ▼                               host-shard, calls the owning actors
    state shards (check_and_mark dedup) ──▶ queue shards (schedule)

Control crosses nodes only at the two keyed exchanges (fingerprint-shard
for dedup ownership, host-shard for politeness locality) — the same two
partitionings the reference places on its message bus
(zeromq/__init__.py:104-107,161-166). Routing happens *inside*
map_batches tasks (direct actor calls on sub-batches) instead of an
all-to-all Dataset shuffle: each sub-batch ships once to its owner with
no sort barrier. The web/strategy objects are broadcast once via
``ray.put`` and cached per worker process — not re-shipped per batch.

Skew handling: per-host round caps bound any host's contribution to a
round; host-salted scoring (strategies.discovery_salted_scores) spreads
hot hosts across score deciles; pops are score-ordered per shard so a
mega-host cannot starve its queue shard (north rule).

Checkpoint/resume: every ``checkpoint_every`` rounds all shards persist
(states parquet + bloom bytes + queue entries + domain metadata) plus a
driver meta.json. A killed run resumes from the latest complete
checkpoint; page output is per-round directories, so finished rounds
are skipped and the in-flight round is rewritten idempotently.
"""

from __future__ import annotations

import json
import shutil
import time
import uuid
from functools import partial
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..fingerprint import crc32_batch, fp64_batch
from ..state.queue import QueueShard
from ..state.urlseen import States, UrlSeenShard
from ..strategies import STRATEGIES, discovery_salted_scores
from ..urls import canonicalize_batch, hostnames_batch


@ray.remote
class UrlSeenActor:
    def __init__(self, shard_id: int, exact: bool = True,
                 bloom_bits: int = 1 << 24, filter_kind: str = "bloom"):
        self.shard = UrlSeenShard(shard_id, exact=exact,
                                  bloom_bits=bloom_bits,
                                  filter_kind=filter_kind)

    def check_and_mark(self, fps: np.ndarray) -> np.ndarray:
        return self.shard.check_and_mark(fps)

    def set_states(self, fps, values) -> None:
        self.shard.set_states(fps, values)

    def mark_crawled(self, fps) -> None:
        self.shard.mark_crawled(fps)

    def get_states(self, fps) -> np.ndarray:
        return self.shard.get_states(fps)

    def unmark(self, fps) -> np.ndarray:
        return self.shard.unmark(fps)

    def seen_count(self) -> int:
        return len(self.shard.states) if self.shard.exact else self.shard.n_seen

    def checkpoint(self, directory: str, fs=None) -> None:
        self.shard.checkpoint(directory, fs=fs)

    def restore(self, directory: str, fs=None) -> None:
        self.shard = UrlSeenShard.restore(
            directory, self.shard.shard_id, exact=self.shard.exact,
            filter_kind=self.shard.filter_kind, fs=fs,
        )

    def node_id(self) -> str:
        """Hex node id this shard landed on (multi-node placement
        evidence — see tests/test_two_node.py)."""
        return ray.get_runtime_context().get_node_id()


@ray.remote
class QueueActor:
    def __init__(self, shard_id: int, profile: str = "max_score", **kwargs):
        self.shard = QueueShard(shard_id, profile=profile, **kwargs)
        self._kwargs = kwargs
        self._profile = profile

    def schedule_table(self, table: pa.Table) -> int:
        return self.shard.schedule_table(table)

    def pop_table(self, max_n: int, overused_keys=(), now=None,
                  max_per_host=None, min_hosts=None) -> pa.Table:
        return self.shard.pop_table(max_n, overused_keys, now, max_per_host,
                                    min_hosts)

    def update_scores(self, fps, scores) -> int:
        return self.shard.update_scores(fps, scores)

    def add_scores(self, fps, deltas) -> int:
        return self.shard.add_scores(fps, deltas)

    def count(self) -> int:
        return self.shard.count()

    def stats(self) -> dict:
        return dict(self.shard.stats)

    def domain_cache_sizes(self) -> dict:
        """Endurance observability: resident vs spilled domain-cache
        entries (the two-generation LRU bound in action)."""
        d = self.shard.domains
        return {"gen1": len(d._gen1), "gen2": len(d._gen2),
                "spilled": len(d._spill_index)}

    def pop_history(self) -> list:
        return list(self.shard.pop_history or ())

    def node_id(self) -> str:
        """Hex node id this shard landed on (multi-node placement
        evidence — see tests/test_two_node.py)."""
        return ray.get_runtime_context().get_node_id()

    def checkpoint(self, directory: str, fs=None) -> None:
        self.shard.checkpoint(directory, fs=fs)

    def restore(self, directory: str, fs=None) -> None:
        self.shard = QueueShard.restore(
            directory, self.shard.shard_id, fs=fs,
            profile=self._profile, **self._kwargs
        )


# ---------------------------------------------------------------------------
# broadcast-once helpers (ray.put ref -> per-worker cache)
# ---------------------------------------------------------------------------

_BCAST_CACHE: dict[str, object] = {}


def _resolve(obj_or_ref):
    if isinstance(obj_or_ref, ray.ObjectRef):
        key = obj_or_ref.hex()
        if key not in _BCAST_CACHE:
            _BCAST_CACHE[key] = ray.get(obj_or_ref)
        return _BCAST_CACHE[key]
    return obj_or_ref


# Deterministic child sequence numbers: tree-path encoding independent of
# execution parallelism (replaces the reference's wall-clock created_at,
# sqlalchemy/components.py:209 — required for identical N-vs-4N ordering,
# SURVEY.md §7.4). Seeds get `16^SEED_DIGITS + index` (a sentinel leading
# digit + fixed-width seed id), children append one base-16 digit per
# level: seq digits are (1, seed, path...) so every (seed, path) is
# unique — no aliasing between seed ids and shallow paths. Supports
# branching < SEQ_BASE, seeds < 16^SEED_DIGITS, depth <= 9 within int64.
SEQ_BASE = 16
SEED_DIGITS = 5
SEED_SEQ_OFFSET = SEQ_BASE ** SEED_DIGITS
MAX_SEQ_BEFORE_CHILD = (1 << 62) // SEQ_BASE  # depth-overflow guard

PAGE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

LINKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("parent_depth", pa.int32()),
        ("seq", pa.int64()),
        ("parent_score", pa.float64()),
        ("n_siblings", pa.int32()),
    ]
)


def fetch_and_sink(batch: pa.Table, web_ref, round_dir: str,
                   carry_parent_url: bool = False, sink_fs=None,
                   state_actors=None) -> pa.Table:
    """Simulated fetch of popped URLs; writes the page fragment (image+
    caption rows, FIXTURES.md §F4 schema) and emits outlink rows.

    Pure function of the URL (payload.fetch_simulated), so re-running a
    round after resume reproduces identical page fragments.
    ``carry_parent_url`` adds a parent_url column to the link rows —
    only requested when the strategy defines filter_extracted_links, so
    the default link stream stays slim.

    CLUSTER ASSUMPTION: fragments are written from INSIDE map tasks, so
    ``round_dir`` must be reachable from every worker node — on a real
    cluster pass ``sink_fs`` (a ``pyarrow.fs.FileSystem``, e.g.
    ``S3FileSystem`` or ``from_uri('s3://bucket/...')``) so writes go
    through shared storage; the default (None) writes local paths and
    is only correct single-node or on a shared mount."""
    from ..payload import fetch_batch_columns

    web = _resolve(web_ref)
    urls = batch["url"].to_pylist()
    if not urls:
        return LINKS_SCHEMA.empty_table()
    # Redirect resolution (canonical solver, Basic profile): fetch the
    # redirect target's content but keep the REQUESTED URL as the
    # record key — the first URL of the chain stays canonical, so the
    # queued fingerprint is the one marked crawled and requests never
    # leak (contrib/canonicalsolvers/basic.py semantics).
    if hasattr(web, "resolve_batch"):
        finals = web.resolve_batch(urls)
    elif hasattr(web, "resolve"):
        finals = [web.resolve(u) for u in urls]
    else:
        finals = urls
    # real adapters (contrib.httpweb.HttpWeb) provide content; synthetic
    # webs fall back to the deterministic payload generator
    if hasattr(web, "fetch_batch"):
        cols = web.fetch_batch(finals)
    else:
        cols = fetch_batch_columns(finals)
    cols["image_id"] = list(urls)  # canonical = requested (chain[0])
    # request_error wiring: adapters that classify failures
    # (errors_of_batch, aligned with the fetch) get their failed pages
    # marked states ERROR on the owning shards — the sink still gets an
    # honest fmt='error' row, so round fragments stay complete and the
    # lineage manifest is unaffected
    if state_actors is not None and hasattr(web, "errors_of_batch"):
        errs = web.errors_of_batch(finals)
        failed = np.flatnonzero(
            np.asarray([e is not None for e in errs], dtype=bool))
        if len(failed):
            _mark_errors(
                batch["fingerprint"].to_numpy()[failed], state_actors)
    pages = pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )
    frag = f"part-{uuid.uuid4().hex}.parquet"
    if sink_fs is not None:
        sink_fs.create_dir(round_dir, recursive=True)
        pq.write_table(pages, f"{round_dir}/{frag}", filesystem=sink_fs)
    else:
        d = Path(round_dir)
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(pages, d / frag)

    if hasattr(web, "links_of_batch"):  # vectorized adapter fast path
        flat, counts = web.links_of_batch(urls)
    else:
        links = [web.links_of(u) for u in urls]
        counts = np.asarray([len(l) for l in links], dtype=np.int64)
        flat = pa.array([u for lst in links for u in lst], pa.string())
    if counts.sum() == 0:
        return LINKS_SCHEMA.empty_table()
    if counts.max() >= SEQ_BASE:
        raise ValueError(
            f"page with {counts.max()} outlinks exceeds SEQ_BASE-1="
            f"{SEQ_BASE - 1}; tree-path sequence numbers would collide — "
            "raise SEQ_BASE (costs depth headroom) or cap outlinks"
        )
    # abs(): robots/sitemap chains use negative seqs that also multiply
    # by SEQ_BASE per level — they must trip the depth guard too
    if int(np.abs(batch["seq"].to_numpy()).max(initial=0)) > MAX_SEQ_BEFORE_CHILD:
        raise ValueError(
            "crawl depth exceeds the tree-path sequence budget (~9 levels "
            "with 5 seed digits); raise SEQ limits or switch to a wider "
            "sequence encoding"
        )
    parent_depth = np.repeat(batch["depth"].to_numpy(), counts)
    parent_seq = np.repeat(batch["seq"].to_numpy(), counts)
    parent_score = np.repeat(batch["score"].to_numpy(), counts)
    n_siblings = np.repeat(counts, counts)
    link_idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts if c])
    seqs = parent_seq * SEQ_BASE + (link_idx + 1)
    out = {
        "url": flat,
        "parent_depth": pa.array(parent_depth.astype(np.int32), pa.int32()),
        "seq": pa.array(seqs, pa.int64()),
        "parent_score": pa.array(parent_score, pa.float64()),
        "n_siblings": pa.array(n_siblings.astype(np.int32), pa.int32()),
    }
    if carry_parent_url:
        out["parent_url"] = pa.array(
            np.repeat(np.asarray(urls, dtype=object), counts), pa.string())
    return pa.table(out)


def process_links(batch: pa.Table, strategy_ref, salted: bool = False) -> pa.Table:
    """Fused canonicalize + fingerprint + host + score kernel (replaces
    frontera's fingerprint/domain middleware chain,
    contrib/middlewares/fingerprint.py:51-123, domain.py:62-117)."""
    if len(batch) == 0:
        return batch.append_column("canonical_url", pa.array([], pa.string())) \
                    .append_column("fingerprint", pa.array([], pa.uint64())) \
                    .append_column("host", pa.array([], pa.string())) \
                    .append_column("host_crc32", pa.array([], pa.int32())) \
                    .append_column("score", pa.array([], pa.float64()))
    strategy = _resolve(strategy_ref)
    if (hasattr(strategy, "filter_extracted_links")
            and "parent_url" in batch.column_names):
        parents = np.asarray(batch["parent_url"].to_pylist(), dtype=object)
        kids = np.asarray(batch["url"].to_pylist(), dtype=object)
        mask = np.asarray(strategy.filter_extracted_links(parents, kids),
                          dtype=bool)
        batch = batch.filter(pa.array(mask))
        if len(batch) == 0:
            return process_links(batch, strategy, salted)
    if getattr(strategy, "schedule_robots", False) and len(batch):
        # discovery cycle: offer http://host/robots.txt for every host
        # seen in this batch's links — urlseen dedup makes it a
        # first-contact-only fetch; its outlinks (via the web adapter)
        # are the declared sitemaps, whose own links are the parsed /
        # sampled sitemap pages and sub-sitemaps (reference
        # strategy/discovery/__init__.py:284-371).
        link_hosts = hostnames_batch(
            np.asarray(batch["url"].to_pylist(), dtype=object))
        uniq_hosts = np.unique(link_hosts[link_hosts != ""])
        if len(uniq_hosts):
            r_urls = np.asarray(
                [f"http://{h}/robots.txt" for h in uniq_hosts], dtype=object)
            # stable negative seqs (host-derived, 20-bit base like the
            # seed-id budget): disjoint from the tree-path sequence
            # space, deterministic under parallelism, and small enough
            # that sitemap chains keep the same ~9-level depth headroom
            # as seeds (collisions only soften FIFO tie-breaks)
            r_seqs = -(crc32_batch(uniq_hosts).astype(np.int64)
                       & 0xFFFFF) - 1
            extra_cols = {
                "url": pa.array(r_urls, pa.string()),
                "parent_depth": pa.array(
                    np.full(len(r_urls), -1, np.int32), pa.int32()),
                "seq": pa.array(r_seqs, pa.int64()),
                "parent_score": pa.array(
                    np.zeros(len(r_urls)), pa.float64()),
                "n_siblings": pa.array(
                    np.ones(len(r_urls), np.int32), pa.int32()),
                "parent_url": pa.array([""] * len(r_urls), pa.string()),
            }
            extra = pa.table({c: extra_cols[c] for c in batch.column_names})
            batch = pa.concat_tables([batch, extra])
    urls = np.asarray(batch["url"].to_pylist(), dtype=object)
    canon = canonicalize_batch(urls)
    fps = fp64_batch(canon)
    hosts = hostnames_batch(urls)
    crc = crc32_batch(hosts)
    depths = batch["parent_depth"].to_numpy()
    if hasattr(strategy, "link_scores_cash") and "parent_score" in batch.column_names:
        scores = strategy.link_scores_cash(
            batch["parent_score"].to_numpy(), batch["n_siblings"].to_numpy())
    else:
        scores = np.empty(len(urls), dtype=np.float64)
        for d in np.unique(depths):
            m = depths == d
            scores[m] = strategy.link_scores(int(d), urls[m])
    if salted:
        scores = discovery_salted_scores(hosts, scores)
    return (
        batch.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("fingerprint", pa.array(fps, pa.uint64()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("host_crc32", pa.array(crc, pa.int32()))
        .append_column("score", pa.array(scores, pa.float64()))
    )


def route_links(batch: pa.Table, state_actors, queue_actors,
                opic_cash: bool = False) -> pa.Table:
    """Route links to owning shards: fp64 %% N state shards for dedup,
    crc32(host) %% M queue shards for scheduling. Emits one stats row.

    ``opic_cash``: OPIC semantics for duplicate links — instead of
    dropping a duplicate's score, its cash is ADDED to the queued
    request (within-batch: summed into the kept row; cross-batch:
    shipped to the owning queue shard's add_scores)."""
    import pyarrow.compute as pc

    if len(batch) == 0:
        return pa.table({"candidates": [0], "scheduled": [0]})
    fps = batch["fingerprint"].to_numpy()
    if opic_cash:
        # within-batch duplicate cash folds into the first occurrence
        uniq, first_idx, inv = np.unique(fps, return_index=True,
                                         return_inverse=True)
        cash_sum = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(cash_sum, inv, batch["score"].to_numpy())
        keep_order = np.sort(first_idx)
        batch = batch.take(pa.array(keep_order))
        batch = batch.set_column(
            batch.column_names.index("score"), "score",
            pa.array(cash_sum[inv[keep_order]], pa.float64()))
    else:
        _, first_idx = np.unique(fps, return_index=True)  # within-batch dedup
        batch = batch.take(pa.array(np.sort(first_idx)))
    fps = batch["fingerprint"].to_numpy()

    n_states = len(state_actors)
    n_queues = len(queue_actors)
    shard_ids = (fps % np.uint64(n_states)).astype(np.int32)
    qids_all = (batch["host_crc32"].to_numpy().astype(np.int64)
                % n_queues).astype(np.int32)
    entry_all = pa.table(
        {
            "url": batch["url"],
            "fingerprint": batch["fingerprint"],
            "host": batch["host"],
            "score": batch["score"],
            "depth": pc.add(batch["parent_depth"], 1).cast(pa.int32()),
            "seq": batch["seq"],
            "crawl_at": pa.array(np.zeros(len(batch), dtype=np.int64), pa.int64()),
        }
    )
    # Overlap the two RPC hops: as each state shard's dedup verdict
    # lands (ray.wait), immediately ship that shard's survivors to their
    # queue shards — shard A's schedule overlaps shard B's dedup.
    pending = {}
    for sid in np.unique(shard_ids):
        m = np.nonzero(shard_ids == sid)[0]
        pending[state_actors[sid].check_and_mark.remote(fps[m])] = m
    sched_futures = []
    cash_futures = []
    scores_np = batch["score"].to_numpy() if opic_cash else None
    while pending:
        done, _ = ray.wait(list(pending), num_returns=1)
        ref = done[0]
        m = pending.pop(ref)
        res = ray.get(ref)
        rows = m[res]
        if opic_cash:
            # cross-batch duplicates: hand their cash to the queued
            # request on its owning queue shard
            dup_rows = m[~res]
            if len(dup_rows):
                dq = qids_all[dup_rows]
                for qid in np.unique(dq):
                    rr = dup_rows[dq == qid]
                    cash_futures.append(queue_actors[qid].add_scores.remote(
                        fps[rr], scores_np[rr]))
        if not len(rows):
            continue
        sub_qids = qids_all[rows]
        for qid in np.unique(sub_qids):
            rr = rows[sub_qids == qid]
            sched_futures.append(
                queue_actors[qid].schedule_table.remote(
                    entry_all.take(pa.array(rr)))
            )
    scheduled = int(sum(ray.get(sched_futures)))
    if cash_futures:
        ray.get(cash_futures)
    return pa.table({"candidates": [len(batch)], "scheduled": [scheduled]})


@ray.remote
def _split_table(table: pa.Table, k: int):
    """Split a popped shard table into k chunks (may include empties)."""
    n = len(table)
    per = (n + k - 1) // k if n else 0
    out = []
    for i in range(k):
        if per == 0:
            out.append(table.schema.empty_table())
        else:
            out.append(table.slice(i * per, per))
    return tuple(out) if k > 1 else out[0]


@ray.remote
def _table_len(table: pa.Table) -> int:
    return len(table)


@ray.remote
def _mark_crawled(table: pa.Table, state_actors) -> int:
    """Mark a popped round batch CRAWLED on its owning state shards
    (no-downgrade: a concurrent request_error ERROR mark survives —
    see UrlSeenShard.mark_crawled)."""
    if len(table) == 0:
        return 0
    fps = table["fingerprint"].to_numpy()
    n = len(state_actors)
    shard_ids = (fps % np.uint64(n)).astype(np.int32)
    futs = []
    for sid in np.unique(shard_ids):
        m = shard_ids == sid
        futs.append(state_actors[sid].mark_crawled.remote(fps[m]))
    ray.get(futs)
    return len(fps)


def _mark_errors(fps: np.ndarray, state_actors) -> None:
    """request_error wiring for the streaming crawl: failed fetches go
    to states ERROR on their owning shards (reference semantics:
    worker/strategy.py request_error; the page stays seen — it is not
    re-queued — but is distinguishable from CRAWLED for re-crawl or
    audit policies)."""
    n = len(state_actors)
    shard_ids = (fps % np.uint64(n)).astype(np.int32)
    futs = []
    for sid in np.unique(shard_ids):
        m = shard_ids == sid
        futs.append(state_actors[sid].set_states.remote(
            fps[m], np.full(int(m.sum()), States.ERROR, dtype=np.int8)))
    ray.get(futs)


def _seed_table(urls, scores) -> pa.Table:
    urls = np.asarray(list(urls), dtype=object)
    if len(urls) >= SEED_SEQ_OFFSET:
        raise ValueError(
            f"{len(urls)} seeds exceed the {SEED_DIGITS}-digit seed-id "
            "budget; raise SEED_DIGITS (costs depth headroom)"
        )
    canon = canonicalize_batch(urls)
    fps = fp64_batch(canon)
    hosts = hostnames_batch(urls)
    crc = crc32_batch(hosts)
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "canonical_url": pa.array(canon, pa.string()),
            "fingerprint": pa.array(fps, pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "host_crc32": pa.array(crc, pa.int32()),
            "score": pa.array(np.asarray(scores, dtype=np.float64), pa.float64()),
            "parent_depth": pa.array(np.full(n, -1, dtype=np.int32), pa.int32()),
            "seq": pa.array(SEED_SEQ_OFFSET + np.arange(n, dtype=np.int64),
                            pa.int64()),
        }
    )


class RayCrawler:
    def __init__(self, web, out_dir: str, strategy: str = "depth_bfs",
                 profile: str = "max_score", num_state_shards: int = 4,
                 num_queue_shards: int = 4, batch_per_shard: int = 512,
                 max_per_host: int | None = 128, min_hosts: int | None = None,
                 fetch_batch_size: int = 512, exact_states: bool = True,
                 bloom_bits: int = 1 << 24, states_filter: str = "bloom",
                 checkpoint_every: int = 0,
                 salted_scores: bool = False, queue_kwargs: dict | None = None,
                 sink_fs=None, state_fs=None,
                 actor_placement: str | None = None):
        self.web = web
        self.out = Path(out_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        # shared-storage hook for the in-task round-fragment writes (see
        # fetch_and_sink docstring): REQUIRED on a multi-node cluster
        # unless out_dir is a shared mount. A pyarrow.fs.FileSystem or a
        # URI string (resolved via FileSystem.from_uri).
        if isinstance(sink_fs, str):
            from pyarrow import fs as _pafs

            sink_fs, _ = _pafs.FileSystem.from_uri(sink_fs)
        self.sink_fs = sink_fs
        # shared-storage hook for the FRONTIER STATE checkpoints (the
        # north rule's per-partition lineage): actor checkpoints run on
        # the actor's node, so on a multi-node cluster they MUST write
        # through a shared pyarrow FileSystem or the restore can't see
        # them. With state_fs set, checkpoints use a rename-free
        # versioned protocol (checkpoint-rNNNNN/ dirs, meta.json
        # written last as the completeness marker) — object stores
        # have no atomic rename.
        if isinstance(state_fs, str):
            from pyarrow import fs as _pafs

            state_fs, _ = _pafs.FileSystem.from_uri(state_fs)
        self.state_fs = state_fs
        # registry name, strategy class, or ready instance
        if isinstance(strategy, str):
            self.strategy = STRATEGIES[strategy]()
        elif isinstance(strategy, type):
            self.strategy = strategy()
        else:
            self.strategy = strategy
        strategy_name = getattr(self.strategy, "name",
                                type(self.strategy).__name__)
        self.cfg = dict(strategy=strategy_name, profile=profile,
                        num_state_shards=num_state_shards,
                        num_queue_shards=num_queue_shards,
                        batch_per_shard=batch_per_shard,
                        max_per_host=max_per_host)
        # actor_placement='spread' pins shard actors across NODES
        # (SPREAD soft-spreads over the alive node set) — the multi-node
        # layout where dedup/schedule routing becomes a true cross-node
        # exchange; default (None) lets Ray pack them (single-node)
        opts = ({"scheduling_strategy": "SPREAD"}
                if actor_placement == "spread" else {})
        seen_cls = UrlSeenActor.options(**opts) if opts else UrlSeenActor
        queue_cls = QueueActor.options(**opts) if opts else QueueActor
        self.state_actors = [
            seen_cls.remote(i, exact=exact_states,
                            bloom_bits=bloom_bits,
                            filter_kind=states_filter)
            for i in range(num_state_shards)
        ]
        self.queue_actors = [
            queue_cls.remote(i, profile=profile, **(queue_kwargs or {}))
            for i in range(num_queue_shards)
        ]
        self.batch_per_shard = batch_per_shard
        self.max_per_host = max_per_host
        self.min_hosts = min_hosts
        self.fetch_batch_size = fetch_batch_size
        self.salted = salted_scores
        self.round = 0
        self.pages_total = 0
        self.checkpoint_every = checkpoint_every
        self.metrics: list[dict] = []
        import threading

        self._lock = threading.Lock()
        # OPIC-style strategies accumulate duplicate-link cash instead
        # of dropping it at dedup
        self._opic_cash = hasattr(self.strategy, "link_scores_cash")
        # strategies with a link filter need parent_url carried in the
        # link stream (slim otherwise)
        self._filter_links = hasattr(self.strategy, "filter_extracted_links")
        # broadcast once; every task resolves from the local object store
        self._web_ref = ray.put(web)
        self._strategy_ref = ray.put(self.strategy)

    # ------------------------------------------------------------------
    def add_seeds(self, seed_urls) -> int:
        seed_urls = [u for u in seed_urls if u.strip() and not u.startswith("#")]
        if getattr(self.strategy, "schedule_robots", False):
            # discovery cycle: first contact with a seed host fetches its
            # robots.txt (link-discovered hosts get theirs injected in
            # process_links); urlseen dedups repeats
            hosts = np.unique(hostnames_batch(
                np.asarray(seed_urls, dtype=object)))
            seed_urls = seed_urls + [
                f"http://{h}/robots.txt" for h in hosts if h]
        t = _seed_table(seed_urls, self.strategy.seed_scores(seed_urls))
        stats = route_links(t, self.state_actors, self.queue_actors)
        return int(stats["scheduled"][0].as_py())

    def run_round(self) -> dict:
        with self._lock:
            round_no = self.round
            self.round += 1
        return self._run_round(round_no)

    def _run_round(self, round_no: int) -> dict:
        t0 = time.perf_counter()
        pop_refs = [
            q.pop_table.remote(self.batch_per_shard,
                              max_per_host=self.max_per_host,
                              min_hosts=self.min_hosts)
            for q in self.queue_actors
        ]
        # Round size from per-shard metadata tasks — NOT ds.count(),
        # which would add a whole Dataset execution barrier per round.
        # The CRAWLED marking wave is dispatched alongside so it overlaps
        # both the length check and the round pipeline.
        len_refs = [_table_len.remote(r) for r in pop_refs]
        mark_refs = [_mark_crawled.remote(r, self.state_actors) for r in pop_refs]
        n_popped = int(sum(ray.get(len_refs)))
        if not n_popped:
            ray.get(mark_refs)  # no-ops on empty tables
            m = {"round": round_no, "popped": 0, "scheduled": 0, "sec": 0.0}
            with self._lock:
                self.metrics.append(m)
            return m
        # Split each shard's pop into chunks with a cheap remote task (no
        # Dataset repartition stage): the three map stages fuse into ONE
        # operator whose parallelism equals the number of input blocks,
        # so block granularity IS the round's parallelism. Target ~2
        # blocks per CPU; empty chunks cost one no-op task.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        k = max(1, (2 * cpus) // len(self.queue_actors))
        chunk_refs = [
            c for r in pop_refs
            for c in _split_table.options(num_returns=k).remote(r, k)
        ] if k > 1 else list(pop_refs)
        ds = ray.data.from_arrow_refs(chunk_refs)

        round_dir = self.out / f"round={round_no:05d}"
        if self.sink_fs is not None:
            try:  # idempotent re-run after resume, through the sink fs
                self.sink_fs.delete_dir(str(round_dir))
            except (FileNotFoundError, OSError):
                pass
        elif round_dir.exists():
            shutil.rmtree(round_dir)  # idempotent re-run after resume

        stats_rows = (
            ds.map_batches(
                partial(fetch_and_sink, web_ref=self._web_ref,
                        round_dir=str(round_dir),
                        carry_parent_url=self._filter_links,
                        sink_fs=self.sink_fs,
                        state_actors=(self.state_actors
                                      if hasattr(self.web,
                                                 "errors_of_batch")
                                      else None)),
                batch_format="pyarrow", batch_size=None,
            )
            .map_batches(
                partial(process_links, strategy_ref=self._strategy_ref,
                        salted=self.salted),
                batch_format="pyarrow", batch_size=None,
            )
            .map_batches(
                partial(route_links, state_actors=self.state_actors,
                        queue_actors=self.queue_actors,
                        opic_cash=self._opic_cash),
                batch_format="pyarrow", batch_size=None,
            )
            .take_all()  # tiny: one stats row per routed batch
        )
        candidates = int(sum(r["candidates"] for r in stats_rows))
        scheduled = int(sum(r["scheduled"] for r in stats_rows))
        ray.get(mark_refs)
        m = {
            "round": round_no,
            "popped": int(n_popped),
            "candidates": candidates,
            "scheduled": scheduled,
            "sec": round(time.perf_counter() - t0, 3),
        }
        with self._lock:
            self.pages_total += n_popped
            self.metrics.append(m)
        return m

    def run(self, max_rounds: int = 1_000_000, max_pages: int | None = None,
            pipeline_depth: int = 1) -> dict:
        """Sequential BSP rounds (deterministic; conformance mode), or —
        with ``pipeline_depth`` > 1 — overlapped rounds mirroring the
        reference's concurrency (spiders fetch while workers schedule:
        frontera runs batch generation and link ingestion in parallel
        processes). Overlap trades strict round determinism for
        throughput; dedup and politeness invariants still hold because
        they live in the shard actors.

        ``checkpoint_every`` composes with ``pipeline_depth`` > 1 via a
        DRAIN BARRIER: when the submitted-round counter crosses a
        checkpoint boundary the driver stops submitting new rounds,
        lets every in-flight round settle (shard-actor state is then
        quiescent — exactly the BSP invariant the snapshot needs),
        checkpoints, and resumes overlapped submission. The cost is a
        bounded pipeline flush every ``checkpoint_every`` rounds — the
        durability/throughput compromise a 100-TB run needs instead of
        choosing between overlap and resumability."""
        # strategy.finished() hook (reference strategy/__init__.py
        # finished(), polled per work cycle) — evaluated on the driver
        # copy with the run totals, since worker-side strategy copies
        # hold no authoritative global state in this architecture
        def _strategy_done() -> bool:
            fin = getattr(self.strategy, "finished", None)
            return bool(fin(self.pages_total, self.round)) if fin else False

        if pipeline_depth <= 1:
            while self.round < max_rounds:
                m = self.run_round()
                if m["popped"] == 0:
                    break
                if max_pages and self.pages_total >= max_pages:
                    break
                if _strategy_done():
                    break
                if self.checkpoint_every and self.round % self.checkpoint_every == 0:
                    self.checkpoint()
            return {"rounds": self.round, "pages": self.pages_total,
                    "config": self.cfg}

        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        # pop pacing: a pop that lands while upstream scheduling is
        # still in flight returns a fraction of the batch budget, and a
        # cascade of tiny rounds pays the per-round fixed cost many
        # times over (observed: 19 vs 74 rounds for the same crawl).
        # After a small round, hold the next submission briefly so the
        # frontier refills.
        round_target = self.batch_per_shard * len(self.queue_actors)
        small_round = False
        # drain-barrier bookkeeping: `submitted` counts rounds handed to
        # the pool (self.round only advances when a worker thread starts),
        # `next_ckpt` is the next boundary; after restore() the first
        # boundary is the next multiple past the restored round count.
        submitted = self.round
        every = self.checkpoint_every or 0
        next_ckpt = ((submitted // every) + 1) * every if every else 0
        with ThreadPoolExecutor(pipeline_depth) as ex:
            pending = set()
            # `draining` stops refills after an all-empty wave so the
            # in-flight rounds can settle; termination is then decided
            # by ONE synchronous confirm round against a quiet frontier.
            # (Refilling eagerly after empty waves is a livelock: with
            # FIRST_COMPLETED waits the driver resubmits before every
            # empty round lands, so "nothing in flight" never holds —
            # observed spinning forever on a 2-node cluster.)
            draining = False
            while True:
                budget_left = (submitted < max_rounds
                               and not (max_pages and self.pages_total >= max_pages)
                               and not _strategy_done())
                while (budget_left and not draining
                       and len(pending) < pipeline_depth
                       and not (next_ckpt and submitted >= next_ckpt)):
                    if small_round:
                        time.sleep(0.03)
                        small_round = False
                    pending.add(ex.submit(self.run_round))
                    submitted += 1
                if not pending:
                    if next_ckpt and submitted >= next_ckpt:
                        # barrier reached with every in-flight round
                        # settled: actor state is quiescent -> snapshot
                        self.checkpoint()
                        next_ckpt = ((submitted // every) + 1) * every
                        continue
                    if not budget_left:
                        break
                    # quiet frontier (drain wave settled, or submission
                    # blocked): one synchronous confirm round decides
                    if self.run_round()["popped"] == 0:
                        break
                    submitted += 1
                    draining = False
                    continue
                done, pending = wait(pending, return_when=FIRST_COMPLETED)
                results = [f.result() for f in done]
                if all(r["popped"] == 0 for r in results):
                    draining = True  # let in-flight settle, no refills
                elif any(r["popped"] > 0 for r in results):
                    draining = False
                small_round = all(r["popped"] < round_target // 4
                                  for r in results)
        return {"rounds": self.round, "pages": self.pages_total,
                "config": self.cfg}

    # ------------------------------------------------------------------
    def _meta_doc(self) -> str:
        return json.dumps({
            "round": self.round,
            "pages_total": self.pages_total,
            "config": self.cfg,
            "metrics": self.metrics[-50:],
            "sink_manifest": self._sink_manifest(),
        })

    def _state_ck_dirs(self) -> list[tuple[int, int, str, bool]]:
        """Versioned checkpoint dirs behind state_fs, sorted:
        (round_no, seq, path, complete) — complete == meta.json
        present. Names are checkpoint-rNNNNN-SSSS (SSSS = a write
        sequence, so a SAME-round re-checkpoint gets a fresh dir and
        the previous complete version survives until the new one's
        meta lands); bare checkpoint-rNNNNN names parse as seq 0."""
        from pyarrow import fs as _pafs

        sel = _pafs.FileSelector(str(self.out), allow_not_found=True)
        out = []
        for info in self.state_fs.get_file_info(sel):
            name = info.path.rsplit("/", 1)[-1]
            if info.type != _pafs.FileType.Directory or \
                    not name.startswith("checkpoint-r"):
                continue
            token = name[len("checkpoint-r"):]
            rno, _, seq = token.partition("-")
            meta = self.state_fs.get_file_info(f"{info.path}/meta.json")
            out.append((int(rno), int(seq or 0), info.path,
                        meta.type == _pafs.FileType.File))
        return sorted(out)

    def checkpoint(self) -> None:
        if self.state_fs is not None:
            # rename-free versioned protocol for shared/object storage:
            # write a FRESH checkpoint-rNNNNN-SSSS/ dir (seq = 1 + max
            # existing, so even a same-round re-checkpoint never
            # touches the previous complete version), meta.json LAST
            # (the completeness marker), THEN prune strictly older
            # dirs — a crash anywhere mid-write leaves the previous
            # complete checkpoint intact and only an incomplete dir
            # restore() ignores
            existing = self._state_ck_dirs()
            seq = 1 + max((s for _r, s, _p, _c in existing), default=0)
            ck = f"{self.out}/checkpoint-r{self.round:05d}-{seq:04d}"
            self.state_fs.create_dir(ck, recursive=True)
            futs = [a.checkpoint.remote(ck, self.state_fs)
                    for a in self.state_actors]
            futs += [a.checkpoint.remote(ck, self.state_fs)
                     for a in self.queue_actors]
            ray.get(futs)
            with self.state_fs.open_output_stream(f"{ck}/meta.json") as f:
                f.write(self._meta_doc().encode("utf8"))
            for _rno, s, path, _complete in existing:
                if s < seq:
                    try:
                        self.state_fs.delete_dir(path)
                    except (FileNotFoundError, OSError):
                        pass
            return
        ck = self.out / "checkpoint"
        tmp = self.out / "checkpoint.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        futs = [a.checkpoint.remote(str(tmp)) for a in self.state_actors]
        futs += [a.checkpoint.remote(str(tmp)) for a in self.queue_actors]
        ray.get(futs)
        (tmp / "meta.json").write_text(self._meta_doc())
        # rename the old checkpoint aside before promoting the new one:
        # a crash between the two renames still leaves one complete
        # checkpoint on disk (restore() falls back to checkpoint.old)
        old = self.out / "checkpoint.old"
        if old.exists():
            shutil.rmtree(old)
        if ck.exists():
            ck.rename(old)
        tmp.rename(ck)  # meta.json written last inside tmp => completeness marker
        if old.exists():
            shutil.rmtree(old)

    def _sink_fragments(self) -> list[tuple[int, str, int]]:
        """Every sink round fragment as (round_no, path, bytes), sorted.
        When ``sink_fs`` is set the fragments exist ONLY behind that
        filesystem (fetch_and_sink writes through it), so enumeration
        must go through a ``FileSelector`` on it — a local glob would
        silently see nothing on a remote-sink deployment."""
        frags: list[tuple[int, str, int]] = []
        if self.sink_fs is not None:
            from pyarrow import fs as _pafs

            sel = _pafs.FileSelector(str(self.out), recursive=True,
                                     allow_not_found=True)
            for info in self.sink_fs.get_file_info(sel):
                if (info.type != _pafs.FileType.File
                        or not info.path.endswith(".parquet")):
                    continue
                parent = info.path.rsplit("/", 2)[-2]
                if not parent.startswith("round="):
                    continue  # keep/, checkpoint/ live under out too
                frags.append((int(parent.split("=")[1]), info.path,
                              int(info.size)))
        else:
            for f in self.out.glob("round=*/*.parquet"):
                frags.append((int(f.parent.name.split("=")[1]), str(f),
                              f.stat().st_size))
        return sorted(frags)

    def _sink_manifest(self) -> dict:
        """Per-round sink lineage: fragment count + total bytes of every
        COMPLETE round (the north rule's per-partition lineage): enough
        to audit on restore that no finished output was lost or
        truncated between the snapshot and the resume. Round dirs only
        contain immutable fully-written fragments at checkpoint time
        (the drain barrier / BSP invariant), so (files, bytes) is a
        stable signature."""
        man: dict = {}
        for rno, _path, nbytes in self._sink_fragments():
            if rno >= self.round:
                continue  # in-flight rounds are deleted + re-run anyway
            ent = man.setdefault(str(rno), {"files": 0, "bytes": 0})
            ent["files"] += 1
            ent["bytes"] += int(nbytes)
        return man

    def restore(self, strict_manifest: bool = True) -> dict:
        if self.state_fs is not None:
            complete = [(r, s, p) for r, s, p, ok
                        in self._state_ck_dirs() if ok]
            if not complete:
                raise FileNotFoundError(
                    f"no complete checkpoint-r* dir under {self.out} "
                    "on the state filesystem")
            _rno, _seq, ckp = complete[-1]  # latest complete wins
            meta = json.loads(
                self.state_fs.open_input_stream(
                    f"{ckp}/meta.json").read().decode("utf8"))
            futs = [a.restore.remote(ckp, self.state_fs)
                    for a in self.state_actors]
            futs += [a.restore.remote(ckp, self.state_fs)
                     for a in self.queue_actors]
            ray.get(futs)
            return self._finish_restore(meta, strict_manifest)
        ck = self.out / "checkpoint"
        if not (ck / "meta.json").exists() and (
                self.out / "checkpoint.old" / "meta.json").exists():
            # crashed between the checkpoint renames: fall back
            if ck.exists():
                shutil.rmtree(ck)
            (self.out / "checkpoint.old").rename(ck)
        meta = json.loads((ck / "meta.json").read_text())
        futs = [a.restore.remote(str(ck)) for a in self.state_actors]
        futs += [a.restore.remote(str(ck)) for a in self.queue_actors]
        ray.get(futs)
        return self._finish_restore(meta, strict_manifest)

    def _finish_restore(self, meta: dict, strict_manifest: bool) -> dict:
        self.round = meta["round"]
        self.pages_total = meta["pages_total"]
        # rounds at/after the checkpoint re-run deterministically
        if self.sink_fs is not None:
            for rno in {r for r, _p, _b in self._sink_fragments()
                        if r >= self.round}:
                try:
                    self.sink_fs.delete_dir(
                        str(self.out / f"round={rno:05d}"))
                except (FileNotFoundError, OSError):
                    pass
        else:
            for d in self.out.glob("round=*"):
                if int(d.name.split("=")[1]) >= self.round:
                    shutil.rmtree(d)
        # sink-lineage audit: every round the snapshot declared complete
        # must still be present with the recorded fragment count/bytes —
        # a silently vanished or truncated fragment would otherwise
        # resume into a gapped corpus (checkpoints written before the
        # manifest existed skip the audit)
        expected = meta.get("sink_manifest")
        if expected is not None:
            found = self._sink_manifest()
            bad = {r: (expected.get(r), found.get(r))
                   for r in set(expected) | set(found)
                   if expected.get(r) != found.get(r)}
            meta["sink_audit"] = {"ok": not bad, "mismatches": bad}
            if bad and strict_manifest:
                raise RuntimeError(
                    f"sink manifest audit failed on restore: {bad} — "
                    "finished round output was lost or altered since the "
                    "checkpoint; restore(strict_manifest=False) to "
                    "resume anyway and re-crawl is NOT automatic for "
                    "completed rounds")
        return meta

    # ------------------------------------------------------------------
    def export_stats(self, path: str | None = None) -> dict:
        """Stats rollup (reference worker/stats.py semantics): per-shard
        queue counters + driver round metrics -> one JSON document."""
        qstats = ray.get([q.stats.remote() for q in self.queue_actors])
        qcounts = ray.get([q.count.remote() for q in self.queue_actors])
        rollup: dict = {"rounds": self.round, "pages_total": self.pages_total,
                        "frontier_size": int(sum(qcounts)),
                        "urls_seen": self.seen_count(),
                        "per_shard_frontier": [int(c) for c in qcounts],
                        "queue_counters": {}}
        for s in qstats:
            for k, v in s.items():
                rollup["queue_counters"][k] = rollup["queue_counters"].get(k, 0) + v
        rollup["recent_rounds"] = self.metrics[-20:]
        if path:
            Path(path).write_text(json.dumps(rollup, indent=1))
        return rollup

    def frontier_size(self) -> int:
        return sum(ray.get([q.count.remote() for q in self.queue_actors]))

    def seen_count(self) -> int:
        return sum(ray.get([a.seen_count.remote() for a in self.state_actors]))

    def crawled_urls(self):
        """All crawled URLs from the sink (small scales / tests only)."""
        frags = [p for _r, p, _b in self._sink_fragments()]
        if not frags:
            return []
        t = pa.concat_tables([
            pq.read_table(f, columns=["image_id"], filesystem=self.sink_fs)
            for f in frags])
        return t["image_id"].to_pylist()

    def dedup_sink(self, max_hamming: int = 2, blocks: int | None = None,
                   exchange: str | None = None,
                   keeper: str = "min_id") -> dict:
        """Post-crawl phash near-dup pass over the sink fragments (the
        graft's stated purpose for the phash column): pruned
        (image_id, phash) read of every round fragment -> the shared
        64-bit Hamming LSH exchange -> pair-scoped union-find keep-list
        written as partitioned parquet at ``<out>/keep/`` next to the
        round dirs (image_id, keeper_image_id, keep). Downstream
        training-data consumers anti-join on keep=false; the sink
        fragments themselves stay immutable (resumable by round).
        ``keeper='best_area'`` keeps the highest-resolution member of
        each cluster instead of the smallest id (reads w, h too).
        Returns {'images': N, 'dups': D} (dups = rows whose keeper is
        another image)."""
        import ray

        from ..stages.images import sink_keeper_table

        frags = [p for _r, p, _b in self._sink_fragments()]
        keep_dir = self.out / "keep"
        if self.sink_fs is not None:
            try:
                self.sink_fs.delete_dir(str(keep_dir))
            except (FileNotFoundError, OSError):
                pass
        elif keep_dir.exists():
            shutil.rmtree(keep_dir)
        if not frags:
            return {"images": 0, "dups": 0}
        # block count: the sink is many small per-round fragments; one
        # block per fragment would pay per-task overhead x fragments
        cpus = int(ray.cluster_resources().get("CPU", 8))
        cols = ["image_id", "phash"] + (
            ["w", "h"] if keeper == "best_area" else [])
        pages = ray.data.read_parquet(
            frags, columns=cols, filesystem=self.sink_fs,
            override_num_blocks=min(len(frags), 4 * cpus))
        keep_ds = sink_keeper_table(pages, max_hamming=max_hamming,
                                    blocks=blocks, exchange=exchange,
                                    keeper=keeper)
        keep_ds.write_parquet(str(keep_dir), filesystem=self.sink_fs)
        import pyarrow.compute as pc

        images = dups = 0
        for t in ray.data.read_parquet(
                str(keep_dir), columns=["keep"],
                filesystem=self.sink_fs).iter_batches(
                batch_format="pyarrow", batch_size=None):
            images += len(t)
            dups += int(pc.sum(pc.invert(t["keep"])).as_py() or 0)
        return {"images": images, "dups": dups}


def run_crawl(web, out_dir: str, seeds=None, max_rounds: int = 1000, **kwargs) -> dict:
    """Convenience wrapper: seed + run to completion; returns summary."""
    crawler = RayCrawler(web, out_dir, **kwargs)
    crawler.add_seeds(seeds if seeds is not None else web.seeds())
    summary = crawler.run(max_rounds=max_rounds)
    summary["urls_seen"] = crawler.seen_count()
    return summary


# ---------------------------------------------------------------------------
# arrival-seq conformance mode
# ---------------------------------------------------------------------------

class ArrivalSeqFrontier:
    """LocalFrontier twin over the DISTRIBUTED components: one
    UrlSeenActor + one QueueActor, driver-sequenced like the reference
    tester loop (pop-k, then process each page fully in pop order;
    links get increasing arrival seqs).

    This is the conformance bridge the golden-ordering corpus needs:
    RayCrawler's streaming rounds are only set-equivalent to the corpus
    (tree-path seqs are deterministic under parallelism but differ from
    arrival order), whereas this mode reproduces the reference
    sequences byte-for-byte through the same actors, Arrow tables and
    vectorized kernels the streaming engine uses. Single-shard only —
    the corpus implies a single feed partition (tests/backends.py).
    """

    def __init__(self, strategy=None, profile: str = "min_score"):
        from ..strategies import BasicStrategy

        self.strategy = strategy or BasicStrategy()
        self.state_actor = UrlSeenActor.remote(0)
        self.queue_actor = QueueActor.remote(0, profile=profile)
        self._seq = 0
        self.iteration = 0

    def _next_seqs(self, n: int) -> np.ndarray:
        out = np.arange(self._seq, self._seq + n, dtype=np.int64)
        self._seq += n
        return out

    def _schedule(self, urls, scores, depths) -> int:
        urls = np.asarray(list(urls), dtype=object)
        canon = canonicalize_batch(urls)
        fps = fp64_batch(canon)
        keep = ray.get(self.state_actor.check_and_mark.remote(fps))
        if not keep.any():
            return 0
        urls, fps = urls[keep], fps[keep]
        scores = np.asarray(scores, dtype=np.float64)[keep]
        depths = np.asarray(depths, dtype=np.int64)[keep]
        hosts = hostnames_batch(urls)
        seqs = self._next_seqs(len(urls))
        t = pa.table({
            "url": pa.array(urls, pa.string()),
            "fingerprint": pa.array(fps, pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "score": pa.array(scores, pa.float64()),
            "depth": pa.array(depths.astype(np.int32), pa.int32()),
            "seq": pa.array(seqs, pa.int64()),
            "crawl_at": pa.array(np.zeros(len(urls), dtype=np.int64), pa.int64()),
        })
        return int(ray.get(self.queue_actor.schedule_table.remote(t)))

    # -- reference-manager API (mirrors LocalFrontier) ------------------
    def add_seeds(self, seed_urls) -> int:
        seed_urls = [u.strip() for u in seed_urls
                     if u.strip() and not u.startswith("#")]
        if not seed_urls:
            return 0
        scores = self.strategy.seed_scores(seed_urls)
        return self._schedule(seed_urls, scores,
                              np.zeros(len(seed_urls), dtype=np.int64))

    def get_next_requests(self, max_next_requests: int, overused_keys=(),
                          **pop_kwargs):
        from ..state.queue import QueueEntry

        self.iteration += 1
        t = ray.get(self.queue_actor.pop_table.remote(
            max_next_requests, tuple(overused_keys), **pop_kwargs))
        rows = zip(*(t[f].to_pylist() for f in
                     ("url", "fingerprint", "host", "score", "depth",
                      "seq", "crawl_at")))
        return [QueueEntry(*r) for r in rows]

    def page_crawled(self, entry) -> None:
        ray.get(self.state_actor.set_states.remote(
            [entry.fingerprint], [States.CRAWLED]))

    def request_error(self, entry, error=None) -> None:
        ray.get(self.state_actor.set_states.remote(
            [entry.fingerprint], [States.ERROR]))

    def links_extracted(self, parent, links) -> int:
        if not links:
            return 0
        if hasattr(self.strategy, "link_scores_cash"):
            scores = self.strategy.link_scores_cash(
                np.full(len(links), parent.score),
                np.full(len(links), len(links)))
        else:
            scores = self.strategy.link_scores(parent.depth, links)
        depths = np.full(len(links), parent.depth + 1, dtype=np.int64)
        return self._schedule(links, scores, depths)

    def frontier_size(self) -> int:
        return int(ray.get(self.queue_actor.count.remote()))

    def seen_count(self) -> int:
        return int(ray.get(self.state_actor.seen_count.remote()))
