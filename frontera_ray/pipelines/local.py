"""LocalFrontier: single-process deterministic frontier engine.

The conformance twin of the distributed Ray engine: identical state
classes (UrlSeenShard / QueueShard) and identical kernels, composed
without actors so golden crawl-ordering sequences from the reference
(tests/backends.py:193-619) can be asserted byte-for-byte.

Lifecycle parity with frontera's LocalFrontierManager loop
(frontera/core/manager.py:486-570):
  add_seeds -> schedule;  get_next_requests -> queue pop;
  per fetched page: page_crawled (state=CRAWLED) then links_extracted
  (dedup via states, schedule NOT_CRAWLED links in order).
"""

from __future__ import annotations

import numpy as np

from ..fingerprint import fp64_batch, fp_shard_batch, host_shard_batch
from ..state.queue import QueueEntry, QueueShard
from ..state.urlseen import States, UrlSeenShard
from ..strategies import BasicStrategy
from ..urls import canonicalize_batch, hostnames_batch


class LocalFrontier:
    def __init__(self, strategy=None, profile: str = "min_score",
                 num_state_shards: int = 1, num_queue_shards: int = 1,
                 queue_kwargs: dict | None = None, max_requests: int = 0,
                 max_next_requests: int = 64):
        self.strategy = strategy or BasicStrategy()
        self.max_next_requests = max_next_requests  # default batch size
        self.state_shards = [UrlSeenShard(i) for i in range(num_state_shards)]
        self.queue_shards = [
            QueueShard(i, profile=profile, **(queue_kwargs or {}))
            for i in range(num_queue_shards)
        ]
        self._seq = 0
        self._depths: dict[int, int] = {}  # fp -> depth of the queued request
        self.max_requests = max_requests
        self.n_requests = 0
        self.iteration = 0

    # ------------------------------------------------------------------
    def _next_seqs(self, n: int) -> np.ndarray:
        out = np.arange(self._seq, self._seq + n, dtype=np.int64)
        self._seq += n
        return out

    def _dedup(self, fps: np.ndarray) -> np.ndarray:
        """Route fingerprints to their owning state shard, first-wins."""
        n_shards = len(self.state_shards)
        if n_shards == 1:
            return self.state_shards[0].check_and_mark(fps)
        shard_ids = fp_shard_batch(fps, n_shards)
        keep = np.zeros(len(fps), dtype=bool)
        for sid in np.unique(shard_ids):
            m = shard_ids == sid
            keep[m] = self.state_shards[sid].check_and_mark(fps[m])
        return keep

    def _schedule(self, urls, scores, depths) -> int:
        urls = np.asarray(urls, dtype=object)
        canon = canonicalize_batch(urls)
        fps = fp64_batch(canon)
        keep = self._dedup(fps)
        if not keep.any():
            return 0
        urls, fps = urls[keep], fps[keep]
        scores = np.asarray(scores, dtype=np.float64)[keep]
        depths = np.asarray(depths, dtype=np.int64)[keep]
        hosts = hostnames_batch(urls)
        seqs = self._next_seqs(len(urls))
        n_q = len(self.queue_shards)
        shard_ids = host_shard_batch(hosts, n_q) if n_q > 1 else np.zeros(len(urls), dtype=int)
        for fp, d in zip(fps, depths):
            self._depths[int(fp)] = int(d)
        scheduled = 0
        for sid in range(n_q):
            m = shard_ids == sid
            if not m.any():
                continue
            entries = [
                QueueEntry(u, f, h, s, d, q)
                for u, f, h, s, d, q in zip(
                    urls[m], fps[m], hosts[m], scores[m], depths[m], seqs[m]
                )
            ]
            scheduled += self.queue_shards[sid].schedule(entries)
        return scheduled

    # -- public API (mirrors the reference manager) --------------------
    def add_seeds(self, seed_urls) -> int:
        seed_urls = [u.strip() for u in seed_urls if u.strip() and not u.startswith("#")]
        if not seed_urls:
            return 0
        scores = self.strategy.seed_scores(seed_urls)
        return self._schedule(seed_urls, scores, np.zeros(len(seed_urls), dtype=np.int64))

    def get_next_requests(self, max_next_requests: int | None = None,
                          overused_keys=(), **pop_kwargs) -> list[QueueEntry]:
        if max_next_requests is None:  # settings MAX_NEXT_REQUESTS default
            max_next_requests = self.max_next_requests
        self.iteration += 1
        if self.max_requests and self.n_requests >= self.max_requests:
            return []
        if self.max_requests:
            max_next_requests = min(max_next_requests,
                                    self.max_requests - self.n_requests)
        out = []
        for q in self.queue_shards:
            out.extend(q.pop(max_next_requests, overused_keys, **pop_kwargs))
        self.n_requests += len(out)
        return out

    def page_crawled(self, entry: QueueEntry) -> None:
        sid = int(entry.fingerprint) % len(self.state_shards)
        self.state_shards[sid].set_states([entry.fingerprint], [States.CRAWLED])

    def request_error(self, entry: QueueEntry, error=None) -> None:
        sid = int(entry.fingerprint) % len(self.state_shards)
        self.state_shards[sid].set_states([entry.fingerprint], [States.ERROR])

    def links_extracted(self, parent: QueueEntry, links) -> int:
        if not links:
            return 0
        if hasattr(self.strategy, "filter_extracted_links"):
            mask = np.asarray(self.strategy.filter_extracted_links(
                np.full(len(links), parent.url, dtype=object),
                np.asarray(links, dtype=object)), dtype=bool)
            links = [l for l, k in zip(links, mask) if k]
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

    def update_score(self, entry: QueueEntry, score: float) -> None:
        """schedule(..., dont_queue=True) semantics: re-prioritize an
        already-queued request without scheduling a new one."""
        n_q = len(self.queue_shards)
        sid = (host_shard_batch([entry.host], n_q)[0] if n_q > 1 else 0)
        self.queue_shards[sid].update_scores([entry.fingerprint], [score])

    def schedule_revisit(self, entry: QueueEntry, crawl_at: int,
                         score: float | None = None) -> None:
        """Revisit support (reference RevisitingBackend semantics): put a
        CRAWLED page back on the queue with a future visibility
        timestamp, bypassing URL-seen dedup. Pops must pass ``now`` so
        the entry stays invisible until due (SURVEY.md §2.7 crawl_at)."""
        n_q = len(self.queue_shards)
        sid = (host_shard_batch([entry.host], n_q)[0] if n_q > 1 else 0)
        e = QueueEntry(entry.url, entry.fingerprint, entry.host,
                       entry.score if score is None else score,
                       entry.depth, self._next_seqs(1)[0], crawl_at)
        self.queue_shards[sid].schedule([e])

    def frontier_size(self) -> int:
        return sum(q.count() for q in self.queue_shards)

    def seen_count(self) -> int:
        return sum(len(s.states) for s in self.state_shards)


# ---------------------------------------------------------------------------
# conformance tester (mirrors frontera/utils/tester.py FrontierTester)
# ---------------------------------------------------------------------------

class BaseDownloaderSimulator:
    def __init__(self):
        self.requests = []

    def update(self, requests):
        self.requests = requests

    def download(self):
        return self.requests

    def downloader_info(self):
        return {"key_type": "domain", "overused_keys": []}

    def idle(self):
        return True


class RateLimitedDownloaderSimulator(BaseDownloaderSimulator):
    """Per-host slots draining ``rate`` requests per iteration; hosts with
    more than ``rate`` pending are reported overused (parity:
    frontera/utils/tester.py:118-153)."""

    def __init__(self, rate: int):
        super().__init__()
        self.rate = rate
        self.slots: dict[str, list] = {}

    def update(self, requests):
        for r in requests:
            self.slots.setdefault(r.host, []).append(r)

    def download(self):
        out = []
        for key in list(self.slots):
            pending = self.slots[key]
            take = min(len(pending), self.rate)
            out.extend(pending[:take])
            del pending[:take]
            if not pending:
                del self.slots[key]
        return out

    def downloader_info(self):
        return {
            "key_type": "domain",
            "overused_keys": [k for k, v in self.slots.items() if len(v) > self.rate],
        }

    def idle(self):
        return not self.slots


def run_crawl_sequence(frontier: LocalFrontier, graph, max_next_requests: int,
                       downloader=None, max_iterations: int = 10_000):
    """Drive the frontier over a GraphManager; returns the list of
    (requests, iteration, overused_keys) per iteration (flatten for the
    URL sequence)."""
    downloader = downloader or BaseDownloaderSimulator()
    frontier.add_seeds(graph.seeds)
    sequence = []
    for _ in range(max_iterations):
        info = downloader.downloader_info()
        requests = frontier.get_next_requests(
            max_next_requests, overused_keys=info["overused_keys"]
        )
        sequence.append((requests, frontier.iteration, info))
        downloader.update(requests)
        for entry in downloader.download():
            if entry.url in getattr(graph, "errors", ()):
                frontier.request_error(entry, "error")
                continue
            frontier.page_crawled(entry)
            frontier.links_extracted(entry, graph.links_of(entry.url))
        if not requests and downloader.idle():
            break
    return sequence


def crawl_url_sequence(graph, strategy, profile, max_next_requests,
                       downloader=None):
    frontier = LocalFrontier(strategy=strategy, profile=profile)
    seq = run_crawl_sequence(frontier, graph, max_next_requests, downloader)
    return [e.url for requests, _, _ in seq for e in requests]
