"""Priority-queue shard with politeness.

Re-expresses, from observed public semantics (no code copied):

- frontera's Queue contract (frontera/core/components.py:57-89) and the
  memory heap backend's pop-k (frontera/contrib/backends/memory/
  __init__.py:51-79): pop best-key first, ties FIFO by insertion.
- the OverusedBuffer (frontera/core/__init__.py:28-110): requests whose
  downloader slot (hostname) is overused are parked in per-key deques
  and served first on later calls once the key is no longer overused;
  a pull of k from the underlying queue may return fewer than k when
  some were parked. Per-key and key-count purges bound memory.
- broad-crawl batch shaping (max requests per host / min hosts,
  frontera/contrib/backends/hbase/__init__.py:198-296 semantics).
- robots.txt gating + per-domain metadata (strategy/discovery).

Ordering profiles (SURVEY.md §2.7): 'fifo' (seq asc), 'lifo' (seq desc),
'min_score' (score asc, seq asc — SQLAlchemy/memory-backend semantics the
golden test corpus encodes), 'max_score' (score desc, seq asc — HBase
production semantics).

One shard owns all hosts with ``crc32(host) % num_shards == shard_id``,
so per-host politeness state is local to its shard — the same invariant
frontera gets from hostname-partitioned spider feeds.
"""

from __future__ import annotations

import bisect
import heapq
import random
import urllib.robotparser
from collections import defaultdict, deque
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ENTRY_FIELDS = ("url", "fingerprint", "host", "score", "depth", "seq", "crawl_at")

ENTRY_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("fingerprint", pa.uint64()),
        ("host", pa.string()),
        ("score", pa.float64()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("crawl_at", pa.int64()),
    ]
)


class QueueEntry(tuple):
    """(url, fingerprint, host, score, depth, seq, crawl_at)"""

    __slots__ = ()

    def __new__(cls, url, fingerprint, host, score=1.0, depth=0, seq=0, crawl_at=0):
        return tuple.__new__(cls, (url, int(fingerprint), host, float(score),
                                   int(depth), int(seq), int(crawl_at)))

    url = property(lambda s: s[0])
    fingerprint = property(lambda s: s[1])
    host = property(lambda s: s[2])
    score = property(lambda s: s[3])
    depth = property(lambda s: s[4])
    seq = property(lambda s: s[5])
    crawl_at = property(lambda s: s[6])


MAX_SUBDOMAINS = 10
MAX_REDIRECTS_STORE = 100
# bound on buffered unmatched OPIC cash entries per shard (see
# QueueShard.add_scores) — oldest evicted beyond this
MAX_PENDING_CASH = 65536


class DomainMetadata:
    """Per-host metadata co-located with the host's queue shard
    (robots parser, crawl delay, counters, ban flag, capped subdomain /
    redirect sets — discovery keeps at most 10 subdomains and 100
    redirect netlocs per domain)."""

    __slots__ = ("robots", "robots_body", "crawl_delay", "queued_pages",
                 "banned", "last_pop_seq", "subdomains", "redirect_to",
                 "redirect_from", "next_fetch_at")

    def __init__(self):
        self.robots = None
        self.robots_body = None
        self.crawl_delay = 0.0
        self.queued_pages = 0
        self.banned = False
        self.last_pop_seq = -1
        self.next_fetch_at = 0.0  # crawl-delay budget: earliest next pop
        self.subdomains: set[str] = set()
        self.redirect_to: set[str] = set()
        self.redirect_from: set[str] = set()

    def add_subdomain(self, name: str) -> bool:
        if len(self.subdomains) >= MAX_SUBDOMAINS and name not in self.subdomains:
            return False
        self.subdomains.add(name)
        return True

    def add_redirect(self, netloc: str, outgoing: bool = True) -> bool:
        target = self.redirect_to if outgoing else self.redirect_from
        if len(target) >= MAX_REDIRECTS_STORE and netloc not in target:
            return False
        target.add(netloc)
        return True

    def set_robots(self, body: str, user_agent: str = "*"):
        self.robots_body = body
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        self.robots = rp
        delay = rp.crawl_delay(user_agent)
        if delay:
            self.crawl_delay = float(delay)

    def allowed(self, url: str, user_agent: str = "*") -> bool:
        if self.banned:
            return False
        if self.robots is None:
            return True
        return self.robots.can_fetch(user_agent, url)


class TwoGenDomainCache:
    """Bounded per-shard domain-metadata store with the reference's
    two-generation LRU semantics (hbase/domaincache.py:65-312 — a
    1000-entry live cache whose second generation is batch-written to
    the backend): the live generation holds the most recently touched
    ``cap`` hosts; when it fills, the previous generation is spilled
    to a parquet fragment on local disk and the generations rotate.
    Touches (``get`` / ``[]``) promote second-generation and spilled
    hosts back into the live generation, so politeness state
    (crawl-delay budgets, robots, per-domain counters) survives
    eviction. Resident memory is O(2 x cap) DomainMetadata entries no
    matter how many distinct hosts a long broad crawl contacts —
    previously the first memory wall at 10^8 hosts/shard.

    Fragments are logically append-only (the index, not the file, is
    authoritative — a promoted host leaves a stale row behind), but
    disk growth is bounded: per-fragment live-row counts are tracked,
    a fragment whose last live row is promoted is deleted immediately,
    and when stale rows outnumber live spilled rows the sparse
    fragments are merge-compacted into one. Spill disk is therefore
    O(live spilled hosts), not O(total rotations). ``cap=None``
    disables spilling (plain dict semantics)."""

    _SCHEMA = pa.schema([
        ("host", pa.string()), ("robots_body", pa.string()),
        ("crawl_delay", pa.float64()), ("queued_pages", pa.int64()),
        ("banned", pa.bool_()), ("last_pop_seq", pa.int64()),
        ("next_fetch_at", pa.float64()),
        ("subdomains", pa.list_(pa.string())),
        ("redirect_to", pa.list_(pa.string())),
        ("redirect_from", pa.list_(pa.string())),
    ])

    def __init__(self, cap: int | None = 1000, spill_dir: str | None = None):
        self.cap = cap
        self._gen1: dict[str, DomainMetadata] = {}
        self._gen2: dict[str, DomainMetadata] = {}
        self._spill_dir = spill_dir
        self._spill_index: dict[str, int] = {}  # host -> fragment id
        self._frag_total: dict[int, int] = {}  # fragment -> rows written
        self._frag_live: dict[int, int] = {}   # fragment -> rows still live
        self._next_frag = 0
        self.spills = 0
        self.compactions = 0

    # -- dict-style surface ---------------------------------------------------
    def __contains__(self, host: str) -> bool:
        return (host in self._gen1 or host in self._gen2
                or host in self._spill_index)

    def __len__(self) -> int:
        return len(self._gen1) + len(self._gen2) + len(self._spill_index)

    def get(self, host: str, default=None):
        m = self._gen1.get(host)
        if m is not None:
            return m
        m = self._gen2.pop(host, None)
        if m is None and host in self._spill_index:
            m = self._load_spilled(host)
        if m is None:
            return default
        self._insert(host, m)
        return m

    def __getitem__(self, host: str) -> DomainMetadata:
        m = self.get(host)
        if m is None:
            m = DomainMetadata()
            self._insert(host, m)
        return m

    def items(self):
        """All entries, including spilled ones (loaded fragment by
        fragment, superseded rows skipped) — checkpoint/introspection."""
        seen = set()
        for gen in (self._gen1, self._gen2):
            for h, m in gen.items():
                seen.add(h)
                yield h, m
        by_frag: dict[int, list[str]] = defaultdict(list)
        for h, f in self._spill_index.items():
            if h not in seen:
                by_frag[f].append(h)
        for f, hosts in sorted(by_frag.items()):
            t = pq.read_table(Path(self._spill_dir) / f"frag-{f:06d}.parquet")
            rows = {t["host"][i].as_py(): i for i in range(len(t))}
            for h in hosts:
                yield h, self._row_to_meta(t, rows[h])

    # -- internals ------------------------------------------------------------
    def _insert(self, host: str, m: DomainMetadata) -> None:
        old_frag = self._spill_index.pop(host, None)
        if old_frag is not None:
            self._frag_decr(old_frag)
        if (self.cap is not None and host not in self._gen1
                and len(self._gen1) >= self.cap):
            self._rotate()
        self._gen1[host] = m

    def _frag_path(self, frag: int) -> Path:
        return Path(self._spill_dir) / f"frag-{frag:06d}.parquet"

    def _frag_decr(self, frag: int) -> None:
        live = self._frag_live.get(frag, 0) - 1
        if live <= 0:
            self._frag_live.pop(frag, None)
            self._frag_total.pop(frag, None)
            try:
                self._frag_path(frag).unlink()
            except OSError:
                pass
        else:
            self._frag_live[frag] = live

    def _maybe_compact(self) -> None:
        """Merge sparse fragments once stale rows outnumber the live
        rows still stuck in holed fragments (the actual waste metric —
        fully-live fragments carry no waste and fully-drained ones are
        unlinked by ``_frag_decr``): read only the live rows of every
        fragment with holes, rewrite them as one fragment, delete the
        originals. Bounds spill disk at ~2x the live spilled set."""
        sparse = [f for f in self._frag_total
                  if self._frag_live[f] < self._frag_total[f]]
        if not sparse:
            return
        sparse_live = sum(self._frag_live[f] for f in sparse)
        stale = sum(self._frag_total.values()) - sum(self._frag_live.values())
        if stale <= max(sparse_live, self.cap or 0):
            return
        by_frag: dict[int, list[str]] = defaultdict(list)
        for h, f in self._spill_index.items():
            if f in self._frag_total and self._frag_live[f] < self._frag_total[f]:
                by_frag[f].append(h)
        merged: dict[str, DomainMetadata] = {}
        for f in sorted(by_frag):
            t = pq.read_table(self._frag_path(f))
            rows = {t["host"][i].as_py(): i for i in range(len(t))}
            for h in by_frag[f]:
                merged[h] = self._row_to_meta(t, rows[h])
        for f in sparse:
            self._frag_total.pop(f, None)
            self._frag_live.pop(f, None)
            try:
                self._frag_path(f).unlink()
            except OSError:
                pass
        if merged:
            self._spill(merged)
        self.compactions += 1

    def _rotate(self) -> None:
        if self._gen2:
            self._spill(self._gen2)
            self._maybe_compact()
        self._gen2 = self._gen1
        self._gen1 = {}

    def _spill(self, gen: dict) -> None:
        import tempfile

        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix="domcache-")
        frag = self._next_frag
        self._next_frag += 1
        hosts = list(gen)
        pq.write_table(
            pa.table({
                "host": pa.array(hosts, pa.string()),
                "robots_body": pa.array(
                    [gen[h].robots_body or "" for h in hosts], pa.string()),
                "crawl_delay": pa.array(
                    [gen[h].crawl_delay for h in hosts], pa.float64()),
                "queued_pages": pa.array(
                    [gen[h].queued_pages for h in hosts], pa.int64()),
                "banned": pa.array([gen[h].banned for h in hosts], pa.bool_()),
                "last_pop_seq": pa.array(
                    [gen[h].last_pop_seq for h in hosts], pa.int64()),
                "next_fetch_at": pa.array(
                    [gen[h].next_fetch_at for h in hosts], pa.float64()),
                "subdomains": pa.array(
                    [sorted(gen[h].subdomains) for h in hosts],
                    pa.list_(pa.string())),
                "redirect_to": pa.array(
                    [sorted(gen[h].redirect_to) for h in hosts],
                    pa.list_(pa.string())),
                "redirect_from": pa.array(
                    [sorted(gen[h].redirect_from) for h in hosts],
                    pa.list_(pa.string())),
            }),
            Path(self._spill_dir) / f"frag-{frag:06d}.parquet")
        for h in hosts:
            old = self._spill_index.get(h)
            if old is not None and old != frag:
                self._frag_decr(old)
            self._spill_index[h] = frag
        self._frag_total[frag] = len(hosts)
        self._frag_live[frag] = len(hosts)
        self.spills += 1

    @staticmethod
    def _row_to_meta(t: pa.Table, i: int) -> DomainMetadata:
        m = DomainMetadata()
        body = t["robots_body"][i].as_py()
        if body:
            m.set_robots(body)
        m.crawl_delay = t["crawl_delay"][i].as_py()
        m.queued_pages = t["queued_pages"][i].as_py()
        m.banned = t["banned"][i].as_py()
        m.last_pop_seq = t["last_pop_seq"][i].as_py()
        m.next_fetch_at = t["next_fetch_at"][i].as_py()
        m.subdomains = set(t["subdomains"][i].as_py())
        m.redirect_to = set(t["redirect_to"][i].as_py())
        m.redirect_from = set(t["redirect_from"][i].as_py())
        return m

    def _load_spilled(self, host: str) -> DomainMetadata | None:
        frag = self._spill_index.get(host)
        if frag is None:
            return None
        t = pq.read_table(Path(self._spill_dir) / f"frag-{frag:06d}.parquet")
        idx = pc.index(t["host"], host).as_py()
        if idx < 0:
            return None
        return self._row_to_meta(t, idx)


def _is_robots_url(url: str) -> bool:
    """robots.txt requests are always fetchable — robots gating must
    not block fetching robots itself (a 'Disallow: /' site would
    otherwise deadlock its own discovery)."""
    parts = url.split("://", 1)[-1].split("/", 1)
    return len(parts) > 1 and parts[1] == "robots.txt"


def make_slot_keyer(key_type: str = "domain", ip_resolver=None):
    """host -> downloader-slot key: the hostname, or its resolved IP
    (cached) with key_type='ip' (reference core/__init__.py:10-25 —
    multi-host single-IP sites share one politeness slot)."""
    if key_type not in ("domain", "ip"):
        raise ValueError(f"key_type must be 'domain' or 'ip', got {key_type!r}")
    if key_type == "domain":
        return lambda host: host
    if ip_resolver is None:
        raise ValueError("key_type='ip' needs an ip_resolver(host) hook")
    cache: dict[str, str] = {}

    def keyer(host: str) -> str:
        ip = cache.get(host)
        if ip is None:
            ip = cache[host] = str(ip_resolver(host))
        return ip

    return keyer


class SlotLoadTracker:
    """Downloader-slot load tracking — the piece that DECIDES which keys
    are overused (reference contrib/scrapy/schedulers/frontier.py:
    166-176: a key is overused when active/concurrency >
    OVERUSED_SLOT_FACTOR). Feed dispatches/completions from the fetch
    layer; pass ``overused_keys()`` into ``QueueShard.pop``. Keys are
    hostnames or IPs, matching the queue's ``key_type``."""

    def __init__(self, concurrency: int = 1, slot_factor: float = 5.0,
                 key_type: str = "domain", ip_resolver=None):
        self.concurrency = max(1, int(concurrency))
        self.slot_factor = float(slot_factor)
        self._key = make_slot_keyer(key_type, ip_resolver)
        self.active: dict[str, int] = defaultdict(int)

    def on_dispatch(self, entries) -> None:
        for e in entries:
            self.active[self._key(e.host)] += 1

    def on_complete(self, entry) -> None:
        key = self._key(entry.host)
        n = self.active.get(key, 0)
        if n <= 1:
            self.active.pop(key, None)
        else:
            self.active[key] = n - 1

    def overused_keys(self) -> list[str]:
        return [k for k, n in self.active.items()
                if n / self.concurrency > self.slot_factor]


class QueueShard:
    def __init__(self, shard_id: int = 0, profile: str = "min_score",
                 max_per_key: int | None = None, keep_per_key: int = 1000,
                 max_keys: int | None = None, keep_keys: int = 100,
                 max_pages_per_domain: int | None = None,
                 robots_enabled: bool = False, robots_provider=None,
                 purge_seed: int = 42, key_type: str = "domain",
                 ip_resolver=None, domains_blacklist=None,
                 domain_cache_size: int | None = 1000,
                 record_pops: bool = False):
        self._blacklist = {b.lower() for b in (domains_blacklist or ())}
        # conformance instrumentation: record every popped URL in pop
        # order (per-host ordering tests); off in production
        self.pop_history: list[str] | None = [] if record_pops else None
        self._slot_key = make_slot_keyer(key_type, ip_resolver)
        self.shard_id = shard_id
        self.profile = profile
        self._heap: list[tuple] = []
        # liveness index for O(k log n) score updates: every heap item
        # is (*priority_key, ticket, entry) with a shard-local monotonic
        # ticket; an entry is live iff its ticket is in _live. A
        # re-scored entry gets a fresh ticket, turning the old heap item
        # into a ghost that pops discard — tickets are never reused, so
        # ghosts cannot leak. The ticket between key and entry also
        # makes priority ties strictly FIFO by insertion.
        self._ticket = 0
        self._live: dict[int, QueueEntry] = {}
        self._by_fp: dict[int, set[int]] = defaultdict(set)
        self._pending: dict[str, deque] = defaultdict(deque)
        self._max_per_key = max_per_key
        self._keep_per_key = keep_per_key
        self._max_keys = max_keys
        self._keep_keys = keep_keys
        self._max_pages_per_domain = max_pages_per_domain
        self._robots_enabled = robots_enabled
        self._robots_provider = robots_provider
        # providers that accept (host, sample_url) get the triggering
        # URL so they can pin the exact origin (scheme AND port) — a
        # bare hostname loses a non-default port for hosts first seen
        # on a different worker (HttpWeb.robots_body)
        self._robots_wants_url = False
        if robots_provider is not None:
            import inspect

            try:
                pos = [p for p in inspect.signature(
                           robots_provider).parameters.values()
                       if p.kind in (p.POSITIONAL_ONLY,
                                     p.POSITIONAL_OR_KEYWORD)]
                self._robots_wants_url = len(pos) >= 2
            except (TypeError, ValueError):
                pass
        self._key_type = key_type
        self.domains = TwoGenDomainCache(cap=domain_cache_size)
        self._rng = random.Random(purge_seed)
        self.stats = defaultdict(int)
        # sorted parked-slot keys, maintained incrementally (no per-pop
        # sort); see _serve_pending
        self._pending_keys: list[str] = []
        # OPIC cash that arrived for a fingerprint not currently live
        # (cross-batch schedule race, or an entry parked in the
        # overused buffer): folded into the entry's score on the next
        # schedule / parked serve of that fingerprint. Bounded; oldest
        # buffered fp evicted first (insertion order).
        self._cash_pending: dict[int, float] = {}

    # -- keys ----------------------------------------------------------------
    def _key(self, e: QueueEntry) -> tuple:
        if self.profile == "fifo":
            return (e.seq,)
        if self.profile == "lifo":
            return (-e.seq,)
        if self.profile == "min_score":
            return (e.score, e.seq)
        if self.profile == "max_score":
            return (-e.score, e.seq)
        raise ValueError(f"unknown profile {self.profile!r}")

    def _blacklisted(self, host: str) -> bool:
        """Match the full hostname AND the registrable domain — the
        reference blacklists against the domain middleware's
        ``meta['domain']['name']`` (the registrable domain), so
        blacklisting ``example.com`` drops ``www.example.com`` too
        (worker/components/batch_generator.py:97-109)."""
        h = host.lower()
        if h in self._blacklist:
            return True
        from ..urls import _split_host

        return _split_host(h)[0] in self._blacklist

    # -- scheduling ----------------------------------------------------------
    def _domain_meta(self, host: str,
                     sample_url: str | None = None) -> DomainMetadata:
        """Lazily initialize per-host metadata; with a robots_provider,
        the host's robots.txt is fetched once on first contact (the
        discovery pattern: robots before pages). ``sample_url`` — any
        queued URL for the host — is forwarded to two-arg providers so
        the robots fetch hits the URL's true origin."""
        known = host in self.domains
        meta = self.domains[host]
        if not known and self._robots_provider is not None:
            body = (self._robots_provider(host, sample_url)
                    if self._robots_wants_url
                    else self._robots_provider(host))
            if body:
                lines = body.splitlines()
                from ..filters import is_valid_robotstxt

                if is_valid_robotstxt(lines):
                    meta.set_robots(body)
        return meta

    def schedule(self, entries) -> int:
        """Push a batch of QueueEntry; applies robots gating / domain
        caps / ban flags. Returns the number actually queued."""
        n = 0
        for e in entries:
            if self._blacklist and self._blacklisted(e.host):
                self.stats["dropped_blacklist"] += 1
                continue
            meta = self._domain_meta(e.host, e.url) if (
                self._robots_enabled or self._max_pages_per_domain
            ) else None
            if meta is not None:
                if meta.banned:
                    self.stats["dropped_banned"] += 1
                    continue
                if (self._robots_enabled and not meta.allowed(e.url)
                        and not _is_robots_url(e.url)):
                    self.stats["dropped_robots"] += 1
                    continue
                if (self._max_pages_per_domain is not None
                        and meta.queued_pages >= self._max_pages_per_domain):
                    self.stats["dropped_domain_cap"] += 1
                    continue
                meta.queued_pages += 1
            self._push_live(e)
            n += 1
        self.stats["scheduled"] += n
        return n

    def _fold_cash(self, e: QueueEntry) -> QueueEntry:
        """Fold buffered OPIC cash (see _cash_pending) into an entry's
        score at (re-)schedule / parked-serve time."""
        cash = self._cash_pending.pop(e.fingerprint, None)
        if not cash:
            return e
        self.stats["cash_folded"] += 1
        return QueueEntry(e.url, e.fingerprint, e.host, e.score + cash,
                          e.depth, e.seq, e.crawl_at)

    def _push_live(self, e: QueueEntry) -> None:
        if self._cash_pending:
            e = self._fold_cash(e)
        t = self._ticket
        self._ticket += 1
        self._live[t] = e
        self._by_fp[e.fingerprint].add(t)
        heapq.heappush(self._heap, (*self._key(e), t, e))

    def _schedule_gated(self, rows) -> int:
        """Batch path for robots/domain-cap gating: group rows by host so
        per-host metadata (robots parser, counters) is touched once per
        host instead of once per row; per-row work is only the robots
        can_fetch call for hosts that actually have a parser."""
        by_host: dict[str, list] = defaultdict(list)
        for r in rows:
            by_host[r[2]].append(r)
        n = 0
        for host, group in by_host.items():
            if self._blacklist and self._blacklisted(host):
                self.stats["dropped_blacklist"] += len(group)
                continue
            meta = self._domain_meta(host, group[0][0])
            if meta.banned:
                self.stats["dropped_banned"] += len(group)
                continue
            if self._robots_enabled and meta.robots is not None:
                kept = []
                for r in group:
                    if meta.allowed(r[0]) or _is_robots_url(r[0]):
                        kept.append(r)
                    else:
                        self.stats["dropped_robots"] += 1
                group = kept
            if self._max_pages_per_domain is not None:
                room = self._max_pages_per_domain - meta.queued_pages
                if room <= 0:
                    self.stats["dropped_domain_cap"] += len(group)
                    continue
                if len(group) > room:
                    self.stats["dropped_domain_cap"] += len(group) - room
                    group = group[:room]
                meta.queued_pages += len(group)
            elif group:
                meta.queued_pages += len(group)
            for r in group:
                self._push_live(tuple.__new__(QueueEntry, r))
                n += 1
        self.stats["scheduled"] += n
        return n

    def update_scores(self, fps, scores) -> int:
        """The reference's scoring-log / ``schedule(..., dont_queue=True)``
        path: change the priority of already-QUEUED requests without
        re-scheduling them. O(k log n) per batch of k updates: the
        re-scored entry replaces its slot in the ``_live`` index and is
        re-pushed; the old heap item becomes a ghost that pops discard
        (identity-checked against ``_live``, so ghosts cannot leak).
        Entries parked in the overused buffer are served FIFO and skip
        updates."""
        n = 0
        for fp, s in zip(fps, scores):
            s = float(s)
            tickets = self._by_fp.get(int(fp))
            if not tickets:
                continue
            for t in list(tickets):
                e = self._live[t]
                if e.score == s:
                    continue
                e2 = QueueEntry(e.url, e.fingerprint, e.host, s,
                                e.depth, e.seq, e.crawl_at)
                del self._live[t]
                tickets.discard(t)
                t2 = self._ticket
                self._ticket += 1
                self._live[t2] = e2
                tickets.add(t2)
                heapq.heappush(self._heap, (*self._key(e2), t2, e2))
                n += 1
        self.stats["score_updates"] += n
        self._maybe_compact()
        return n

    def add_scores(self, fps, deltas) -> int:
        """OPIC cash accumulation: ADD delta to the priority of queued
        requests (duplicate links hand their cash to the already-queued
        request instead of dropping it — Abiteboul et al., "Adaptive
        on-line page importance computation", WWW 2003). Same ghost
        mechanics as update_scores. Cash for fingerprints not currently
        live — a concurrent schedule still in flight (Ray gives no
        cross-caller ordering) or an entry parked in the overused
        buffer — is BUFFERED (bounded, oldest-evicted) and folded into
        the entry's score when that fingerprint is next scheduled or
        served from parking; cash for fingerprints that never return
        (already crawled) ages out of the buffer, matching
        cash-on-crawl semantics."""
        n = 0
        for fp, d in zip(fps, deltas):
            d = float(d)
            if d == 0.0:
                continue
            fp = int(fp)
            tickets = self._by_fp.get(fp)
            if not tickets:
                self._cash_pending[fp] = self._cash_pending.get(fp, 0.0) + d
                self.stats["cash_buffered"] += 1
                if len(self._cash_pending) > MAX_PENDING_CASH:
                    self._cash_pending.pop(next(iter(self._cash_pending)))
                    self.stats["cash_evicted"] += 1
                continue
            for t in list(tickets):
                e = self._live[t]
                e2 = QueueEntry(e.url, e.fingerprint, e.host, e.score + d,
                                e.depth, e.seq, e.crawl_at)
                del self._live[t]
                tickets.discard(t)
                t2 = self._ticket
                self._ticket += 1
                self._live[t2] = e2
                tickets.add(t2)
                heapq.heappush(self._heap, (*self._key(e2), t2, e2))
                n += 1
        self.stats["score_adds"] += n
        self._maybe_compact()
        return n

    def _maybe_compact(self) -> None:
        """Bound ghost accumulation: when over half the heap is stale,
        rebuild it from live items (amortized O(n), rare)."""
        if len(self._heap) > 2 * len(self._live) + 64:
            self._heap = [item for item in self._heap
                          if item[-2] in self._live]
            heapq.heapify(self._heap)

    def _pop_live(self, ticket: int, e: QueueEntry) -> None:
        del self._live[ticket]
        tickets = self._by_fp.get(e.fingerprint)
        if tickets is not None:
            tickets.discard(ticket)
            if not tickets:
                del self._by_fp[e.fingerprint]

    def count(self) -> int:
        return len(self._live) + sum(len(d) for d in self._pending.values())

    # -- crawl-delay budget (robots Crawl-delay -> pacing) -------------------
    def _delay_ok(self, host: str, now) -> bool:
        meta = self.domains.get(host)
        return not (meta is not None and meta.crawl_delay > 0
                    and meta.next_fetch_at > now)

    def _consume_delay(self, host: str, now) -> None:
        meta = self.domains.get(host)
        if meta is not None and meta.crawl_delay > 0:
            meta.next_fetch_at = now + meta.crawl_delay

    # -- OverusedBuffer semantics -------------------------------------------
    def _park(self, e: QueueEntry) -> None:
        slot = self._slot_key(e.host)
        if slot not in self._pending:
            bisect.insort(self._pending_keys, slot)
        self._pending[slot].append(e)
        if self._max_per_key:
            self._check_and_purge(slot)

    def _drop_pending_key(self, key: str) -> None:
        self._pending.pop(key, None)
        i = bisect.bisect_left(self._pending_keys, key)
        if i < len(self._pending_keys) and self._pending_keys[i] == key:
            del self._pending_keys[i]

    def _serve_pending(self, max_n: int, overused: set,
                       now: int | None = None) -> list[QueueEntry]:
        """Serve parked entries round-robin in sorted-key order.
        ``_pending_keys`` is maintained incrementally (insort on park,
        delete on drain) so a pop never re-sorts the parked key set —
        O(eligible keys + served) per call instead of O(K log K) with
        many parked keys."""
        out = []
        if not self._pending:
            return out
        keys = [k for k in self._pending_keys if k not in overused]
        while len(out) < max_n and keys:
            for key in list(keys):
                dq = self._pending.get(key)
                if not dq:
                    keys.remove(key)
                    self._drop_pending_key(key)
                    continue
                # a delay-blocked front entry blocks its key this call
                # (FIFO within the slot must hold)
                if now is not None and not self._delay_ok(dq[0].host, now):
                    keys.remove(key)
                    continue
                e = dq.popleft()
                if self._cash_pending:
                    e = self._fold_cash(e)
                if now is not None:
                    self._consume_delay(e.host, now)
                out.append(e)
                if not dq:
                    keys.remove(key)
                    self._drop_pending_key(key)
                if len(out) >= max_n:
                    break
        return out

    def _check_and_purge(self, key: str) -> None:
        dq = self._pending[key]
        if self._max_per_key is not None and len(dq) > self._max_per_key:
            while len(dq) > self._keep_per_key:
                dq.popleft()
                self.stats["purged"] += 1

    def _check_and_purge_keys(self) -> None:
        if self._max_keys is not None and len(self._pending) > self._max_keys:
            keep = set(self._rng.sample(sorted(self._pending.keys()), self._keep_keys))
            for key in list(self._pending.keys()):
                if key not in keep:
                    del self._pending[key]
                    self.stats["purged_keys"] += 1
            self._pending_keys = sorted(self._pending)

    def _admit(self, item, now, max_per_host, host_counts, overused,
               out, parked, setaside) -> None:
        """Shared admission logic for one popped heap item: ghost
        discard, crawl_at visibility, overused parking (parked entries
        never consume the host's crawl-delay budget — nothing was
        fetched), per-host cap, then the Crawl-delay budget."""
        e: QueueEntry = item[-1]
        if item[-2] not in self._live:
            self.stats["ghosts_discarded"] += 1
            return
        if now is not None and e.crawl_at > now:
            setaside.append(item)
            return
        if overused and self._slot_key(e.host) in overused:
            self._pop_live(item[-2], e)
            parked.append(e)
            return
        if max_per_host is not None and host_counts[e.host] >= max_per_host:
            setaside.append(item)
            return
        if now is not None:
            if not self._delay_ok(e.host, now):
                setaside.append(item)
                return
            self._consume_delay(e.host, now)
        host_counts[e.host] += 1
        self._pop_live(item[-2], e)
        out.append(e)

    def _heap_pop(self, n: int, now: int | None, max_per_host: int | None,
                  host_counts, overused: set):
        """Pop up to n admissible entries; capped / delayed /
        not-yet-visible entries are set aside and re-pushed; overused
        entries are parked (they count toward n — a pull of k returns
        fewer when some got parked, parity with the reference buffer).
        Returns (served, parked)."""
        out: list[QueueEntry] = []
        parked: list[QueueEntry] = []
        setaside: list[tuple] = []
        while len(out) + len(parked) < n and self._heap:
            item = heapq.heappop(self._heap)
            self._admit(item, now, max_per_host, host_counts, overused,
                        out, parked, setaside)
        for item in setaside:
            heapq.heappush(self._heap, item)
        return out, parked

    def pop(self, max_n: int, overused_keys=(), now: int | None = None,
            max_per_host: int | None = None,
            min_hosts: int | None = None) -> list[QueueEntry]:
        """get_next_requests with OverusedBuffer parking.

        1. serve parked requests for keys no longer overused (reference
           serves pending first);
        2. pull ``max_n - served`` from the heap; entries whose host is
           overused are parked (the call may return fewer than max_n —
           parity with the reference buffer).
        3. with ``min_hosts``: broad-crawl iterative deepening — keep
           scanning the heap for entries from NEW hosts until the batch
           spans at least min_hosts distinct hosts (or the heap runs
           dry); skipped same-host entries are re-pushed.
        """
        self._check_and_purge_keys()
        overused = set(overused_keys)
        requests = self._serve_pending(max_n, overused, now)
        if len(requests) == max_n:
            self.stats["popped"] += len(requests)
            return requests
        host_counts = defaultdict(int)
        for r in requests:
            host_counts[r.host] += 1
        pulled, parked = self._heap_pop(max_n - len(requests), now,
                                        max_per_host, host_counts, overused)
        if min_hosts is not None:
            hosts_seen = set(host_counts) | {e.host for e in pulled}
            if len(hosts_seen) < min_hosts:
                setaside = []
                while len(hosts_seen) < min_hosts and self._heap:
                    item = heapq.heappop(self._heap)
                    e: QueueEntry = item[-1]
                    if e.host in hosts_seen and item[-2] in self._live:
                        setaside.append(item)
                        continue
                    n_before = len(pulled)
                    self._admit(item, now, max_per_host, host_counts,
                                overused, pulled, parked, setaside)
                    if len(pulled) > n_before:
                        hosts_seen.add(e.host)
                for item in setaside:
                    heapq.heappush(self._heap, item)
        for e in parked:
            self._park(e)
        requests.extend(pulled)
        self.stats["popped"] += len(requests)
        if self.pop_history is not None:
            self.pop_history.extend(e.url for e in requests)
        return requests

    # -- Arrow interop (used by Ray actors) ---------------------------------
    def schedule_table(self, table: pa.Table) -> int:
        """Bulk schedule from an Arrow batch. Fast path (no robots /
        domain caps): build key+entry items, then either heappush each
        (cheaper for a small batch into a big frontier) or extend +
        heapify once (cheaper when the batch rivals the heap size)."""
        cols = [table[f].to_pylist() for f in ENTRY_FIELDS]
        rows = zip(*cols)
        if self._blacklist and not (self._robots_enabled
                                    or self._max_pages_per_domain):
            # blacklist-only: pre-filter then keep the fast path (the
            # gated path would build DomainMetadata for every host)
            kept = [r for r in rows if not self._blacklisted(r[2])]
            self.stats["dropped_blacklist"] += (len(table) - len(kept))
            rows = iter(kept)
        elif self._robots_enabled or self._max_pages_per_domain:
            return self._schedule_gated(list(rows))
        if self._cash_pending:
            cp = self._cash_pending

            def _fold_row(r):
                cash = cp.pop(r[1], None)
                if not cash:
                    return r
                self.stats["cash_folded"] += 1
                return (r[0], r[1], r[2], r[3] + cash, r[4], r[5], r[6])

            rows = [_fold_row(r) for r in rows]
        profile = self.profile
        live, by_fp = self._live, self._by_fp
        t0 = self._ticket
        if profile == "fifo":
            items = [(r[5], t0 + i, tuple.__new__(QueueEntry, r))
                     for i, r in enumerate(rows)]
        elif profile == "lifo":
            items = [(-r[5], t0 + i, tuple.__new__(QueueEntry, r))
                     for i, r in enumerate(rows)]
        elif profile == "min_score":
            items = [(r[3], r[5], t0 + i, tuple.__new__(QueueEntry, r))
                     for i, r in enumerate(rows)]
        else:  # max_score
            items = [(-r[3], r[5], t0 + i, tuple.__new__(QueueEntry, r))
                     for i, r in enumerate(rows)]
        self._ticket = t0 + len(items)
        for item in items:
            e = item[-1]
            live[item[-2]] = e
            by_fp[e.fingerprint].add(item[-2])
        if len(items) >= len(self._heap):
            self._heap.extend(items)
            heapq.heapify(self._heap)
        else:
            push, heap = heapq.heappush, self._heap
            for item in items:
                push(heap, item)
        self.stats["scheduled"] += len(items)
        return len(items)

    def pop_table(self, max_n: int, overused_keys=(), now: int | None = None,
                  max_per_host: int | None = None,
                  min_hosts: int | None = None) -> pa.Table:
        entries = self.pop(max_n, overused_keys, now, max_per_host, min_hosts)
        if not entries:
            return ENTRY_SCHEMA.empty_table()
        cols = list(zip(*entries))
        return pa.table(
            {name: pa.array(list(col), type=ENTRY_SCHEMA.field(name).type)
             for name, col in zip(ENTRY_FIELDS, cols)}
        )

    # -- checkpoint ----------------------------------------------------------
    def checkpoint(self, directory: str, fs=None) -> None:
        """Persist this shard under ``directory``; ``fs`` (a
        ``pyarrow.fs.FileSystem``) routes through shared storage — the
        multi-node requirement (see UrlSeenShard.checkpoint)."""
        if fs is None:
            Path(directory).mkdir(parents=True, exist_ok=True)
        else:
            fs.create_dir(directory, recursive=True)
        entries = list(self._live.values())  # heap may hold ghosts
        for dq in self._pending.values():
            entries.extend(dq)
        if entries:
            cols = list(zip(*entries))
            t = pa.table({name: pa.array(list(col), type=ENTRY_SCHEMA.field(name).type)
                          for name, col in zip(ENTRY_FIELDS, cols)})
        else:
            t = ENTRY_SCHEMA.empty_table()
        pq.write_table(t, f"{directory}/queue-{self.shard_id:04d}.parquet",
                       filesystem=fs)
        # stream domain rows in bounded chunks: domains.items() walks
        # the resident generations then the spill fragments one file at
        # a time, so the checkpoint never materializes the full host
        # universe (a shard can own millions of spilled hosts)
        dom_schema = pa.schema([
            ("host", pa.string()), ("robots_body", pa.string()),
            ("crawl_delay", pa.float64()), ("queued_pages", pa.int64()),
            ("banned", pa.bool_()),
        ])
        with pq.ParquetWriter(
                f"{directory}/domains-{self.shard_id:04d}.parquet",
                dom_schema, filesystem=fs) as w:
            chunk: list = []

            def flush():
                if not chunk:
                    return
                hosts, bodies, delays, qp, banned = zip(*chunk)
                w.write_table(pa.table(
                    {"host": pa.array(list(hosts), pa.string()),
                     "robots_body": pa.array(list(bodies), pa.string()),
                     "crawl_delay": pa.array(list(delays), pa.float64()),
                     "queued_pages": pa.array(list(qp), pa.int64()),
                     "banned": pa.array(list(banned), pa.bool_())}))
                chunk.clear()

            for h, m in self.domains.items():
                chunk.append((h, m.robots_body or "", m.crawl_delay,
                              m.queued_pages, m.banned))
                if len(chunk) >= 10_000:
                    flush()
            flush()

    @classmethod
    def restore(cls, directory: str, shard_id: int, fs=None,
                **kwargs) -> "QueueShard":
        shard = cls(shard_id, **kwargs)
        t = pq.read_table(f"{directory}/queue-{shard_id:04d}.parquet",
                          filesystem=fs)
        rows = zip(*(t[f].to_pylist() for f in ENTRY_FIELDS))
        for row in rows:
            shard._push_live(QueueEntry(*row))
        dpath = f"{directory}/domains-{shard_id:04d}.parquet"
        if fs is None:
            have_domains = Path(dpath).exists()
        else:
            from pyarrow import fs as _pafs

            have_domains = (fs.get_file_info(dpath).type
                            == _pafs.FileType.File)
        if have_domains:
            dt = pq.read_table(dpath, filesystem=fs)
            for h, body, delay, qp, banned in zip(
                dt["host"].to_pylist(), dt["robots_body"].to_pylist(),
                dt["crawl_delay"].to_pylist(), dt["queued_pages"].to_pylist(),
                dt["banned"].to_pylist(),
            ):
                m = shard.domains[h]
                if body:
                    m.set_robots(body)
                m.crawl_delay = delay
                m.queued_pages = qp
                m.banned = banned
        return shard
