"""Queue shard ordering / robots / checkpoint semantics.

Ordering parity with the reference queue test (tests/contrib/backends/
test_backends.py::test_queue semantics: pop best-scored first)."""

import pyarrow as pa
import pyarrow.parquet as pq

from frontera_ray.state.queue import ENTRY_SCHEMA, QueueEntry, QueueShard


def E(url, fp, host, score, seq, depth=0, crawl_at=0):
    return QueueEntry(url, fp, host, score, depth, seq, crawl_at)


def test_profiles_ordering():
    entries = [E("u1", 1, "a", 0.5, 0), E("u2", 2, "a", 0.7, 1), E("u3", 3, "a", 0.6, 2)]
    for profile, expect in [
        ("fifo", ["u1", "u2", "u3"]),
        ("lifo", ["u3", "u2", "u1"]),
        ("min_score", ["u1", "u3", "u2"]),
        ("max_score", ["u2", "u3", "u1"]),
    ]:
        q = QueueShard(profile=profile)
        q.schedule(entries)
        assert [e.url for e in q.pop(10)] == expect


def test_ties_fifo():
    q = QueueShard(profile="min_score")
    q.schedule([E("u1", 1, "a", 0.5, 0), E("u2", 2, "a", 0.5, 1), E("u3", 3, "a", 0.5, 2)])
    assert [e.url for e in q.pop(3)] == ["u1", "u2", "u3"]


def test_arrow_roundtrip():
    q = QueueShard(profile="max_score")
    t = pa.table({
        "url": ["http://a.com/1", "http://b.com/1"],
        "fingerprint": pa.array([1, 2], pa.uint64()),
        "host": ["a.com", "b.com"],
        "score": [0.1, 0.9],
        "depth": pa.array([0, 0], pa.int32()),
        "seq": pa.array([0, 1], pa.int64()),
        "crawl_at": pa.array([0, 0], pa.int64()),
    })
    assert q.schedule_table(t) == 2
    out = q.pop_table(10)
    assert out.schema.equals(ENTRY_SCHEMA)
    assert out["url"].to_pylist() == ["http://b.com/1", "http://a.com/1"]


def test_robots_gating():
    q = QueueShard(robots_enabled=True)
    q.domains["a.com"].set_robots("User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n")
    n = q.schedule([
        E("http://a.com/ok", 1, "a.com", 0.5, 0),
        E("http://a.com/private/x", 2, "a.com", 0.5, 1),
    ])
    assert n == 1
    assert q.stats["dropped_robots"] == 1
    assert q.domains["a.com"].crawl_delay == 2.0


def test_domain_page_cap_and_ban():
    q = QueueShard(max_pages_per_domain=2)
    n = q.schedule([E(f"http://a.com/{i}", i, "a.com", 0.5, i) for i in range(5)])
    assert n == 2
    q.domains["b.com"].banned = True
    assert q.schedule([E("http://b.com/1", 9, "b.com", 0.5, 9)]) == 0


def test_checkpoint_restore(tmp_path):
    q = QueueShard(shard_id=1, profile="min_score", robots_enabled=True)
    q.domains["a.com"].set_robots("User-agent: *\nCrawl-delay: 1\n")
    q.schedule([E("u1", 1, "a.com", 0.3, 0), E("u2", 2, "b.com", 0.1, 1)])
    q.checkpoint(str(tmp_path))
    r = QueueShard.restore(str(tmp_path), 1, profile="min_score", robots_enabled=True)
    assert r.count() == 2
    assert [e.url for e in r.pop(2)] == ["u2", "u1"]
    assert r.domains["a.com"].crawl_delay == 1.0


def test_domain_capped_sets():
    from frontera_ray.state.queue import DomainMetadata, MAX_SUBDOMAINS

    m = DomainMetadata()
    for i in range(MAX_SUBDOMAINS + 5):
        m.add_subdomain(f"s{i}.a.com")
    assert len(m.subdomains) == MAX_SUBDOMAINS
    assert m.add_subdomain("s0.a.com")  # existing member still accepted
    assert not m.add_redirect("x.com") if len(m.redirect_to) >= 100 else m.add_redirect("x.com")
    assert "x.com" in m.redirect_to


def test_update_scores_reprioritizes():
    """Scoring-log semantics (dont_queue=True): a queued entry's
    priority changes without re-scheduling; lazy re-keying at pop."""
    q = QueueShard(profile="max_score")
    q.schedule([E("u1", 1, "a", 0.3, 0), E("u2", 2, "a", 0.2, 1),
                E("u3", 3, "a", 0.1, 2)])
    q.update_scores([3], [0.9])  # boost the lowest
    got = q.pop(3)
    assert [e.url for e in got] == ["u3", "u1", "u2"]
    assert got[0].score == 0.9
    assert q.count() == 0
    # downgrade path
    q2 = QueueShard(profile="max_score")
    q2.schedule([E("a1", 1, "a", 0.9, 0), E("a2", 2, "a", 0.5, 1)])
    q2.update_scores([1], [0.1])
    assert [e.url for e in q2.pop(2)] == ["a2", "a1"]


def test_update_score_local_frontier():
    from frontera_ray.pipelines.local import LocalFrontier

    f = LocalFrontier(profile="max_score")
    f.add_seeds(["http://a.com/1", "http://a.com/2"])
    entries = {e.url: e for e in []}
    # peek entries by popping and re-scheduling via revisit? simpler:
    # grab from the shard heap directly
    heap_entries = [item[-1] for item in f.queue_shards[0]._heap]
    target = [e for e in heap_entries if e.url.endswith("/2")][0]
    f.update_score(target, 9.0)
    got = f.get_next_requests(2)
    assert [e.url for e in got] == ["http://a.com/2", "http://a.com/1"]


def test_update_scores_checkpoint_no_dup(tmp_path):
    """A pending score override must not duplicate entries through
    checkpoint/restore (stale heap copies are filtered)."""
    q = QueueShard(shard_id=2, profile="max_score")
    q.schedule([E("u1", 1, "a", 0.3, 0), E("u2", 2, "a", 0.2, 1)])
    q.update_scores([1], [0.9])
    q.checkpoint(str(tmp_path))
    r = QueueShard.restore(str(tmp_path), 2, profile="max_score")
    got = r.pop(10)
    assert [e.url for e in got] == ["u1", "u2"]
    assert got[0].score == 0.9
    assert r.count() == 0


def test_crawl_delay_budget_gates_pops():
    """robots Crawl-delay is consumed by pop(): one fetch per host per
    delay window when pops are time-aware (now=...)."""
    from frontera_ray.state.queue import QueueEntry, QueueShard

    q = QueueShard(robots_enabled=True)
    q.domains["slow.com"].set_robots(
        "User-agent: *\nCrawl-delay: 10\nAllow: /\n")
    q.schedule([QueueEntry(f"http://slow.com/{i}", i, "slow.com", 1.0, 0, i)
                for i in range(3)])
    assert q.domains["slow.com"].crawl_delay == 10.0
    assert len(q.pop(3, now=100)) == 1     # first fetch allowed
    assert len(q.pop(3, now=105)) == 0     # inside the delay window
    assert len(q.pop(3, now=110)) == 1     # window elapsed
    assert len(q.pop(3)) == 2 - 1          # timeless pops ignore delay
    # delay never blocks other hosts
    q2 = QueueShard(robots_enabled=True)
    q2.domains["slow.com"].set_robots("User-agent: *\nCrawl-delay: 10\n")
    q2.schedule([QueueEntry("http://slow.com/1", 1, "slow.com", 0.1, 0, 0),
                 QueueEntry("http://slow.com/2", 2, "slow.com", 0.2, 0, 1),
                 QueueEntry("http://fast.com/1", 3, "fast.com", 0.9, 0, 2)])
    got = q2.pop(3, now=0)
    assert [e.host for e in got] == ["slow.com", "fast.com"]


def test_update_scores_sublinear_in_frontier():
    """Score updates must not rescan the whole frontier: batch cost is
    O(k log n), so a 10x bigger frontier must NOT cost ~10x per batch."""
    import time

    from frontera_ray.state.queue import QueueEntry, QueueShard

    # structural proof of laziness: a batch of k updates re-pushes k
    # items (old ones become ghosts) instead of rebuilding the heap
    q = QueueShard()
    q.schedule([QueueEntry(f"u{i}", i, "h", 0.5, 0, i) for i in range(50_000)])
    fps = list(range(0, 2000, 2))
    n = q.update_scores(fps, [0.9] * len(fps))
    assert n == len(fps)
    assert len(q._heap) == 50_000 + n  # k ghosts, no O(frontier) rescan
    assert q.count() == 50_000         # live count unaffected

    # relaxed wall-clock check (best of 3 — CI noise tolerant)
    def batch_cost(frontier_size: int) -> float:
        q = QueueShard()
        q.schedule([QueueEntry(f"u{i}", i, "h", 0.5, 0, i)
                    for i in range(frontier_size)])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q.update_scores(fps, [0.9] * len(fps))
            q.update_scores(fps, [0.1] * len(fps))
            best = min(best, (time.perf_counter() - t0) / 2)
        return best

    small, big = batch_cost(20_000), batch_cost(200_000)
    assert big < small * 6, (small, big)  # O(frontier) would be ~10x


def test_add_scores_accumulates_cash():
    """OPIC cash addition: add_scores ADDS to a queued entry's priority
    (update_scores replaces); cash for popped fps is dropped."""
    from frontera_ray.state.queue import QueueEntry, QueueShard

    q = QueueShard(profile="max_score")
    q.schedule([QueueEntry("u1", 1, "h", 0.2, 0, 0),
                QueueEntry("u2", 2, "h", 0.5, 0, 1)])
    assert q.add_scores([1, 1, 99], [0.4, 0.1, 1.0]) == 2  # 99 not queued
    # u1 now 0.2+0.4+0.1 = 0.7 > u2's 0.5 -> pops first under max_score
    got = q.pop(2)
    assert [e.url for e in got] == ["u1", "u2"]
    assert abs(got[0].score - 0.7) < 1e-12
    assert q.count() == 0
    # cash after pop is dropped
    assert q.add_scores([1], [0.5]) == 0


def test_crawl_delay_respected_in_min_hosts_deepening():
    """Broad-crawl (min_hosts) deepening must honor the Crawl-delay
    budget too — a host inside its delay window is skipped, not
    re-fetched."""
    from frontera_ray.state.queue import QueueEntry, QueueShard

    q = QueueShard(profile="max_score", robots_enabled=True)
    q.domains["a.test"].set_robots("User-agent: *\nCrawl-delay: 100\n")
    q.schedule([QueueEntry("http://a.test/1", 1, "a.test", 0.9, 0, 0),
                QueueEntry("http://a.test/2", 2, "a.test", 0.8, 0, 1),
                QueueEntry("http://b.test/1", 3, "b.test", 0.1, 0, 2)])
    assert [e.host for e in q.pop(1, now=0)] == ["a.test"]
    # deepening for 2 hosts at now=1: a.test is delay-blocked, only b
    got = q.pop(2, now=1, min_hosts=2)
    assert [e.host for e in got] == ["b.test"]
    # window over: a.test/2 becomes poppable
    assert [e.url for e in q.pop(2, now=100)] == ["http://a.test/2"]


def test_crawl_delay_and_overused_parking_interaction():
    """Parking must not burn the crawl-delay budget (nothing was
    fetched), and serving parked entries must consume it."""
    from frontera_ray.state.queue import QueueEntry, QueueShard

    q = QueueShard(profile="max_score", robots_enabled=True)
    q.domains["s.test"].set_robots("User-agent: *\nCrawl-delay: 50\n")
    q.schedule([QueueEntry("http://s.test/1", 1, "s.test", 0.9, 0, 0),
                QueueEntry("http://x.test/1", 2, "x.test", 0.5, 0, 1)])
    # s.test overused: its entry parks WITHOUT spending the delay window
    got = q.pop(2, overused_keys=["s.test"], now=0)
    assert [e.host for e in got] == ["x.test"]
    assert q.domains["s.test"].next_fetch_at == 0.0  # budget untouched
    # slot freed: parked entry serves and NOW consumes the budget
    got2 = q.pop(2, now=10)
    assert [e.host for e in got2] == ["s.test"]
    assert q.domains["s.test"].next_fetch_at == 60.0
    # a still-hot delay window blocks the parked queue too
    q.schedule([QueueEntry("http://s.test/2", 3, "s.test", 0.9, 0, 2)])
    got3 = q.pop(2, overused_keys=["s.test"], now=20)  # parks /2
    assert got3 == []
    assert [e.url for e in q.pop(2, now=30)] == []      # window hot
    assert [e.url for e in q.pop(2, now=60)] == ["http://s.test/2"]


def test_domains_blacklist_param():
    """DOMAINS_BLACKLIST consumer: blacklisted hosts are dropped at
    schedule time on both the scalar and the Arrow bulk path."""
    import pyarrow as pa

    from frontera_ray.state.queue import QueueEntry, QueueShard

    q = QueueShard(domains_blacklist=["Bad.test"])
    n = q.schedule([QueueEntry("http://bad.test/1", 1, "bad.test", 1.0, 0, 0),
                    QueueEntry("http://ok.test/1", 2, "ok.test", 1.0, 0, 1)])
    assert n == 1 and q.stats["dropped_blacklist"] == 1
    t = pa.table({
        "url": ["http://bad.test/2", "http://ok.test/2"],
        "fingerprint": pa.array([3, 4], pa.uint64()),
        "host": ["bad.test", "ok.test"],
        "score": [0.5, 0.5],
        "depth": pa.array([0, 0], pa.int32()),
        "seq": pa.array([2, 3], pa.int64()),
        "crawl_at": pa.array([0, 0], pa.int64()),
    })
    assert q.schedule_table(t) == 1
    assert {e.host for e in q.pop(10)} == {"ok.test"}


def test_blacklist_registrable_domain():
    """Blacklisting a registrable domain drops subdomain hosts too
    (reference matches meta['domain']['name'], so 'example.com' covers
    'www.example.com') — scalar, gated and bulk paths."""
    q = QueueShard(domains_blacklist=["example.com"])
    n = q.schedule([
        QueueEntry("http://www.example.com/a", 1, "www.example.com", 1.0, 0, 0),
        QueueEntry("http://example.com/b", 2, "example.com", 1.0, 0, 1),
        QueueEntry("http://examplexcom.net/c", 3, "examplexcom.net", 1.0, 0, 2),
    ])
    assert n == 1 and q.stats["dropped_blacklist"] == 2
    # gated path (robots_enabled forces _schedule_gated)
    qg = QueueShard(domains_blacklist=["example.com"], robots_enabled=True)
    t = pa.table({
        "url": ["http://sub.example.com/1", "http://ok.test/1"],
        "fingerprint": pa.array([5, 6], pa.uint64()),
        "host": ["sub.example.com", "ok.test"],
        "score": [0.5, 0.5],
        "depth": pa.array([0, 0], pa.int32()),
        "seq": pa.array([0, 1], pa.int64()),
        "crawl_at": pa.array([0, 0], pa.int64()),
    })
    assert qg.schedule_table(t) == 1
    assert {e.host for e in qg.pop(10)} == {"ok.test"}


def test_opic_cash_buffered_across_schedule_race():
    """OPIC cash arriving BEFORE the entry is scheduled (cross-batch
    race: Ray gives no cross-caller ordering) is buffered and folded
    into the score at schedule time, on both schedule paths."""
    q = QueueShard(profile="max_score")
    q.add_scores([11], [0.25])          # entry not queued yet
    assert q.stats["cash_buffered"] == 1
    q.schedule([QueueEntry("http://a.test/1", 11, "a.test", 0.5, 0, 0)])
    assert q.stats["cash_folded"] == 1
    got = q.pop(1)
    assert got[0].score == 0.75
    # bulk path
    q2 = QueueShard(profile="max_score")
    q2.add_scores([21], [0.1])
    t = pa.table({
        "url": ["http://b.test/1"], "fingerprint": pa.array([21], pa.uint64()),
        "host": ["b.test"], "score": [0.4],
        "depth": pa.array([0], pa.int32()), "seq": pa.array([0], pa.int64()),
        "crawl_at": pa.array([0], pa.int64()),
    })
    q2.schedule_table(t)
    assert q2.pop(1)[0].score == 0.5


def test_opic_cash_reaches_parked_entries():
    """Cash for an entry parked in the overused buffer is folded when
    the entry is served from parking (previously silently dropped)."""
    q = QueueShard()
    q.schedule([QueueEntry("http://hot.test/1", 7, "hot.test", 0.5, 0, 0)])
    parked = q.pop(1, overused_keys=["hot.test"])
    assert parked == []                  # entry went to the buffer
    q.add_scores([7], [0.2])             # fp no longer live -> buffered
    got = q.pop(1)                       # slot free again -> served
    assert got[0].score == 0.7 and q.stats["cash_folded"] == 1


def test_opic_cash_buffer_bounded():
    from frontera_ray.state.queue import MAX_PENDING_CASH

    q = QueueShard()
    fps = list(range(MAX_PENDING_CASH + 10))
    q.add_scores(fps, [0.1] * len(fps))
    assert len(q._cash_pending) == MAX_PENDING_CASH
    assert q.stats["cash_evicted"] == 10
    # oldest evicted first
    assert 0 not in q._cash_pending and fps[-1] in q._cash_pending


def test_domain_cache_two_generation_bounded():
    """Endurance: 10^5 distinct hosts with robots bodies keep resident
    domain metadata bounded at O(2 x cap); politeness state survives
    eviction via lazy spill reload."""
    q = QueueShard(robots_enabled=True,
                   robots_provider=lambda h: "User-agent: *\nCrawl-delay: 2\n",
                   domain_cache_size=500)
    for i in range(100_000):
        host = f"h{i}.test"
        q.schedule([QueueEntry(f"http://{host}/", i, host, 0.5, 0, i)])
    cache = q.domains
    assert len(cache._gen1) <= 500 and len(cache._gen2) <= 500
    assert cache.spills > 0
    # state for an early (spilled) host is intact on touch
    m = cache.get("h0.test")
    assert m is not None and m.queued_pages == 1 and m.crawl_delay == 2.0
    assert "h0.test" in cache._gen1      # promoted back to live gen
    assert len(cache._gen1) <= 500 and len(cache._gen2) <= 500


def test_domain_cache_spill_compaction(tmp_path):
    """Spill disk is bounded under churn: promoting spilled hosts back
    to the live generation leaves stale fragment rows behind; once
    stale rows outnumber live spilled rows the sparse fragments are
    merge-compacted and fully-dead fragments deleted. Every host must
    stay resolvable throughout (a fragment with remaining live rows
    must never be unlinked)."""
    from frontera_ray.state.queue import DomainMetadata, TwoGenDomainCache

    cache = TwoGenDomainCache(cap=10, spill_dir=str(tmp_path))
    n = 300
    for i in range(n):
        cache[f"h{i}.test"].queued_pages = i
    assert cache.spills > 0
    # long-tail churn: every 10th host goes cold (stays spilled), the
    # rest are repeatedly promoted — each promotion strands a stale row
    # next to a cold host, so fragments go sparse instead of draining
    hot = [i for i in range(n) if i % 10]
    for _ in range(3):
        for i in hot:
            m = cache.get(f"h{i}.test")
            assert m is not None and m.queued_pages == i
    assert cache.compactions > 0
    # disk holds ~O(live spilled rows), not O(total rotations)
    live_spilled = len(cache._spill_index)
    frag_rows = sum(pq.read_metadata(f).num_rows
                    for f in tmp_path.glob("frag-*.parquet"))
    assert frag_rows <= 2 * max(live_spilled, cache.cap) + 2 * cache.cap
    assert sum(cache._frag_live.values()) == live_spilled
    # on-disk fragment set matches the tracked set exactly
    on_disk = {int(f.stem.split("-")[1]) for f in tmp_path.glob("frag-*.parquet")}
    assert on_disk == set(cache._frag_total)
    # partial promotion must not unlink a fragment others still live in
    for i in range(n):
        assert cache.get(f"h{i}.test").queued_pages == i


def test_domain_cache_checkpoint_includes_spilled(tmp_path):
    q = QueueShard(robots_enabled=True, domain_cache_size=10)
    for i in range(50):
        host = f"d{i}.test"
        q.schedule([QueueEntry(f"http://{host}/", i, host, 0.5, 0, i)])
    q.domains["d0.test"].banned = True   # touch + mutate an early host
    q.checkpoint(str(tmp_path))
    r = QueueShard.restore(str(tmp_path), 0, domain_cache_size=10)
    assert r.domains["d0.test"].banned
    assert r.domains["d42.test"].queued_pages == 1


def test_serve_pending_no_resort(monkeypatch):
    """_serve_pending must not re-sort the parked key set per call
    (the maintained sorted list is the structure)."""
    import builtins

    q = QueueShard()
    for i in range(500):
        host = f"p{i}.test"
        q.schedule([QueueEntry(f"http://{host}/", i, host, 0.5, 0, i)])
    q.pop(500, overused_keys=[f"p{i}.test" for i in range(500)])  # park all
    assert len(q._pending_keys) == 500
    calls = {"n": 0}
    real_sorted = builtins.sorted

    def counting_sorted(*a, **k):
        calls["n"] += 1
        return real_sorted(*a, **k)

    monkeypatch.setattr(builtins, "sorted", counting_sorted)
    served = q.pop(5)
    assert len(served) == 5 and calls["n"] == 0
    # sorted-key serve order is preserved
    assert [e.host for e in served] == real_sorted(
        [e.host for e in served])
