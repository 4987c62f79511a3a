"""Politeness / overused-buffer conformance (reference
tests/test_overused_buffer.py:34-47 and tests/test_core_overused_buffer.py).
"""

from frontera_ray.graphs import GraphManager, SITE_LIST_09
from frontera_ray.pipelines.local import (
    LocalFrontier,
    RateLimitedDownloaderSimulator,
    run_crawl_sequence,
)
from frontera_ray.state.queue import QueueEntry, QueueShard
from frontera_ray.strategies import DFSStrategy
from frontera_ray.urls import hostname_of


def test_overused_crawl_properties():
    """With a rate-1 downloader, no emitted batch may contain a request
    for a host currently reported overused; the crawl still completes
    the full URL set (property parity with the reference test)."""
    g = GraphManager(SITE_LIST_09())
    frontier = LocalFrontier(strategy=DFSStrategy(), profile="min_score")
    sim = RateLimitedDownloaderSimulator(rate=1)
    seq = run_crawl_sequence(frontier, g, max_next_requests=5, downloader=sim)
    all_urls = []
    all_domains = set()
    for requests, iteration, info in seq:
        overused = set(info["overused_keys"])
        for r in requests:
            all_urls.append(r.url)
            all_domains.add(r.host)
            assert r.host not in overused
        assert overused.issubset(all_domains | {hostname_of(u) for u in g.seeds})
    assert set(all_urls) == g.all_urls()
    assert len(all_urls) == len(set(all_urls))


def _entries(spec):
    # spec: list of (url, seq)
    return [QueueEntry(u, i, hostname_of(u), 1.0, 0, s) for i, (u, s) in enumerate(spec)]


def test_buffer_parks_overused_and_serves_later():
    q = QueueShard(profile="fifo")
    q.schedule(_entries([("http://a.com/1", 0), ("http://b.com/1", 1),
                         ("http://a.com/2", 2), ("http://c.com/1", 3)]))
    # a.com overused: pulled entries for it are parked, call may return fewer
    got = q.pop(3, overused_keys={"a.com"})
    assert [e.url for e in got] == ["http://b.com/1"]
    # next call serves parked a.com first once no longer overused
    got = q.pop(2, overused_keys=set())
    assert [e.url for e in got] == ["http://a.com/1", "http://a.com/2"]
    got = q.pop(2, overused_keys=set())
    assert [e.url for e in got] == ["http://c.com/1"]
    assert q.count() == 0


def test_buffer_purge_per_key():
    q = QueueShard(profile="fifo", max_per_key=2, keep_per_key=1)
    q.schedule(_entries([(f"http://a.com/{i}", i) for i in range(5)]))
    q.pop(5, overused_keys={"a.com"})  # all parked; purge keeps last 1
    assert sum(len(d) for d in q._pending.values()) == 1


def test_buffer_purge_keys():
    q = QueueShard(profile="fifo", max_keys=2, keep_keys=1)
    q.schedule(_entries([("http://a.com/1", 0), ("http://b.com/1", 1),
                         ("http://c.com/1", 2)]))
    q.pop(3, overused_keys={"a.com", "b.com", "c.com"})  # 3 pending keys
    q.pop(1, overused_keys={"a.com", "b.com", "c.com"})  # triggers key purge
    assert len(q._pending) == 1


def test_max_per_host_shaping():
    """Broad-crawl per-host cap (BC_MAX_REQUESTS_PER_HOST semantics)."""
    q = QueueShard(profile="fifo")
    q.schedule(_entries(
        [(f"http://a.com/{i}", i) for i in range(10)]
        + [(f"http://b.com/{i}", 10 + i) for i in range(3)]
    ))
    got = q.pop(10, max_per_host=2)
    by_host = {}
    for e in got:
        by_host[e.host] = by_host.get(e.host, 0) + 1
    assert by_host == {"a.com": 2, "b.com": 2}
    assert q.count() == 9  # capped entries were re-pushed


def test_crawl_at_visibility():
    """Future-crawl_at entries invisible until `now` passes (revisit
    support, SURVEY.md §2.7)."""
    q = QueueShard(profile="fifo")
    q.schedule([QueueEntry("http://a.com/1", 1, "a.com", 1.0, 0, 0, crawl_at=100)])
    q.schedule([QueueEntry("http://a.com/2", 2, "a.com", 1.0, 0, 1, crawl_at=0)])
    got = q.pop(10, now=50)
    assert [e.url for e in got] == ["http://a.com/2"]
    got = q.pop(10, now=150)
    assert [e.url for e in got] == ["http://a.com/1"]


def test_min_hosts_iterative_deepening():
    """Broad-crawl shaping: the batch must span min_hosts distinct hosts
    even when one host dominates the score order (BC_MIN_HOSTS
    semantics)."""
    q = QueueShard(profile="max_score")
    entries = [QueueEntry(f"http://big.com/{i}", i, "big.com", 0.9, 0, i)
               for i in range(20)]
    entries += [QueueEntry("http://s1.com/1", 100, "s1.com", 0.1, 0, 100),
                QueueEntry("http://s2.com/1", 101, "s2.com", 0.1, 0, 101)]
    q.schedule(entries)
    got = q.pop(5, min_hosts=3)
    hosts = {e.host for e in got}
    assert hosts == {"big.com", "s1.com", "s2.com"}
    assert len(got) == 7  # 5 score-ordered + 2 deepening picks
    assert q.count() == 15  # everything else re-pushed


def test_min_hosts_no_op_when_diverse():
    q = QueueShard(profile="fifo")
    q.schedule([QueueEntry(f"http://h{i}.com/1", i, f"h{i}.com", 1.0, 0, i)
                for i in range(4)])
    got = q.pop(4, min_hosts=3)
    assert len(got) == 4


def test_ip_slot_keys_park_multihost_site():
    """key_type='ip': hosts resolving to the same IP share one
    politeness slot (reference core/__init__.py key_type semantics) —
    overused_keys are IPs and parking is keyed by IP."""
    from frontera_ray.state.queue import QueueEntry, QueueShard

    ips = {"a.example": "10.0.0.1", "b.example": "10.0.0.1",
           "c.other": "10.0.0.2"}
    q = QueueShard(key_type="ip", ip_resolver=ips.__getitem__)
    q.schedule([QueueEntry("http://a.example/1", 1, "a.example", 0.1, 0, 0),
                QueueEntry("http://b.example/1", 2, "b.example", 0.2, 0, 1),
                QueueEntry("http://c.other/1", 3, "c.other", 0.3, 0, 2)])
    # 10.0.0.1 overused: both a.example and b.example park; c.other serves
    got = q.pop(3, overused_keys=["10.0.0.1"])
    assert [e.host for e in got] == ["c.other"]
    assert q.count() == 2  # two parked
    # slot freed: parked entries served first, FIFO
    got2 = q.pop(3, overused_keys=[])
    assert [e.host for e in got2] == ["a.example", "b.example"]


def test_ip_key_type_requires_resolver():
    import pytest

    from frontera_ray.state.queue import QueueShard

    with pytest.raises(ValueError):
        QueueShard(key_type="ip")
    with pytest.raises(ValueError):
        QueueShard(key_type="bogus")


def test_slot_load_tracker_overuse_formula():
    """active/concurrency > OVERUSED_SLOT_FACTOR marks a key overused
    (reference scheduler formula); completions release the slot."""
    from frontera_ray.state.queue import QueueEntry, SlotLoadTracker

    t = SlotLoadTracker(concurrency=2, slot_factor=2.0)
    es = [QueueEntry(f"http://a.com/{i}", i, "a.com", 1.0, 0, i)
          for i in range(5)]
    t.on_dispatch(es[:4])
    assert t.overused_keys() == []          # 4/2 = 2.0, not > 2.0
    t.on_dispatch([es[4]])
    assert t.overused_keys() == ["a.com"]   # 5/2 = 2.5 > 2.0
    t.on_complete(es[0])
    assert t.overused_keys() == []
    # end-to-end with the queue: overused key parks, release serves
    from frontera_ray.state.queue import QueueShard

    q = QueueShard()
    q.schedule([QueueEntry("http://a.com/x", 50, "a.com", 1.0, 0, 50),
                QueueEntry("http://b.com/x", 51, "b.com", 1.0, 0, 51)])
    got = q.pop(2, overused_keys=t.overused_keys())
    assert len(got) == 2  # nothing overused anymore


def test_slot_load_tracker_ip_keys():
    from frontera_ray.state.queue import QueueEntry, SlotLoadTracker

    ips = {"a.x": "1.1.1.1", "b.x": "1.1.1.1"}
    t = SlotLoadTracker(concurrency=1, slot_factor=1.0, key_type="ip",
                        ip_resolver=ips.__getitem__)
    t.on_dispatch([QueueEntry("http://a.x/1", 1, "a.x", 1.0, 0, 0),
                   QueueEntry("http://b.x/1", 2, "b.x", 1.0, 0, 1)])
    assert t.overused_keys() == ["1.1.1.1"]  # both hosts share the slot
