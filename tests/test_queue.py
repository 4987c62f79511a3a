"""Queue shard ordering / robots / checkpoint semantics.

Ordering parity with the reference queue test (tests/contrib/backends/
test_backends.py::test_queue semantics: pop best-scored first)."""

import pyarrow as pa

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
