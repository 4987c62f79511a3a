"""URL-seen / states shard semantics (reference States contract,
frontera/core/components.py:93-134; bloom filter behavior)."""

import numpy as np

from frontera_ray.state.urlseen import BloomFilter, States, UrlSeenShard


def test_check_and_mark_first_wins():
    s = UrlSeenShard()
    fps = np.array([1, 2, 1, 3, 2], dtype=np.uint64)
    keep = s.check_and_mark(fps)
    assert list(keep) == [True, True, False, True, False]  # within-batch dedup
    keep2 = s.check_and_mark(np.array([1, 4], dtype=np.uint64))
    assert list(keep2) == [False, True]
    assert s.get_states(np.array([1], dtype=np.uint64))[0] == States.QUEUED


def test_state_transitions():
    s = UrlSeenShard()
    s.check_and_mark(np.array([10, 11, 12], dtype=np.uint64))
    s.set_states([10], [States.CRAWLED])
    s.set_states([11], [States.ERROR])
    got = s.get_states(np.array([10, 11, 12, 99], dtype=np.uint64))
    assert list(got) == [States.CRAWLED, States.ERROR, States.QUEUED, States.NOT_CRAWLED]


def test_bloom_filter_no_false_negatives():
    bf = BloomFilter(num_bits=1 << 16, num_hashes=5)
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    bf.add_batch(keys)
    assert bf.contains_batch(keys).all()
    other = (np.arange(1000, 2000, dtype=np.uint64)) * np.uint64(2654435761)
    fp_rate = bf.contains_batch(other).mean()
    assert fp_rate < 0.05


def test_bloom_roundtrip():
    bf = BloomFilter(num_bits=1 << 12, num_hashes=3)
    keys = np.array([7, 8, 9], dtype=np.uint64)
    bf.add_batch(keys)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains_batch(keys).all()
    assert bf2.num_bits == bf.num_bits


def test_bloom_mode_shard():
    s = UrlSeenShard(exact=False, bloom_bits=1 << 16)
    fps = np.arange(100, dtype=np.uint64) + np.uint64(1)
    keep = s.check_and_mark(fps)
    assert keep.all()
    keep2 = s.check_and_mark(fps)
    assert not keep2.any()


def test_checkpoint_restore(tmp_path):
    s = UrlSeenShard(shard_id=3)
    s.check_and_mark(np.array([5, 6], dtype=np.uint64))
    s.set_states([5], [States.CRAWLED])
    s.checkpoint(str(tmp_path))
    r = UrlSeenShard.restore(str(tmp_path), 3)
    assert r.get_states(np.array([5, 6, 7], dtype=np.uint64)).tolist() == [
        States.CRAWLED, States.QUEUED, States.NOT_CRAWLED]


def test_bloom_overlay_lru_eviction():
    """Bloom-mode overlay is an LRU: recently-read states survive a
    flush, least-recently-used are evicted; the bloom still answers
    'seen' for evicted keys."""
    import numpy as np

    from frontera_ray.state.urlseen import States, UrlSeenShard

    s = UrlSeenShard(0, exact=False, bloom_bits=1 << 16, overlay_limit=100)
    fps = np.arange(1, 121, dtype=np.uint64)
    assert s.check_and_mark(fps).all()
    # touch the FIRST 10 (oldest) so they become most-recent
    s.get_states(list(range(1, 11)))
    s.flush()  # 120 > 100 -> evict down to 50
    assert len(s.states) == 50
    # the touched keys survived eviction
    assert all(int(f) in s.states for f in range(1, 11))
    # evicted keys: overlay forgets the exact state but bloom remembers
    evicted = [fp for fp in range(11, 121) if fp not in s.states][0]
    assert not s.check_and_mark(np.array([evicted], dtype=np.uint64))[0]
    assert s.get_states([evicted])[0] == States.DEFAULT


def test_cuckoo_filter_fn_free_and_delete():
    """CuckooFilter: no false negatives under load, delete actually
    removes, serialization round-trips table + stash."""
    import numpy as np

    from frontera_ray.state.urlseen import (CuckooFilter,
                                            membership_filter_from_bytes)

    cf = CuckooFilter(num_buckets=1 << 12)  # 16384 slots
    rng = np.random.default_rng(5)
    keys = rng.integers(1, 2**63, 12_000, dtype=np.int64).astype(np.uint64)
    cf.add_batch(keys)
    assert cf.contains_batch(keys).all()  # FN-free, stash included
    assert 0.6 < cf.occupancy() <= 1.0

    # delete half; deleted keys must read absent (no fp aliasing in
    # this fixture), the rest must remain
    half = keys[:6_000]
    removed = cf.delete_batch(half)
    assert removed.all()
    assert cf.contains_batch(keys[6_000:]).all()
    assert not cf.contains_batch(half[:100]).any()

    data = cf.to_bytes()
    cf2 = membership_filter_from_bytes(data)
    assert type(cf2).__name__ == "CuckooFilter"
    assert cf2.contains_batch(keys[6_000:]).all()
    assert (cf2.table == cf.table).all() and cf2.stash == cf.stash


def test_cuckoo_filter_deterministic_inserts():
    import numpy as np

    from frontera_ray.state.urlseen import CuckooFilter

    keys = np.arange(1, 2001, dtype=np.uint64)
    a, b = CuckooFilter(1 << 10), CuckooFilter(1 << 10)
    a.add_batch(keys)
    b.add_batch(keys)
    assert (a.table == b.table).all() and a.stash == b.stash


def test_urlseen_shard_cuckoo_mode_first_wins():
    import numpy as np

    from frontera_ray.state.urlseen import UrlSeenShard

    s = UrlSeenShard(0, exact=False, bloom_bits=1 << 20,
                     filter_kind="cuckoo")
    fps = np.arange(10, 5010, dtype=np.uint64)
    assert s.check_and_mark(fps).all()
    assert not s.check_and_mark(fps).any()


def test_urlseen_shard_cuckoo_checkpoint_restore(tmp_path):
    import numpy as np

    from frontera_ray.state.urlseen import CuckooFilter, UrlSeenShard

    s = UrlSeenShard(3, exact=False, bloom_bits=1 << 20,
                     filter_kind="cuckoo")
    fps = np.arange(100, 3100, dtype=np.uint64)
    s.check_and_mark(fps)
    s.checkpoint(str(tmp_path))
    r = UrlSeenShard.restore(str(tmp_path), 3, exact=False)
    assert r.filter_kind == "cuckoo"
    assert isinstance(r.bloom, CuckooFilter)
    assert not r.check_and_mark(fps).any()  # still all seen


def test_unmark_exact_and_cuckoo_allow_revisit():
    import numpy as np
    import pytest as _pytest

    from frontera_ray.state.urlseen import UrlSeenShard

    for kw in (dict(exact=True),
               dict(exact=False, bloom_bits=1 << 20,
                    filter_kind="cuckoo")):
        s = UrlSeenShard(0, **kw)
        fps = np.arange(10, 60, dtype=np.uint64)
        assert s.check_and_mark(fps).all()
        assert not s.check_and_mark(fps).any()
        removed = s.unmark(fps[:20])
        assert removed.all()
        # unmarked fingerprints schedule again exactly once
        assert s.check_and_mark(fps).sum() == 20
        assert not s.check_and_mark(fps).any()

    b = UrlSeenShard(0, exact=False, bloom_bits=1 << 20,
                     filter_kind="bloom")
    b.check_and_mark(np.arange(5, dtype=np.uint64))
    with _pytest.raises(TypeError):
        b.unmark(np.arange(5, dtype=np.uint64))
