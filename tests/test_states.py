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
