"""Partitioner goldens (reference tests/test_partitioners.py:18-29)."""

from frontera_ray.partitioners import Crc32NamePartitioner, FingerprintPartitioner


def test_crc32name_partitioner_golden():
    parts = list(range(5))
    cp = Crc32NamePartitioner(parts)
    key = "1be68ff556fd0bbe5802d1a100850da29f7f15b11"
    assert cp.partition(key, parts) == 3
    assert cp.partition(None, parts) == 0
    assert cp.partition(key, None) == 3


def test_fingerprint_partitioner_stability():
    parts = list(range(5))
    fp = FingerprintPartitioner(parts)
    key = "1be68ff556fd0bbe5802d1a100850da29f7f15b1"
    p = fp.partition(key, parts)
    assert p == fp.partition(key, None)
    assert 0 <= p < 5
    # int fingerprints partition by modulo directly
    assert fp.partition(12, parts) == 2
