"""Partitioners: stable key -> shard mappings.

Parity targets (reference frontera/contrib/backends/partitioners.py):

- ``Crc32NamePartitioner``: signed crc32 of the (host)name, Python modulo
  over the partition list; ``None`` key -> first partition. Golden vector:
  key '1be68ff556fd0bbe5802d1a100850da29f7f15b11' over 5 partitions -> 3
  (tests/test_partitioners.py:18-29).
- ``FingerprintPartitioner``: the reference uses CityHash64 (unavailable
  here); the rebuild uses the fp64 integer fingerprint directly
  (``fp % n``) which preserves the property that matters: a fingerprint is
  owned by exactly one shard. Documented deviation.
"""

from __future__ import annotations

from .fingerprint import get_crc32, fp64


class Crc32NamePartitioner:
    def __init__(self, partitions):
        self.partitions = list(partitions)

    def partition(self, key, partitions=None):
        if key is None:
            return self.partitions[0]
        value = get_crc32(key)
        parts = list(partitions) if partitions else self.partitions
        return parts[value % len(parts)]

    __call__ = partition


class FingerprintPartitioner:
    """Partition by the engine-native uint64 fingerprint. Accepts either
    an int fingerprint or a string key (hashed with fp64)."""

    def __init__(self, partitions):
        self.partitions = list(partitions)

    def partition(self, key, partitions=None):
        parts = list(partitions) if partitions else self.partitions
        value = key if isinstance(key, int) else fp64(str(key))
        return parts[value % len(parts)]

    __call__ = partition
