"""Fingerprinting kernels.

Parity targets (re-derived from public hash primitives, no code copied):

- ``sha1`` / ``md5``: hex-digest-as-bytes of the UTF-8 encoded key
  (reference: frontera/utils/fingerprint.py:10-15; golden vectors
  tests/test_fingerprint.py:14-32).
- ``hostname_local_fingerprint``: 4-byte signed crc32 of the hostname +
  16-byte md5 of hostname+path+';'+params+query+fragment, hexlified
  (reference: frontera/utils/fingerprint.py:18-36; golden vectors
  tests/test_fingerprint.py:34-43).
- ``get_crc32``: signed-32 crc32 (reference: frontera/utils/misc.py:48-61).

The rebuild's native fingerprint is ``fp64``: the first 8 bytes of
sha1(canonical_url) as an unsigned 64-bit int (north rule: "64-bit
fingerprint hashing"). Dedup correctness depends only on injectivity, so
the hash function may differ from the reference's 20-byte hex strings.
"""

from __future__ import annotations

import hashlib
import struct
from binascii import hexlify
from zlib import crc32

import numpy as np

from .urls import parse_url


def _to_bytes(s, errors="strict") -> bytes:
    if isinstance(s, bytes):
        return s
    return s.encode("utf8", errors)


def sha1(key) -> bytes:
    return _to_bytes(hashlib.sha1(_to_bytes(key)).hexdigest())


def md5(key) -> bytes:
    return _to_bytes(hashlib.md5(_to_bytes(key)).hexdigest())


def to_signed32(x: int) -> int:
    return x - 0x100000000 if x > 0x7FFFFFFF else x


def get_crc32(name) -> int:
    """Signed crc32 of str/bytes (utf-8, errors ignored)."""
    return to_signed32(crc32(_to_bytes(name, "ignore") if isinstance(name, str) else name))


def hostname_local_fingerprint(key) -> bytes:
    """crc32(host).be32 + md5(host+path+';'+params+query+fragment), hex.

    Groups documents of one host into adjacent 20-byte keys (the
    reference uses this for HBase block-cache locality)."""
    if isinstance(key, bytes):
        key = key.decode("utf8", "ignore")
    parts = parse_url(key)
    # urlparse hostname: lowercased, port/credentials stripped; '-' if absent
    from urllib.parse import urlparse

    hostname = urlparse(key).hostname or "-"
    host_checksum = get_crc32(hostname)
    combined = hostname + parts[2] + ";" + parts[3] + parts[4] + parts[5]
    doc_fprint = hashlib.md5(combined.encode("utf8", "ignore")).digest()
    return hexlify(struct.pack(">i16s", host_checksum, doc_fprint))


# ---------------------------------------------------------------------------
# 64-bit engine-native fingerprints (vectorized batch kernels)
# ---------------------------------------------------------------------------

def fp64(url: str) -> int:
    """First 8 bytes (big-endian) of sha1(url) as uint64."""
    return int.from_bytes(hashlib.sha1(url.encode("utf8")).digest()[:8], "big")


def fp64_batch(urls) -> np.ndarray:
    """uint64 fingerprints for a batch of (canonical) URL strings."""
    _sha1 = hashlib.sha1
    out = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(_sha1(u.encode("utf8")).digest()[:8], "big")
    return out


def md5_hex_batch(urls) -> np.ndarray:
    """Hex md5 strings for a batch (oracle-friendly: matches DuckDB md5())."""
    _md5 = hashlib.md5
    out = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        out[i] = _md5(u.encode("utf8")).hexdigest()
    return out


def crc32_batch(names) -> np.ndarray:
    """Signed crc32 per value, hashing each *unique* value once (hosts
    repeat heavily within a crawl batch)."""
    arr = np.asarray(names, dtype=object)
    uniq, inverse = np.unique(arr, return_inverse=True)
    hashes = np.fromiter(
        (get_crc32(u) for u in uniq), dtype=np.int32, count=len(uniq)
    )
    return hashes[inverse]


def host_shard_batch(hosts, num_shards: int) -> np.ndarray:
    """Queue-shard id per host: signed crc32 mod num_shards with Python
    modulo semantics (non-negative result), mirroring the reference's
    Crc32NamePartitioner (frontera/contrib/backends/partitioners.py:9-19)."""
    return (crc32_batch(hosts).astype(np.int64) % num_shards).astype(np.int32)


def fp_shard_batch(fps: np.ndarray, num_shards: int) -> np.ndarray:
    """State-shard id per uint64 fingerprint (ownership partitioning,
    mirroring spider-log partitioning by fingerprint)."""
    return (fps % np.uint64(num_shards)).astype(np.int32)
