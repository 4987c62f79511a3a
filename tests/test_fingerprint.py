"""Golden fingerprint vectors from the reference suite
(tests/test_fingerprint.py:14-43)."""

import numpy as np

from frontera_ray.fingerprint import (
    crc32_batch,
    fp64,
    fp64_batch,
    get_crc32,
    hostname_local_fingerprint,
    host_shard_batch,
    md5,
    md5_hex_batch,
    sha1,
)

URL1 = ("https://news.yandex.ru/yandsearch?cl4url=top.rbc.ru/politics/"
        "14/07/2015/55a50b509a79473f583e104c&lang=ru&lr=54#fragment")
URL2 = "TestString"
URL3 = "http://www.example.com/some/page倀/"


def test_sha1_golden():
    assert sha1(URL1) == b"880c5e7919cb09e182bd639d724bce6d90db71eb"
    assert sha1(URL2) == b"d598b03bee8866ae03b54cb6912efdfef107fd6d"
    assert sha1(URL3) == b"28bf812b6421a46ee5bcf40c05a82e8f051ab88e"
    assert sha1(URL1.encode()) == b"880c5e7919cb09e182bd639d724bce6d90db71eb"


def test_md5_golden():
    assert md5(URL1) == b"bb82110ce034c1a6ad55a2e73adc322a"
    assert md5(URL2) == b"5b56f40f8828701f97fa4511ddcd25fb"
    assert md5(URL3) == b"5abf5c9aa02d870756032bdec0bd6522"
    assert md5(URL2.encode()) == b"5b56f40f8828701f97fa4511ddcd25fb"


def test_hostname_local_fingerprint_golden():
    assert hostname_local_fingerprint(URL1) == b"1be68ff5587d241e22865288133b37d63ab49e13"
    assert hostname_local_fingerprint(URL2) == b"97ddb3f898d2460d60d3f4d6cb7dbc5d0b8025f8"
    assert hostname_local_fingerprint(URL3) == b"2ed642bb1e215e68ef283a1939252734e84c3c76"
    assert hostname_local_fingerprint(URL1.encode()) == b"1be68ff5587d241e22865288133b37d63ab49e13"


def test_fp64_matches_sha1_prefix():
    for u in (URL1, URL2, URL3):
        assert fp64(u) == int(sha1(u)[:16], 16)
    batch = fp64_batch([URL1, URL2, URL3])
    assert batch.dtype == np.uint64
    assert list(batch) == [fp64(URL1), fp64(URL2), fp64(URL3)]


def test_md5_hex_batch():
    out = md5_hex_batch([URL1, URL2])
    assert out[0] == "bb82110ce034c1a6ad55a2e73adc322a"
    assert out[1] == "5b56f40f8828701f97fa4511ddcd25fb"


def test_crc32_signed_semantics():
    # signed-32 range parity (frontera/utils/misc.py:48-61)
    assert get_crc32("example.com") == crc32_batch(["example.com"])[0]
    vals = crc32_batch(["a", "b", "a", "c"])
    assert vals[0] == vals[2]
    assert vals.dtype == np.int32


def test_host_shard_stability():
    hosts = ["aaa.com", "bbb.com", "aaa.com"]
    shards = host_shard_batch(hosts, 4)
    assert shards[0] == shards[2]
    assert (shards >= 0).all() and (shards < 4).all()
