"""Codec round-trip parity (reference tests/test_codecs.py model)."""

import pytest

from frontera_ray.codecs import CODECS, EVENT_TYPES, decode_json, encode_json

EVENTS = [
    {"type": "pc", "fingerprint": 123, "url": "http://a.com/1"},
    {"type": "le", "fingerprint": 123, "url": "http://a.com/1",
     "payload": '["http://a.com/11", "http://a.com/12"]'},
    {"type": "us", "fingerprint": 456, "url": "http://a.com/2",
     "score": 0.75, "schedule": True},
    {"type": "re", "fingerprint": 789, "url": "http://a.com/3",
     "error": "DNS lookup failed"},
    {"type": "njid", "job_id": 7},
    {"type": "of", "partition_id": 2, "offset": 1024},
    {"type": "st", "payload": '{"pages": 10}'},
]


@pytest.mark.parametrize("codec", sorted(CODECS))
def test_roundtrip_all_event_types(codec):
    enc, dec = CODECS[codec]
    out = dec(enc(EVENTS))
    assert len(out) == len(EVENTS)
    assert {e["type"] for e in out} == set(EVENT_TYPES)
    by_type = {e["type"]: e for e in out}
    assert by_type["us"]["score"] == 0.75
    assert by_type["us"]["schedule"] is True
    assert by_type["pc"]["fingerprint"] == 123
    assert by_type["re"]["error"] == "DNS lookup failed"
    assert by_type["njid"]["job_id"] == 7
    assert by_type["of"] ["offset"] == 1024
    assert "http://a.com/11" in by_type["le"]["payload"]


def test_unknown_type_rejected():
    with pytest.raises(ValueError):
        encode_json([{"type": "xx"}])


def test_json_deterministic():
    assert encode_json(EVENTS) == encode_json(EVENTS)
    assert decode_json(b"") == []
