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


def test_replay_events_into_frontier():
    """Strategy-worker consume-loop equivalence: an exported event log
    replayed into a fresh frontier reproduces the queue/state effects
    (reference tests/test_worker_strategy.py flow)."""
    from frontera_ray.codecs import CODECS, replay_events
    from frontera_ray.pipelines.local import LocalFrontier
    from frontera_ray.state.urlseen import States

    log = [
        {"type": "us", "fingerprint": 11, "url": "http://a.com/1",
         "score": 0.9, "schedule": True},
        {"type": "us", "fingerprint": 11, "url": "http://a.com/1",
         "score": 0.9, "schedule": True},          # duplicate -> deduped
        {"type": "us", "fingerprint": 22, "url": "http://b.com/1",
         "score": 0.5, "schedule": True},
        {"type": "pc", "fingerprint": 11, "url": "http://a.com/1"},
        {"type": "re", "fingerprint": 33, "url": "http://c.com/1",
         "error": "dns"},
    ]
    enc, dec = CODECS["arrow"]
    f = LocalFrontier(profile="max_score")
    counts = replay_events(f, dec(enc(log)))
    assert counts == {"us": 3, "pc": 1, "re": 1}
    assert f.frontier_size() == 2  # duplicate dropped
    import numpy as np

    assert f.state_shards[0].get_states(np.array([11], np.uint64))[0] == States.CRAWLED
    assert f.state_shards[0].get_states(np.array([33], np.uint64))[0] == States.ERROR
    popped = f.get_next_requests(10)
    assert [e.url for e in popped] == ["http://a.com/1", "http://b.com/1"]
