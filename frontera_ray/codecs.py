"""Event-record codecs.

The reference serializes 7 event types over its message bus
(page_crawled 'pc', links_extracted 'le', update_score 'us',
request_error 're', new_job_id 'njid', offset 'of', stats 'st') with
msgpack/json codecs (contrib/backends/remote/codecs/*). In the rebuild
the transport is the Ray object store moving Arrow blocks, so codecs are
only needed at the system boundary (exporting an event log, replaying
one). Two encodings, same logical schema:

- ``json``: line-delimited JSON (human-debuggable)
- ``arrow``: Arrow IPC stream of the event table (zero-copy replay)
- ``msgpack``: the reference's default wire codec
  (settings MESSAGE_BUS_CODEC), import-gated

Round-trip of every event type is the parity obligation (reference
tests/test_codecs.py is a round-trip suite).
"""

from __future__ import annotations

import io
import json

import pyarrow as pa

EVENT_TYPES = ("pc", "le", "us", "re", "njid", "of", "st")

EVENT_SCHEMA = pa.schema(
    [
        ("type", pa.string()),        # one of EVENT_TYPES
        ("fingerprint", pa.uint64()),  # 0 when N/A
        ("url", pa.string()),          # '' when N/A
        ("score", pa.float64()),       # us events
        ("schedule", pa.bool_()),      # us events
        ("error", pa.string()),        # re events
        ("job_id", pa.int64()),        # njid events
        ("partition_id", pa.int32()),  # of events
        ("offset", pa.int64()),        # of events
        ("payload", pa.string()),      # JSON blob: links, stats, extra meta
    ]
)

_DEFAULTS = {"fingerprint": 0, "url": "", "score": 0.0, "schedule": False,
             "error": "", "job_id": 0, "partition_id": 0, "offset": 0,
             "payload": ""}


def _normalize(event: dict) -> dict:
    if event.get("type") not in EVENT_TYPES:
        raise ValueError(f"unknown event type {event.get('type')!r}")
    out = dict(_DEFAULTS)
    out.update({k: event[k] for k in event if k in _DEFAULTS or k == "type"})
    return out


def encode_json(events) -> bytes:
    return "\n".join(json.dumps(_normalize(e), sort_keys=True) for e in events).encode()


def decode_json(data: bytes) -> list[dict]:
    return [json.loads(line) for line in data.decode().splitlines() if line]


def encode_arrow(events) -> bytes:
    rows = [_normalize(e) for e in events]
    table = pa.Table.from_pylist(rows, schema=EVENT_SCHEMA)
    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, EVENT_SCHEMA) as w:
        w.write_table(table)
    return buf.getvalue()


def decode_arrow(data: bytes) -> list[dict]:
    with pa.ipc.open_stream(io.BytesIO(data)) as r:
        table = r.read_all()
    return table.to_pylist()


CODECS = {
    "json": (encode_json, decode_json),
    "arrow": (encode_arrow, decode_arrow),
}

try:
    import msgpack as _msgpack

    def encode_msgpack(events) -> bytes:
        return b"".join(
            _msgpack.packb(_normalize(e), use_bin_type=True) for e in events)

    def decode_msgpack(data: bytes) -> list[dict]:
        unpacker = _msgpack.Unpacker(io.BytesIO(data), raw=False)
        return list(unpacker)

    CODECS["msgpack"] = (encode_msgpack, decode_msgpack)
except ImportError:  # codec optional, like the reference's msgpack extra
    pass


def replay_events(frontier, events) -> dict:
    """Apply a decoded event log to a LocalFrontier — the strategy-worker
    consume loop (collect -> states fetch -> handler -> update) replayed
    from an exported stream. Returns per-type counts."""
    from .state.queue import QueueEntry
    from .state.urlseen import States
    from .urls import hostname_of

    counts: dict[str, int] = {}
    for ev in events:
        t = ev["type"]
        counts[t] = counts.get(t, 0) + 1
        if t == "us" and ev.get("schedule"):
            host = hostname_of(ev["url"])
            e = QueueEntry(ev["url"], ev["fingerprint"], host,
                           ev.get("score", 1.0), 0, ev["fingerprint"] & 0xFFFF)
            keep = frontier._dedup(
                __import__("numpy").array([ev["fingerprint"]], dtype="uint64"))
            if keep[0]:
                # same crc32(host)->shard ownership as LocalFrontier._schedule
                from .fingerprint import host_shard_batch

                n_q = len(frontier.queue_shards)
                sid = host_shard_batch([host], n_q)[0] if n_q > 1 else 0
                frontier.queue_shards[sid].schedule([e])
        elif t == "pc":
            sid = int(ev["fingerprint"]) % len(frontier.state_shards)
            frontier.state_shards[sid].set_states(
                [ev["fingerprint"]], [States.CRAWLED])
        elif t == "re":
            sid = int(ev["fingerprint"]) % len(frontier.state_shards)
            frontier.state_shards[sid].set_states(
                [ev["fingerprint"]], [States.ERROR])
    return counts
