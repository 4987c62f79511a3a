"""Distributed crawl pipeline tests (Ray session from conftest).

Covers: end-to-end crawl completeness + URL-seen parity with the local
engine, sink payload validation (PSNR/caption invariants), checkpoint /
resume determinism, and politeness caps under sharding."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from frontera_ray.graphs import GraphManager, SITE_LIST_02, SyntheticWeb
from frontera_ray.payload import decode_image, gen_pixels, psnr, caption_of
from frontera_ray.pipelines.local import LocalFrontier, run_crawl_sequence
from frontera_ray.strategies import DepthBFSStrategy


@pytest.fixture(scope="module")
def small_web():
    return SyntheticWeb(8, seed=11, max_class=3)


def _crawler(ray_session, web, out_dir, **kw):
    from frontera_ray.pipelines.crawl import RayCrawler

    kw.setdefault("num_state_shards", 2)
    kw.setdefault("num_queue_shards", 2)
    kw.setdefault("batch_per_shard", 64)
    return RayCrawler(web, str(out_dir), **kw)


def test_crawl_completeness_and_parity(ray_session, small_web, tmp_path):
    c = _crawler(ray_session, small_web, tmp_path / "out")
    c.add_seeds(small_web.seeds())
    summary = c.run(max_rounds=200)
    urls = c.crawled_urls()
    assert summary["pages"] == len(urls) == len(set(urls))
    assert c.seen_count() == small_web.total_pages()
    assert len(urls) == small_web.total_pages()

    # URL-seen parity vs the single-process engine on the same web
    class _Graph:
        seeds = small_web.seeds()
        links_of = staticmethod(small_web.links_of)

    lf = LocalFrontier(strategy=DepthBFSStrategy(), profile="max_score")
    seq = run_crawl_sequence(lf, _Graph, max_next_requests=100)
    local_urls = [e.url for reqs, _, _ in seq for e in reqs]
    assert set(local_urls) == set(urls)


def test_sink_payload_invariants(ray_session, small_web, tmp_path):
    c = _crawler(ray_session, small_web, tmp_path / "out")
    c.add_seeds(small_web.seeds()[:2])
    c.run(max_rounds=3)
    frags = sorted((tmp_path / "out").glob("round=*/*.parquet"))
    assert frags
    t = pq.read_table(frags[0])
    assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    for row in t.slice(0, 8).to_pylist():
        pix = decode_image(row["bytes"], row["fmt"])
        assert pix.shape == (row["h"], row["w"], 3)
        ref, _ = gen_pixels(row["image_id"])
        assert psnr(ref, pix) >= 40.0
        assert row["caption"] == caption_of(row["image_id"])


def test_checkpoint_resume_determinism(ray_session, small_web, tmp_path):
    # reference run to completion, no interruption
    c1 = _crawler(ray_session, small_web, tmp_path / "a")
    c1.add_seeds(small_web.seeds())
    c1.run(max_rounds=100)
    ref_urls = sorted(c1.crawled_urls())

    # interrupted run: checkpoint every 2 rounds, stop after 5
    c2 = _crawler(ray_session, small_web, tmp_path / "b", checkpoint_every=2)
    c2.add_seeds(small_web.seeds())
    c2.run(max_rounds=5)
    # "kill": fresh actors, restore from latest checkpoint (round 4)
    c3 = _crawler(ray_session, small_web, tmp_path / "b", checkpoint_every=0)
    meta = c3.restore()
    assert meta["round"] == 4
    c3.run(max_rounds=100)
    assert sorted(c3.crawled_urls()) == ref_urls
    assert c3.seen_count() == small_web.total_pages()


def test_checkpoint_under_pipelined_rounds(ray_session, small_web, tmp_path):
    """Drain-barrier checkpointing composes with pipeline_depth > 1:
    overlapped submission pauses at each checkpoint boundary, in-flight
    rounds settle, the snapshot is taken on quiescent actors, and a
    'killed' run restored from it finishes with the exact page set of
    an uninterrupted pipelined run."""
    c1 = _crawler(ray_session, small_web, tmp_path / "a")
    c1.add_seeds(small_web.seeds())
    c1.run(max_rounds=100, pipeline_depth=3)
    ref_urls = sorted(c1.crawled_urls())
    assert c1.seen_count() == small_web.total_pages()

    # interrupted pipelined run: checkpoint every 2 rounds, stop at 5
    c2 = _crawler(ray_session, small_web, tmp_path / "b", checkpoint_every=2)
    c2.add_seeds(small_web.seeds())
    c2.run(max_rounds=5, pipeline_depth=3)
    assert (tmp_path / "b" / "checkpoint" / "meta.json").exists()

    # "kill": fresh actors, restore from the latest drain-barrier snapshot
    c3 = _crawler(ray_session, small_web, tmp_path / "b", checkpoint_every=0)
    meta = c3.restore()
    assert meta["round"] >= 2 and meta["round"] % 2 == 0
    c3.run(max_rounds=100, pipeline_depth=3)
    assert sorted(c3.crawled_urls()) == ref_urls
    assert c3.seen_count() == small_web.total_pages()


def test_max_per_host_round_cap(ray_session, tmp_path):
    web = SyntheticWeb(2, seed=3, max_class=5)
    c = _crawler(ray_session, web, tmp_path / "out", max_per_host=7,
                 num_queue_shards=2, batch_per_shard=100)
    c.add_seeds(web.seeds())
    c.run_round()
    m = c.run_round()  # second round: frontier has many links per host
    assert 0 < m["popped"] <= 7 * 2  # <= max_per_host * num hosts


def test_redirect_canonical_crawl(ray_session, tmp_path):
    """Canonical-solver integration in the live crawl: alias URLs
    (`...?r=1` -> 301 -> target) are crawled under their canonical
    (requested) key carrying the target's content; the bare target is
    never crawled separately; per-row validation still passes."""
    from frontera_ray.payload import decode_image, gen_pixels, resolve_alias
    from frontera_ray.pipelines.crawl import RayCrawler
    from frontera_ray.stages.images import ValidateStage

    web = SyntheticWeb(21, seed=4, max_class=3)  # includes i%7==3 hosts
    redirect_hosts = [web.host(i) for i in range(21) if i % 7 == 3]
    assert redirect_hosts
    c = _crawler(ray_session, web, tmp_path / "out")
    c.add_seeds(web.seeds())
    c.run(max_rounds=100)
    urls = c.crawled_urls()
    aliases = [u for u in urls if u.endswith("?r=1")]
    assert aliases  # redirecting links were followed
    crawled = set(urls)
    for a in aliases:
        assert resolve_alias(a) not in crawled  # no duplicate via bare URL
    # record content equals the redirect target's content
    import pyarrow.parquet as pq
    import pyarrow as pa

    frags = sorted((tmp_path / "out").glob("round=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in frags])
    rows = [r for r in t.to_pylist() if r["image_id"].endswith("?r=1")][:5]
    assert rows
    for row in rows:
        ref, _ = gen_pixels(resolve_alias(row["image_id"]))
        got = decode_image(row["bytes"], row["fmt"])
        assert (ref.shape == got.shape)
    out = ValidateStage()(pa.Table.from_pylist(rows))
    assert all(out["pixels_ok"].to_pylist())
    assert all(out["caption_ok"].to_pylist())


def test_restore_falls_back_to_checkpoint_old(ray_session, small_web, tmp_path):
    """A crash between the two checkpoint renames leaves only
    checkpoint.old; restore() must promote and use it."""
    import shutil

    c = _crawler(ray_session, small_web, tmp_path / "out")
    c.add_seeds(small_web.seeds())
    c.run(max_rounds=3)
    c.checkpoint()
    out = tmp_path / "out"
    # simulate the crash window: good checkpoint renamed aside, the new
    # one never promoted (leave a half-written tmp for realism)
    (out / "checkpoint").rename(out / "checkpoint.old")
    (out / "checkpoint").mkdir()
    meta = c.restore()
    assert meta["round"] == c.round
    assert (out / "checkpoint" / "meta.json").exists()
    assert not (out / "checkpoint.old").exists()


def test_opic_cash_routing(ray_session):
    """OPIC duplicate-link cash: a link already queued receives ADDED
    cash via the owning queue shard (cross-batch), and duplicate rows
    within one batch fold their cash into the kept row."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.pipelines.crawl import (QueueActor, UrlSeenActor,
                                              route_links)

    states = [UrlSeenActor.remote(0)]
    queues = [QueueActor.remote(0, profile="max_score")]

    def links_table(rows):
        urls, scores = zip(*rows)
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "parent_depth": pa.array(np.zeros(n, np.int32), pa.int32()),
            "seq": pa.array(np.arange(n, dtype=np.int64) + 100, pa.int64()),
            "parent_score": pa.array(np.zeros(n), pa.float64()),
            "n_siblings": pa.array(np.full(n, n, np.int32), pa.int32()),
        })

    from frontera_ray.pipelines.crawl import process_links
    from frontera_ray.strategies import OPICStrategy

    st_ref = ray.put(OPICStrategy())

    def route(rows):
        b = process_links(links_table(rows), st_ref)
        # overwrite scores with explicit cash for determinism
        b = b.set_column(b.column_names.index("score"), "score",
                         pa.array([s for _, s in rows], pa.float64()))
        return route_links(b, states, queues, opic_cash=True)

    # batch 1: d queued with cash 0.3 + within-batch duplicate 0.2 -> 0.5
    route([("http://x.test/d", 0.3), ("http://x.test/d", 0.2),
           ("http://x.test/e", 0.1)])
    # batch 2: d again (cross-batch duplicate) with cash 0.25
    route([("http://x.test/d", 0.25)])
    stats = ray.get(queues[0].stats.remote())
    assert stats["score_adds"] == 1
    popped = ray.get(queues[0].pop_table.remote(10))
    by_url = dict(zip(popped["url"].to_pylist(),
                      popped["score"].to_pylist()))
    assert abs(by_url["http://x.test/d"] - 0.75) < 1e-12
    assert abs(by_url["http://x.test/e"] - 0.1) < 1e-12


def test_filter_extracted_links_hook(ray_session, tmp_path):
    """Strategies can drop links before scheduling (reference
    filter_extracted_links hook): a same-host-only filter confines the
    crawl in both the local and the distributed engine."""
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.strategies import DepthBFSStrategy
    from frontera_ray.urls import hostnames_batch

    class EvenHostOnly(DepthBFSStrategy):
        """Drops links to odd-numbered hosts."""

        def filter_extracted_links(self, parent_urls, urls):
            import numpy as np

            hosts = hostnames_batch(np.asarray(urls, dtype=object))
            return np.array([int(h[5:10]) % 2 == 0 for h in hosts])

    web = SyntheticWeb(6, seed=2, max_class=3)
    c = _crawler(ray_session, web, tmp_path / "out")
    c.strategy = EvenHostOnly()
    c._strategy_ref = __import__("ray").put(c.strategy)
    c._filter_links = True
    c.add_seeds(web.seeds())  # seeds are not filtered (parity: reference
    # filter applies to extracted links only)
    c.run(max_rounds=50)
    urls = c.crawled_urls()
    # seeds from odd hosts crawl (depth 0) but never expand
    from collections import Counter

    per_host = Counter(u.split("/")[2] for u in urls)
    for host, n in per_host.items():
        if int(host[5:10]) % 2 == 1:
            assert n == 1, (host, n)  # seed only
    assert any(int(h[5:10]) % 2 == 0 and n > 1 for h, n in per_host.items())

    # local engine: same hook, same confinement
    from frontera_ray.pipelines.local import LocalFrontier, run_crawl_sequence

    class _G:
        seeds = web.seeds()
        links_of = staticmethod(web.links_of)

    lf = LocalFrontier(strategy=EvenHostOnly(), profile="max_score")
    seq = run_crawl_sequence(lf, _G, max_next_requests=100)
    local_urls = [e.url for reqs, _, _ in seq for e in reqs]
    assert set(local_urls) == set(urls)


def test_strategy_finished_hook(ray_session, tmp_path):
    """strategy.finished(pages_total, rounds) stops the run early."""
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.strategies import DepthBFSStrategy

    class TwoRounds(DepthBFSStrategy):
        def finished(self, pages_total, rounds):
            return rounds >= 2

    web = SyntheticWeb(8, seed=11, max_class=3)
    c = _crawler(ray_session, web, tmp_path / "out")
    c.strategy = TwoRounds()
    c._strategy_ref = __import__("ray").put(c.strategy)
    c.add_seeds(web.seeds())
    summary = c.run(max_rounds=100)
    assert summary["rounds"] == 2
    assert summary["pages"] < web.total_pages()


def test_dedup_sink_excludes_planted_duplicates(ray_session, tmp_path):
    """VERDICT r3 ask #5: the live crawl's phash column drives a
    post-crawl keep-list. Every '...2' page carries its '...1'
    sibling's pixels -> identical phash -> the keep-list puts both in
    one component with exactly one keeper."""
    from frontera_ray.graphs import ContentTwinWeb

    base = SyntheticWeb(3, seed=5, max_class=3)  # hosts 0-2: no aliases
    web = ContentTwinWeb(base)
    c = _crawler(ray_session, web, tmp_path / "out")
    c.add_seeds(web.seeds())
    c.run(max_rounds=50)
    urls = c.crawled_urls()
    assert len(urls) == base.total_pages()

    summary = c.dedup_sink(max_hamming=0)
    t = pq.read_table(str(tmp_path / "out" / "keep"))
    keep = {r["image_id"]: (r["keeper_image_id"], r["keep"])
            for r in t.to_pylist()}
    assert sorted(keep) == sorted(urls)  # one row per crawled page
    twins = [(u[:-1] + "1", u) for u in urls
             if u.endswith("2") and u[:-1] + "1" in keep]
    assert twins
    assert summary["images"] == len(urls)
    assert summary["dups"] >= len(twins)
    for one, two in twins:
        # same component, exactly one of the pair kept
        assert keep[one][0] == keep[two][0]
        assert keep[one][1] != keep[two][1]
    # keepers are self-kept rows
    for u, (k, kept) in keep.items():
        assert keep[k][1] is True or keep[k][1] == True  # noqa: E712
        assert kept == (k == u)


def test_sink_manifest_audit_on_restore(ray_session, small_web, tmp_path):
    """Checkpoints carry per-round sink lineage (files+bytes); restore
    audits it and refuses to resume over lost/truncated output."""
    c = _crawler(ray_session, small_web, tmp_path / "out", checkpoint_every=2)
    c.add_seeds(small_web.seeds())
    c.run(max_rounds=5)
    import json
    meta = json.loads((tmp_path / "out" / "checkpoint" / "meta.json")
                      .read_text())
    assert meta["sink_manifest"]  # lineage recorded
    assert all(v["files"] > 0 for v in meta["sink_manifest"].values())

    # clean restore passes the audit
    c2 = _crawler(ray_session, small_web, tmp_path / "out",
                  checkpoint_every=0)
    m = c2.restore()
    assert m["sink_audit"]["ok"]

    # corrupt a finished round: delete one fragment -> strict restore
    # refuses; non-strict resumes with the mismatch reported
    victim = next(iter(sorted((tmp_path / "out").glob(
        "round=*/*.parquet"))))
    victim.unlink()
    c3 = _crawler(ray_session, small_web, tmp_path / "out",
                  checkpoint_every=0)
    with pytest.raises(RuntimeError, match="manifest audit failed"):
        c3.restore()
    m3 = c3.restore(strict_manifest=False)
    assert not m3["sink_audit"]["ok"]
    assert m3["sink_audit"]["mismatches"]


def test_sink_keeper_best_area(ray_session):
    """keeper='best_area' keeps the highest-resolution member of each
    phash near-dup cluster (tiebreak: smallest image_id) — within an
    exact-sketch group AND across a near-dup component — while
    keeper='min_id' keeps the smallest id as before."""
    import numpy as np
    import pyarrow as pa
    import ray

    from frontera_ray.stages.images import sink_keeper_table

    # sketch A = 0b0 (three copies, the LARGE one is u_big), sketch
    # B = 0b1 (hamming 1 from A — same component at max_hamming>=1,
    # its sole member is mid-sized), sketch C = far away (alone)
    rows = [
        ("http://a/u_small", 0, 10, 10),
        ("http://a/u_big", 0, 100, 100),
        ("http://a/u_big2", 0, 100, 100),   # area tie -> min url wins
        ("http://b/mid", 1, 50, 50),
        ("http://c/lone", (1 << 40) | (1 << 30) | (1 << 20), 20, 20),
    ]
    tbl = pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "phash": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array(np.asarray([r[2] for r in rows], np.int32),
                      pa.int32()),
        "h": pa.array(np.asarray([r[3] for r in rows], np.int32),
                      pa.int32()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)

    best = {r["image_id"]: r for r in sink_keeper_table(
        ds, max_hamming=1, keeper="best_area").take_all()}
    # component {A, B}: keeper = the 100x100 rep, min url of the tie
    for u in ("http://a/u_small", "http://a/u_big", "http://a/u_big2",
              "http://b/mid"):
        assert best[u]["keeper_image_id"] == "http://a/u_big"
    assert best["http://a/u_big"]["keep"]
    assert not best["http://b/mid"]["keep"]
    assert best["http://c/lone"]["keep"]

    ds2 = ray.data.from_arrow(tbl).repartition(2)
    minid = {r["image_id"]: r for r in sink_keeper_table(
        ds2, max_hamming=1, keeper="min_id").take_all()}
    # min_id rule ignores area: smallest url string of the component
    comp = sorted(["http://a/u_small", "http://a/u_big",
                   "http://a/u_big2", "http://b/mid"])
    for u in comp:
        assert minid[u]["keeper_image_id"] == comp[0]
