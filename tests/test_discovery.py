"""Discovery strategy, revisiting, robots-gated crawl, stats export."""

import numpy as np

from frontera_ray.pipelines.local import LocalFrontier, run_crawl_sequence
from frontera_ray.state.queue import QueueShard
from frontera_ray.strategies import (
    DISCOVERY_CLASS_SCORES,
    DiscoveryStrategy,
    classify_url,
    discovery_salted_scores,
)


def test_classify_url():
    assert classify_url("http://a.com/robots.txt") == "robots"
    assert classify_url("http://a.com/sitemap.xml") == "sitemap"
    assert classify_url("http://a.com/sitemap-news.xml") == "sitemap"
    assert classify_url("http://a.com/") == "home"
    assert classify_url("http://a.com/page") == "other"


def test_salted_scores_properties():
    # same host -> same decile; relative order within host preserved
    s = discovery_salted_scores(["a.com", "a.com", "b.com"],
                                np.array([0.9, 0.5, 0.9]))
    assert abs((s[0] - s[1]) - (0.9 - 0.5) / 10) < 1e-9
    assert np.floor(s[0] * 10) == np.floor(s[1] * 10)
    assert all(0.0 <= x <= 1.1 for x in s)


def test_discovery_strategy_scores():
    st = DiscoveryStrategy()
    urls = ["http://a.com/robots.txt", "http://a.com/x", "http://a.com/"]
    scores = st.link_scores(0, urls)
    base = [DISCOVERY_CLASS_SCORES[classify_url(u)] for u in urls]
    # same host => ordering by class score preserved
    assert (np.argsort(-scores) == np.argsort(-np.array(base))).all()


def test_robots_gated_crawl():
    """Discovery-style crawl with robots gating in the queue shard:
    disallowed paths are never scheduled or crawled."""

    class G:
        seeds = ["http://a.com/1"]
        pages = {
            "http://a.com/1": ["http://a.com/11", "http://a.com/private/x"],
            "http://a.com/11": [],
            "http://a.com/private/x": [],
        }

        @staticmethod
        def links_of(u):
            return G.pages.get(u, [])

    f = LocalFrontier(profile="min_score",
                      queue_kwargs=dict(robots_enabled=True))
    f.queue_shards[0].domains["a.com"].set_robots(
        "User-agent: *\nDisallow: /private/\n")
    seq = run_crawl_sequence(f, G, max_next_requests=10)
    urls = [e.url for reqs, _, _ in seq for e in reqs]
    assert "http://a.com/private/x" not in urls
    assert set(urls) == {"http://a.com/1", "http://a.com/11"}
    assert f.queue_shards[0].stats["dropped_robots"] == 1


def test_revisit_cycle():
    """Revisiting semantics: a CRAWLED page rescheduled with a future
    crawl_at becomes visible only once `now` passes, and is crawled
    again (reference tests/test_revisiting_backend.py property)."""
    f = LocalFrontier(profile="fifo")
    f.add_seeds(["http://a.com/1"])
    got = f.get_next_requests(10, now=0)
    assert [e.url for e in got] == ["http://a.com/1"]
    f.page_crawled(got[0])
    f.links_extracted(got[0], [])
    # re-adding via normal scheduling is deduped
    assert f.links_extracted(got[0], ["http://a.com/1"]) == 0
    # revisit bypasses dedup with future visibility
    f.schedule_revisit(got[0], crawl_at=100)
    assert f.get_next_requests(10, now=50) == []
    again = f.get_next_requests(10, now=150)
    assert [e.url for e in again] == ["http://a.com/1"]


def test_stats_export(ray_session, tmp_path):
    import json

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(4, seed=3, max_class=2)
    c = RayCrawler(web, str(tmp_path / "out"), num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=32)
    c.add_seeds(web.seeds())
    c.run(max_rounds=3)
    stats = c.export_stats(str(tmp_path / "stats.json"))
    assert stats["pages_total"] > 0
    assert stats["queue_counters"]["scheduled"] >= stats["pages_total"]
    on_disk = json.loads((tmp_path / "stats.json").read_text())
    assert on_disk["rounds"] == stats["rounds"]


def test_discovery_crawl_e2e(ray_session, tmp_path):
    """Distributed crawl with the discovery strategy + domain page caps."""
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(6, seed=9, max_class=3)
    c = RayCrawler(web, str(tmp_path / "out"), strategy="discovery",
                   profile="max_score", num_state_shards=2, num_queue_shards=2,
                   batch_per_shard=64, salted_scores=False,
                   queue_kwargs=dict(max_pages_per_domain=5))
    c.add_seeds(web.seeds())
    c.run(max_rounds=50)
    urls = c.crawled_urls()
    # cap: at most 5 pages per domain ever queued
    from collections import Counter

    hosts = Counter(u.split("/")[2] for u in urls)
    assert max(hosts.values()) <= 5
    assert len(urls) > 0


def test_request_error_flow():
    """Pages that fail to fetch transition to ERROR, yield no links, and
    are never re-scheduled (reference request_error semantics)."""
    from frontera_ray.graphs import GraphManager, SITE_LIST_01
    from frontera_ray.state.urlseen import States

    g = GraphManager(SITE_LIST_01(), errors={"http://aaa.com/11"})
    f = LocalFrontier(profile="fifo")
    seq = run_crawl_sequence(f, g, max_next_requests=5)
    urls = [e.url for reqs, _, _ in seq for e in reqs]
    # the errored page was popped once but its subtree never discovered
    assert "http://aaa.com/11" in urls
    assert "http://aaa.com/111" not in urls
    assert "http://aaa.com/121" in urls  # sibling subtree unaffected
    import numpy as np
    from frontera_ray.fingerprint import fp64_batch
    from frontera_ray.urls import canonicalize_batch

    fp = fp64_batch(canonicalize_batch(np.array(["http://aaa.com/11"], object)))
    assert f.state_shards[0].get_states(fp)[0] == States.ERROR
    # re-offering it as a link does not reschedule (state != NOT_CRAWLED)
    parent = [e for reqs, _, _ in seq for e in reqs][0]
    assert f.links_extracted(parent, ["http://aaa.com/11"]) == 0


def test_opic_strategy_local():
    """OPIC cash splitting: seeds share 1.0; each page's cash divides
    among its outlinks; max_score pop follows the cash."""
    from frontera_ray.strategies import OPICStrategy

    class G:
        seeds = ["http://a.com/1", "http://b.com/1"]
        pages = {
            "http://a.com/1": ["http://a.com/11"],             # 1 link: full cash
            "http://b.com/1": ["http://b.com/11", "http://b.com/12",
                               "http://b.com/13", "http://b.com/14"],
        }

        @staticmethod
        def links_of(u):
            return G.pages.get(u, [])

    f = LocalFrontier(strategy=OPICStrategy(), profile="max_score")
    seq = run_crawl_sequence(f, G, max_next_requests=2)
    urls = [e.url for reqs, _, _ in seq for e in reqs]
    scores = {e.url: e.score for reqs, _, _ in seq for e in reqs}
    assert scores["http://a.com/1"] == scores["http://b.com/1"] == 0.5
    assert scores["http://a.com/11"] == 0.5       # sole heir
    assert scores["http://b.com/11"] == 0.125     # split 4 ways
    # the cash-rich single child is crawled before the split siblings
    assert urls.index("http://a.com/11") < urls.index("http://b.com/11")


def test_opic_strategy_distributed(ray_session, tmp_path):
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(4, seed=13, max_class=3)
    c = RayCrawler(web, str(tmp_path / "out"), strategy="opic",
                   profile="max_score", num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=64)
    c.add_seeds(web.seeds())
    c.run(max_rounds=100)
    assert len(c.crawled_urls()) == web.total_pages()


def test_robots_provider_distributed(ray_session, tmp_path):
    """Lazy robots fetching in the distributed path: hosts 0 and 5
    disallow their /12 subtree; the crawl never touches it."""
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(8, seed=17, max_class=4)
    c = RayCrawler(web, str(tmp_path / "out"), num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=64,
                   queue_kwargs=dict(robots_enabled=True,
                                     robots_provider=web.robots_body))
    c.add_seeds(web.seeds())
    c.run(max_rounds=100)
    urls = c.crawled_urls()
    blocked = [u for u in urls
               if u.startswith(("http://host-00000.test/12",
                                "http://host-00005.test/12"))]
    assert blocked == []
    # non-robots hosts keep their /12 subtree (when the tree is deep enough)
    assert any("/12" in u and "host-00000" not in u and "host-00005" not in u
               for u in urls)


def test_sitemap_discovery_cycle_e2e(ray_session, tmp_path):
    """Live discovery cycle (reference strategy/discovery/__init__.py:
    284-371): first host contact schedules robots.txt; robots declares
    a sitemap; the sitemap's pages AND its sub-sitemap's pages are
    crawled — pages reachable ONLY through the cycle prove the wiring."""
    from frontera_ray.graphs import DiscoveryWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    class Base:
        def seeds(self):
            return ["http://smap.test/"]

        def robots_body(self, host):
            if host == "smap.test":
                return "User-agent: *\nSitemap: http://smap.test/sitemap.xml\n"
            return None

        def sitemap_body(self, url):
            if url == "http://smap.test/sitemap.xml":
                return ("<urlset><url><loc>http://smap.test/orphan-1</loc>"
                        "</url><sitemap><loc>"
                        "http://smap.test/sitemap-sub.xml</loc></sitemap>"
                        "</urlset>")
            if url == "http://smap.test/sitemap-sub.xml":
                return ("<urlset><url><loc>http://smap.test/orphan-2</loc>"
                        "</url></urlset>")
            return None

        def links_of(self, url):
            return []  # no organic links: only the cycle finds orphans

    web = DiscoveryWeb(Base())
    c = RayCrawler(web, str(tmp_path / "out"), strategy="discovery",
                   profile="max_score", num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=32)
    c.add_seeds(web.seeds())
    c.run(max_rounds=20)
    by_round = {}
    for d in sorted((tmp_path / "out").glob("round=*")):
        import pyarrow.parquet as pq

        for f in d.glob("*.parquet"):
            for u in pq.read_table(f, columns=["image_id"])["image_id"].to_pylist():
                by_round.setdefault(u, int(d.name.split("=")[1]))
    urls = set(by_round)
    assert {"http://smap.test/robots.txt", "http://smap.test/sitemap.xml",
            "http://smap.test/sitemap-sub.xml", "http://smap.test/orphan-1",
            "http://smap.test/orphan-2"} <= urls
    # the cycle's causal order holds round-wise
    assert by_round["http://smap.test/robots.txt"] \
        < by_round["http://smap.test/sitemap.xml"] \
        < by_round["http://smap.test/orphan-1"]
    assert by_round["http://smap.test/sitemap-sub.xml"] \
        < by_round["http://smap.test/orphan-2"]


def test_sitemap_discovery_synthetic_web(ray_session, tmp_path):
    """DiscoveryWeb over SyntheticWeb: sitemap hosts (i%3==1) get their
    deep sitemap pages crawled early via the robots->sitemap shortcut,
    including the sub-sitemap's page; robots-disallowed subtrees stay
    gated."""
    from frontera_ray.graphs import DiscoveryWeb, SyntheticWeb

    from frontera_ray.pipelines.crawl import RayCrawler

    base = SyntheticWeb(6, seed=4, max_class=4)
    web = DiscoveryWeb(base)
    c = RayCrawler(web, str(tmp_path / "out"), strategy="discovery",
                   profile="max_score", num_state_shards=2,
                   num_queue_shards=2, batch_per_shard=64,
                   queue_kwargs=dict(robots_enabled=True,
                                     robots_provider=web.robots_body))
    c.add_seeds(web.seeds())
    c.run(max_rounds=60)
    urls = set(c.crawled_urls())
    # host 1 and 4 are sitemap hosts
    for i in (1, 4):
        host = base.host(i)
        max_depth, branching = base.shape_of(host)
        assert f"http://{host}/sitemap.xml" in urls
        assert f"http://{host}/sitemap-sub.xml" in urls
        assert f"http://{host}/" + "1" * (max_depth - 1) in urls
        assert f"http://{host}/" + str(min(2, branching)) * (max_depth - 1) in urls
