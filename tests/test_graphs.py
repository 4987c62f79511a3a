"""Synthetic web generator parity with the reference tree generator
(frontera/utils/graphs/data.py:5-23)."""

from frontera_ray.graphs import (
    GraphManager,
    SITE_LIST_01,
    SITE_LIST_02,
    SITE_LIST_03,
    SITE_LIST_09,
    SyntheticWeb,
    site_tree,
)


def test_site_tree_shape():
    pages = site_tree("http://aaa.com/", 4, 2)
    urls = [p for p, _ in pages]
    assert urls[0] == "http://aaa.com/1"
    # pages exist at depths 1..3; leaves (depth 4) appear only as links
    assert "http://aaa.com/111" in urls
    assert "http://aaa.com/1111" not in urls
    assert len(urls) == 7  # 1 + 2 + 4
    links = dict(pages)
    assert links["http://aaa.com/1"] == ["http://aaa.com/11", "http://aaa.com/12"]


def test_self_link():
    pages = dict(site_tree("http://ccc.com/", 5, 2, self_link=True))
    assert pages["http://ccc.com/1"][-1] == "http://ccc.com/1"


def test_graph_manager_seeds():
    g = GraphManager(SITE_LIST_02())
    assert g.seeds == ["http://aaa.com/1", "http://bbb.com/1"]
    assert len(GraphManager(SITE_LIST_01()).all_urls()) == 15
    assert len(GraphManager(SITE_LIST_03()).all_urls()) == 31


def test_site_09():
    g = GraphManager(SITE_LIST_09())
    assert g.seeds == ["https://www.a.com", "http://b.com", "http://test.cloud.c.com"]
    assert "http://cloud.c.com" in g.all_urls()


def test_synthetic_web_pure_function():
    web = SyntheticWeb(num_hosts=32, seed=7)
    seeds = web.seeds()
    assert len(seeds) == 32
    l1 = web.links_of(seeds[0])
    l2 = SyntheticWeb(num_hosts=32, seed=7).links_of(seeds[0])
    assert l1 == l2  # deterministic across instances
    for u in l1:
        assert u.startswith(seeds[0])
    assert web.total_pages() > 32


def test_links_of_batch_parity():
    """The vectorized batch adapter APIs are byte-identical to the
    scalar resolve()/links_of() over every page of a mixed-shape web,
    including redirect-alias hosts and alias inputs."""
    web = SyntheticWeb(num_hosts=32, seed=42, max_class=4)
    # walk the whole web through the scalar API
    urls, frontier = [], list(web.seeds())
    while frontier:
        u = frontier.pop()
        urls.append(u)
        frontier.extend(web.links_of(u))
    assert any(u.endswith("?r=1") for u in urls)  # aliases present

    assert web.resolve_batch(urls) == [web.resolve(u) for u in urls]
    flat, counts = web.links_of_batch(urls)
    flat = flat.to_pylist()
    pos = 0
    for u, c in zip(urls, counts):
        assert flat[pos:pos + int(c)] == web.links_of(u), u
        pos += int(c)
    assert pos == len(flat)


def test_links_of_batch_noncanonical_fallback():
    web = SyntheticWeb(num_hosts=8, seed=1, max_class=3)
    mixed = [web.seeds()[0], "http://host-00001.test/robots.txt", "nonsense"]
    flat, counts = web.links_of_batch(mixed)
    flat = flat.to_pylist()
    pos = 0
    for u, c in zip(mixed, counts):
        assert flat[pos:pos + int(c)] == web.links_of(u), u
        pos += int(c)


def test_discovery_links_of_batch_routing():
    """DiscoveryWeb must route robots/sitemap URLs through the discovery
    scalar path while page URLs use the wrapped vectorized path."""
    from frontera_ray.graphs import DiscoveryWeb

    base = SyntheticWeb(num_hosts=16, seed=42, max_class=3)
    web = DiscoveryWeb(base)
    sitemap_host = base.host(1)  # 1 % 3 == 1 -> has sitemap
    mixed = [base.seeds()[0],
             f"http://{sitemap_host}/robots.txt",
             f"http://{sitemap_host}/sitemap.xml",
             base.seeds()[2]]
    flat, counts = web.links_of_batch(mixed)
    flat = flat.to_pylist()
    pos = 0
    for u, c in zip(mixed, counts):
        assert flat[pos:pos + int(c)] == web.links_of(u), u
        pos += int(c)
    # robots URL produced its declared sitemap, not tree children
    assert f"http://{sitemap_host}/sitemap.xml" in flat
