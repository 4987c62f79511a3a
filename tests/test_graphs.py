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
