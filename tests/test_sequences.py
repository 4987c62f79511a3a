"""Golden crawl-ordering conformance.

Expected sequences transcribed from the reference corpus
(tests/backends.py:193-619): FIFO/LIFO/DFS/BFS strategies x
max_next_requests in {1,2,5,10,100} over SITE_01/02/03. The engine must
reproduce every sequence exactly (same URLs, same order).

Mapping to the rebuild: FIFO/LIFO = BasicStrategy + 'fifo'/'lifo' queue
profile; DFS = score 1/(depth+1), BFS = score depth/10, both popped
with the 'min_score' profile, ties FIFO — the SQLAlchemy/memory-backend
ordering the reference corpus encodes (SURVEY.md §2.7).
"""

import pytest

from frontera_ray.graphs import GraphManager, SITE_LIST_01, SITE_LIST_02, SITE_LIST_03
from frontera_ray.pipelines.local import crawl_url_sequence
from frontera_ray.strategies import BasicStrategy, BFSStrategy, DFSStrategy

SITES = {1: SITE_LIST_01, 2: SITE_LIST_02, 3: SITE_LIST_03}


def urls(spec: str):
    """'a:1 b:12' -> ['http://aaa.com/1', 'http://bbb.com/12']; bare
    paths default to host c (SITE_03) or a (SITE_01)."""
    hostmap = {"a": "aaa.com", "b": "bbb.com", "c": "ccc.com"}
    out = []
    for token in spec.split():
        if ":" in token:
            h, p = token.split(":")
        else:
            h, p = "a", token
        out.append(f"http://{hostmap[h]}/{p}")
    return out


def curls(spec: str):
    return [u.replace("aaa", "ccc") for u in urls(spec)]


FIFO = {
    (1, 1): urls("1 11 12 111 112 121 122 1111 1112 1121 1122 1211 1212 1221 1222"),
    (2, 1): urls("a:1 b:1 a:11 a:12 b:11 b:12 a:111 a:112 a:121 a:122 b:111 b:112 b:121 b:122 "
                 "a:1111 a:1112 a:1121 a:1122 a:1211 a:1212 a:1221 a:1222 "
                 "b:1111 b:1112 b:1121 b:1122 b:1211 b:1212 b:1221 b:1222"),
    (3, 1): curls("1 11 12 111 112 121 122 1111 1112 1121 1122 1211 1212 1221 1222 "
                  "11111 11112 11121 11122 11211 11212 11221 11222 "
                  "12111 12112 12121 12122 12211 12212 12221 12222"),
}

LIFO = {
    (1, 1): urls("1 12 122 1222 1221 121 1212 1211 11 112 1122 1121 111 1112 1111"),
    (1, 2): urls("1 12 11 112 111 1112 1111 1122 1121 122 121 1212 1211 1222 1221"),
    (1, 5): urls("1 12 11 112 111 122 121 1212 1211 1222 1221 1112 1111 1122 1121"),
    (2, 1): urls("b:1 b:12 b:122 b:1222 b:1221 b:121 b:1212 b:1211 b:11 b:112 b:1122 b:1121 "
                 "b:111 b:1112 b:1111 a:1 a:12 a:122 a:1222 a:1221 a:121 a:1212 a:1211 "
                 "a:11 a:112 a:1122 a:1121 a:111 a:1112 a:1111"),
    (2, 2): urls("b:1 a:1 a:12 a:11 a:112 a:111 a:1112 a:1111 a:1122 a:1121 a:122 a:121 "
                 "a:1212 a:1211 a:1222 a:1221 b:12 b:11 b:112 b:111 b:1112 b:1111 "
                 "b:1122 b:1121 b:122 b:121 b:1212 b:1211 b:1222 b:1221"),
    (2, 5): urls("b:1 a:1 a:12 a:11 b:12 b:11 b:112 b:111 b:122 b:121 a:112 "
                 "a:1122 a:1121 b:1212 b:1211 b:1222 b:1221 b:1112 b:1111 b:1122 b:1121 "
                 "a:111 a:122 a:121 a:1212 a:1211 a:1222 a:1221 a:1112 a:1111"),
    (2, 10): urls("b:1 a:1 a:12 a:11 b:12 b:11 b:112 b:111 b:122 b:121 a:112 a:111 a:122 a:121 "
                  "a:1212 a:1211 a:1222 a:1221 a:1112 a:1111 a:1122 a:1121 "
                  "b:1212 b:1211 b:1222 b:1221 b:1112 b:1111 b:1122 b:1121"),
    (3, 1): curls("1 12 122 1222 12222 12221 1221 12212 12211 121 1212 12122 12121 1211 "
                  "12112 12111 11 112 1122 11222 11221 1121 11212 11211 111 1112 11122 "
                  "11121 1111 11112 11111"),
    (3, 2): curls("1 12 11 112 111 1112 1111 11112 11111 11122 11121 1122 1121 11212 11211 "
                  "11222 11221 122 121 1212 1211 12112 12111 12122 12121 1222 1221 "
                  "12212 12211 12222 12221"),
    (3, 5): curls("1 12 11 112 111 122 121 1212 1211 1222 1221 1112 11122 11121 12212 12211 "
                  "12222 12221 12112 12111 12122 12121 1111 1122 1121 11212 11211 "
                  "11222 11221 11112 11111"),
    (3, 10): curls("1 12 11 112 111 122 121 1212 1211 1222 1221 1112 1111 1122 1121 "
                   "11212 11211 11222 11221 11112 11111 11122 11121 "
                   "12212 12211 12222 12221 12112 12111 12122 12121"),
}

DFS = {
    (1, 1): urls("1 11 111 1111 1112 112 1121 1122 12 121 1211 1212 122 1221 1222"),
    (1, 2): urls("1 11 12 111 112 1111 1112 1121 1122 121 122 1211 1212 1221 1222"),
    (1, 5): urls("1 11 12 111 112 121 122 1111 1112 1121 1122 1211 1212 1221 1222"),
    (2, 1): urls("a:1 a:11 a:111 a:1111 a:1112 a:112 a:1121 a:1122 a:12 a:121 a:1211 a:1212 "
                 "a:122 a:1221 a:1222 b:1 b:11 b:111 b:1111 b:1112 b:112 b:1121 b:1122 "
                 "b:12 b:121 b:1211 b:1212 b:122 b:1221 b:1222"),
    (2, 2): urls("a:1 b:1 a:11 a:12 a:111 a:112 a:1111 a:1112 a:1121 a:1122 a:121 a:122 "
                 "a:1211 a:1212 a:1221 a:1222 b:11 b:12 b:111 b:112 b:1111 b:1112 "
                 "b:1121 b:1122 b:121 b:122 b:1211 b:1212 b:1221 b:1222"),
    (2, 5): urls("a:1 b:1 a:11 a:12 b:11 b:12 a:111 a:112 a:121 a:122 b:111 "
                 "a:1111 a:1112 a:1121 a:1122 a:1211 a:1212 a:1221 a:1222 b:1111 b:1112 "
                 "b:112 b:121 b:122 b:1121 b:1122 b:1211 b:1212 b:1221 b:1222"),
    (2, 10): urls("a:1 b:1 a:11 a:12 b:11 b:12 a:111 a:112 a:121 a:122 "
                  "b:111 b:112 b:121 b:122 a:1111 a:1112 a:1121 a:1122 a:1211 a:1212 "
                  "a:1221 a:1222 b:1111 b:1112 b:1121 b:1122 b:1211 b:1212 b:1221 b:1222"),
    (3, 1): curls("1 11 111 1111 11111 11112 1112 11121 11122 112 1121 11211 11212 1122 "
                  "11221 11222 12 121 1211 12111 12112 1212 12121 12122 122 1221 12211 "
                  "12212 1222 12221 12222"),
    (3, 2): curls("1 11 12 111 112 1111 1112 11111 11112 11121 11122 1121 1122 11211 11212 "
                  "11221 11222 121 122 1211 1212 12111 12112 12121 12122 1221 1222 "
                  "12211 12212 12221 12222"),
    (3, 5): curls("1 11 12 111 112 121 122 1111 1112 1121 1122 1211 11111 11112 11121 11122 "
                  "11211 11212 11221 11222 12111 12112 1212 1221 1222 12121 12122 "
                  "12211 12212 12221 12222"),
    (3, 10): curls("1 11 12 111 112 121 122 1111 1112 1121 1122 1211 1212 1221 1222 "
                   "11111 11112 11121 11122 11211 11212 11221 11222 "
                   "12111 12112 12121 12122 12211 12212 12221 12222"),
}

BFS = {
    (1, 1): urls("1 11 12 111 112 121 122 1111 1112 1121 1122 1211 1212 1221 1222"),
    (2, 1): FIFO[(2, 1)],
    (3, 1): FIFO[(3, 1)],
}


def run(site, strategy, profile, mnr):
    return crawl_url_sequence(GraphManager(SITES[site]()), strategy, profile, mnr)


@pytest.mark.parametrize("site,mnr", [(s, m) for s in (1, 2, 3) for m in (1, 2, 5, 10, 100)])
def test_fifo(site, mnr):
    assert run(site, BasicStrategy(), "fifo", mnr) == FIFO[(site, 1)]


@pytest.mark.parametrize("site,mnr,key", [
    (1, 1, (1, 1)), (1, 2, (1, 2)), (1, 5, (1, 5)), (1, 10, (1, 5)), (1, 100, (1, 5)),
    (2, 1, (2, 1)), (2, 2, (2, 2)), (2, 5, (2, 5)), (2, 10, (2, 10)), (2, 100, (2, 10)),
    (3, 1, (3, 1)), (3, 2, (3, 2)), (3, 5, (3, 5)), (3, 10, (3, 10)), (3, 100, (3, 10)),
])
def test_lifo(site, mnr, key):
    assert run(site, BasicStrategy(), "lifo", mnr) == LIFO[key]


@pytest.mark.parametrize("site,mnr,key", [
    (1, 1, (1, 1)), (1, 2, (1, 2)), (1, 5, (1, 5)), (1, 10, (1, 5)), (1, 100, (1, 5)),
    (2, 1, (2, 1)), (2, 2, (2, 2)), (2, 5, (2, 5)), (2, 10, (2, 10)), (2, 100, (2, 10)),
    (3, 1, (3, 1)), (3, 2, (3, 2)), (3, 5, (3, 5)), (3, 10, (3, 10)), (3, 100, (3, 10)),
])
def test_dfs(site, mnr, key):
    assert run(site, DFSStrategy(), "min_score", mnr) == DFS[key]


@pytest.mark.parametrize("site,mnr", [(s, m) for s in (1, 2, 3) for m in (1, 2, 5, 10, 100)])
def test_bfs(site, mnr):
    assert run(site, BFSStrategy(), "min_score", mnr) == BFS[(site, 1)]


@pytest.mark.parametrize("site", [1, 2, 3])
def test_urlseen_set_complete(site):
    """Every crawl visits each reachable URL exactly once (URL-seen
    parity: the final seen set equals the site's node set)."""
    g = GraphManager(SITES[site]())
    seq = run(site, BasicStrategy(), "fifo", 5)
    assert len(seq) == len(set(seq)) == len(g.all_urls())
    assert set(seq) == g.all_urls()


# ---------------------------------------------------------------------------
# distributed conformance: the same corpus through the Ray actors
# (arrival-seq mode, single state+queue shard — see ArrivalSeqFrontier)
# ---------------------------------------------------------------------------

def _ray_run(site, strategy, profile, mnr, ray_session):
    from frontera_ray.pipelines.crawl import ArrivalSeqFrontier
    from frontera_ray.pipelines.local import run_crawl_sequence

    f = ArrivalSeqFrontier(strategy=strategy, profile=profile)
    g = GraphManager(SITES[site]())
    seq = run_crawl_sequence(f, g, mnr)
    return [e.url for reqs, _, _ in seq for e in reqs]


RAY_SLICES = [(s, m) for s in (1, 2, 3) for m in (1, 5, 100)]


@pytest.mark.parametrize("site,mnr", RAY_SLICES)
def test_ray_path_fifo(ray_session, site, mnr):
    assert _ray_run(site, BasicStrategy(), "fifo", mnr,
                    ray_session) == FIFO[(site, 1)]


@pytest.mark.parametrize("site,mnr,key", [
    (1, 1, (1, 1)), (1, 5, (1, 5)), (1, 100, (1, 5)),
    (2, 1, (2, 1)), (2, 5, (2, 5)), (2, 100, (2, 10)),
    (3, 1, (3, 1)), (3, 5, (3, 5)), (3, 100, (3, 10)),
])
def test_ray_path_dfs(ray_session, site, mnr, key):
    assert _ray_run(site, DFSStrategy(), "min_score", mnr,
                    ray_session) == DFS[key]


@pytest.mark.parametrize("site,mnr", RAY_SLICES)
def test_ray_path_bfs(ray_session, site, mnr):
    assert _ray_run(site, BFSStrategy(), "min_score", mnr,
                    ray_session) == BFS[(site, 1)]


@pytest.mark.parametrize("site,mnr,key", [
    (1, 1, (1, 1)), (1, 5, (1, 5)), (1, 100, (1, 5)),
    (2, 1, (2, 1)), (2, 5, (2, 5)), (2, 100, (2, 10)),
    (3, 1, (3, 1)), (3, 5, (3, 5)), (3, 100, (3, 10)),
])
def test_ray_path_lifo(ray_session, site, mnr, key):
    assert _ray_run(site, BasicStrategy(), "lifo", mnr,
                    ray_session) == LIFO[key]
