"""Settings surface: load_object + Settings + builders
(reference utils/misc.py:22-45, settings/__init__.py semantics)."""

import pytest

from frontera_ray.settings import (
    Settings,
    load_object,
    local_frontier_from_settings,
    ray_crawler_from_settings,
)


def test_load_object():
    cls = load_object("frontera_ray.strategies.BFSStrategy")
    from frontera_ray.strategies import BFSStrategy

    assert cls is BFSStrategy
    with pytest.raises(ValueError):
        load_object("notapath")
    with pytest.raises(NameError):
        load_object("frontera_ray.strategies.Nope")


def test_settings_sources_and_precedence(tmp_path):
    s = Settings()
    assert s.MAX_NEXT_REQUESTS == 64  # default
    s2 = Settings(attributes={"MAX_NEXT_REQUESTS": 7, "lowercase": 1})
    assert s2.MAX_NEXT_REQUESTS == 7
    assert s2.get("lowercase") is None  # only UPPERCASE keys are settings
    # module source
    mod = tmp_path / "my_settings.py"
    mod.write_text("BC_MIN_HOSTS = 3\nQUEUE_PROFILE = 'fifo'\nignored = 1\n")
    import sys

    sys.path.insert(0, str(tmp_path))
    try:
        s3 = Settings("my_settings")
        assert s3.BC_MIN_HOSTS == 3 and s3.QUEUE_PROFILE == "fifo"
    finally:
        sys.path.remove(str(tmp_path))
    # from_params + object_from
    s4 = Settings.from_params(max_requests=5)
    assert s4.MAX_REQUESTS == 5
    assert Settings.object_from(s4) is s4


def test_local_frontier_from_settings():
    f = local_frontier_from_settings(
        Settings.from_params(strategy="frontera_ray.strategies.DFSStrategy",
                             queue_profile="min_score",
                             num_queue_shards=2, max_requests=9,
                             overused_max_per_key=10))
    from frontera_ray.strategies import DFSStrategy

    assert isinstance(f.strategy, DFSStrategy)
    assert len(f.queue_shards) == 2
    assert f.max_requests == 9
    assert f.queue_shards[0]._max_per_key == 10
    # registry short names work too
    f2 = local_frontier_from_settings(Settings.from_params(strategy="bfs"))
    from frontera_ray.strategies import BFSStrategy

    assert isinstance(f2.strategy, BFSStrategy)


def test_settings_driven_crawl_sequence():
    """A settings-built frontier reproduces the golden DFS ordering."""
    from frontera_ray.graphs import GraphManager, SITE_LIST_01
    from frontera_ray.pipelines.local import run_crawl_sequence

    f = local_frontier_from_settings(Settings.from_params(
        strategy="frontera_ray.strategies.DFSStrategy",
        queue_profile="min_score", num_queue_shards=1))
    g = GraphManager(SITE_LIST_01())
    seq = run_crawl_sequence(f, g, max_next_requests=1)
    urls = [e.url for reqs, _, _ in seq for e in reqs]
    assert urls[:4] == ["http://aaa.com/1", "http://aaa.com/11",
                        "http://aaa.com/111", "http://aaa.com/1111"]


def test_ray_crawler_from_settings(ray_session, tmp_path):
    from frontera_ray.graphs import SyntheticWeb

    web = SyntheticWeb(8, seed=5, max_class=3)
    c = ray_crawler_from_settings(
        web, str(tmp_path / "out"),
        Settings.from_params(strategy="depth_bfs", queue_profile="max_score",
                             num_state_shards=2, num_queue_shards=2,
                             batch_per_shard=64))
    c.add_seeds(web.seeds())
    summary = c.run(max_rounds=100)
    assert summary["pages"] == web.total_pages()
    with pytest.raises((ValueError, ImportError)):
        ray_crawler_from_settings(
            web, str(tmp_path / "out2"),
            Settings.from_params(strategy="not.a.registry.Name"))
    # dict settings source works end-to-end (silent-drop regression)
    f = ray_crawler_from_settings(
        web, str(tmp_path / "out3"),
        {"STRATEGY": "bfs", "NUM_QUEUE_SHARDS": 2, "BATCH_PER_SHARD": 32})
    assert len(f.queue_actors) == 2


def test_fingerprint_function_settings():
    """URL/DOMAIN fingerprint functions resolve via load_object from
    their settings keys (reference default_settings.py contract)."""
    from frontera_ray import fingerprint as fpmod

    s = Settings()
    assert load_object(s.URL_FINGERPRINT_FUNCTION) is fpmod.sha1
    assert load_object(s.DOMAIN_FINGERPRINT_FUNCTION) is \
        fpmod.hostname_local_fingerprint
    s2 = Settings.from_params(
        url_fingerprint_function="frontera_ray.fingerprint.md5")
    from frontera_ray.fingerprint import md5 as repo_md5

    assert load_object(s2.URL_FINGERPRINT_FUNCTION) is repo_md5


def test_msgpack_codec_selectable():
    from frontera_ray.codecs import CODECS

    assert Settings().MESSAGE_BUS_CODEC in CODECS
    enc, dec = CODECS["msgpack"]
    evs = [{"type": "us", "fingerprint": 5, "url": "http://a/", "score": 0.5,
            "schedule": True}]
    out = dec(enc(evs))
    assert out[0]["type"] == "us" and out[0]["score"] == 0.5
