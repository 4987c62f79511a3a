"""Real-HTTP fetch adapter (contrib.httpweb.HttpWeb) through the full
Ray crawl pipeline against a LOCAL test HTTP server (hermetic — no
external network; gated on the `requests` lib and loopback sockets).
Reference semantics: contrib/requests/manager.py + the grequests
links_follower example."""

import threading

import pyarrow.parquet as pq
import pytest

requests = pytest.importorskip("requests")


@pytest.fixture(scope="module")
def http_site(tmp_path_factory):
    """Static site: index -> a/b -> images + a robots-disallowed page."""
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    from frontera_ray.payload import gen_pixels, png_encode

    root = tmp_path_factory.mktemp("site")
    pix, _ = gen_pixels("http://t/img")
    (root / "img1.png").write_bytes(png_encode(pix))
    (root / "img2.png").write_bytes(png_encode(pix[::2, ::2]))
    (root / "index.html").write_text(
        "<html><head><title>Index Page</title></head><body>"
        '<a href="/a.html">a</a> <a href="b.html">b</a>'
        '<a href="/secret/hidden.html">s</a></body></html>')
    (root / "a.html").write_text(
        '<html><head><title>A</title></head>'
        '<body><img src="/img1.png"><a href="/index.html">up</a></body></html>')
    (root / "b.html").write_text(
        '<html><head><title>B</title></head>'
        '<body><img src="img2.png"></body></html>')
    (root / "secret").mkdir()
    (root / "secret" / "hidden.html").write_text("<html>no</html>")
    (root / "robots.txt").write_text("User-agent: *\nDisallow: /secret\n")

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_httpweb_adapter_units(http_site):
    from frontera_ray.contrib.httpweb import HttpWeb

    web = HttpWeb([f"http://{http_site}/index.html"])
    links = web.links_of(f"http://{http_site}/index.html")
    assert f"http://{http_site}/a.html" in links
    assert f"http://{http_site}/b.html" in links  # relative absolutized
    cols = web.fetch_batch([f"http://{http_site}/index.html",
                            f"http://{http_site}/img1.png"])
    assert cols["fmt"] == ["html", "png"]
    assert cols["caption"][0] == "Index Page"
    assert cols["w"][1] > 0 and cols["h"][1] > 0  # real decode
    assert web.robots_body("127.0.0.1").startswith("User-agent")


def test_httpweb_full_ray_crawl(ray_session, http_site, tmp_path):
    """The whole pipeline — queue shards, robots gating, dedup, sink —
    over real HTTP: crawls the site, never touches the disallowed
    subtree, and lands decodable image rows in the sink."""
    from frontera_ray.contrib.httpweb import HttpWeb
    from frontera_ray.payload import decode_image
    from frontera_ray.pipelines.crawl import RayCrawler

    web = HttpWeb([f"http://{http_site}/index.html"])
    c = RayCrawler(
        web, str(tmp_path / "out"), num_state_shards=1, num_queue_shards=1,
        batch_per_shard=16,
        queue_kwargs=dict(robots_enabled=True,
                          robots_provider=web.robots_body))
    c.add_seeds(web.seeds())
    c.run(max_rounds=10)
    urls = c.crawled_urls()
    assert f"http://{http_site}/index.html" in urls
    assert f"http://{http_site}/a.html" in urls
    assert f"http://{http_site}/b.html" in urls
    assert f"http://{http_site}/img1.png" in urls
    assert f"http://{http_site}/img2.png" in urls
    assert not any("/secret/" in u for u in urls)  # robots honored
    assert len(urls) == len(set(urls))  # URL-seen dedup over real HTTP

    frags = sorted((tmp_path / "out").glob("round=*/*.parquet"))
    t = pq.read_table(frags[0]).to_pylist() if frags else []
    rows = {r["image_id"]: r for r in
            (row for f in frags for row in pq.read_table(f).to_pylist())}
    png = rows[f"http://{http_site}/img1.png"]
    assert png["fmt"] == "png" and png["w"] > 0
    pix = decode_image(png["bytes"], "png")
    assert pix.shape == (png["h"], png["w"], 3)
    html = rows[f"http://{http_site}/index.html"]
    assert html["fmt"] == "html" and html["caption"] == "Index Page"


def test_httpweb_robots_port_via_sample_url(ray_session, tmp_path_factory,
                                            tmp_path):
    """A second origin on its OWN non-default port, reachable only
    through a cross-site link (never in the seed list): its robots.txt
    must still be honored. The queue forwards a sample queued URL to
    two-arg robots providers (QueueShard._domain_meta), which pins the
    scheme and port — the lazily-learned per-worker netloc map alone
    would fall back to port 80 and silently treat the host as
    allow-all (the r4 advisory gap)."""
    import threading
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    from frontera_ray.contrib.httpweb import HttpWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    def serve(root):
        class Handler(SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=str(root), **kw)

            def log_message(self, *a):
                pass

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    # origin B: robots forbids /secret; known only via a link from A.
    # Host key "localhost" (vs A's "127.0.0.1") => first contact with B
    # happens inside a queue shard whose HttpWeb copy never saw B's port.
    root_b = tmp_path_factory.mktemp("site_b")
    (root_b / "landing.html").write_text(
        '<html><head><title>B</title></head>'
        '<body><a href="/secret/x.html">x</a></body></html>')
    (root_b / "secret").mkdir()
    (root_b / "secret" / "x.html").write_text("<html>no</html>")
    (root_b / "robots.txt").write_text("User-agent: *\nDisallow: /secret\n")
    srv_b = serve(root_b)
    port_b = srv_b.server_address[1]

    root_a = tmp_path_factory.mktemp("site_a")
    (root_a / "index.html").write_text(
        '<html><body>'
        f'<a href="http://localhost:{port_b}/landing.html">b</a>'
        "</body></html>")
    (root_a / "robots.txt").write_text("User-agent: *\nAllow: /\n")
    srv_a = serve(root_a)
    port_a = srv_a.server_address[1]

    try:
        web = HttpWeb([f"http://127.0.0.1:{port_a}/index.html"])
        c = RayCrawler(
            web, str(tmp_path / "out"), num_state_shards=1,
            num_queue_shards=1, batch_per_shard=16,
            queue_kwargs=dict(robots_enabled=True,
                              robots_provider=web.robots_body))
        c.add_seeds(web.seeds())
        c.run(max_rounds=10)
        urls = c.crawled_urls()
        assert f"http://localhost:{port_b}/landing.html" in urls
        assert not any("/secret/" in u for u in urls)
    finally:
        srv_a.shutdown()
        srv_b.shutdown()


def test_httpweb_retry_and_request_error_states(ray_session,
                                                tmp_path_factory,
                                                tmp_path):
    """Downloader-grade error path through the full pipeline: a 404
    link is fetched once, lands as an honest fmt='error' sink row, and
    its fingerprint is marked states ERROR (the reference
    request_error semantics) while a flaky URL (500 twice, then 200)
    is retried to success and sinked as real content. The optimistic
    CRAWLED wave must not overwrite the ERROR mark regardless of
    ordering (no-downgrade on the state shard)."""
    import threading
    from collections import Counter
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np

    from frontera_ray.contrib.httpweb import HttpWeb
    from frontera_ray.fingerprint import fp64_batch
    from frontera_ray.pipelines.crawl import RayCrawler
    from frontera_ray.state.urlseen import States
    from frontera_ray.urls import canonicalize_batch

    hits = Counter()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits[self.path] += 1
            if self.path == "/index.html":
                body = (b'<html><body><a href="/missing.html">m</a>'
                        b'<a href="/flaky.html">f</a></body></html>')
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/flaky.html":
                if hits[self.path] <= 2:
                    self.send_response(500)
                    self.end_headers()
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(
                        b"<html><head><title>Flaky OK</title></head></html>")
            else:
                self.send_response(404)
                self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    site = f"127.0.0.1:{srv.server_address[1]}"
    try:
        web = HttpWeb([f"http://{site}/index.html"], backoff=0.01)
        c = RayCrawler(web, str(tmp_path / "out"), num_state_shards=2,
                       num_queue_shards=1, batch_per_shard=16)
        c.add_seeds(web.seeds())
        c.run(max_rounds=10)
        urls = c.crawled_urls()
        missing = f"http://{site}/missing.html"
        flaky = f"http://{site}/flaky.html"
        assert missing in urls and flaky in urls
        # retry path: 500 twice then fetched OK
        assert hits["/flaky.html"] == 3
        # 4xx is terminal: exactly one request, no retry storm
        assert hits["/missing.html"] == 1
        # sink rows: flaky has real content, missing is an error row
        import pyarrow.parquet as pq
        rows = {r["image_id"]: r for f in
                sorted((tmp_path / "out").glob("round=*/*.parquet"))
                for r in pq.read_table(f).to_pylist()}
        assert rows[flaky]["fmt"] == "html"
        assert rows[flaky]["caption"] == "Flaky OK"
        assert rows[missing]["fmt"] == "error"
        assert rows[missing]["caption"] == "http_404"
        # states: missing is ERROR, flaky is CRAWLED
        import ray
        fps = fp64_batch(canonicalize_batch(
            np.asarray([missing, flaky], dtype=object)))
        n = len(c.state_actors)
        got = {}
        for u, fp in zip((missing, flaky), fps):
            sid = int(fp % np.uint64(n))
            got[u] = int(ray.get(
                c.state_actors[sid].get_states.remote(
                    np.asarray([fp], np.uint64)))[0])
        assert got[missing] == States.ERROR
        assert got[flaky] == States.CRAWLED
    finally:
        srv.shutdown()
