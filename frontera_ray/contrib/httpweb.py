"""Real HTTP fetch adapter behind the synthetic-web protocol.

``HttpWeb`` plugs the live crawl pipeline (pipelines/crawl.py) into a
real HTTP origin: the same duck-typed surface the deterministic webs
expose (``seeds`` / ``resolve_batch`` / ``links_of_batch`` /
``robots_body`` / ``sitemap_body``) plus ``fetch_batch`` — the hook
``fetch_and_sink`` prefers over the simulated payload generator when an
adapter provides real content. Reference shape:
frontera/contrib/requests/manager.py:1-60 (requests-based frontier
manager) and examples/grequests/links_follower.py (batch fetch + link
follow loop); the Ray rebuild keeps the reference's semantics (politeness
and robots live in the queue shards, not here) and makes the adapter a
broadcastable value object.

Execution model: the instance is ``ray.put`` once by the crawler and
resolved inside every fetch task. All live state (requests.Session,
per-round body cache) is created lazily per WORKER PROCESS and excluded
from pickling, so the object stays a pure config capsule on the wire.
``fetch_batch`` GETs a batch with a bounded thread fan-out (network
I/O releases the GIL; per-task threads beat per-URL tasks because a
fetch is latency- not CPU-bound) and caches bodies so the
``links_of_batch`` call that follows in the same task re-parses the
cached body instead of re-fetching. Politeness: the queue's crawl-delay
budget and per-host round caps shape WHAT lands in a batch; the adapter
additionally serializes requests per host inside a batch (one
connection per host, ``max_per_host_conn=1``) so a burst never hits one
origin in parallel.

Content mapping to the sink schema (image_id, bytes, w, h, fmt,
caption, phash): decodable images (png / the qimg test codec) carry
real (w, h) and a real pixel phash; other content types are honest
opaque rows — fmt = media subtype ('html', 'jpeg', ...), w = h = 0,
phash = md5-top-64 of the body (two's complement int64), caption =
<title> text for HTML, '' otherwise. JPEG decode stays gated exactly
like payload.decode_image (no PIL in this environment).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urldefrag, urljoin, urlsplit

import numpy as np
import pyarrow as pa

_LINK_RE = re.compile(rb"""(?:href|src)\s*=\s*["']([^"'#>\s]+)""", re.I)
_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.I | re.S)


def _content_hash64(body: bytes) -> int:
    """md5-top-64 of the body, two's-complement int64 (the same
    SQL-expressible convention as the text family's token hash)."""
    u = int.from_bytes(hashlib.md5(body).digest()[:8], "big")
    return u - (1 << 64) if u >= (1 << 63) else u


class HttpWeb:
    """Requests-backed web adapter (see module docstring)."""

    def __init__(self, seed_urls, timeout: float = 10.0,
                 max_threads: int = 16, max_body: int = 1 << 22,
                 user_agent: str = "frontera-ray/0.1",
                 allowed_schemes=("http", "https"),
                 max_retries: int = 2, backoff: float = 0.2):
        self._seeds = [u for u in seed_urls if u.strip()]
        self.timeout = float(timeout)
        self.max_threads = int(max_threads)
        self.max_body = int(max_body)
        self.user_agent = user_agent
        self.allowed_schemes = tuple(allowed_schemes)
        # downloader-grade error handling (reference shape:
        # contrib/requests/manager.py + the Scrapy downloader's
        # RETRY_TIMES semantics): transport errors and retryable
        # statuses (429/5xx) retry with linear backoff up to
        # max_retries; terminal failures are classified per URL and
        # surfaced via errors_of_batch -> states ERROR
        self.max_retries = int(max_retries)
        self.backoff = float(backoff)
        # hostname -> netloc (host[:port]) learned from seeds/links, so
        # robots_body(host) — the queue strips ports — finds the origin
        self._netloc_of = {}
        for u in self._seeds:
            p = urlsplit(u)
            if p.hostname:
                self._netloc_of[p.hostname] = p.netloc

    # -- pickling: ship config only; live state is per-process ---------
    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_local", None)
        return d

    @property
    def _state(self):
        loc = self.__dict__.get("_local")
        if loc is None:
            import requests

            s = requests.Session()
            s.headers["User-Agent"] = self.user_agent
            loc = self.__dict__["_local"] = {"session": s, "bodies": {},
                                             "errors": {}}
        return loc

    # -- protocol surface ----------------------------------------------
    def seeds(self):
        return list(self._seeds)

    def resolve(self, url: str) -> str:
        return url  # canonical key = requested URL; GET follows 3xx

    def resolve_batch(self, urls):
        return list(urls)

    def _get(self, url: str):
        """(body, content_type) with redirects followed, size capped,
        bounded retries, and per-URL error classification.

        Transport errors (timeout / connection) and retryable statuses
        (429, 5xx) retry up to ``max_retries`` times with linear
        backoff; non-2xx is a FAILURE (body discarded — a 404 page's
        HTML must not be sinked or link-parsed as content). Terminal
        failures return (b'', '') so the round never wedges, and the
        error kind ('timeout' / 'connect' / 'http_<status>' / 'error')
        is recorded for ``errors_of_batch`` — the crawl engine marks
        those fingerprints states ERROR (reference request_error
        semantics, worker/strategy.py)."""
        import time as _time

        import requests

        st = self._state
        if url in st["bodies"]:
            return st["bodies"][url]
        body, ctype, err = b"", "", None
        for attempt in range(self.max_retries + 1):
            err = None
            try:
                r = st["session"].get(url, timeout=self.timeout,
                                      stream=True)
                status = int(r.status_code)
                if status >= 400:
                    err = f"http_{status}"
                    r.close()
                    if status != 429 and status < 500:
                        break  # 4xx (bar 429) is terminal — no retry
                else:
                    body = r.raw.read(self.max_body,
                                      decode_content=True) or b""
                    ctype = (r.headers.get("Content-Type")
                             or "").split(";")[0].strip()
                    r.close()
                    break
            except requests.Timeout:
                err = "timeout"
            except requests.ConnectionError:
                err = "connect"
            except Exception:
                err = "error"
            if attempt < self.max_retries:
                _time.sleep(self.backoff * (attempt + 1))
        if err is not None:
            body, ctype = b"", ""
            st["errors"][url] = err
        # cache is per fetch_batch round (cleared there) — bounded
        st["bodies"][url] = (body, ctype)
        return body, ctype

    def errors_of_batch(self, urls):
        """Per-URL terminal error kind for the LAST fetch round (None
        for successes) — the engine's request_error hook
        (pipelines/crawl.fetch_and_sink)."""
        errs = self._state["errors"]
        return [errs.get(u) for u in urls]

    def _get_many(self, urls):
        """Batch GET with a bounded thread pool, serialized per host
        (one in-flight request per origin inside a batch)."""
        from concurrent.futures import ThreadPoolExecutor

        by_host: dict = {}
        for u in urls:
            by_host.setdefault(urlsplit(u).netloc, []).append(u)

        def run_host(us):
            for u in us:
                self._get(u)

        n = max(1, min(self.max_threads, len(by_host)))
        with ThreadPoolExecutor(n) as ex:
            list(ex.map(run_host, by_host.values()))

    def fetch_batch(self, urls) -> dict:
        """One batch of real fetches -> sink-schema columns (image_id is
        overwritten with the requested URL by fetch_and_sink)."""
        from ..payload import decode_image, phash64

        st = self._state
        st["bodies"].clear()  # fresh round: cap memory, learn redirects
        st["errors"].clear()
        self._get_many(urls)
        out = {"image_id": [], "bytes": [], "w": [], "h": [],
               "fmt": [], "caption": [], "phash": []}
        for u in urls:
            body, ctype = self._get(u)
            err = st["errors"].get(u)
            if err is not None:
                # honest failure row: keeps round fragments complete
                # (one row per popped URL) without fake content; phash
                # keys on the URL so error rows never collide in the
                # sink's phash near-dup pass
                out["image_id"].append(u)
                out["bytes"].append(b"")
                out["w"].append(np.int32(0))
                out["h"].append(np.int32(0))
                out["fmt"].append("error")
                out["caption"].append(err)
                out["phash"].append(np.int64(
                    _content_hash64(u.encode("utf8"))))
                continue
            fmt = (ctype.split("/")[-1] if ctype else
                   ("html" if body[:1] in (b"<", b"\xef") else "bin"))
            w = h = 0
            caption = ""
            phash = _content_hash64(body)
            if fmt in ("png", "qimg"):
                try:
                    pix = decode_image(body, fmt)
                    h, w = int(pix.shape[0]), int(pix.shape[1])
                    phash = int(phash64(pix))
                except Exception:  # undecodable: honest opaque row
                    pass
            elif fmt == "html":
                m = _TITLE_RE.search(body)
                if m:
                    caption = m.group(1).decode("utf8", "replace").strip()
            out["image_id"].append(u)
            out["bytes"].append(body)
            out["w"].append(np.int32(w))
            out["h"].append(np.int32(h))
            out["fmt"].append(fmt)
            out["caption"].append(caption)
            out["phash"].append(np.int64(phash))
        return out

    # -- link extraction -------------------------------------------------
    def links_of(self, url: str):
        body, ctype = self._get(url)
        if not body or (ctype and not ctype.startswith("text/")):
            return []
        base = url
        seen, out = set(), []
        for raw in _LINK_RE.findall(body):
            try:
                absu = urldefrag(urljoin(base, raw.decode("utf8", "replace")))[0]
            except ValueError:
                continue
            p = urlsplit(absu)
            if p.scheme not in self.allowed_schemes or not p.hostname:
                continue
            if p.hostname not in self._netloc_of:
                self._netloc_of[p.hostname] = p.netloc
            if absu not in seen:
                seen.add(absu)
                out.append(absu)
        return out

    def links_of_batch(self, urls):
        urls = list(urls)
        self._get_many(urls)  # cached from fetch_batch in the same task
        links = [self.links_of(u) for u in urls]
        counts = np.asarray([len(l) for l in links], np.int64)
        return (pa.array([u for lst in links for u in lst], pa.string()),
                counts)

    # -- robots / sitemap --------------------------------------------------
    def robots_body(self, host: str, sample_url: str | None = None):
        """robots.txt for ``host``. The queue forwards a sample queued
        URL (two-arg provider protocol, QueueShard._domain_meta), which
        pins the TRUE origin — scheme AND non-default port. The lazily
        learned ``_netloc_of`` map is per worker process, so a host
        first seen on a different worker would otherwise fall back to
        the bare hostname over http and silently miss its port."""
        scheme, netloc = "http", self._netloc_of.get(host, host)
        if sample_url:
            p = urlsplit(sample_url)
            if p.scheme in self.allowed_schemes and p.netloc:
                scheme, netloc = p.scheme, p.netloc
                if p.hostname:
                    self._netloc_of.setdefault(p.hostname, p.netloc)
        body, ctype = self._get(f"{scheme}://{netloc}/robots.txt")
        if not body:
            return None
        try:
            return body.decode("utf8")
        except UnicodeDecodeError:
            return None

    def sitemap_body(self, url: str):
        body, _ = self._get(url)
        try:
            return body.decode("utf8") if body else None
        except UnicodeDecodeError:
            return None
