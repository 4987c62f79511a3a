"""Deterministic synthetic web graphs.

The crawl engine is tested/benchmarked against purely synthetic webs where
``links_of(url)`` is a *pure function* of the URL — no stored adjacency is
needed at scale, mirroring the reference's generated balanced link trees
(``create_test_site``, frontera/utils/graphs/data.py:5-23) used by its
golden-ordering suite (tests/backends.py:120-125).

Two families:

- ``site_tree(prefix, max_depth, branching, self_link)``: explicit
  page -> links list, byte-for-byte equal to the reference generator's
  output shape (pages only exist above max_depth; leaf URLs appear only
  as links). Used for SITE_01/02/03 golden sequences.
- ``SyntheticWeb``: a pure-function web over hosts
  ``http://host-{i}.test/{digits}`` with per-host depth/branching drawn
  deterministically (Zipf-skewed page counts for skew testing). Used for
  bench-scale frontiers (FIXTURES.md §F7).
"""

from __future__ import annotations

import numpy as np


def site_tree(prefix: str, max_depth: int, branching: int, self_link: bool = False):
    """List of (page_url, [link_urls]) for a balanced tree site.

    Parity with reference ``create_test_site`` (frontera/utils/graphs/
    data.py:5-23): the root is ``prefix + '1'``; a page at depth d <
    max_depth-? has children page+digit; with ``self_link`` every page
    also links to itself (appended last)."""
    pages = []

    def rec(page: str, depth: int):
        depth += 1
        if depth < max_depth:
            links = [page + str(k) for k in range(1, branching + 1)]
            pages.append((page, links))
            for link in links:
                rec(link, depth)
            if self_link:
                links.append(page)

    rec(prefix + "1", 0)
    return pages


# The three site lists driving the reference golden-ordering corpus
# (frontera/utils/graphs/data.py:65-104).
def SITE_LIST_01():
    return [site_tree("http://aaa.com/", 4, 2)]


def SITE_LIST_02():
    return [site_tree("http://aaa.com/", 4, 2), site_tree("http://bbb.com/", 4, 2)]


def SITE_LIST_03():
    return [site_tree("http://ccc.com/", 5, 2, self_link=True)]


# Multi-domain graph with subdomains and cross-links used by the
# overused-buffer suite (frontera/utils/graphs/data.py SITE_LIST_09,
# tests/test_overused_buffer.py:10-47). First page of each site = seed.
def SITE_LIST_09():
    return [
        [
            ("https://www.a.com", [
                "http://www.a.com/2",
                "http://www.a.com/2/1",
                "http://www.a.com/3",
                "http://www.a.com/2/1/3",
                "http://www.a.com/2/4/1",
                "http://www.a.com/2/4/2",
                "http://www.a.net",
            ]),
        ],
        [
            ("http://b.com", [
                "http://b.com/2",
                "http://www.a.net",
                "http://test.cloud.c.com",
                "http://b.com",
            ]),
            ("http://b.com/entries?page=2", [
                "http://b.com/entries?page=2",
                "http://b.com",
            ]),
        ],
        [
            ("http://test.cloud.c.com", [
                "http://cloud.c.com",
                "http://test.cloud.c.com/2",
            ]),
            ("http://test.cloud.c.com/2", [
                "http://b.com/entries?page=2",
                "http://test.cloud.c.com",
            ]),
        ],
    ]


class GraphManager:
    """Materialized page->links web (test scale only) with seeds = first
    page of each site, like the reference graphs.Manager. ``errors`` is
    a set of URLs whose fetch fails (reference pages with error status
    trigger request_error instead of page_crawled)."""

    def __init__(self, site_list, errors=()):
        self.pages = {}
        self.seeds = []
        self.errors = set(errors)
        for site in site_list:
            if site:
                self.seeds.append(site[0][0])
            for url, links in site:
                self.pages[url] = list(links)

    def links_of(self, url: str):
        return self.pages.get(url, [])

    def all_urls(self):
        urls = set(self.pages)
        for links in self.pages.values():
            urls.update(links)
        return urls


# ---------------------------------------------------------------------------
# pure-function bench-scale web
# ---------------------------------------------------------------------------

# (max_depth, branching) classes; tree size ~ branching^(depth-1) pages.
_HOST_CLASSES = [
    (4, 2),    # tiny: 7 pages
    (5, 2),    # 15
    (5, 3),    # 40
    (6, 3),    # 121
    (7, 3),    # 364
    (6, 5),    # 781
    (7, 5),    # 3906
    (8, 5),    # ~19.5k
]


class SyntheticWeb:
    """Pure-function web: ``http://host-{i:05d}.test/{digits}``.

    Host i's tree shape comes from a deterministic Zipf-ish assignment:
    most hosts are tiny, a few are huge (skew testing, FIXTURES.md §F7).
    ``links_of`` needs no state — safe to call from any Ray task."""

    def __init__(self, num_hosts: int, seed: int = 42, max_class: int | None = None):
        self.num_hosts = num_hosts
        self.seed = seed
        rng = np.random.default_rng(seed)
        n_cls = len(_HOST_CLASSES) if max_class is None else max_class
        # Zipf over classes: P(class c) ∝ 1/(c+1)^1.5 with class index in
        # size order — most hosts tiny, a few huge (skew profile)
        w = 1.0 / np.arange(1, n_cls + 1) ** 1.5
        w /= w.sum()
        self._cls = rng.choice(n_cls, size=num_hosts, p=w)
        self._cls.flags.writeable = False

    def host(self, i: int) -> str:
        return f"host-{i:05d}.test"

    def seeds(self):
        return [f"http://{self.host(i)}/1" for i in range(self.num_hosts)]

    def shape_of(self, host: str):
        i = int(host[5:10])
        return _HOST_CLASSES[self._cls[i]]

    # every 7th host publishes its first child link through a redirecting
    # alias URL (`...?r=1` -> 301 -> the real page), exercising the
    # canonical-solver path in live crawls
    REDIRECT_HOST_MOD = 7

    def _is_redirect_host(self, host: str) -> bool:
        try:
            return int(host[5:10]) % self.REDIRECT_HOST_MOD == 3
        except (ValueError, IndexError):
            return False

    def resolve(self, url: str) -> str:
        """Follow the (single-hop) synthetic redirect; identity for
        normal URLs. Pure function — safe in any task."""
        return url[:-4] if url.endswith("?r=1") else url

    def links_of(self, url: str):
        # url = http://host-XXXXX.test/<digits>[?r=1]
        url = self.resolve(url)
        try:
            rest = url.split("//", 1)[1]
            host, path = rest.split("/", 1)
        except (IndexError, ValueError):
            return []
        max_depth, branching = self.shape_of(host)
        if len(path) + 1 >= max_depth:
            return []
        out = [url + str(k) for k in range(1, branching + 1)]
        if self._is_redirect_host(host):
            out[0] = out[0] + "?r=1"  # first child advertised via alias
        return out

    # -- batched adapter API (the crawl hot path) -----------------------
    # fetch_and_sink calls these once per Arrow batch instead of the
    # per-row resolve()/links_of() list comps; both are pure and
    # byte-identical to the scalar methods (asserted in pytest).
    def resolve_batch(self, urls) -> list:
        """Vectorized resolve(): '?r=1' only ever appears as the alias
        suffix in this web, so one substring replace strips it."""
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = urls if isinstance(urls, pa.Array) else pa.array(
            list(urls), pa.string())
        return pc.replace_substring(arr, "?r=1", "").to_pylist()

    def links_of_batch(self, urls):
        """Vectorized links_of() over a batch: returns
        ``(flat_links: pa.StringArray, counts: np.ndarray[int64])``
        where flat_links concatenates each URL's outlinks in order.
        Arrow-kernel parse (host index slice + path length), per-host
        shape lookup via one np.take, children built with ONE
        binary_join_element_wise — no per-row Python. Falls back to the
        scalar path if any URL is not canonical ``http://host-XXXXX.
        test/<digits>`` (never in a live crawl; robots/sitemap URLs are
        routed by DiscoveryWeb before reaching here)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        finals = self.resolve_batch(urls)
        n = len(finals)
        if n == 0:
            return pa.array([], pa.string()), np.zeros(0, np.int64)
        arr = pa.array(finals, pa.string())
        ok = pc.all(pc.and_(
            pc.starts_with(arr, "http://host-"),
            pc.match_substring_regex(
                arr, r"^http://host-\d{5}\.test/\d+$"))).as_py()
        if not ok:  # non-canonical rows: scalar fallback for the batch
            links = [self.links_of(u) for u in finals]
            counts = np.asarray([len(l) for l in links], np.int64)
            return (pa.array([u for lst in links for u in lst],
                             pa.string()), counts)
        hosts_i = pc.cast(pc.utf8_slice_codeunits(arr, 12, 17),
                          pa.int64()).to_numpy()
        plen = (pc.utf8_length(arr).to_numpy() - 23).astype(np.int64)
        shapes = np.asarray(_HOST_CLASSES, dtype=np.int64)[
            self._cls[hosts_i]]
        md, br = shapes[:, 0], shapes[:, 1]
        counts = np.where(plen + 1 < md, br, 0).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            return pa.array([], pa.string()), counts
        rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        starts = np.cumsum(counts) - counts
        link_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        parents = arr.take(pa.array(rep))
        digits = pc.cast(pa.array(link_idx + 1, pa.int64()), pa.string())
        alias = np.where((hosts_i[rep] % self.REDIRECT_HOST_MOD == 3)
                         & (link_idx == 0), "?r=1", "")
        flat = pc.binary_join_element_wise(
            parents, digits, pa.array(alias.tolist(), pa.string()), "")
        return flat, counts

    # every (3k+1)-th host publishes a sitemap index (robots 'Sitemap:'
    # line -> /sitemap.xml -> one deep page + a sub-sitemap with another)
    SITEMAP_HOST_MOD = 3

    def _has_sitemap(self, host: str) -> bool:
        try:
            return int(host[5:10]) % self.SITEMAP_HOST_MOD == 1
        except (ValueError, IndexError):
            return False

    def robots_body(self, host: str) -> str | None:
        """Deterministic synthetic robots.txt: every 5th host disallows
        its '/12' subtree and asks for a crawl delay; sitemap hosts
        declare their sitemap index; others have none."""
        try:
            i = int(host[5:10])
        except (ValueError, IndexError):
            return None
        parts = []
        if i % 5 == 0:
            parts.append("User-agent: *\nDisallow: /12\nCrawl-delay: 1\n")
        if self._has_sitemap(host):
            parts.append(f"Sitemap: http://{host}/sitemap.xml\n")
        return "".join(parts) or None

    def sitemap_body(self, url: str) -> str | None:
        """Deterministic sitemap XML: the index lists the host's deepest
        all-1s page plus a sub-sitemap; the sub-sitemap lists the
        deepest all-2s page (sub-sitemap recursion fixture)."""
        rest = self.resolve(url).split("//", 1)[-1]
        host, _, path = rest.partition("/")
        if not self._has_sitemap(host):
            return None
        max_depth, branching = self.shape_of(host)
        if path == "sitemap.xml":
            deep = "1" * max(1, max_depth - 1)
            return (f"<urlset><url><loc>http://{host}/{deep}</loc></url>"
                    f"<sitemap><loc>http://{host}/sitemap-sub.xml</loc>"
                    f"</sitemap></urlset>")
        if path == "sitemap-sub.xml":
            d = str(min(2, branching))
            deep2 = d * max(1, max_depth - 1)
            return f"<urlset><url><loc>http://{host}/{deep2}</loc></url></urlset>"
        return None

    def total_pages(self) -> int:
        tot = 0
        for c in self._cls:
            d, b = _HOST_CLASSES[c]
            tot += (b ** (d - 1) - 1) // (b - 1)
        return tot


class ContentTwinWeb:
    """Duplicate-planting wrapper web for near-dup testing/benching:
    pages whose path ends in '2' FETCH the content of their '1' sibling
    (``resolve_batch`` is the fetch side only — link generation
    delegates to the wrapped web, so the crawl tree is unchanged).
    Every branching>=2 parent therefore yields one planted exact
    duplicate image pair for ``RayCrawler.dedup_sink`` to find."""

    def __init__(self, base):
        self.base = base

    def seeds(self):
        return self.base.seeds()

    def links_of(self, url):
        return self.base.links_of(url)

    def links_of_batch(self, urls):
        return self.base.links_of_batch(urls)

    def total_pages(self):
        return self.base.total_pages()

    def resolve(self, url):
        return url[:-1] + "1" if url.endswith("2") else url

    def resolve_batch(self, urls):
        return [u[:-1] + "1" if u.endswith("2") else u for u in urls]

    def __getattr__(self, name):
        base = self.__dict__.get("base")
        if base is None or name.startswith("__"):
            raise AttributeError(name)
        return getattr(base, name)


class DiscoveryWeb:
    """Discovery-cycle adapter (reference strategy/discovery/__init__.py:
    284-371): robots.txt URLs resolve their outlinks to the 'Sitemap:'
    URLs the robots body declares; sitemap URLs resolve to
    ``parse_sitemap`` of the XML body (pages + sub-sitemaps, index
    sampled at ``max_sitemaps``) so sub-sitemap recursion happens
    through the normal crawl loop; every other URL delegates to the
    wrapped web. Pure functions — safe to broadcast into Ray tasks."""

    def __init__(self, base, max_sitemaps: int = 100, seed: int = 42):
        self.base = base
        self.max_sitemaps = max_sitemaps
        self.seed = seed

    def seeds(self):
        return self.base.seeds()

    def robots_body(self, host: str):
        return self.base.robots_body(host)

    def resolve(self, url: str) -> str:
        return self.base.resolve(url) if hasattr(self.base, "resolve") else url

    def __getattr__(self, name):
        # everything not overridden (total_pages, shape_of, ...) passes
        # through to the wrapped web. Guarded for pickling: dunder
        # lookups during deserialization arrive before ``base`` exists
        # and must raise AttributeError, not recurse.
        base = self.__dict__.get("base")
        if base is None or name.startswith("__"):
            raise AttributeError(name)
        return getattr(base, name)

    def links_of_batch(self, urls):
        """Batched adapter API with discovery routing: page URLs go
        through the wrapped web's vectorized ``links_of_batch``;
        robots/sitemap URLs (a tiny minority of any round) take the
        scalar discovery path; results reassemble in input order.
        Overridden here because ``__getattr__`` passthrough would send
        robots/sitemap URLs down the page fast path."""
        import pyarrow as pa

        from .strategies import classify_url

        urls = list(urls) if not isinstance(urls, list) else urls
        kinds = [classify_url(u) for u in urls]
        if all(k == "page" for k in kinds):
            return self.base.links_of_batch(urls)
        links = [self.links_of(u) if k != "page" else None
                 for u, k in zip(urls, kinds)]
        page_urls = [u for u, k in zip(urls, kinds) if k == "page"]
        if page_urls:
            flat, counts = self.base.links_of_batch(page_urls)
            flat = flat.to_pylist()
            pos = 0
            it = iter(range(len(page_urls)))
            for i, k in enumerate(kinds):
                if k == "page":
                    c = int(counts[next(it)])
                    links[i] = flat[pos:pos + c]
                    pos += c
        counts = np.asarray([len(l) for l in links], np.int64)
        return (pa.array([u for lst in links for u in lst], pa.string()),
                counts)

    def links_of(self, url: str):
        from .filters import parse_sitemap, sample_sitemaps
        from .strategies import classify_url

        kind = classify_url(url)
        if kind == "robots":
            host = url.split("//", 1)[-1].split("/", 1)[0]
            body = self.base.robots_body(host) or ""
            return [ln.split(":", 1)[1].strip() for ln in body.splitlines()
                    if ln.lower().startswith("sitemap:")]
        if kind == "sitemap":
            body = self.base.sitemap_body(url) or ""
            pages, subs = [], []
            for loc, is_sub in parse_sitemap(body):
                (subs if is_sub else pages).append(loc)
            subs = sample_sitemaps(subs, self.max_sitemaps, self.seed)
            return subs + pages
        return self.base.links_of(url)
