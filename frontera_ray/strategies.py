"""Crawling strategies: scoring policies for seeds and extracted links.

Mirrors the reference strategy surface (frontera/strategy/__init__.py:
7-151 — read_seeds / links_extracted / page_crawled / schedule(score))
reduced to its decision kernel: a score for every scheduled request.

Golden-corpus strategies (tests/backends.py:12-73):
- Basic: constant score 1.0 (queue profile then decides FIFO/LIFO).
- DFS:   score = 1/(depth+1)   (deeper = smaller = popped first under
         the 'min_score' profile — depth-first).
- BFS:   score = depth/10      (shallower = smaller = popped first —
         breadth-first).

Library strategies (frontera/strategy/depth.py:35-42):
- DepthBFS: 1 - depth/(depth+1); DepthDFS: depth/(depth+1) (used with
  the 'max_score' production profile).

Discovery scoring (frontera/strategy/discovery/__init__.py:47-50,209,
322,399-401,425): host-salted deciles + per-class constants.
"""

from __future__ import annotations

import numpy as np

from .fingerprint import crc32_batch


class BasicStrategy:
    """Constant score; ordering comes from the queue profile."""

    name = "basic"

    def seed_scores(self, urls) -> np.ndarray:
        return np.ones(len(urls), dtype=np.float64)

    def link_scores(self, parent_depth: int, urls) -> np.ndarray:
        return np.ones(len(urls), dtype=np.float64)


class DFSStrategy(BasicStrategy):
    name = "dfs"

    def seed_scores(self, urls):
        return np.full(len(urls), 1.0)  # depth 0 -> 1/(0+1)

    def link_scores(self, parent_depth, urls):
        return np.full(len(urls), 1.0 / (parent_depth + 2.0))


class BFSStrategy(BasicStrategy):
    name = "bfs"

    def seed_scores(self, urls):
        return np.zeros(len(urls))  # depth 0 -> 0/10

    def link_scores(self, parent_depth, urls):
        return np.full(len(urls), (parent_depth + 1) / 10.0)


class DepthBFSStrategy(BasicStrategy):
    """score = 1 - d/(d+1); use with 'max_score' profile."""

    name = "depth_bfs"

    def seed_scores(self, urls):
        return np.ones(len(urls))

    def link_scores(self, parent_depth, urls):
        d = parent_depth + 1
        return np.full(len(urls), 1.0 - d / (d + 1.0))


class DepthDFSStrategy(BasicStrategy):
    """score = d/(d+1); use with 'max_score' profile."""

    name = "depth_dfs"

    def seed_scores(self, urls):
        return np.zeros(len(urls))

    def link_scores(self, parent_depth, urls):
        d = parent_depth + 1
        return np.full(len(urls), d / (d + 1.0))


def discovery_salted_scores(hosts, base_scores: np.ndarray) -> np.ndarray:
    """Host-salted decile scores: floor(|crc32(host)/2^31-1| * 10)/10 +
    max(0.01, score-0.01)/10 — spreads hosts across score deciles while
    preserving relative priority within a host (reference
    strategy/discovery/__init__.py:47-50)."""
    crc = crc32_batch(hosts).astype(np.float64)
    decile = np.floor(np.abs(crc / (2**31 - 1)) * 10.0) / 10.0
    return decile + np.maximum(0.01, base_scores - 0.01) / 10.0


DISCOVERY_CLASS_SCORES = {
    "robots": 0.9,
    "sitemap": 0.9,
    "home": 0.8,
    "interest": 0.7,
    "other": 0.5,
}

class OPICStrategy(BasicStrategy):
    """One-pass OPIC (On-line Page Importance Computation) scoring:
    every page holds "cash" (its score); on extraction the cash is split
    equally among outlinks, so heavily-linked shallow pages accumulate
    priority. Pairs with the 'max_score' profile. This is the
    single-visit approximation: cash of duplicate links is dropped with
    the dedup (the reference's update_score stream would add it to the
    queued entry); revisit-driven cash refresh composes via
    schedule_revisit."""

    name = "opic"
    # Reference (public): Abiteboul, Preda, Cobena — "Adaptive On-Line
    # Page Importance Computation" (WWW 2003).

    def seed_scores(self, urls):
        n = max(len(urls), 1)
        return np.full(len(urls), 1.0 / n)

    def link_scores(self, parent_depth, urls):
        # fallback when no cash context is available
        return np.full(len(urls), 0.0)

    def link_scores_cash(self, parent_scores: np.ndarray,
                         n_siblings: np.ndarray) -> np.ndarray:
        return parent_scores / np.maximum(n_siblings, 1)


def classify_url(url: str) -> str:
    """Discovery link classes (strategy/discovery/__init__.py:209,322,
    399-401,425): robots.txt -> 'robots', sitemap XML -> 'sitemap',
    home page -> 'home', else 'other'."""
    from .filters import is_home_page_url

    low = url.lower()
    path = low.split("://", 1)[-1].split("/", 1)
    tail = path[1] if len(path) > 1 else ""
    if tail == "robots.txt":
        return "robots"
    if tail.endswith(".xml") and "sitemap" in tail:
        return "sitemap"
    if is_home_page_url(url):
        return "home"
    return "other"


class DiscoveryStrategy(BasicStrategy):
    """Broad-crawl discovery scoring: per-class base scores salted by
    host deciles so every host keeps frontier presence; pairs with the
    'max_score' production profile, robots gating and per-domain page
    caps in the queue shards (QueueShard(robots_enabled=True,
    max_pages_per_domain=N))."""

    name = "discovery"
    # live discovery cycle (reference strategy/discovery/__init__.py:
    # 284-371): the crawl pipeline schedules http://host/robots.txt for
    # every host it discovers links on; robots/sitemap requests then
    # flow through the normal frontier (urlseen dedups repeat contacts)
    # and their outlinks come from the discovery parsing path — robots
    # 'Sitemap:' lines -> sitemap URLs -> parse_sitemap + sample ->
    # pages and recursive sub-sitemaps (see graphs.DiscoveryWeb).
    schedule_robots = True

    def _base(self, urls) -> np.ndarray:
        return np.fromiter(
            (DISCOVERY_CLASS_SCORES[classify_url(u)] for u in urls),
            dtype=np.float64, count=len(urls),
        )

    def seed_scores(self, urls):
        hosts = [u.split("://", 1)[-1].split("/", 1)[0] for u in urls]
        return discovery_salted_scores(hosts, self._base(urls))

    def link_scores(self, parent_depth, urls):
        hosts = [u.split("://", 1)[-1].split("/", 1)[0] for u in urls]
        return discovery_salted_scores(hosts, self._base(urls))


STRATEGIES = {
    cls.name: cls
    for cls in (BasicStrategy, DFSStrategy, BFSStrategy, DepthBFSStrategy,
                DepthDFSStrategy, DiscoveryStrategy, OPICStrategy)
}
