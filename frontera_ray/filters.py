"""Link filters, predicates and canonical solvers.

Reimplements (from observed public behavior, no code copied) the
reference's per-record predicates and middleware-style transforms as
vectorized batch kernels (SURVEY.md §2.2):

- home-page predicate           (strategy/discovery/__init__.py:25-36)
- robots.txt validity predicate (strategy/discovery/__init__.py:78-86)
- sitemap <loc> parser          (strategy/discovery/sitemap.py:5-25)
- domain blacklist filter       (worker/components/batch_generator.py:97-109)
- same-domain link filter       (strategy/discovery/__init__.py:236-255)
- canonical solvers             (contrib/canonicalsolvers/basic.py:6-49,
                                 common.py:7-25; golden cases
                                 tests/test_canonical_solver.py:17-41)
- seed reader / normalizer      (strategy/discovery/__init__.py:158-183)
- jid (generation) filter       (worker/strategy.py:51-68)
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlparse

import numpy as np
import pyarrow as pa

from .urls import _split_host, hostnames_batch

DEFAULT_HOME_PATHS = ["/", "index.html", "index.htm", "default.htm", "default.html"]
# the corporate-friendly solver checks a narrower list (no default.html)
CANONICAL_HOME_PATHS = ["/", "index.html", "index.htm", "default.htm"]


def is_home_page_url(url: str) -> bool:
    """No query, and path empty or a default home path."""
    p = urlsplit(url)
    return not p.query and (not p.path or p.path in DEFAULT_HOME_PATHS)


def home_page_mask(urls) -> np.ndarray:
    return np.fromiter((is_home_page_url(u) for u in urls), dtype=bool,
                       count=len(urls))


def is_valid_robotstxt(lines) -> bool:
    """First non-comment line (BOM-stripped, lowercased) must start with
    'user-agent:' or 'sitemap:'."""
    for raw in lines:
        line = raw.strip("﻿").strip().lower()
        if line and not line.startswith("#"):
            return line.startswith("user-agent:") or line.startswith("sitemap:")
    return False


_LOC_RE = re.compile(r"<loc[^>]*>(.*?)</loc>", re.IGNORECASE | re.DOTALL)


def parse_sitemap(content: str):
    """Yield (url, is_sub_sitemap) from sitemap XML: <loc> under a <url>
    parent is a page, under a <sitemap> parent a sub-sitemap. Regex
    parent detection (no XML lib needed for the well-formed subset)."""
    pages, subs = [], []
    for m in _LOC_RE.finditer(content):
        before = content[: m.start()].lower()
        last_url = before.rfind("<url")
        last_sm = before.rfind("<sitemap")
        loc = m.group(1).strip()
        if last_url > last_sm:
            pages.append(loc)
        elif last_sm > last_url:
            subs.append(loc)
    # reference yields by popping from the end (reverse doc order)
    while pages:
        yield pages.pop(), False
    while subs:
        yield subs.pop(), True


def blacklist_mask(urls, blacklist) -> np.ndarray:
    """True for URLs neither whose lowercased hostname NOR whose
    registrable domain is blacklisted — the reference matches the
    domain middleware's ``meta['domain']['name']`` (the registrable
    domain), so blacklisting ``example.com`` must also drop
    ``www.example.com`` (worker/components/batch_generator.py:97-109)."""
    bl = {b.lower() for b in blacklist}
    hosts = hostnames_batch(np.asarray(urls, dtype=object))
    return np.fromiter(
        (h not in bl and _split_host(h)[0] not in bl for h in hosts),
        dtype=bool, count=len(hosts))


def same_domain_mask(parent_url: str, urls, use_psl: bool = False) -> np.ndarray:
    """True for links sharing the parent's registrable domain.

    Default: PSL-free heuristic (last two labels — the semantics the
    oracle-checked ``same_domain`` query encodes). ``use_psl=True``
    resolves against the real Public Suffix List so ``a.example.co.uk``
    and ``b.example.co.uk`` match while ``other.co.uk`` does not
    (reference strategy/discovery/__init__.py:236-255 via tldextract)."""
    if use_psl:
        from .urls import _split_host_psl as split
    else:
        split = _split_host
    parent_name = split(urlparse(parent_url).hostname or "")[0]
    hosts = hostnames_batch(np.asarray(urls, dtype=object))
    return np.fromiter(
        (split(h)[0] == parent_name for h in hosts), dtype=bool,
        count=len(hosts),
    )


def jid_mask(jids, current_jid: int) -> np.ndarray:
    """Generation fencing: keep only events stamped with the current job
    id (stale in-flight events after a restart are dropped)."""
    return np.asarray(jids) == current_jid


def consume_randomly(items, seed: int = 42):
    """Yield items in a seeded random order (discovery's randomized link
    scheduling, made deterministic for replay)."""
    import random

    pool = list(items)
    rng = random.Random(seed)
    rng.shuffle(pool)
    yield from pool


def sample_sitemaps(sub_sitemaps, max_n: int = 100, seed: int = 42):
    """Seeded sample of sub-sitemaps when a sitemap index exceeds the
    budget (discovery samples >100 sub-sitemaps)."""
    import random

    subs = list(sub_sitemaps)
    if len(subs) <= max_n:
        return subs
    rng = random.Random(seed)
    return rng.sample(subs, max_n)


# ---------------------------------------------------------------------------
# canonical solvers (redirect-chain resolution)
# ---------------------------------------------------------------------------

def solve_canonical_basic(url: str, redirect_urls, redirect_fps):
    """First URL of the redirect chain wins; the fetched URL and its
    fingerprint are appended to the chain. Returns
    (canonical_url, canonical_fp, chain_urls, chain_fps)."""
    if not redirect_urls:
        return url, None, [], []
    chain = list(redirect_urls) + [url]
    chain_fps = list(redirect_fps)
    return chain[0], (chain_fps[0] if chain_fps else None), chain, chain_fps


def solve_canonical_corporate(url: str, redirect_urls, redirect_fps):
    """Keep the redirect *target* when the source is a home page or the
    redirect stays on the same hostname; otherwise basic behavior."""
    if not redirect_urls:
        return url, None, [], []
    src = urlparse(redirect_urls[0])
    if not src.path or src.path in CANONICAL_HOME_PATHS:
        return url, None, list(redirect_urls) + [url], list(redirect_fps)
    src_host = (src.netloc or "").partition(":")[0]
    trg_host = (urlparse(url).netloc or "").partition(":")[0]
    if src_host == trg_host:
        return url, None, list(redirect_urls) + [url], list(redirect_fps)
    return solve_canonical_basic(url, redirect_urls, redirect_fps)


def canonical_solver_table(batch: pa.Table, mode: str = "basic") -> pa.Table:
    """Batch kernel over (url, redirect_urls:list<string>,
    redirect_fps:list<uint64>) -> adds canonical_url column."""
    solve = solve_canonical_basic if mode == "basic" else solve_canonical_corporate
    urls = batch["url"].to_pylist()
    chains = batch["redirect_urls"].to_pylist()
    fps = (batch["redirect_fps"].to_pylist()
           if "redirect_fps" in batch.column_names else [[] for _ in urls])
    out = [solve(u, c or [], f or [])[0] for u, c, f in zip(urls, chains, fps)]
    return batch.append_column("canonical_url", pa.array(out, pa.string()))


# ---------------------------------------------------------------------------
# seed reading
# ---------------------------------------------------------------------------

def normalize_seed(line: str) -> str | None:
    """Strip, skip blanks/comments, prepend http:// when scheme-less."""
    url = line.strip()
    if not url or url.startswith("#"):
        return None
    if "://" not in url:
        url = "http://" + url
    return url


def read_seeds_dataset(paths):
    """Seed file(s) (one URL per line) -> Dataset of normalized url
    rows, streaming via ray.data.read_text.

    ``paths`` may be one path or a list, local or remote — read_text
    resolves s3://, gs://, hdfs:// and http(s):// URIs through
    pyarrow.fs, which covers the reference's S3 seed source
    (worker/strategy.py:211-224) without a dedicated client."""
    import ray

    def kernel(batch: pa.Table) -> pa.Table:
        urls = [normalize_seed(t) for t in batch["text"].to_pylist()]
        urls = [u for u in urls if u]
        return pa.table({"url": pa.array(urls, pa.string())})

    return ray.data.read_text(paths).map_batches(kernel, batch_format="pyarrow")
