"""map_batches kernels for the crawl pipeline (zero-copy Arrow in/out).

Each kernel takes/returns ``pyarrow.Table`` so Ray Data moves blocks
through the object store without conversion. Per-record Python work is
limited to hashing (C-speed hashlib) and URL slicing with caches; all
arithmetic is numpy.

Replaces frontera's middleware chain (fingerprint/domain middlewares,
frontera/contrib/middlewares/fingerprint.py:51-123 and domain.py:62-117)
with one fused vectorized stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fingerprint import crc32_batch, fp64_batch
from ..urls import canonicalize_batch, hostnames_batch

# Deterministic child sequence numbers: tree-path encoding independent of
# execution parallelism (replaces the reference's wall-clock created_at,
# sqlalchemy/components.py:209 — required for identical N-vs-4N ordering,
# SURVEY.md §7.4). Supports branching factors < SEQ_BASE.
SEQ_BASE = 16


def child_seq(parent_seq: np.ndarray, link_idx: np.ndarray) -> np.ndarray:
    return parent_seq * SEQ_BASE + (link_idx + 1)


def fingerprint_table(table: pa.Table, url_col: str = "url") -> pa.Table:
    """Append canonical_url, fingerprint(uint64), host, host_crc32 columns."""
    urls = np.asarray(table[url_col].to_pylist(), dtype=object)
    canon = canonicalize_batch(urls)
    fps = fp64_batch(canon)
    hosts = hostnames_batch(urls)
    crc = crc32_batch(hosts)
    return (
        table.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("fingerprint", pa.array(fps, pa.uint64()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("host_crc32", pa.array(crc, pa.int32()))
    )


class FetchSimStage:
    """Actor-pool stage: simulated fetch of every popped URL.

    Pure function of the URL (graphs.SyntheticWeb / GraphManager web
    object is broadcast once per actor via fn_constructor_args) —
    produces the image+caption payload row plus the page's outlinks as a
    list column. At real scale this class holds the HTTP client /
    decoder state (setup once per actor, work per batch)."""

    def __init__(self, web):
        self.web = web
        # import here so the actor pays it once, not per batch
        from ..payload import fetch_simulated

        self._fetch = fetch_simulated

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        rows = [self._fetch(u) for u in urls]
        links = [self.web.links_of(u) for u in urls]
        return pa.table(
            {
                "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
                "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
                "w": pa.array([r["w"] for r in rows], pa.int32()),
                "h": pa.array([r["h"] for r in rows], pa.int32()),
                "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
                "caption": pa.array([r["caption"] for r in rows], pa.string()),
                "phash": pa.array([r["phash"] for r in rows], pa.int64()),
                "url": batch["url"],
                "fingerprint": batch["fingerprint"],
                "depth": batch["depth"],
                "seq": batch["seq"],
                "links": pa.array(links, pa.list_(pa.string())),
            }
        )


PAGE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def explode_links(batch: pa.Table) -> pa.Table:
    """pages-with-links -> one row per outlink, carrying parent depth/seq."""
    links = batch["links"]
    counts = np.asarray(
        [len(v) for v in links.to_pylist()], dtype=np.int64
    )
    if counts.sum() == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "parent_depth": pa.array([], pa.int32()),
                "seq": pa.array([], pa.int64()),
            }
        )
    flat = pa.array(
        [u for lst in links.to_pylist() for u in lst], pa.string()
    )
    parent_depth = np.repeat(batch["depth"].to_numpy(), counts)
    parent_seq = np.repeat(batch["seq"].to_numpy(), counts)
    link_idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts if c])
    seqs = child_seq(parent_seq, link_idx)
    return pa.table(
        {
            "url": flat,
            "parent_depth": pa.array(parent_depth.astype(np.int32), pa.int32()),
            "seq": pa.array(seqs, pa.int64()),
        }
    )


class ScoreStage:
    """Vectorized link scoring from the strategy (one strategy object per
    actor; replaces per-request strategy.schedule calls)."""

    def __init__(self, strategy, salted: bool = False):
        self.strategy = strategy
        self.salted = salted

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column("score", pa.array([], pa.float64()))
        depths = batch["parent_depth"].to_numpy()
        urls = batch["url"].to_pylist()
        # group by depth (few distinct depths per batch) for vector scoring
        scores = np.empty(n, dtype=np.float64)
        for d in np.unique(depths):
            m = depths == d
            scores[m] = self.strategy.link_scores(int(d), [urls[i] for i in np.nonzero(m)[0]])
        if self.salted:
            from ..strategies import discovery_salted_scores

            hosts = batch["host"].to_pylist()
            scores = discovery_salted_scores(hosts, scores)
        return batch.append_column("score", pa.array(scores, pa.float64()))
