"""frontera_ray — a Ray-Data-native crawl-frontier / data-processing engine.

A from-scratch rebuild of the capabilities of scrapinghub/frontera
(reference: /root/reference) on top of ray.data.Dataset:

- URL canonicalization + 64-bit fingerprinting as vectorized ``map_batches``
  kernels over zero-copy Arrow batches (``frontera_ray.stages``).
- Sharded URL-seen membership (exact dict overlay + bloom filter) in
  stateful actors keyed by fingerprint hash (``frontera_ray.state.urlseen``).
- Per-host politeness-aware priority queue shards with overused-buffer
  parking, robots.txt gating and crawl-delay budgets
  (``frontera_ray.state.queue``).
- A BSP round-based crawl driver (``frontera_ray.pipelines.crawl``) that
  reproduces frontera's reference crawl ordering and URL-seen set
  (golden sequences from reference tests/backends.py).
- Deterministic synthetic web graph + image/caption payload generators so
  fetching is a pure function of the URL (``frontera_ray.graphs``,
  ``frontera_ray.payload``).
- Training-data operators: dedup (exact / minhash-LSH / simhash / n-gram
  Jaccard / embedding cosine), ANN search, text quality & language ID
  (``frontera_ray.stages``).

Nothing here calls ``ray.init()``; the driver / bench / test fixture owns
the Ray session.
"""

__version__ = "0.1.0"
