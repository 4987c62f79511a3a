"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (SURVEY.md §3.4) at smoke
scale; ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 plus the training-data operator suite; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query (same
column names, same rounding). Non-SQL-expressible ops (iterative crawl,
sketches, LSH, image stages) are rows-only checked here and
golden/oracle-checked in tests/.

Ray is initialised by the driver before import — nothing here calls
ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


_TABLE_BLOCKS = {"lineitem": 32, "orders": 16, "events": 8,
                 "documents": 8, "embeddings": 8, "customer": 4}


def _read(sf_dir: str, table: str):
    """read_parquet with an explicit block count: groupby/aggregate
    shuffles inherit their partition count from upstream blocks, and the
    default (~200) drowns small inputs in task overhead."""
    import ray

    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet",
        override_num_blocks=_TABLE_BLOCKS.get(table, 8),
    )


# ---------------------------------------------------------------------------
# URL derivation shared by Ray and SQL sides: a messy URL per document
# ---------------------------------------------------------------------------


def _choose_exchange(parallel: str = "tasks", small: str = "groups") -> str:
    """The ONE shared scale knob for exchange choice (round-3 VERDICT
    ask #8): delegates to relational.choose_exchange, which encodes the
    measured small-cluster crossover (EXCHANGE_CPU_CROSSOVER) — queries
    no longer carry per-site CPU literals, so a 256-core cluster takes
    the parallel branch automatically."""
    from frontera_ray.stages.relational import choose_exchange

    return choose_exchange(parallel, small)


def _raw_urls(doc_ids: np.ndarray) -> np.ndarray:
    return np.array(
        [f"  HTTP://Host-{d % 20}.Test/p/{d}?b=2&a=1#frag  " for d in doc_ids],
        dtype=object,
    )

_RAW_URL_SQL = "'  HTTP://Host-' || (doc_id % 20) || '.Test/p/' || doc_id || '?b=2&a=1#frag  '"
_CANON_URL_SQL = "'http://host-' || (doc_id % 20) || '.test/p/' || doc_id || '?a=1&b=2'"
_HOST_SQL = "'host-' || (doc_id % 20) || '.test'"

# langid prediction, shared by the langid / lang_confusion / cohen_kappa
# oracles (exact twin of text.langid_table's argmax-first tie-break).
_LANGID_PRED_SQL = r"""
    SELECT doc_id,
           CASE WHEN greatest(c_en,c_de,c_fr,c_es,c_zh) = 0 THEN 'und'
                WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
                WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
                WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
                WHEN c_es >= c_zh THEN 'es'
                ELSE 'zh' END AS lang_pred
    FROM (
      SELECT doc_id,
        len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) c_en,
        len(regexp_extract_all(lower(text), '\b(der|und|die|das|ein)\b')) c_de,
        len(regexp_extract_all(lower(text), '\b(le|la|les|des|une)\b')) c_fr,
        len(regexp_extract_all(lower(text), '\b(el|los|las|una|que)\b')) c_es,
        len(regexp_extract_all(lower(text), '\b(de|le|shi|bu|zai)\b')) c_zh
      FROM documents)"""

# BM25 scoring CTE shared by the bm25_topk and rrf_fusion oracles
# (identical expression tree to text.bm25_topk — see its docstring).
_BM25_SC_CTE = r"""
    WITH tok AS (SELECT doc_id, unnest(
                   regexp_extract_all(text, '\S+')) AS token
                 FROM documents),
    len AS (SELECT doc_id, count(*)::BIGINT AS len
            FROM tok GROUP BY 1),
    alldocs AS (SELECT d.doc_id, coalesce(l.len, 0)::DOUBLE AS len
                FROM documents d LEFT JOIN len l USING (doc_id)),
    st AS (SELECT count(*)::DOUBLE AS n,
                  sum(len) / count(*) AS avglen FROM alldocs),
    tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf
           FROM tok
           WHERE token IN ('data', 'hash', 'scan', 'batch')
           GROUP BY 1, 2),
    df AS (SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    sc AS (SELECT tf.doc_id, sum(CAST(round(
               ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1)
               * ((tf.tf * (1.2 + 1))
                  / (tf.tf + 1.2 * ((1 - 0.75)
                       + 0.75 * (a.len / st.avglen))))
               * 1000000) AS BIGINT)) AS score_micro
           FROM tf JOIN df USING (token)
                JOIN alldocs a USING (doc_id) CROSS JOIN st
           GROUP BY tf.doc_id)"""

# label_prop oracle: 4 unrolled min-label propagation steps (each step
# = min over neighbors ∪ self, via UNION ALL self-loop rows).
_LABEL_PROP_SQL = """
    WITH e AS (SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
               FROM lineitem x JOIN lineitem y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_suppkey < y.l_suppkey
               WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
    und AS (SELECT u AS a, v AS b FROM e
            UNION ALL SELECT v, u FROM e
            UNION ALL SELECT u, u FROM e
            UNION ALL SELECT v, v FROM e),
    l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM und)""" + "".join(
    f""",
    l{i} AS (SELECT und.a AS node, min(l{i - 1}.lbl) AS lbl
             FROM und JOIN l{i - 1} ON l{i - 1}.node = und.b
             GROUP BY und.a)""" for i in range(1, 5)) + """
    SELECT node, lbl::BIGINT AS lbl FROM l4 ORDER BY node"""

# converged CC over the same graph: min REACHABLE id per node via a
# recursive closure (the fixpoint the iterative min-label rounds reach)
def _ktruss_oracle(k: int = 4, rounds: int = 3) -> str:
    """Exact SQL twin of q_ktruss: per round, LEFT-join triangle
    support per surviving edge (count of w adjacent to both ends;
    0-support edges kept in the count via the LEFT join), filter
    sup >= k-2, unrolled; final support recomputed over the
    survivors."""
    parts = []
    for i in range(rounds + 1):
        parts.append(f"""
        und{i} AS (SELECT u AS a, v AS b FROM e{i}
                   UNION ALL SELECT v, u FROM e{i}),
        sup{i} AS (SELECT e{i}.u, e{i}.v, count(y.b)::BIGINT AS sup
                   FROM e{i}
                   LEFT JOIN und{i} x ON x.a = e{i}.u
                   LEFT JOIN und{i} y ON y.a = e{i}.v AND y.b = x.b
                   GROUP BY e{i}.u, e{i}.v)""")
        if i < rounds:
            parts.append(f"""
        e{i + 1} AS (SELECT u, v FROM sup{i} WHERE sup >= {k - 2})""")
    chain = ",".join(parts)
    return f"""
        WITH e0 AS (SELECT DISTINCT x.l_suppkey AS u,
                           y.l_suppkey AS v
               FROM lineitem x JOIN lineitem y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_suppkey < y.l_suppkey
               WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),{chain}
        SELECT u, v, sup FROM sup{rounds} ORDER BY u, v"""


_SSSP_HOPS_SQL = """
    WITH RECURSIVE e AS (SELECT DISTINCT x.l_suppkey AS u,
                                y.l_suppkey AS v
               FROM lineitem x JOIN lineitem y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_suppkey < y.l_suppkey
               WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
    und AS (SELECT u AS a, v AS b,
                   (1 + (u + v) % 9)::DOUBLE AS w FROM e
            UNION ALL
            SELECT v, u, (1 + (u + v) % 9)::DOUBLE FROM e),
    srcs AS (SELECT s_suppkey AS n FROM supplier
             WHERE s_suppkey % 10 = 1),
    reach(id, dist, hops) AS (
        SELECT n, 0.0::DOUBLE, 0 FROM srcs
      UNION
        SELECT und.b, reach.dist + und.w, reach.hops + 1
        FROM reach JOIN und ON und.a = reach.id
        WHERE reach.hops < 3)
    SELECT id AS node, min(dist)::BIGINT AS dist
    FROM reach GROUP BY id ORDER BY node"""

_CC_CONVERGED_SQL = """
    WITH RECURSIVE e AS (SELECT DISTINCT x.l_suppkey AS u,
                                y.l_suppkey AS v
               FROM lineitem x JOIN lineitem y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_suppkey < y.l_suppkey
               WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
    und AS (SELECT u AS a, v AS b FROM e
            UNION ALL SELECT v, u FROM e),
    nodes AS (SELECT DISTINCT a AS n FROM und),
    reach AS (SELECT n AS id, n AS comp FROM nodes
              UNION
              SELECT und.b AS id, reach.comp
              FROM reach JOIN und ON und.a = reach.id)
    SELECT id AS node, min(comp)::BIGINT AS lbl
    FROM reach GROUP BY id ORDER BY node"""

# Morton interleave unrolled for the zorder_cells oracle: x bits land on
# even positions, y bits on odd (exactly relational._spread16's ladder).
_ZORDER_X_SQL = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i})" for i in range(16))
_ZORDER_Y_SQL = " + ".join(
    f"(((y >> {i}) & 1) << {2 * i + 1})" for i in range(16))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_seed_normalize(sf_dir: str):
    """Seed reader + URL canonicalization (SURVEY.md §2.1/§2.2):
    strip, lowercase scheme+host, sort query params, drop fragment."""
    from frontera_ray.urls import canonicalize_batch

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = canonicalize_batch(_raw_urls(ids))
        return pa.table({"doc_id": batch["doc_id"],
                         "url": pa.array(urls, pa.string())})

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


def q_url_fingerprint(sf_dir: str):
    """URL fingerprinting (md5 profile — oracle-checkable; sha1/hlf
    profiles golden-tested in tests/test_fingerprint.py)."""
    from frontera_ray.fingerprint import md5_hex_batch
    from frontera_ray.urls import canonicalize_batch

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = canonicalize_batch(_raw_urls(ids))
        return pa.table({"doc_id": batch["doc_id"],
                         "fp_md5": pa.array(md5_hex_batch(urls), pa.string())})

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


def q_host_partition(sf_dir: str):
    """Host-hash partitioning (md5 profile) + per-partition counts —
    the queue-shard assignment aggregate."""
    from frontera_ray.urls import hostnames_batch

    import hashlib

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        hosts = hostnames_batch(_raw_urls(ids))
        part = np.array([int(hashlib.md5(h.encode()).hexdigest()[:8], 16) % 8
                         for h in hosts], dtype=np.int64)
        return pa.table({"partition_id": pa.array(part, pa.int64())})

    ds = _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")
    out = ds.groupby("partition_id").count().to_pandas()
    out = out.rename(columns={"count()": "n_urls"}).sort_values("partition_id")
    return out.reset_index(drop=True)


def q_score_depth(sf_dir: str):
    """BFS/DFS depth-decay scoring kernels (strategy/depth.py:35-42 and
    tests/backends.py:67-73 formulas), vectorized."""

    def kernel(batch: pa.Table) -> pa.Table:
        d = (batch["doc_id"].to_numpy() % 10).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "depth": pa.array(d.astype(np.int64), pa.int64()),
            "score_bfs": pa.array(np.round(1.0 - d / (d + 1.0), 6), pa.float64()),
            "score_dfs": pa.array(np.round(d / (d + 1.0), 6), pa.float64()),
            "score_dfs_test": pa.array(np.round(1.0 / (d + 1.0), 6), pa.float64()),
            "score_bfs_test": pa.array(np.round(d / 10.0, 6), pa.float64()),
        })

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


def q_score_buckets(sf_dir: str):
    """Score -> 0.01-wide interval discretization + counts (HBase queue
    row-key scheme, hbase/__init__.py:149-177)."""

    def kernel(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy()
        score = np.clip(v / 100.0, 0.0, 1.0)
        bucket = np.minimum(np.floor(score * 100.0), 99.0)  # last interval right-inclusive
        return pa.table({"bucket": pa.array(bucket.astype(np.int64), pa.int64())})

    from frontera_ray.stages.relational import partial_groupby_agg

    ds = _read(sf_dir, "events").map_batches(kernel, batch_format="pyarrow")
    out = partial_groupby_agg(ds, "bucket", {"n": ("bucket", "count")})
    return out.sort_values("bucket").reset_index(drop=True)


def q_per_host_cap(sf_dir: str):
    """Per-key top-k (broad-crawl max_requests_per_host shaping,
    hbase/__init__.py:248-250) via groupby().map_groups."""
    from frontera_ray.stages.relational import per_key_topk

    ds = _read(sf_dir, "events").select_columns(["user_id", "event_id", "value"])
    out = per_key_topk(ds, "user_id", "value", k=5, descending=True,
                       tiebreak="event_id")
    return out


def q_priority_topk(sf_dir: str):
    """Global priority pop-k: block partial top-k + driver merge (no
    full sort shuffle)."""
    from frontera_ray.stages.relational import global_topk

    ds = _read(sf_dir, "events").select_columns(["event_id", "value"])
    return global_topk(ds, "value", k=100, descending=True, tiebreak="event_id")


def q_crawl_visibility(sf_dir: str):
    """crawl_at visibility filter (revisit support): events due before
    the cutoff, counted per type."""
    import datetime as dt

    import pyarrow.compute as _pc
    from frontera_ray.stages.relational import partial_groupby_agg

    cutoff = dt.datetime(2024, 1, 3)

    def visible(batch: pa.Table) -> pa.Table:
        mask = _pc.less_equal(batch["ts"], pa.scalar(cutoff, pa.timestamp("us")))
        return batch.filter(mask)

    ds = _read(sf_dir, "events").map_batches(visible, batch_format="pyarrow")
    out = partial_groupby_agg(ds, "event_type", {"n": ("event_type", "count")})
    return out.sort_values("event_type").reset_index(drop=True)


def q_host_agg(sf_dir: str):
    """aggregate_per_host (remote/messagebus.py:97-106): groupby host
    bucket with count + mean."""

    def kernel(batch: pa.Table) -> pa.Table:
        return pa.table({
            "host_bucket": pa.array((batch["user_id"].to_numpy() % 32).astype(np.int64)),
            "value": batch["value"],
        })

    from frontera_ray.stages.relational import partial_groupby_agg

    ds = _read(sf_dir, "events").map_batches(kernel, batch_format="pyarrow")
    out = partial_groupby_agg(ds, "host_bucket",
                              {"n": ("value", "count"), "sv": ("value", "sum")})
    # integer-exact: input values carry 2 decimals, so sum*100 rounds to
    # the same integer regardless of summation order
    out["sum_cents"] = (out.pop("sv") * 100).round().astype("int64")
    return out.sort_values("host_bucket").reset_index(drop=True)


def q_batch_dedup(sf_dir: str):
    """Within-batch dedup, first-wins per key (scoring-consumer `seen`
    semantics, worker/components/scoring_consumer.py:29-43)."""
    from frontera_ray.stages.relational import partial_groupby_agg

    ds = _read(sf_dir, "events").select_columns(["user_id", "event_id"])
    out = partial_groupby_agg(ds, "user_id", {"first_event": ("event_id", "min")})
    return out.sort_values("user_id").reset_index(drop=True)


def q_token_count(sf_dir: str):
    from frontera_ray.stages.text import token_count_table

    return _read(sf_dir, "documents").map_batches(
        token_count_table, batch_format="pyarrow")


def q_token_count_bpe(sf_dir: str):
    """Whitespace + BPE-ish (GPT-2-style pre-tokenizer classes) token
    counts per doc — both via one vectorized RE2 pass; the identical
    pattern strings run in DuckDB (also RE2) for the oracle."""
    from frontera_ray.stages.text import bpe_token_count_table

    return _read(sf_dir, "documents").map_batches(
        bpe_token_count_table, batch_format="pyarrow")


def q_winnow_fp(sf_dir: str):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    ordered 3-gram md5-64 hashes, window-of-4 minima, distinct selected
    values exploded to (doc_id, fp) rows — the rolling-hash
    fingerprinting scheme, fully SQL-oracled via a window-function
    min."""
    from frontera_ray.stages.text import winnow_table

    return _read(sf_dir, "documents").map_batches(
        winnow_table, batch_format="pyarrow")


def q_quality(sf_dir: str):
    from frontera_ray.stages.text import quality_features_table

    return _read(sf_dir, "documents").map_batches(
        quality_features_table, batch_format="pyarrow")


def q_langid(sf_dir: str):
    from frontera_ray.stages.text import langid_table

    return _read(sf_dir, "documents").map_batches(
        langid_table, batch_format="pyarrow")


def q_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup pairs over the doc_id<100
    slice (integer-exact inter/union sizes, threshold 0.5 as
    100*inter >= 50*union). The SQL oracle rebuilds the same grams with
    array windowing; Jaccard over the engine's hashed gram sets equals
    Jaccard over the raw grams."""
    from frontera_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(sf_dir, "documents"), limit_ids=100)


def q_exact_dedup(sf_dir: str):
    """Exact dedup: hash-partition by content md5, first-wins per group."""
    from frontera_ray.stages.text import content_md5_table

    ds = _read(sf_dir, "documents").map_batches(
        content_md5_table, batch_format="pyarrow").select_columns(
        ["text_md5", "doc_id"])
    out = ds.groupby("text_md5").aggregate(
        __import__("ray").data.aggregate.Min("doc_id"),
        __import__("ray").data.aggregate.Count(),
    ).to_pandas()
    return out.rename(columns={"min(doc_id)": "keeper_doc_id",
                               "count()": "n_copies"}).sort_values(
        "text_md5").reset_index(drop=True)


def q_exact_keepers(sf_dir: str):
    """Corpus-wide keeper assignment from EXACT duplicate pairs: the
    md5 groupby emits (keeper=min doc_id, member) pairs; keeper_table
    union-finds over pair ids only and maps the broadcast mapping over
    the corpus as a streaming Dataset. Oracle-checkable because
    connected components of exact-equality pairs collapse to min() per
    md5 group — so this query oracle-checks the keeper-resolution
    component that the near-dup keep-list (dedup_keepers) reuses."""
    import ray

    from frontera_ray.stages.dedup import keeper_table
    from frontera_ray.stages.text import content_md5_table

    ds = _read(sf_dir, "documents")
    md5 = ds.map_batches(content_md5_table, batch_format="pyarrow") \
        .select_columns(["text_md5", "doc_id"])

    def group_pairs(group: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.sort(group["doc_id"].to_numpy().astype(np.int64))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.full(len(ids) - 1, ids[0]),
                                       pa.int64()),
                         "b": pa.array(ids[1:], pa.int64())})

    parts = list(md5.groupby("text_md5").map_groups(
        group_pairs, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    pairs = (pa.concat_tables(parts) if parts
             else pa.table({"a": pa.array([], pa.int64()),
                            "b": pa.array([], pa.int64())}))
    return keeper_table(ds, pairs)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for queries vec_id<10 (broadcast query
    matrix, per-block partial top-k, driver merge)."""
    from frontera_ray.stages.ann import brute_force_topk

    return brute_force_topk(_read(sf_dir, "embeddings"), range(10), k=10)


def q_cosine_neardup(sf_dir: str):
    """Embedding cosine near-dup pairs among vec_id<300 (brute baseline;
    LSH variant is q_ann_lsh)."""
    from frontera_ray.stages.ann import cosine_neardup_pairs

    return cosine_neardup_pairs(_read(sf_dir, "embeddings"), threshold=0.6,
                                limit_ids=300)


def q_revenue_nation(sf_dir: str):
    """Two-stage broadcast join (lineitem -> orders -> customer) +
    nation revenue rollup — the multi-join pipeline without any shuffle
    join (both small sides broadcast once)."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import broadcast_join, partial_groupby_agg

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["o_orderkey", "l_extendedprice", "l_discount"])

    j1 = broadcast_join(li.map_batches(prep, batch_format="pyarrow"),
                        orders, key="o_orderkey")

    def prep2(batch: pa.Table) -> pa.Table:
        # integer-exact revenue: price-cents x (100 - discount-percent),
        # i.e. units of 10^-4 dollars, summed exactly in int64 (float
        # sums of price*(1-disc) are NOT order-independent at this scale)
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_b = np.round((1.0 - batch["l_discount"].to_numpy()) * 100).astype(np.int64)
        return pa.table({"c_custkey": batch["o_custkey"],
                         "revenue_c4": pa.array(price_c * disc_b, pa.int64())})

    j2 = broadcast_join(j1.map_batches(prep2, batch_format="pyarrow"),
                        cust, key="c_custkey")
    out = partial_groupby_agg(j2, "c_nationkey",
                              {"n_items": ("revenue_c4", "count"),
                               "revenue_c4": ("revenue_c4", "sum")})
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(region, nation) over order revenue: one
    distributed partial aggregate at the finest (region, nation) level
    (broadcast dims, integer cents), then the coarser grouping sets
    derived from that 25-row frame (relational.rollup_from_finest) —
    the multi-level-subtotal report shape without re-scanning base
    rows per level."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import (broadcast_join,
                                                partial_groupby_agg,
                                                rollup_from_finest)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    # tiny dims pre-joined driver-side into one 25-row lookup
    nr = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    dim = pa.table({"c_nationkey": pa.array(nr["n_nationkey"], pa.int64()),
                    "n_name": pa.array(nr["n_name"], pa.string()),
                    "r_name": pa.array(nr["r_name"], pa.string())})

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"c_custkey": batch["o_custkey"],
                         "cents": pa.array(cents, pa.int64())})

    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow")
    j1 = broadcast_join(orders, cust, key="c_custkey")
    j2 = broadcast_join(j1, dim, key="c_nationkey")
    fin = partial_groupby_agg(j2, ["r_name", "n_name"],
                              {"n_orders": ("cents", "count"),
                               "revenue_cents": ("cents", "sum")})
    out = rollup_from_finest(fin, ["r_name", "n_name"],
                             ["n_orders", "revenue_cents"])
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def q_priority_revenue(sf_dir: str):
    """Large-large shuffle join demo: lineitem JOIN orders through ONE
    keyed exchange (both sides tagged + unioned; vectorized
    cumulative-count pair expansion — the shape when neither side is
    broadcastable), then a tiny combiner rollup of integer-exact
    revenue per order priority."""
    from frontera_ray.stages.relational import equi_join, partial_groupby_agg

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100
                           ).astype(np.int64)
        disc_b = np.round((1.0 - batch["l_discount"].to_numpy()) * 100
                          ).astype(np.int64)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "revenue_c4": pa.array(price_c * disc_b, pa.int64())})

    def prep_o(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch["o_orderkey"],
                         "o_orderpriority": batch["o_orderpriority"]})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        prep_li, batch_format="pyarrow")
    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_orderpriority"]).map_batches(
        prep_o, batch_format="pyarrow")
    # ~150k join keys: the hash exchange (one kernel call per
    # partition) beats per-key map_groups 2.4x at 32 cpus; small
    # sessions keep the sort exchange (Ray 2.49 hash-shuffle
    # aggregators can wedge later all-to-alls at 4 cpus — COVERAGE.md)
    from frontera_ray.stages.relational import cluster_cpus
    joined = equi_join(li, orders, "l_orderkey",
                       ["revenue_c4"], ["o_orderpriority"],
                       exchange=_choose_exchange("tasks"))
    out = partial_groupby_agg(joined, "o_orderpriority",
                              {"n_items": ("revenue_c4", "count"),
                               "revenue_c4": ("revenue_c4", "sum")})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_token_df(sf_dir: str):
    """Token document-frequency: top tokens by number of documents
    containing them (the TF-IDF denominator aggregate).

    Vectorized explode (Arrow split_whitespace + list_flatten; per-doc
    distinct via pandas drop_duplicates — a doc lives wholly inside one
    batch) and a hash-shuffle ``ds.groupby('token')`` for the count:
    token is a HIGH-cardinality key, so the partial/driver-merge
    combiner is wrong here. Top-20 via per-block partial + tiny merge."""
    import pyarrow.compute as _pc

    def explode(batch: pa.Table) -> pa.Table:
        toks = _pc.utf8_split_whitespace(batch["text"])
        parent = _pc.list_parent_indices(toks)
        flat = _pc.list_flatten(toks)
        t = pa.table({"token": flat, "doc_id": batch["doc_id"].take(parent)})
        t = t.filter(_pc.not_equal(t["token"], ""))
        df = t.to_pandas().drop_duplicates()  # per-doc distinct, vectorized
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")
    agg = ds.groupby("token").count()

    def blk_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={"count()": "df"})
        df = df.sort_values(["df", "token"], ascending=[False, True]).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    import pandas as pd

    parts = pa.concat_tables(
        list(agg.map_batches(blk_top, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)))
    out = parts.to_pandas().sort_values(
        ["df", "token"], ascending=[False, True]).head(20)
    return out[["token", "df"]].reset_index(drop=True)


def q_tfidf(sf_dir: str):
    """Per-document top-3 TF-IDF terms: one explode pass feeds both the
    hash-shuffle df aggregate and (broadcast back) the streaming tf
    scoring; integer micro-unit scores for exact oracle hashing."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.text import tfidf_top_terms

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    out = tfidf_top_terms(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        n_docs=n_docs, k=3).to_pandas()
    return out.sort_values(["doc_id", "score_micro", "token"],
                           ascending=[True, False, True]
                           ).reset_index(drop=True)


def q_hopping_window(sf_dir: str):
    """Hopping-window event counts (1h window, 15min hop): each event
    expands into 4 overlapping windows, counted per (window, type)."""
    from frontera_ray.stages.relational import hopping_window_counts

    return hopping_window_counts(_read(sf_dir, "events"), window_s=3600,
                                 hop_s=900, keys=("event_type",))


_SAMPLE_RATES = {"en": 0.5, "de": 0.25}
_SAMPLE_DEFAULT = 0.1


def q_doc_sample(sf_dir: str):
    """Stratified deterministic hash sample of documents: keep 50% of
    English, 25% of German, 10% of everything else — decision is a
    pure function of doc_id (md5 top-32-bits), so retries and re-runs
    agree with no shared RNG state."""
    from frontera_ray.stages.sampling import stratified_hash_sample

    out = stratified_hash_sample(
        _read(sf_dir, "documents").select_columns(
            ["doc_id", "lang", "n_chars"]),
        id_col="doc_id", strata_col="lang", rates=_SAMPLE_RATES,
        default_rate=_SAMPLE_DEFAULT).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_curate(sf_dir: str):
    """Flagship corpus-curation composite: ONE fused feature pass
    (quality + langid + md5 — text read once), a vectorized
    quality/language filter, then exact-dedup keeper resolution over
    the SURVIVORS (min doc_id per content hash). The whole chain —
    three kernels, a filter and one keyed exchange — is SQL-oracled
    end to end."""
    from frontera_ray.stages.text import curate_table

    feats = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(curate_table, batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        m = _pc.and_(
            _pc.greater_equal(batch["quality_score"], 0.5),
            _pc.is_in(batch["lang_pred"],
                      value_set=pa.array(["en", "de"])))
        return batch.filter(m)

    # keeper = min doc_id per content hash: per_key_topk(k=1 ascending)
    # is vectorized across key runs (text_md5 is corpus-cardinality, so
    # a per-group Python kernel would pay one call per document)
    from frontera_ray.stages.relational import per_key_topk

    out = (per_key_topk(feats.map_batches(keep, batch_format="pyarrow"),
                        "text_md5", "doc_id", k=1, descending=False)
           .select_columns(["doc_id", "lang_pred", "n_tokens",
                            "quality_score"])
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_prep_pipeline(sf_dir: str):
    """Flagship END-TO-END training-data prep composite, every stage a
    suite operator: eval-set exclusion -> fused curate features
    (quality + langid + md5, text read once) -> quality/language gates
    -> exact-dup keeper (min doc_id per content hash, one keyed
    exchange) -> benchmark decontamination (eval 4-gram hash set
    broadcast; the rare contaminated ids collected once, bounded, and
    re-broadcast as a streaming filter) -> deterministic split ladder
    -> per-(split, language) corpus card (n_docs, tokens). The whole
    chain is streaming with ONE corpus exchange (the keeper's) and one
    tiny final groupby; the DuckDB twin composes the same shared CTEs
    (_CURATE_FEATS_CTE, decontaminate, _split_case_sql)."""
    import ray
    from frontera_ray.stages.relational import (partial_groupby_agg,
                                                per_key_topk)
    from frontera_ray.stages.sampling import hash_split
    from frontera_ray.stages.text import (collect_eval_gram_hashes,
                                          curate_table, decontaminate)

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ev = docs.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() % 97 == 0)),
        batch_format="pyarrow")
    train = docs.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() % 97 != 0)),
        batch_format="pyarrow")
    ev_ref = ray.put(collect_eval_gram_hashes(ev, k=_DECON_K))
    # contaminated ids are overlap-scale (rare by construction): one
    # bounded collect, then a broadcast id-set filter over the stream
    bad = pa.concat_tables(list(
        decontaminate(train, ev_ref, k=_DECON_K)
        .map_batches(lambda b: b.filter(pc.equal(b["contaminated"], 1))
                     .select(["doc_id"]), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    bad_ids = bad["doc_id"].to_numpy().astype(np.int64)
    assert len(bad_ids) < 1_000_000, (
        "prep_pipeline: contaminated set is not small — broadcast "
        "filter assumption violated; route through an anti-join")
    bad_ref = ray.put(np.sort(bad_ids))

    feats = docs.map_batches(curate_table, batch_format="pyarrow")

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        m = ((ids % 97 != 0)
             & pc.greater_equal(batch["quality_score"], 0.5)
                 .to_numpy(zero_copy_only=False)
             & pc.is_in(batch["lang_pred"],
                        value_set=pa.array(["en", "de"]))
                 .to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(m))

    # decontamination runs AFTER keeper resolution (a contaminated
    # keeper takes its whole duplicate group with it — the group was
    # deduplicated against benchmark-tainted content)
    def drop_contaminated(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids = batch["doc_id"].to_numpy()
        return batch.filter(pa.array(
            ~np.isin(ids, _ray.get(bad_ref), assume_unique=False)))

    keep = per_key_topk(feats.map_batches(gate, batch_format="pyarrow"),
                        "text_md5", "doc_id", k=1, descending=False) \
        .map_batches(drop_contaminated, batch_format="pyarrow")
    card = partial_groupby_agg(
        hash_split(keep, "doc_id", _SPLITS),
        ["split", "lang_pred"],
        {"n_docs": ("n_tokens", "count"), "tokens": ("n_tokens", "sum")})
    return card.sort_values(["split", "lang_pred"]).reset_index(drop=True)


def q_gate_attrition(sf_dir: str):
    """Gate-by-gate attrition card of the curation chain (pipeline
    observability: where do documents die): cumulative survivor
    counts through eval-exclusion -> quality -> language ->
    exact-dup-keeper. One fused feature pass + vectorized flag
    combiner; the keeper gate is the same one keyed exchange
    prep_pipeline uses. Oracle composes the shared curate CTE."""
    import pandas as pd
    from frontera_ray.stages.relational import per_key_topk
    from frontera_ray.stages.text import curate_table

    feats = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(
        curate_table, batch_format="pyarrow").materialize()

    def flag_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        g0 = np.ones(len(ids), bool)
        g1 = g0 & (ids % 97 != 0)
        g2 = g1 & pc.greater_equal(batch["quality_score"], 0.5) \
            .to_numpy(zero_copy_only=False)
        g3 = g2 & pc.is_in(batch["lang_pred"],
                           value_set=pa.array(["en", "de"])) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"r": pa.array(
            [[int(g0.sum()), int(g1.sum()), int(g2.sum()), int(g3.sum())]],
            pa.list_(pa.int64()))})

    acc = np.zeros(4, np.int64)
    for t in feats.map_batches(flag_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in t["r"].to_pylist():
            acc += np.asarray(row, np.int64)

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        m = ((ids % 97 != 0)
             & pc.greater_equal(batch["quality_score"], 0.5)
                 .to_numpy(zero_copy_only=False)
             & pc.is_in(batch["lang_pred"],
                        value_set=pa.array(["en", "de"]))
                 .to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(m))

    n_keep = per_key_topk(feats.map_batches(gate, batch_format="pyarrow"),
                          "text_md5", "doc_id", k=1,
                          descending=False).count()
    return pd.DataFrame({
        "gate": ["input", "eval_excluded", "quality", "language",
                 "exact_dedup"],
        "n_pass": np.concatenate((acc, [n_keep])).astype(np.int64)})


def q_corpus_card(sf_dir: str):
    """One-row corpus card: n_docs, total tokens, distinct vocabulary,
    exact-duplicate docs, majority language and its share (ppm) — the
    at-a-glance dataset summary. One fused feature pass feeds a
    combiner; vocab rides the native token groupby; all integers."""
    import pandas as pd
    from frontera_ray.stages.text import curate_table, term_freq_table

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    feats = docs.map_batches(curate_table, batch_format="pyarrow") \
        .materialize()
    n_docs = feats.count()
    n_tokens = int(feats.sum("n_tokens"))
    vocab = docs.map_batches(term_freq_table, batch_format="pyarrow") \
        .groupby("token").count().count()
    # duplicate docs = docs minus distinct content hashes
    n_distinct_md5 = feats.groupby("text_md5").count().count()
    lang_counts = (feats.groupby("lang_pred").count()
                   .to_pandas().sort_values(
                       ["count()", "lang_pred"],
                       ascending=[False, True]).reset_index(drop=True))
    top_lang = lang_counts.loc[0, "lang_pred"]
    top_n = int(lang_counts.loc[0, "count()"])
    return pd.DataFrame({
        "n_docs": [n_docs],
        "n_tokens": [n_tokens],
        "vocab": [vocab],
        "n_dup_docs": [n_docs - n_distinct_md5],
        "top_lang": [top_lang],
        "top_lang_ppm": [int(round(top_n / n_docs * 1e6))]})


def q_quantity_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (median + p90) of lineitem
    quantity via bounded-domain histogram combine — the histogram, not
    the data, is what moves."""
    from frontera_ray.stages.relational import grouped_quantile_disc

    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_quantity"])
    return grouped_quantile_disc(ds, "l_returnflag", "l_quantity",
                                 [0.5, 0.9])


def q_distinct_users(sf_dir: str):
    """Exact per-type distinct-user counts: per-block dedup combiner ->
    one hash-shuffle on the (type, user) composite -> tiny rollup."""
    from frontera_ray.stages.relational import grouped_count_distinct

    # 5 types x ~1.5k users: the distinct-pair domain is known-small,
    # so the driver combine is the right call here (the shuffle path
    # stays the default for unbounded pair cardinality)
    return grouped_count_distinct(
        _read(sf_dir, "events").select_columns(["event_type", "user_id"]),
        "event_type", "user_id", combine="driver")


def q_region_suppliers(sf_dir: str):
    """Chained dimension joins (supplier -> nation -> region, both sides
    broadcast) + rollup: supplier count and balance per region."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import broadcast_join, partial_groupby_agg

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    ds = _read(sf_dir, "supplier").select_columns(["s_suppkey", "s_nationkey", "s_acctbal"])

    def prep(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["s_suppkey", "n_nationkey", "s_acctbal"])

    j1 = broadcast_join(ds.map_batches(prep, batch_format="pyarrow"),
                        nation, key="n_nationkey")

    def prep2(batch: pa.Table) -> pa.Table:
        return pa.table({"r_regionkey": batch["n_regionkey"],
                         "s_acctbal": batch["s_acctbal"]})

    j2 = broadcast_join(j1.map_batches(prep2, batch_format="pyarrow"),
                        region, key="r_regionkey")
    out = partial_groupby_agg(j2, "r_name",
                              {"n_suppliers": ("s_acctbal", "count"),
                               "ab": ("s_acctbal", "sum")})
    out["acctbal_cents"] = (out.pop("ab") * 100).round().astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


def q_part_types(sf_dir: str):
    """Dimension-table aggregate over part: count + integer-exact retail
    price cents per (p_brand, p_type)."""
    from frontera_ray.stages.relational import partial_groupby_agg

    ds = _read(sf_dir, "part").select_columns(["p_brand", "p_type", "p_retailprice"])
    out = partial_groupby_agg(ds, ["p_brand", "p_type"],
                              {"n_parts": ("p_retailprice", "count"),
                               "rp": ("p_retailprice", "sum")})
    out["retail_cents"] = (out.pop("rp") * 100).round().astype("int64")
    return out.sort_values(["p_brand", "p_type"]).reset_index(drop=True)


def q_window_counts(sf_dir: str):
    """Tumbling-window aggregate (1h windows) per event type — the
    streaming-window operator over the events table."""
    from frontera_ray.stages.relational import tumbling_window_counts

    return tumbling_window_counts(_read(sf_dir, "events"), window_s=3600,
                                  keys=("event_type",))


def q_asof_join(sf_dir: str):
    """Per-user AS-OF join: each 'click' event gets the value of the
    most recent earlier 'view' event (-1 when none)."""
    from frontera_ray.stages.relational import asof_join_latest

    out = asof_join_latest(
        _read(sf_dir, "events"), key_col="user_id", ts_col="ts",
        type_col="event_type", left_type="click", right_type="view",
        value_col="value").to_pandas()
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_range_join(sf_dir: str):
    """Per-user windowed attribution (range join): every 'purchase'
    event paired with each 'click' by the same user in the preceding
    6 hours (inclusive window). One keyed exchange + a whole-block
    kernel vectorized across keys (two cumulative-count merges)."""
    from frontera_ray.stages.relational import range_join

    out = range_join(
        _read(sf_dir, "events"), key_col="user_id", ts_col="ts",
        type_col="event_type", build_type="click", probe_type="purchase",
        window_us=6 * 3600 * 1_000_000).to_pandas()
    out = out.rename(columns={"build_id": "click_id",
                              "probe_id": "purchase_id"})
    return out.sort_values(["user_id", "click_id", "purchase_id"]
                           ).reset_index(drop=True)


def q_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap) per user."""
    from frontera_ray.stages.relational import sessionize

    out = sessionize(_read(sf_dir, "events")).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_agg_pricing(sf_dir: str):
    """Wide aggregate over lineitem (TPC-H q1 shape): partial aggregation
    inside blocks via Ray's hash aggregate."""
    import ray

    from frontera_ray.stages.relational import partial_groupby_agg

    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])
    out = partial_groupby_agg(
        ds, ["l_returnflag", "l_linestatus"],
        {"sq": ("l_quantity", "sum"), "sp": ("l_extendedprice", "sum"),
         "sd": ("l_discount", "sum"), "count_order": ("l_quantity", "count")},
    )
    # integer-exact sums: quantities are integral, money has 2 decimals
    out["sum_qty"] = out.pop("sq").round().astype("int64")
    out["sum_price_cents"] = (out.pop("sp") * 100).round().astype("int64")
    out["sum_disc_cents"] = (out.pop("sd") * 100).round().astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_nation_orders(sf_dir: str):
    """Broadcast hash-join (small side ray.put once, no shuffle) +
    groupby count: orders per customer nation."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import broadcast_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ds = _read(sf_dir, "orders").select_columns(["o_orderkey", "o_custkey"])

    def prep(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["o_orderkey", "c_custkey"])

    from frontera_ray.stages.relational import partial_groupby_agg

    joined = broadcast_join(ds.map_batches(prep, batch_format="pyarrow"),
                            cust, key="c_custkey")
    out = partial_groupby_agg(joined, "c_nationkey",
                              {"n_orders": ("c_nationkey", "count")})
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q_home_page(sf_dir: str):
    """Home-page predicate (discovery home scoring gate) over derived
    URL variants."""
    from frontera_ray.filters import home_page_mask

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        paths = np.where(ids % 4 == 0, "",
                 np.where(ids % 4 == 1, "/",
                  np.where(ids % 4 == 2,
                           np.char.add("/p/", ids.astype(str)),
                           np.char.add("/?q=", ids.astype(str)))))
        urls = np.char.add("http://site.test", paths.astype(str))
        return pa.table({
            "doc_id": batch["doc_id"],
            "is_home": pa.array(home_page_mask(list(urls)), pa.bool_()),
        })

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


def q_blacklist(sf_dir: str):
    """Domain blacklist filter (batch_generator semantics): count of
    surviving URLs per host."""
    from frontera_ray.filters import blacklist_mask

    BLACKLIST = {"host-0.test", "host-5.test", "host-10.test", "host-15.test"}

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = _raw_urls(ids)
        keep = blacklist_mask(urls, BLACKLIST)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64())})

    ds = _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")
    import pandas as pd

    return pd.DataFrame({"n_kept": [ds.count()]})


def q_same_domain(sf_dir: str):
    """Same-domain link filter (public-suffix-free 2nd-level match)."""
    from frontera_ray.filters import same_domain_mask

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        hosts = np.where(ids % 3 == 0, "www.site.com",
                  np.where(ids % 3 == 1, "blog.site.com",
                           np.char.add(np.char.add("other-", (ids % 7).astype(str)),
                                       ".com")))
        urls = [f"http://{h}/x" for h in hosts]
        keep = same_domain_mask("http://www.site.com/", urls)
        return pa.table({"doc_id": batch["doc_id"],
                         "same_domain": pa.array(keep, pa.bool_())})

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


# -- non-SQL-expressible (rows-only for the driver; golden/pytest-checked) --


def q_canonical_solver(sf_dir: str):
    """Redirect-chain canonicalization (basic solver) over synthesized
    chains."""
    from frontera_ray.filters import canonical_solver_table

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = [f"http://t.test/final/{d}" for d in ids]
        chains = [[f"http://src.test/orig/{d}"] if d % 3 == 0 else []
                  for d in ids]
        t = pa.table({
            "doc_id": batch["doc_id"],
            "url": pa.array(urls, pa.string()),
            "redirect_urls": pa.array(chains, pa.list_(pa.string())),
        })
        return canonical_solver_table(t, mode="basic").select(
            ["doc_id", "canonical_url"])

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


def q_sitemap_parse(sf_dir: str):
    """Sitemap <loc> parser over a synthesized sitemap per document."""
    from frontera_ray.filters import parse_sitemap

    def kernel(batch: pa.Table) -> pa.Table:
        out_doc, out_url, out_sub = [], [], []
        for d in batch["doc_id"].to_pylist():
            xml = (f"<urlset><url><loc>http://s.test/{d}/a</loc></url>"
                   f"<sitemap><loc>http://s.test/{d}/sub.xml</loc></sitemap>"
                   f"</urlset>")
            for url, is_sub in parse_sitemap(xml):
                out_doc.append(d)
                out_url.append(url)
                out_sub.append(is_sub)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "url": pa.array(out_url, pa.string()),
            "is_sub_sitemap": pa.array(out_sub, pa.bool_()),
        })

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")


def q_seed_reader(sf_dir: str):
    """Seed-file reader: line stream -> normalized URL Dataset."""
    import hashlib

    from frontera_ray.filters import read_seeds_dataset

    lines = ["# seeds", "", "www.a.test/1", "http://b.test/2", "  c.test/3  "]
    body = "\n".join(lines) + "\n"
    path = f"/tmp/frontera_ray_seeds_{hashlib.md5(body.encode()).hexdigest()[:8]}.txt"
    with open(path, "w") as f:
        f.write(body)
    return read_seeds_dataset(path)


def q_discovery_scores(sf_dir: str):
    """Discovery host-salted class scoring (crc32 deciles — not
    SQL-expressible without crc32)."""
    from frontera_ray.strategies import DiscoveryStrategy

    st = DiscoveryStrategy()

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = [
            f"http://host-{d % 20}.test/robots.txt" if d % 4 == 0 else
            f"http://host-{d % 20}.test/" if d % 4 == 1 else
            f"http://host-{d % 20}.test/p/{d}"
            for d in ids
        ]
        scores = st.link_scores(0, urls)
        return pa.table({"doc_id": batch["doc_id"],
                         "score": pa.array(np.round(scores, 6), pa.float64())})

    return _read(sf_dir, "documents").map_batches(kernel, batch_format="pyarrow")

def q_crawl_bfs(sf_dir: str):
    """Flagship iterative crawl (local deterministic engine, BFS) over a
    fixed synthetic web; returns the crawl order."""
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.local import LocalFrontier, run_crawl_sequence
    from frontera_ray.strategies import BFSStrategy

    web = SyntheticWeb(32, seed=42, max_class=3)

    class _G:
        seeds = web.seeds()
        links_of = staticmethod(web.links_of)

    f = LocalFrontier(strategy=BFSStrategy(), profile="min_score")
    seq = run_crawl_sequence(f, _G, max_next_requests=64)
    urls = [e.url for reqs, _, _ in seq for e in reqs]
    return pa.table({
        "rank": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })


def q_fetch_pages(sf_dir: str):
    """Deterministic fetch simulation -> image+caption rows (input_hint
    schema) for the first 200 crawl URLs."""
    import ray
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.payload import fetch_simulated

    web = SyntheticWeb(32, seed=42, max_class=3)
    urls = sorted(web.seeds())[:200]

    def kernel(batch: pa.Table) -> pa.Table:
        rows = [fetch_simulated(u) for u in batch["url"].to_pylist()]
        return pa.table({
            "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "caption": pa.array([r["caption"] for r in rows], pa.string()),
            "phash": pa.array([r["phash"] for r in rows], pa.int64()),
        })

    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    return ds.map_batches(kernel, batch_format="pyarrow")


def q_minhash_neardup(sf_dir: str):
    """MinHash+LSH near-dup pairs over documents (banded buckets ->
    candidate groupby -> Jaccard verify), integer-exact output
    (a, b, inter_size, union_size) so the FULL pipeline — md5-64 gram
    hashes, the 64 wrap-mod universal-hash minima, 16x4 banding, and
    the exact verify — is SQL-oracle-checked end to end."""
    from frontera_ray.stages.dedup import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(_read(sf_dir, "documents"), threshold=0.5)
    return pairs.select(["a", "b", "inter_size", "union_size"])


def q_dedup_keepers(sf_dir: str):
    """Near-dup keeper resolution: minhash pair list -> union-find
    over PAIR ids only (ids absent from pairs keep themselves by
    definition) -> broadcast lookup mapped over the corpus. The
    keep-list is produced as a streaming Dataset; nothing corpus-sized
    ever lands on the driver."""
    from frontera_ray.stages.dedup import keeper_table, minhash_neardup_pairs

    ds = _read(sf_dir, "documents")
    pairs = minhash_neardup_pairs(ds, threshold=0.5)
    # no sort: the keep-list is written partitioned at scale; content
    # (not row order) is the contract, and it is deterministic.
    return keeper_table(ds, pairs)


def q_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster size distribution (how big do near-dup
    components get — the skew/quality read on a dedup pass before
    committing to drop 1-1/size of each cluster): minhash pairs ->
    pair-scoped union-find -> component sizes (members + the keeper
    itself) -> size histogram. Pairs are output-scale, so the fold is
    a tiny driver reduction; the corpus never moves."""
    import pandas as pd
    from frontera_ray.stages.dedup import dedup_keepers, minhash_neardup_pairs

    pairs = minhash_neardup_pairs(_read(sf_dir, "documents"), threshold=0.5)
    km = dedup_keepers(None, list(zip(pairs["a"].to_pylist(),
                                      pairs["b"].to_pylist())))
    sizes = pd.Series(list(km.values())).value_counts()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame({
        "cluster_size": hist.index.to_numpy().astype(np.int64),
        "n_clusters": hist.to_numpy().astype(np.int64)})


def q_dedup_keepers_cc(sf_dir: str):
    """Same keep-list as `dedup_keepers`, but the pair-graph reduction
    runs as DISTRIBUTED connected components (iterative min-label
    propagation — equi-join + groupby-min per step) instead of driver
    union-find: the scale path when the pair stream itself is too
    large to walk sequentially. Shares the recursive min-label SQL
    oracle with `dedup_keepers`."""
    from frontera_ray.stages.dedup import (keeper_table_cc,
                                           minhash_neardup_pairs)

    ds = _read(sf_dir, "documents")
    pairs = minhash_neardup_pairs(ds, threshold=0.5)
    return keeper_table_cc(ds, pairs)


def q_simhash(sf_dir: str):
    from frontera_ray.stages.text import simhash_table

    return _read(sf_dir, "documents").map_batches(
        simhash_table, batch_format="pyarrow")


def q_simhash_neardup(sf_dir: str):
    from frontera_ray.stages.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_read(sf_dir, "documents"), max_hamming=6)


def q_ann_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN (second scale path beside LSH), the
    deterministic variant: inverted lists from the kmeans_centroids
    Lloyd recurrence (smallest-vec_id seeds, 1e-9 rounding), per-query
    nprobe probe sets, exact cosine top-k over probed candidates.
    Oracle = the unrolled iters=1 k-means CTE (same recurrence as
    `kmeans`/`semantic_dedup`) + probe ranking + the ann_topk rank
    convention. The sampled spherical-kmeans `ivf_topk` stays as the
    recall-tested production alternative (pytest: nprobe=nlist
    reproduces brute_force_topk byte-for-byte)."""
    from frontera_ray.stages.ann import ivf_topk_fixed

    return ivf_topk_fixed(_read(sf_dir, "embeddings"), range(5), k=10,
                          nlist=8, nprobe=3, iters=1)


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN (scale path): hyperplane codes, Hamming<=1 probe."""
    from frontera_ray.stages.ann import lsh_topk

    return lsh_topk(_read(sf_dir, "embeddings"), range(5), k=10)


def q_cosine_neardup_lsh(sf_dir: str):
    """Banded hyperplane LSH near-dup pairs (the scale path for
    cosine_neardup: one pass + one bucket exchange over the whole
    corpus; recall vs brute asserted in tests/test_dedup_ann.py)."""
    from frontera_ray.stages.ann import cosine_neardup_lsh

    return cosine_neardup_lsh(_read(sf_dir, "embeddings"), threshold=0.6)


def q_phash_neardup(sf_dir: str):
    """Perceptual-hash near-dup pairs over a 3,211-image synthetic web,
    fully distributed (the input_hint's phash column put to work):
    flat-map seed expansion -> sketch-only phash fetch (no encode) ->
    the shared bit-block-LSH + Hamming-verify exchange (blocks=3 gives
    pigeonhole-exact recall at hamming<=2) -> broadcast pair-id
    resolution back to image_id strings. One keyed all-to-all over
    16 B/image sketch rows; no driver-side all-pairs."""
    from frontera_ray.stages.images import phash_neardup_pairs

    return phash_neardup_pairs(_image_url_corpus(), max_hamming=2, blocks=3)


def _image_url_corpus(blocks: int = 8):
    """3,211-URL synthetic image corpus as a streaming Dataset: the
    full SyntheticWeb(256, max_class=3) page tree (path lengths 1..4,
    redirect aliases resolved), enumerated CLOSED-FORM per host in one
    stage over a pre-split host table — the tree is a pure function of
    the host's (depth, branching) class, so no level-by-level BFS
    expansion (4 chained map_batches) is needed, and the pre-split
    gives downstream fetch/decode stages ``blocks``-way parallelism
    from the first batch. Equivalence with the BFS expansion is pinned
    by test_image_corpus_closed_form."""
    import ray
    from frontera_ray.graphs import SyntheticWeb

    web = SyntheticWeb(256, seed=42, max_class=3)

    def expand(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch["hid"].to_numpy():
            host = web.host(int(i))
            depth, branching = web.shape_of(host)
            frontier = ["1"]
            for _ in range(min(depth - 1, 4)):
                out.extend(f"http://{host}/{p}" for p in frontier)
                frontier = [p + str(k) for p in frontier
                            for k in range(1, branching + 1)]
        return pa.table({"url": pa.array(out, pa.string())})

    hosts = pa.table({"hid": pa.array(np.arange(256), pa.int64())})
    per = 256 // blocks
    ds = ray.data.from_arrow(
        [hosts.slice(j * per, per) for j in range(blocks)])
    return ds.map_batches(expand, batch_format="pyarrow")


def q_image_dedup_keepers(sf_dir: str):
    """Image-dedup keep-list over the 3,211-image corpus: distributed
    phash near-dup pairs -> pair-scoped union-find (keeper = smallest
    pair id) -> broadcast keeper map -> streaming (image_id,
    keeper_image_id). Images absent from the pair stream keep
    themselves; nothing corpus-sized lands on the driver."""
    from frontera_ray.stages.images import image_keeper_table

    return image_keeper_table(_image_url_corpus(), max_hamming=2, blocks=3)


def _fetch_payload_batch(batch: pa.Table) -> pa.Table:
    """(url) -> (image_id, bytes, fmt) via the columnar batch fetch
    (pixel gen + phash vectorized per size-class group)."""
    from frontera_ray.payload import fetch_batch_columns

    cols = fetch_batch_columns(batch["url"].to_pylist())
    return pa.table({
        "image_id": pa.array(cols["image_id"], pa.string()),
        "bytes": pa.array(cols["bytes"], pa.binary()),
        "fmt": pa.array(cols["fmt"], pa.string()),
    })


def _image_pool() -> tuple[int, int]:
    """Actor-pool sizing for the image stages: enough floor actors to
    keep the 4 corpus blocks busy on a big node, but never so many
    that the pool reserves every CPU and starves the upstream expand
    tasks (4-CPU test sessions deadlock at min >= cpus)."""
    from frontera_ray.stages.relational import cluster_cpus

    return (2, 4) if cluster_cpus() < 8 else (4, 8)


# Batch size for the fused corpus->fetch->decode image chains: Ray
# fuses expand/fetch into the downstream actor operator, so batch_size
# counts OPERATOR-INPUT rows (host ids, 256 total), not expanded image
# rows — 256 would coalesce the whole corpus into ONE task (zero
# parallelism; measured 3.9 s -> 2.0 s at sf0.1 when split). 16 hids
# ~= 200 images per actor batch.
_IMG_FUSED_BS = 16


def q_image_stats(sf_dir: str):
    """Multimodal decode stage over the full 3,211-image corpus:
    vectorized batch fetch feeding the actor-pool decode/stats stage
    (codec state per actor in __init__, per-image decode in __call__)."""
    from frontera_ray.stages.images import DecodeStatsStage

    return (_image_url_corpus()
            .map_batches(_fetch_payload_batch, batch_format="pyarrow")
            .map_batches(DecodeStatsStage, batch_format="pyarrow",
                         batch_size=_IMG_FUSED_BS, concurrency=_image_pool()))


def q_image_resize(sf_dir: str):
    """Multimodal thumbnailing over the full 3,211-image corpus:
    vectorized batch fetch -> decode -> nearest-neighbor resize -> PNG
    re-encode (actor-pool stage; thumbnails validated pixel-exact in
    tests/test_stages.py)."""
    from frontera_ray.stages.images import ResizeStage

    return (_image_url_corpus()
            .map_batches(_fetch_payload_batch, batch_format="pyarrow")
            .map_batches(ResizeStage,
                         fn_constructor_kwargs=dict(out_w=16, out_h=16),
                         batch_format="pyarrow",
                         batch_size=_IMG_FUSED_BS, concurrency=_image_pool()))


def q_image_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing card over the 3,211-image corpus
    (images.aspect_bucket_table): metadata-only fetch (no decode),
    nearest log-aspect bucket + per-image padding-waste ppm, then a
    combiner rollup (n, total waste) per bucket — the pre-batching
    step that keeps multimodal batches aspect-uniform."""
    from frontera_ray.payload import meta_batch_columns
    from frontera_ray.stages.images import aspect_bucket_table
    from frontera_ray.stages.relational import partial_groupby_agg

    def meta(batch: pa.Table) -> pa.Table:
        cols = meta_batch_columns(batch["url"].to_pylist())
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32())})

    buckets = (_image_url_corpus()
               .map_batches(meta, batch_format="pyarrow")
               .map_batches(aspect_bucket_table, batch_format="pyarrow"))
    out = partial_groupby_agg(
        buckets, ["bucket_ppm"],
        {"n": ("waste_ppm", "count"), "waste_ppm_sum": ("waste_ppm", "sum")})
    return out.sort_values("bucket_ppm").reset_index(drop=True)


def q_incremental_dedup(sf_dir: str):
    """Incremental snapshot dedup via large-large ANTI join: 'new'
    docs (odd doc_id) whose exact content key (md5) does NOT appear in
    the previous snapshot (even doc_id) — the daily-delta dedup shape
    where both sides are corpus-sized, so neither fits a broadcast.
    One keyed exchange; the right side ships only its md5 column."""
    import pyarrow.compute as _pc
    from frontera_ray.stages.relational import semi_anti_join
    from frontera_ray.stages.text import content_md5_table

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    keyed = docs.map_batches(content_md5_table, batch_format="pyarrow") \
                .select_columns(["doc_id", "text_md5"])
    new = keyed.map_batches(
        lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b["doc_id"], 1), 1)),
        batch_format="pyarrow")
    snap = keyed.map_batches(
        lambda b: b.filter(_pc.equal(_pc.bit_wise_and(b["doc_id"], 1), 0)),
        batch_format="pyarrow")
    # measured at sf0.1/32cpus: groups 0.7 s vs hash 1.6 s warm —
    # 5k distinct md5 keys sit below the per-key map_groups wall, so
    # the sort exchange wins; corpora with 10^8+ distinct hashes
    # should pass exchange='hash'
    out = semi_anti_join(new, snap, "text_md5", ["doc_id"],
                         anti=True).to_pandas()
    return out[["doc_id", "text_md5"]].sort_values(
        "doc_id").reset_index(drop=True)


def q_active_customers(sf_dir: str):
    """SEMI join (EXISTS): customers with at least one urgent order —
    each surviving left row emitted once, right side ships only its
    key column through the exchange."""
    import pyarrow.compute as _pc
    from frontera_ray.stages.relational import semi_anti_join

    cust = _read(sf_dir, "customer").select_columns(
        ["c_custkey", "c_name", "c_mktsegment"])
    urgent = (_read(sf_dir, "orders")
              .select_columns(["o_custkey", "o_orderpriority"])
              .map_batches(lambda b: b.filter(
                  _pc.equal(b["o_orderpriority"], "1-URGENT")),
                  batch_format="pyarrow")
              .map_batches(lambda b: b.rename_columns(
                  ["c_custkey", "o_orderpriority"]),
                  batch_format="pyarrow"))
    # 15k customer keys: hash repartition (1.6 s) beats per-key
    # map_groups (3.4 s) at 32 cpus; small sessions keep the sort
    # exchange (Ray 2.49 hash-shuffle wedge — COVERAGE.md)
    from frontera_ray.stages.relational import cluster_cpus
    out = semi_anti_join(cust, urgent, "c_custkey",
                         ["c_name", "c_mktsegment"],
                         exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_hash_split(sf_dir: str):
    """Deterministic train/val/test split: the split label is a pure
    function of doc_id (md5 top-32-bits vs the cumulative fraction
    ladder), so retries, re-runs and incremental batches agree with no
    shuffle and no shared RNG."""
    from frontera_ray.stages.sampling import hash_split

    out = hash_split(_read(sf_dir, "documents")
                     .select_columns(["doc_id", "lang"]),
                     "doc_id", _SPLITS).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_PII_DIGITS_RE = r"[0-9]+"


def q_pii_redact(sf_dir: str):
    """PII-style scrubbing over the events payload column: redact
    every digit run and count matches — one vectorized RE2
    replace + count per batch (the identical pattern runs in DuckDB's
    regexp_replace/extract_all, also RE2)."""
    from frontera_ray.stages.text import regex_redact_table

    return _read(sf_dir, "events").select_columns(
        ["event_id", "props"]).map_batches(
        lambda b: regex_redact_table(b, "props", _PII_DIGITS_RE,
                                     replacement="#", id_col="event_id"),
        batch_format="pyarrow")


_DECON_K = 4  # word-4-grams: non-degenerate on this corpus at all SFs

# the curate feature CTE — the SQL twin of text.curate_table, shared by
# the "curate" and "prep_pipeline" oracles so the two cannot drift
_CURATE_FEATS_CTE = r"""feats AS (
              SELECT doc_id,
                     n_tokens::BIGINT AS n_tokens,
                     round(0.4*least(1.0, n_tokens/100.0)
                         + 0.3*(1.0 - n_upper/greatest(n_chars,1)::DOUBLE)
                         + 0.3*least(1.0, 20.0*n_punct/greatest(n_chars,1)::DOUBLE),
                         4) AS quality_score,
                     CASE WHEN greatest(c_en,c_de,c_fr,c_es,c_zh) = 0 THEN 'und'
                          WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
                          WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
                          WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
                          WHEN c_es >= c_zh THEN 'es'
                          ELSE 'zh' END AS lang_pred,
                     md5(text) AS text_md5
              FROM (
                SELECT doc_id, text, length(text) AS n_chars,
                       len(regexp_extract_all(text, '\S+')) AS n_tokens,
                       len(regexp_extract_all(text, '[.!,;:?]')) AS n_punct,
                       len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
                       len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) c_en,
                       len(regexp_extract_all(lower(text), '\b(der|und|die|das|ein)\b')) c_de,
                       len(regexp_extract_all(lower(text), '\b(le|la|les|des|une)\b')) c_fr,
                       len(regexp_extract_all(lower(text), '\b(el|los|las|una|que)\b')) c_es,
                       len(regexp_extract_all(lower(text), '\b(de|le|shi|bu|zai)\b')) c_zh
                FROM documents))"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: eval set = docs with doc_id % 97 == 0
    (standing in for a held-out benchmark); a training doc is flagged
    iff it shares any word-4-gram with the eval set. Eval grams reduce
    to one distinct md5-64 hash array (benchmarks are small by
    construction), broadcast once via ray.put; the training corpus
    streams through one np.isin map_batches — no corpus-side shuffle."""
    import ray
    from frontera_ray.stages.text import (collect_eval_gram_hashes,
                                          decontaminate)

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ev = docs.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() % 97 == 0)),
        batch_format="pyarrow")
    train = docs.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() % 97 != 0)),
        batch_format="pyarrow")
    ref = ray.put(collect_eval_gram_hashes(ev, k=_DECON_K))
    return decontaminate(train, ref, k=_DECON_K)


def q_repetition(sf_dir: str):
    """Gopher-style repetition signals (duplicate-token / duplicate
    3-gram numerators+denominators) per doc — integers for exact
    oracle hashing; two np.unique reductions per batch, no per-doc
    Python."""
    from frontera_ray.stages.text import repetition_table

    return _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(
        repetition_table, batch_format="pyarrow")


_PACK_BUDGET = 128
_PACK_BUCKET = 64


def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing of documents into <=128-token packs
    within doc_id buckets of 64 — deterministic w.r.t. block structure
    (pack assignment is a pure function of the bucket's (id, weight)
    rows), buckets pack in parallel. The SQL oracle replays the same
    greedy scan with a recursive CTE."""
    from frontera_ray.stages.sampling import pack_sequences
    from frontera_ray.stages.text import token_count_table

    toks = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(
        token_count_table, batch_format="pyarrow")
    out = pack_sequences(toks, "doc_id", "n_tokens",
                         budget=_PACK_BUDGET,
                         bucket_size=_PACK_BUCKET).to_pandas()
    return out[["pack_id", "doc_id", "n_tokens"]].sort_values(
        "doc_id").reset_index(drop=True)


_PRICE_QS = (0.25, 0.5, 0.9, 0.99)


def q_price_quantiles(sf_dir: str):
    """EXACT discrete quantiles of a CONTINUOUS column (o_totalprice)
    with no sort shuffle: per-block (count,min,max) + equi-width
    histogram partials locate each rank's bin, one filter pass
    collects only the target bins (~n/4096 values each), skewed bins
    recurse. Complements the bounded-domain histogram combine of
    `quantity_quantiles`."""
    import pandas as pd
    from frontera_ray.stages.relational import quantile_unbounded

    ds = _read(sf_dir, "orders").select_columns(["o_totalprice"])
    res = quantile_unbounded(ds, "o_totalprice", list(_PRICE_QS))
    return pd.DataFrame([{f"p{int(q * 100)}": res[q] for q in _PRICE_QS}])


_CONT_QS = (0.25, 0.5, 0.9, 0.99)


def q_percentile_cont(sf_dir: str):
    """EXACT interpolated quantiles (SQL PERCENTILE_CONT) of the
    events value column: the same histogram-bisection machinery as
    price_quantiles resolves BOTH neighboring order statistics of
    every q in one shared pass set; the interpolation expression tree
    is op-matched to the SQL twin so micro-rounded values hash
    bit-for-bit. Completes the quantile family (bounded-domain
    histogram / unbounded disc / one-pass sketch / interpolated)."""
    import math

    import pandas as pd
    from frontera_ray.stages.relational import percentile_cont_unbounded

    ds = _read(sf_dir, "events").select_columns(["value"])
    res = percentile_cont_unbounded(ds, "value", list(_CONT_QS))
    return pd.DataFrame({
        "q": pd.Series(list(_CONT_QS), dtype="float64"),
        "value_micro": pd.Series(
            [int(math.floor(res[q] * 1e6 + 0.5)) for q in _CONT_QS],
            dtype="int64"),
    })


def _high_value_orders(sf_dir: str):
    import pyarrow.compute as _pc

    return (_read(sf_dir, "orders")
            .select_columns(["o_orderkey", "o_totalprice"])
            .map_batches(lambda b: b.filter(
                _pc.greater(b["o_totalprice"], 480000.0))
                .rename_columns(["l_orderkey", "o_totalprice"]),
                batch_format="pyarrow"))


def q_bloom_semi_join(sf_dir: str):
    """Bloom-prefiltered EXACT semi join: lineitem rows of high-value
    orders (~4% selective right side). The right side's Bloom filter
    (16 KiB) broadcasts; ~96% of lineitem is dropped WITHOUT any
    shuffle; only candidates enter the exact confirm exchange."""
    from frontera_ray.stages.relational import bloom_semi_join

    left = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity"])
    out = bloom_semi_join(left, _high_value_orders(sf_dir), "l_orderkey",
                          ["l_linenumber", "l_quantity"],
                          m_bits=1 << 17).to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]) \
        .reset_index(drop=True)


def q_bloom_anti_join(sf_dir: str):
    """Bloom-split EXACT anti join (NOT EXISTS): bloom-absent lineitem
    rows stream straight to the output (definitive non-matches, no
    exchange); only the ~4% candidates go through the exact anti
    confirm. Result is aggregated per returnflag so the output stays
    tiny while the whole corpus flows through the union."""
    from frontera_ray.stages.relational import bloom_semi_join

    left = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity"])
    out = bloom_semi_join(left, _high_value_orders(sf_dir), "l_orderkey",
                          ["l_linenumber", "l_quantity"], anti=True,
                          m_bits=1 << 17)
    agg = pa.concat_tables(list(
        out.map_batches(lambda b: pa.table({
            "n_rows": pa.array([len(b)], pa.int64()),
            "sum_qty": pa.array(
                [0.0 if len(b) == 0 else
                 float(pc.sum(b["l_quantity"]).as_py())], pa.float64()),
        }), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    import pandas as pd
    return pd.DataFrame([{
        "n_rows": int(agg["n_rows"].to_numpy().sum()),
        "sum_qty": int(round(agg["sum_qty"].to_numpy().sum())),
    }])


def q_hll_distinct(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT) of (l_orderkey,
    l_partkey) pairs next to the exact answer: one streaming pass of
    16 KiB register partials + driver max-merge vs a hash-shuffle
    groupby count. Exact integer register arithmetic (md5-hash, power-
    of-two register sum) makes even the ESTIMATE bit-reproducible by
    the SQL oracle — both branches of the estimator are pure IEEE
    expressions written identically on both sides."""
    import pandas as pd
    from frontera_ray.stages.sketches import hll_count_distinct

    def build(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy()
        pk = b["l_partkey"].to_numpy()
        return pa.table({
            "v": pc.binary_join_element_wise(
                pc.cast(b["l_orderkey"], pa.string()),
                pc.cast(b["l_partkey"], pa.string()), "|"),
            # packed int64 twin of v ('|' makes the string bijective
            # with the pair, so count-distinct agrees): the exact
            # exchange ships 8-byte ints, not strings
            "pk": pa.array(ok * (1 << 32) + pk, pa.int64()),
        })

    # materialized ONLY to share one read+build between the estimate
    # and its exact companion; the 100-TB path runs the sketch alone,
    # streaming
    keyed = (_read(sf_dir, "lineitem")
             .select_columns(["l_orderkey", "l_partkey"])
             .map_batches(build, batch_format="pyarrow").materialize())
    est = hll_count_distinct(keyed.select_columns(["v"]), "v", p=14)

    # exact companion: per-PARTITION unique count after one key-hash
    # exchange of 8-byte ints + a 16-int driver sum — 3x faster than
    # the sort groupby (1.3 s vs 4.1 s at sf0.1); small sessions keep
    # the sort path (Ray 2.49 hash-shuffle wedge — COVERAGE.md)
    from frontera_ray.stages.relational import cluster_cpus, keyed_exchange

    def block_distinct(b: pa.Table) -> pa.Table:
        u = len(np.unique(b["pk"].to_numpy())) if len(b) else 0
        return pa.table({"n": pa.array([u], pa.int64())})

    if _choose_exchange("hash") == "hash":
        parts = keyed_exchange(keyed.select_columns(["pk"]), "pk",
                               block_distinct, exchange="hash")
        n_exact = sum(int(t["n"].to_numpy().sum())
                      for t in parts.iter_batches(
                          batch_format="pyarrow", batch_size=None))
    else:
        n_exact = keyed.select_columns(["pk"]).groupby("pk").count().count()
    return pd.DataFrame([{"est_distinct": int(np.floor(est)),
                          "n_exact": int(n_exact)}])


def q_unigram_logprob(sf_dir: str):
    """CCNet-style quality filter: per-doc mean unigram log-prob under
    the corpus's own unigram LM (integer micro-units so the SQL oracle
    hashes exactly) + a keep flag. One explode pass feeds both the
    corpus count aggregate and — broadcast back — the streaming
    per-doc scoring."""
    from frontera_ray.stages.text import unigram_logprob

    out = unigram_logprob(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_bigram_logprob(sf_dir: str):
    """Bigram-LM quality filter (text.bigram_logprob): per-doc sum of
    Laplace-smoothed conditional bigram log-probs under the corpus's
    own bigram LM + keep flag at the mean-logprob cutoff — the
    word-order-aware step past unigram_logprob toward a perplexity
    filter. One explode feeds the LM aggregate and the scoring pass;
    integer micro-units keep the score an order-free sum."""
    from frontera_ray.stages.text import bigram_logprob

    out = bigram_logprob(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_gram_novelty(sf_dir: str):
    """Per-doc 4-gram novelty (text.gram_novelty): how many of a doc's
    distinct word-4-grams appear nowhere else — the inverse-
    memorization / boilerplate signal. Two NATIVE hash aggregates
    (groupby(gram) count+min, groupby(doc_id) sum), no per-key UDF
    calls; a df-1 gram's sole doc is its min(doc_id)."""
    from frontera_ray.stages.text import gram_novelty

    out = gram_novelty(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        k=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (text.bpe_learn_merges): the first 6
    merge rules learned from the corpus — per round, the most frequent
    adjacent symbol pair over the frequency-weighted distinct-word
    table, merged everywhere. Corpus-scale work is one native word
    count; iterations run over the vocabulary-bounded word table.
    Oracle = the rounds unrolled as chained CTEs with the same
    replace() merge semantics."""
    from frontera_ray.stages.text import bpe_learn_merges

    out = bpe_learn_merges(
        _read(sf_dir, "documents").select_columns(["text"]), rounds=6)
    return out


_BPE_ROUNDS = 6


def _bpe_ctes(rounds: int, through_final_w: bool) -> list[str]:
    """The shared BPE CTE chain: w0 = char-split distinct words (one
    space pad each side); each round's winner CTE picks
    (count desc, pair asc) and the merge is the SAME left-to-right
    non-overlapping replace() scan the Python side uses."""
    parts = [r"""w0 AS (
        SELECT word, count(*)::BIGINT AS cnt,
               ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS seq
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
              FROM documents)
        GROUP BY word)"""]
    for r in range(1, rounds + 1):
        parts.append(rf"""p{r} AS (
        SELECT s[i] AS a, s[i+1] AS b, sum(cnt)::BIGINT AS c
        FROM (SELECT cnt, regexp_extract_all(trim(seq), '\S+') AS s
              FROM w{r - 1}),
             UNNEST(generate_series(1, len(s) - 1)) AS t(i)
        GROUP BY 1, 2)""")
        parts.append(f"""m{r} AS (
        SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1)""")
        if r < rounds or through_final_w:
            parts.append(f"""w{r} AS (
        SELECT word, cnt,
               replace(seq, ' ' || m.a || ' ' || m.b || ' ',
                       ' ' || m.a || m.b || ' ') AS seq
        FROM w{r - 1}, m{r} m)""")
    return parts


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """SQL twin of bpe_learn_merges (see ``_bpe_ctes``)."""
    parts = _bpe_ctes(rounds, through_final_w=False)
    unions = "\n        UNION ALL ".join(
        f"SELECT {r} AS round, a AS \"left\", b AS \"right\", "
        f"c AS pair_count FROM m{r}"
        for r in range(1, rounds + 1))
    return ("WITH " + ",\n        ".join(parts)
            + f"\n        {unions}\n        ORDER BY round")


def _bpe_encode_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """SQL twin of bpe_encode_lengths over the merges learned by the
    same CTE chain: per-word symbol counts from the final merged
    sequences, summed per document."""
    parts = _bpe_ctes(rounds, through_final_w=True)
    return ("WITH " + ",\n        ".join(parts) + rf""",
        ws AS (SELECT word,
                      len(regexp_extract_all(trim(seq), '\S+'))::BIGINT
                        AS n_sym
               FROM w{rounds}),
        tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+'))
                         AS word
                FROM documents)
        SELECT d.doc_id, count(tok.word)::BIGINT AS n_words,
               COALESCE(sum(ws.n_sym), 0)::BIGINT AS n_symbols
        FROM documents d
        LEFT JOIN tok ON tok.doc_id = d.doc_id
        LEFT JOIN ws ON ws.word = tok.word
        GROUP BY d.doc_id ORDER BY d.doc_id""")


def q_bpe_encode(sf_dir: str):
    """Tokenize with the trained BPE (text.bpe_encode_lengths): apply
    the 6 learned merge rules and report each doc's encoded length in
    symbols — packing budgets are denominated in tokens. Word ->
    symbol-count map built once over the vocab, broadcast; documents
    stream through one vectorized lookup pass."""
    from frontera_ray.stages.text import bpe_encode_lengths, bpe_learn_merges

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    rules = bpe_learn_merges(docs, rounds=_BPE_ROUNDS)
    out = bpe_encode_lengths(
        docs, list(zip(rules["left"], rules["right"]))).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_tokenize_ids(sf_dir: str):
    """Corpus word-level tokenizer (text.tokenize_ids): frequency-
    ranked vocabulary ids (count desc, token asc) + every doc encoded
    as ordered (doc_id, pos, token_id) rows — the text-to-tensor
    bridge. One position-preserving explode feeds the vocab aggregate
    and, broadcast back, the streaming encode."""
    from frontera_ray.stages.text import tokenize_ids

    return tokenize_ids(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]))


_HH_NUM, _HH_DEN = 330, 10000  # 3.3% support — splits this vocabulary


def q_heavy_hitters(sf_dir: str):
    """EXACT frequent tokens (>= 3.3% of the token stream) with NO
    all-to-all: per-block candidate prefilter (pigeonhole superset
    guarantee) + sentinel block totals, then a broadcast exact recount
    of the tiny candidate set — the heavy-hitter shape for
    vocabularies too large to groupby-shuffle."""
    from frontera_ray.stages.text import heavy_hitters

    return heavy_hitters(
        _read(sf_dir, "documents").select_columns(["text"]),
        _HH_NUM, _HH_DEN)


def q_orders_left_join(sf_dir: str):
    """LEFT OUTER large-large join: every order survives; orders with
    no heavy lineitem (quantity >= 48) emit a null-padded row (null
    take indices; -1 filled on both sides for exact value hashing)."""
    import pyarrow.compute as _pc
    from frontera_ray.stages.relational import cluster_cpus, equi_join

    li = (_read(sf_dir, "lineitem")
          .select_columns(["l_orderkey", "l_quantity"])
          .map_batches(lambda b: pa.table({
              "o_orderkey": b["l_orderkey"],
              "l_qty": b["l_quantity"].cast(pa.int64()),
          }).filter(_pc.greater_equal(b["l_quantity"], 48.0)),
              batch_format="pyarrow"))
    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_orderpriority"])
    out = equi_join(orders, li, "o_orderkey", ["o_orderpriority"],
                    ["l_qty"], how="left",
                    exchange=_choose_exchange("tasks"))
    out = out.map_batches(
        lambda b: b.set_column(b.column_names.index("l_qty"), "l_qty",
                               _pc.fill_null(b["l_qty"], -1)),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["o_orderkey", "l_qty"]).reset_index(drop=True)


def q_customers_full_join(sf_dir: str):
    """FULL OUTER large-large join (relational.equi_join how='full'):
    BUILDING-segment customers vs ALL orders on custkey. Customers
    with no order emit null-padded right payloads; orders from
    non-BUILDING customers emit null-padded left payloads (the output
    key is COALESCE(l.key, r.key) by construction — unmatched right
    rows carry their own key). -1 sentinel fill on both sides for
    exact value hashing."""
    import pyarrow.compute as _pc
    from frontera_ray.stages.relational import cluster_cpus, equi_join

    cust = (_read(sf_dir, "customer")
            .select_columns(["c_custkey", "c_mktsegment", "c_acctbal"])
            .map_batches(lambda b: pa.table({
                "c_custkey": b["c_custkey"],
                "acctbal_cents": _pc.cast(_pc.round(
                    _pc.multiply(b["c_acctbal"], 100.0)), pa.int64()),
            }).filter(_pc.equal(b["c_mktsegment"], "BUILDING")),
                batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders")
              .select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
              .map_batches(lambda b: pa.table({
                  "c_custkey": b["o_custkey"],
                  "o_orderkey": b["o_orderkey"],
                  "price_cents": _pc.cast(_pc.round(
                      _pc.multiply(b["o_totalprice"], 100.0)), pa.int64()),
              }), batch_format="pyarrow"))
    out = equi_join(cust, orders, "c_custkey", ["acctbal_cents"],
                    ["o_orderkey", "price_cents"], how="full",
                    exchange=_choose_exchange("tasks"))
    out = out.map_batches(
        lambda b: pa.table({c: _pc.fill_null(b[c], -1)
                            for c in b.column_names}),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["c_custkey", "o_orderkey"]).reset_index(drop=True)


def q_order_rank(sf_dir: str):
    """Per-customer ROW_NUMBER ranking window (relational.per_key_rank):
    each customer's 2 most expensive orders with their 1-based rank as
    an output column — QUALIFY rn <= 2 semantics from one keyed
    exchange + one vectorized lexsort."""
    import pyarrow.compute as _pc
    from frontera_ray.stages.relational import cluster_cpus, per_key_rank

    orders = (_read(sf_dir, "orders")
              .select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
              .map_batches(lambda b: pa.table({
                  "o_custkey": b["o_custkey"],
                  "o_orderkey": b["o_orderkey"],
                  "price_cents": _pc.cast(_pc.round(
                      _pc.multiply(b["o_totalprice"], 100.0)), pa.int64()),
              }), batch_format="pyarrow"))
    out = per_key_rank(orders, "o_custkey", "price_cents", 2,
                       descending=True, tiebreak="o_orderkey",
                       exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values(["o_custkey", "rn"]).reset_index(drop=True)


def q_latest_events(sf_dir: str):
    """Keep-latest upsert (CDC compaction): one surviving row per
    user_id — max ts, smallest event_id on ties — via per_key_topk
    k=1 over a single keyed exchange. The snapshot-compaction shape a
    mutable-corpus ingest (latest version of each doc) needs."""
    from frontera_ray.stages.relational import cluster_cpus, per_key_topk

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "event_type"]).map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_type": b["event_type"],
        }), batch_format="pyarrow")
    out = per_key_topk(ev, "user_id", "ts_us", 1, descending=True,
                       tiebreak="event_id",
                       exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_percent_rank(sf_dir: str):
    """PERCENT_RANK of each event's value (integer cents) within its
    event_type (relational.per_key_percent_rank): RANK tie semantics,
    micro-rounded, one keyed exchange + one vectorized pass."""
    from frontera_ray.stages.relational import per_key_percent_rank

    ev = _read(sf_dir, "events").select_columns(
        ["event_id", "event_type", "value"]).map_batches(
        lambda b: pa.table({
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "cents": pa.array(
                np.floor(b["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64), pa.int64()),
        }), batch_format="pyarrow")
    out = per_key_percent_rank(ev, "event_type", "cents").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_event_pivot(sf_dir: str):
    """PIVOT long->wide: one row per user with a count column per
    event type (relational.pivot_counts — per-block bincount partials,
    one hash-shuffle groupby-sum of pre-aggregated wide rows)."""
    from frontera_ray.stages.relational import pivot_counts

    types = ["click", "error", "purchase", "signup", "view"]
    out = pivot_counts(_read(sf_dir, "events"), "user_id",
                       "event_type", types).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _priority_custkeys(sf_dir: str, prio: str):
    import pyarrow.compute as _pc

    return (_read(sf_dir, "orders")
            .select_columns(["o_custkey", "o_orderpriority"])
            .map_batches(lambda b: pa.table({
                "o_custkey": b["o_custkey"]}).filter(
                _pc.equal(b["o_orderpriority"], prio)),
                batch_format="pyarrow"))


def q_urgent_low_intersect(sf_dir: str):
    """Distributed INTERSECT (relational.set_op): customers that placed
    BOTH an urgent and a low-priority order — keys-only tagged
    exchange, one distinct key out per match."""
    from frontera_ray.stages.relational import cluster_cpus, set_op

    out = set_op(_priority_custkeys(sf_dir, "1-URGENT"),
                 _priority_custkeys(sf_dir, "5-LOW"),
                 "o_custkey", op="intersect",
                 exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_validity_intervals(sf_dir: str):
    """SCD2 validity intervals per user
    (relational.per_key_validity_intervals): each event becomes a
    [valid_from, valid_to) version row (valid_to = next event's
    timestamp, -1 while current) — LEAD-window semantics re-expressed
    as the change-log -> point-in-time-history warehouse pattern.
    (user_id, ts) is unique in this data, so the order — and the
    oracle — is deterministic."""
    from frontera_ray.stages.relational import (cluster_cpus,
                                                per_key_validity_intervals)

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_id", "ts"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "event_id": b["event_id"],
              "ts_us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
          }), batch_format="pyarrow"))
    out = per_key_validity_intervals(
        ev, "user_id", "ts_us", cols=["event_id"],
        exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_props_extract(sf_dir: str):
    """Semi-structured extraction + aggregate: pull the integer 'k'
    field out of the JSON props column with ONE vectorized RE2 pass
    (text.json_scalar_i64 — no per-row json.loads), then a combiner
    aggregate per event_type (sum + count + found-count). The
    telemetry-props / flat-JSON shape; nested JSON routes to an
    actor-pool parser stage instead."""
    from frontera_ray.stages.relational import partial_groupby_agg
    from frontera_ray.stages.text import json_scalar_i64

    def extract(batch: pa.Table) -> pa.Table:
        vals, found = json_scalar_i64(batch["props"], "k")
        return pa.table({
            "event_type": batch["event_type"],
            "k_val": pc.fill_null(vals, 0),
            "k_found": pa.array(found.astype(np.int64), pa.int64()),
        })

    ds = _read(sf_dir, "events").select_columns(
        ["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow")
    out = partial_groupby_agg(ds, "event_type", {
        "sum_k": ("k_val", "sum"),
        "n_found": ("k_found", "sum"),
        "n_rows": ("k_val", "count"),
    })
    for c in ("sum_k", "n_found", "n_rows"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_lang_top_tokens(sf_dir: str):
    """Per-language frequent tokens (>= 3.5% of that language's token
    stream) — text.grouped_heavy_hitters: the heavy-hitter pigeonhole
    bound applied per group, two streaming passes, no all-to-all; the
    per-language vocabulary profile of a multilingual curation pass."""
    from frontera_ray.stages.text import grouped_heavy_hitters

    return grouped_heavy_hitters(
        _read(sf_dir, "documents").select_columns(["lang", "text"]),
        "lang", 35, 1000)


def q_ridge_probe(sf_dir: str):
    """Linear probe over the embedding column (ann.ridge_fit): ridge
    regression of the label on the embedding via distributed normal
    equations — one (d+1)² register partial per block (rows never
    leave their blocks), driver solves the tiny system. The
    between-epochs quality-probe shape of a curation loop. Micro-
    rounded outputs (block-order float drift is ~1e-12); rows-only
    (pytest asserts parity with the closed-form numpy solution)."""
    import pandas as pd

    from frontera_ray.stages.ann import ridge_fit

    beta, b0, n = ridge_fit(
        _read(sf_dir, "embeddings").select_columns(
            ["embedding", "label"]).map_batches(
            lambda b: pa.table({
                "embedding": b["embedding"],
                "y": b["label"].cast(pa.float64()),
            }), batch_format="pyarrow"),
        "embedding", "y", l2=1e-3)
    return pd.DataFrame([{
        "n": int(n),
        "intercept_micro": int(round(b0 * 1e6)),
        "beta_norm_micro": int(round(float(np.linalg.norm(beta)) * 1e6)),
    }])


def q_quantile_sketch(sf_dir: str):
    """ONE-PASS approximate price quantiles (sketches.quantile_sketch):
    per-block equi-weight k-point summaries (16 KiB each) merge on the
    driver — the streaming/unbounded-domain counterpart of
    price_quantiles' exact three-pass histogram bisection, with rank
    error ≤ 1/(2k) per block summary. Deterministic (no RNG), so
    retries agree; approximate, so no SQL oracle — the error bound is
    pytest-asserted against the exact path."""
    import pandas as pd

    from frontera_ray.stages.sketches import quantile_sketch

    got = quantile_sketch(
        _read(sf_dir, "lineitem").select_columns(["l_extendedprice"]),
        "l_extendedprice", [0.25, 0.5, 0.9, 0.99], k=1024)
    return pd.DataFrame(
        [{"q": q, "est_cents": int(round(v * 100))}
         for q, v in sorted(got.items())])


def q_window_users(sf_dir: str):
    """Distinct active users per hourly tumbling window — the
    telemetry DAU/WAU shape: vectorized epoch truncation inside
    map_batches assigns windows, then the exact count-distinct
    combine (`relational.grouped_count_distinct`: per-block pair
    dedup shrinks the stream BEFORE the one composite-key exchange).
    Distinct from `window_counts` (event counts) and `distinct_users`
    (global): both dimensions at once."""
    from frontera_ray.stages.relational import grouped_count_distinct

    ev = (_read(sf_dir, "events")
          .select_columns(["ts", "user_id"])
          .map_batches(lambda b: pa.table({
              "window_start": pa.array(
                  (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                   .to_numpy() // 3_600_000_000) * 3600, pa.int64()),
              "user_id": b["user_id"],
          }), batch_format="pyarrow"))
    out = grouped_count_distinct(
        ev, "window_start", "user_id",
        combine=_choose_exchange("tasks", "shuffle"))
    return out.sort_values("window_start").reset_index(drop=True)


def q_urgent_low_union(sf_dir: str):
    """Distributed UNION DISTINCT (relational.set_op): customers with
    an urgent OR a low-priority order, each key once — completing the
    set-op family (INTERSECT / EXCEPT / UNION, DISTINCT and ALL bags)
    over the same keys-only tagged exchange."""
    from frontera_ray.stages.relational import cluster_cpus, set_op

    out = set_op(_priority_custkeys(sf_dir, "1-URGENT"),
                 _priority_custkeys(sf_dir, "5-LOW"),
                 "o_custkey", op="union",
                 exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_urgent_only_except(sf_dir: str):
    """Distributed EXCEPT (relational.set_op): customers with an urgent
    order but NO low-priority order."""
    from frontera_ray.stages.relational import cluster_cpus, set_op

    out = set_op(_priority_custkeys(sf_dir, "1-URGENT"),
                 _priority_custkeys(sf_dir, "5-LOW"),
                 "o_custkey", op="except",
                 exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_order_ntile(sf_dir: str):
    """NTILE(4) price-quartile bucket of every order within its
    priority class (relational.per_key_ntile): SQL remainder rule,
    deterministic ROW_NUMBER tie-break, one keyed exchange."""
    from frontera_ray.stages.relational import cluster_cpus, per_key_ntile

    orders = (_read(sf_dir, "orders")
              .select_columns(["o_orderkey", "o_orderpriority",
                               "o_totalprice"])
              .map_batches(lambda b: pa.table({
                  "o_orderkey": b["o_orderkey"],
                  "o_orderpriority": b["o_orderpriority"],
                  "price_cents": pa.array(
                      np.round(b["o_totalprice"].to_numpy() * 100)
                      .astype(np.int64), pa.int64()),
              }), batch_format="pyarrow"))
    out = per_key_ntile(orders, "o_orderpriority", "price_cents", 4,
                        tiebreak="o_orderkey",
                        exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_urgent_low_intersect_all(sf_dir: str):
    """INTERSECT ALL (bag semantics): each customer key emitted
    min(urgent_count, low_count) times — same keys-only tagged
    exchange as the DISTINCT variant, multiplicities from two local
    bincounts + one np.repeat."""
    from frontera_ray.stages.relational import cluster_cpus, set_op

    out = set_op(_priority_custkeys(sf_dir, "1-URGENT"),
                 _priority_custkeys(sf_dir, "5-LOW"),
                 "o_custkey", op="intersect_all",
                 exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_urgent_only_except_all(sf_dir: str):
    """EXCEPT ALL (bag semantics): each customer key emitted
    max(urgent_count - low_count, 0) times."""
    from frontera_ray.stages.relational import cluster_cpus, set_op

    out = set_op(_priority_custkeys(sf_dir, "1-URGENT"),
                 _priority_custkeys(sf_dir, "5-LOW"),
                 "o_custkey", op="except_all",
                 exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_locf_fill(sf_dir: str):
    """LOCF / forward-fill imputation (relational.per_key_locf):
    sensor-style carry-forward — each event gets the user's latest
    'purchase' value (cents) at or before it, -1 before the first
    observation; SQL's last_value(v IGNORE NULLS) window. One keyed
    exchange + a run-rebased maximum.accumulate — no per-row Python."""
    from frontera_ray.stages.relational import per_key_locf

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["value"].to_numpy() * 100).astype(np.int64)
        is_obs = pc.equal(batch["event_type"], "purchase")
        v = pa.array(cents, pa.int64(),
                     mask=~is_obs.to_numpy(zero_copy_only=False))
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "v": v})

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow")
    out = per_key_locf(ev, "user_id", "ts_us", "v",
                       out_col="filled_cents", tiebreak="event_id",
                       sentinel=-1).to_pandas()
    out = out[["user_id", "event_id", "filled_cents"]]
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_gap_fill(sf_dir: str):
    """Dense hourly resample (relational.gap_fill_counts): per-user
    event counts for EVERY hour between the user's first and last
    event, zeros included — the gap-filling step before rolling
    features. Per-block (user, hour) partials bound the exchange; the
    dense grid is one global arange scatter, never a generated-series
    join."""
    from frontera_ray.stages.relational import gap_fill_counts

    out = gap_fill_counts(
        _read(sf_dir, "events").select_columns(["user_id", "ts"]),
        "user_id", "ts", window_s=21600).to_pandas()
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention triangle
    (relational.retention_cohorts): cohort = each user's first-event
    week; n_active users per (cohort, weeks_since) cell. Per-block
    (user, week) pre-dedup bounds the exchange; the kernel emits each
    user's distinct cells; a combiner counts the tiny matrix."""
    from frontera_ray.stages.relational import retention_cohorts

    return retention_cohorts(
        _read(sf_dir, "events").select_columns(["user_id", "ts"]),
        "user_id", "ts", period_s=7 * 86400)


def q_running_distinct(sf_dir: str):
    """Per-user running COUNT(DISTINCT event_type)
    (relational.per_key_running_distinct): the novelty / exploration
    curve at each event. Two lexsorts inside one keyed exchange —
    first-occurrence flags scattered back to time order, run-rebased
    cumsum."""
    from frontera_ray.stages.relational import per_key_running_distinct

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_type": batch["event_type"]})

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    out = per_key_running_distinct(ev, "user_id", "ts_us", "event_type",
                                   tiebreak="event_id").to_pandas()
    out = out[["user_id", "event_id", "n_distinct"]]
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_interval_merge(sf_dir: str):
    """Merge overlapping intervals per user (relational.interval_merge):
    each event opens an interval of value-proportional length; the
    union coverage (merged count + covered microseconds) is the
    session-stitching / availability reduction. One keyed exchange, a
    segment-cummax + reduceat kernel, no per-row Python."""
    from frontera_ray.stages.relational import interval_merge

    def prep(batch: pa.Table) -> pa.Table:
        lo = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dur = np.round(batch["value"].to_numpy() * 100).astype(np.int64) \
            * 10_000_000
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(lo + dur, pa.int64())})

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    out = interval_merge(ev, "user_id", "lo", "hi",
                         tiebreak="event_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_twap(sf_dir: str):
    """Time-weighted average components per user
    (relational.per_key_time_weighted): each event's value (cents)
    weighted by how long it held until the next event (ms gaps) — the
    TWAP / state-duration aggregate behind pricing and dwell-time
    features. Integer-exact (n_gaps, wsum, dur) so the oracle hashes
    bit-for-bit; the mean is wsum/dur downstream."""
    from frontera_ray.stages.relational import per_key_time_weighted

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "cents": pa.array(np.round(batch["value"].to_numpy() * 100)
                              .astype(np.int64), pa.int64())})

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    out = per_key_time_weighted(ev, "user_id", "ts_us", "cents",
                                tiebreak="event_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_vocab_drift(sf_dir: str):
    """Top-20 vocabulary comparison between the two doc-id-parity
    halves (side, rank, token, cnt rows) — the rank-stability /
    vocabulary-drift check between corpus snapshots: a large symmetric
    difference of the head vocabularies flags a content shift. Two
    explode + native-count passes, per-block partial top-k, tiny
    driver merges; deterministic (count desc, token asc) ranking."""
    import pandas as pd
    from frontera_ray.stages.text import term_freq_table

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = []
    for side in (0, 1):
        cnt = pa.concat_tables(list(
            docs.map_batches(
                lambda b, s=side: b.filter(
                    pa.array(b["doc_id"].to_numpy() % 2 == s)),
                batch_format="pyarrow")
            .map_batches(term_freq_table, batch_format="pyarrow")
            .groupby("token").sum("tf")
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        toks = cnt["token"].to_numpy(zero_copy_only=False)
        ns = cnt["sum(tf)"].to_numpy().astype(np.int64)
        order = np.lexsort((toks, -ns))[:20]
        for r, i in enumerate(order, 1):
            out.append((side, r, str(toks[i]), int(ns[i])))
    return pd.DataFrame(out, columns=["side", "rank", "token", "cnt"])


def q_chi_square(sf_dir: str):
    """Chi-square independence cells: event_type x day-of-week
    contingency table with each cell's (observed, chi2 contribution in
    micro units) — is behavior independent of weekday (the
    seasonality / drift sanity check). One combiner aggregate (cells
    move, rows don't); per-cell expected counts and contributions are
    the identical double expressions as the SQL twin, rounded per
    cell so the output is order-free."""
    import pandas as pd
    from frontera_ray.stages.relational import partial_groupby_agg

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = (ts // 86_400_000_000 + 4) % 7  # 1970-01-01 was a Thursday
        return pa.table({"event_type": batch["event_type"],
                         "dow": pa.array(dow, pa.int64())})

    cells = partial_groupby_agg(
        _read(sf_dir, "events").select_columns(["event_type", "ts"])
        .map_batches(prep, batch_format="pyarrow"),
        ["event_type", "dow"], {"n": ("dow", "count")})
    df = cells.reset_index(drop=True)
    total = float(df["n"].sum())
    row_tot = df.groupby("event_type")["n"].transform("sum").astype(float)
    col_tot = df.groupby("dow")["n"].transform("sum").astype(float)
    exp = row_tot * col_tot / total
    chi = (df["n"].astype(float) - exp) ** 2 / exp
    out = pd.DataFrame({
        "event_type": df["event_type"], "dow": df["dow"],
        "n": df["n"].astype(np.int64),
        "chi2_micro": np.round(chi.to_numpy() * 1e6).astype(np.int64)})
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


def q_hll_intersect(sf_dir: str):
    """Audience-overlap estimate (sketches.hll_intersect): distinct
    clicking vs purchasing users and their intersection via HLL
    inclusion-exclusion — the union sketch is a free register-wise
    max. One streaming pass, per-(block, side) register partials;
    exact intersection companion from the bounded distinct-user sets."""
    import pandas as pd
    from frontera_ray.stages.sketches import hll_intersect

    ev = _read(sf_dir, "events").select_columns(["user_id", "event_type"])
    ea, eb, ei = hll_intersect(ev, "user_id", "event_type",
                               left="click", right="purchase")

    def side_users(which):
        t = pa.concat_tables(list(
            ev.map_batches(
                lambda b, w=which: b.filter(pc.equal(b["event_type"], w))
                .select(["user_id"]), batch_format="pyarrow")
            .groupby("user_id").count()
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        return t["user_id"].to_numpy()

    exact = int(np.intersect1d(side_users("click"),
                               side_users("purchase")).size)
    return pd.DataFrame({"est_click": [ea], "est_purchase": [eb],
                         "est_inter": [ei], "exact_inter": [exact]})


def q_host_entropy(sf_dir: str):
    """Shannon entropy of the crawl's host mix (grouped_entropy with a
    constant group over the canonical hosts) — the crawl-diversity /
    single-host-capture observability signal: entropy near ln(1) says
    the frontier collapsed onto one host."""
    from frontera_ray.stages.relational import grouped_entropy

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        hosts = np.array([f"host-{d % 20}.test" for d in ids], object)
        return pa.table({"g": pa.array(np.zeros(len(ids), np.int64),
                                       pa.int64()),
                         "host": pa.array(hosts, pa.string())})

    ds = _read(sf_dir, "documents").select_columns(["doc_id"]).map_batches(
        prep, batch_format="pyarrow")
    out = (grouped_entropy(ds, "g", "host").to_pandas()
           .sort_values("g").reset_index(drop=True))
    return out[["entropy_micro", "n_events"]]


def q_count_gini(sf_dir: str):
    """Gini coefficient of per-supplier lineitem counts — the skew /
    inequality observability statistic behind the north rule's hot-key
    mitigation (a Gini near 1 says salt before you shuffle). One
    native groupby count; the key-cardinality count vector is
    collected (bounded), sorted once, and the exact integer rank-sum
    formula finalizes with a single op-matched float division."""
    import pandas as pd

    cnt = pa.concat_tables(list(
        _read(sf_dir, "lineitem").select_columns(["l_suppkey"])
        .groupby("l_suppkey").count()
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    c = np.sort(cnt["count()"].to_numpy().astype(np.int64))
    n, s = len(c), int(c.sum())
    ic = int((np.arange(1, n + 1, dtype=np.int64) * c).sum())
    gini = (2.0 * ic - (n + 1) * s) / (n * s) * 1e6
    return pd.DataFrame({"n_keys": [n], "total": [s],
                         "gini_ppm": [int(round(gini))]})


def q_session_durations(sf_dir: str):
    """Session-duration distribution — a three-stage composition:
    gap sessionization into per-session spans
    (relational.session_spans, one keyed exchange), then the
    shuffle-free histogram-bisection quantiles over the session
    durations. Output: one row (n_sessions, p50_us, p90_us)."""
    import pandas as pd
    from frontera_ray.stages.relational import (quantile_unbounded,
                                                session_spans)

    spans = session_spans(
        _read(sf_dir, "events").select_columns(["user_id", "ts"]),
        "user_id", "ts", gap_us=86400 * 1_000_000).materialize()
    n = spans.count()
    qs = quantile_unbounded(spans, "dur_us", [0.5, 0.9])
    return pd.DataFrame({"n_sessions": [n],
                         "p50_us": [int(qs[0.5])],
                         "p90_us": [int(qs[0.9])]})


def q_winsorize(sf_dir: str):
    """Winsorization: clamp order prices to the exact [p01, p99] range
    (histogram-bisection quantiles, no sort shuffle; one streaming
    clamp pass) — the outlier-taming transform before moment-based
    features. Oracle = quantile_disc cutpoints + least/greatest."""
    from frontera_ray.stages.relational import quantile_unbounded

    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_totalprice"])
    cuts = quantile_unbounded(orders, "o_totalprice", [0.01, 0.99])
    lo, hi = float(cuts[0.01]), float(cuts[0.99])

    def clamp(batch: pa.Table) -> pa.Table:
        v = np.clip(batch["o_totalprice"].to_numpy(), lo, hi)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "clamped_cents": pa.array(np.round(v * 100).astype(np.int64),
                                      pa.int64())})

    out = orders.map_batches(clamp, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_decile_bins(sf_dir: str):
    """Quantile-bucket feature discretization: exact decile cutpoints
    from the histogram-bisection quantile pass (no sort shuffle), then
    ONE streaming searchsorted pass bins every order and a combiner
    aggregate profiles each bin — the feature-binning / calibration
    shape. Oracle = quantile_disc cutpoints + a sum-of-comparisons
    bin expression."""
    from frontera_ray.stages.relational import (partial_groupby_agg,
                                                quantile_unbounded)

    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    orders = _read(sf_dir, "orders").select_columns(["o_totalprice"])
    cuts_map = quantile_unbounded(orders, "o_totalprice", qs)
    cuts = np.array([cuts_map[q] for q in qs], np.float64)

    def binify(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy()
        return pa.table({
            "bin": pa.array(np.searchsorted(cuts, v, side="right")
                            .astype(np.int64), pa.int64()),
            "cents": pa.array(np.round(v * 100).astype(np.int64),
                              pa.int64())})

    out = partial_groupby_agg(
        orders.map_batches(binify, batch_format="pyarrow"), ["bin"],
        {"n": ("cents", "count"), "lo_cents": ("cents", "min"),
         "hi_cents": ("cents", "max")})
    return out.sort_values("bin").reset_index(drop=True)


def q_windowed_dedup(sf_dir: str):
    """Time-windowed duplicate suppression (relational.windowed_dedup):
    drop an event when the same (user, event_type) fired within the
    previous 10 minutes — the at-least-once-ingest / retry dedup where
    a key becomes legitimate again after the TTL. The nearest earlier
    row is the sorted predecessor, so the keep rule is one run-aware
    diff; oracle = NOT EXISTS an earlier same-key row within the
    window."""
    from frontera_ray.stages.relational import windowed_dedup

    def prep(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch["user_id"], pa.string()),
            batch["event_type"], "|")
        return pa.table({
            "key": key,
            "event_id": batch["event_id"],
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())})

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow")
    out = windowed_dedup(ev, "key", "ts_us", window_us=600 * 1_000_000,
                         tiebreak="event_id").to_pandas()
    out = out[["event_id"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_order_gaps(sf_dir: str):
    """LAG window delta (relational.per_key_lag_delta): microseconds
    between each customer's consecutive orders (NULL for the first) —
    the inter-arrival-time feature shape. One keyed exchange, one
    lexsort, run-aware np.diff."""
    from frontera_ray.stages.relational import (cluster_cpus,
                                                per_key_lag_delta)

    orders = (_read(sf_dir, "orders")
              .select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(lambda b: pa.table({
                  "o_orderkey": b["o_orderkey"],
                  "o_custkey": b["o_custkey"],
                  "ts_us": b["o_orderdate"].cast(pa.int64()),
              }), batch_format="pyarrow"))
    out = per_key_lag_delta(orders, "o_custkey", "ts_us",
                            out_col="gap_us", tiebreak="o_orderkey",
                            exchange=_choose_exchange("tasks")).to_pandas()
    out = out[["o_orderkey", "o_custkey", "gap_us"]]
    # each key's first order has no predecessor — drop it so gap_us is
    # NULL-free (keeps the int64 dtype end-to-end)
    out = out[out["gap_us"].notna()]
    out["gap_us"] = out["gap_us"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_event_transitions(sf_dir: str):
    """Markov transition matrix (relational.transition_counts): global
    counts of consecutive per-user (prev event_type -> event_type)
    pairs — the session-behavior-model shape. One keyed exchange; the
    kernel pre-aggregates (from, to, n) partials so only a tiny pair
    vocabulary reaches the driver."""
    from frontera_ray.stages.relational import transition_counts

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_type", "event_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_type": b["event_type"],
              "event_id": b["event_id"],
          }), batch_format="pyarrow"))
    # 'groups' measured: ~1.5k user keys ride the sort exchange in
    # ~0.3 s (sessionize, same key column) vs the ~2 s hash-aggregator
    # fixed cost — hash only wins at 10k+ keys (active_customers)
    out = transition_counts(ev, "user_id", "ts_us", "event_type",
                            tiebreak="event_id")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_val", "to_val"]).reset_index(drop=True)


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(region, nation): all four grouping sets derived
    from the same 25-row finest aggregate as rollup_revenue
    (relational.cube_from_finest) — the full cross-tab report without
    re-scanning base rows per set."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import (broadcast_join,
                                                cube_from_finest,
                                                partial_groupby_agg)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    nr = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    dim = pa.table({"c_nationkey": pa.array(nr["n_nationkey"], pa.int64()),
                    "n_name": pa.array(nr["n_name"], pa.string()),
                    "r_name": pa.array(nr["r_name"], pa.string())})

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"c_custkey": batch["o_custkey"],
                         "cents": pa.array(cents, pa.int64())})

    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow")
    j1 = broadcast_join(orders, cust, key="c_custkey")
    j2 = broadcast_join(j1, dim, key="c_nationkey")
    fin = partial_groupby_agg(j2, ["r_name", "n_name"],
                              {"n_orders": ("cents", "count"),
                               "revenue_cents": ("cents", "sum")})
    out = cube_from_finest(fin, ["r_name", "n_name"],
                           ["n_orders", "revenue_cents"])
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def q_group_skew(sf_dir: str):
    """Per-group skewness / excess kurtosis of order quantities from
    EXACT integer power sums (relational.grouped_higher_moments): the
    distribution-shape profile of a dataset card, no shuffle — only
    (n, Σx..Σx⁴) registers leave the blocks; the one float step is
    op-matched to the SQL twin so the micro outputs hash exactly."""
    from frontera_ray.stages.relational import grouped_higher_moments

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "q": pa.array(batch["l_quantity"].to_numpy()
                          .astype(np.int64), pa.int64()),
        })

    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_quantity"]).map_batches(
        prep, batch_format="pyarrow")
    out = grouped_higher_moments(ds, "l_returnflag", "q")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((region, nation), (nation), ()): the
    general form of rollup/cube — including the (nation)-only set a
    ROLLUP prefix chain cannot produce — derived from the same 25-row
    finest aggregate (relational.grouping_sets_from_finest); base rows
    are scanned once."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import (broadcast_join,
                                                grouping_sets_from_finest,
                                                partial_groupby_agg)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    nr = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    dim = pa.table({"c_nationkey": pa.array(nr["n_nationkey"], pa.int64()),
                    "n_name": pa.array(nr["n_name"], pa.string()),
                    "r_name": pa.array(nr["r_name"], pa.string())})

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"c_custkey": batch["o_custkey"],
                         "cents": pa.array(cents, pa.int64())})

    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow")
    j1 = broadcast_join(orders, cust, key="c_custkey")
    j2 = broadcast_join(j1, dim, key="c_nationkey")
    fin = partial_groupby_agg(j2, ["r_name", "n_name"],
                              {"n_orders": ("cents", "count"),
                               "revenue_cents": ("cents", "sum")})
    out = grouping_sets_from_finest(
        fin, ["r_name", "n_name"],
        [("r_name", "n_name"), ("n_name",), ()],
        ["n_orders", "revenue_cents"])
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def q_hash_sample(sf_dir: str):
    """Deterministic uniform exact-k sample: the 100 documents with
    the smallest md5-hash priority (sampling.hash_u32) — 'ORDER BY
    md5(id) LIMIT k' without a global sort: per-block partial top-k,
    tiny driver merge. Reproducible across re-runs / retries / future
    incremental batches (pure function of the id)."""
    from frontera_ray.stages.relational import global_topk
    from frontera_ray.stages.sampling import hash_u32

    def add_h(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch["doc_id"].to_pylist()).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "h": pa.array(h, pa.int64())})

    docs = (_read(sf_dir, "documents").select_columns(["doc_id"])
            .map_batches(add_h, batch_format="pyarrow"))
    out = global_topk(docs, "h", 100, descending=False,
                      tiebreak="doc_id").to_pandas()
    return out.sort_values(["h", "doc_id"]).reset_index(drop=True)


def q_group_mad(sf_dir: str):
    """Per-group median absolute deviation of quantity
    (relational.grouped_mad): robust dispersion per returnflag,
    integer-exact PERCENTILE_DISC at both levels — two histogram
    combines (histograms move, rows don't), medians broadcast into
    the second pass. The skew-proof outlier-gate statistic."""
    from frontera_ray.stages.relational import grouped_mad

    out = grouped_mad(
        _read(sf_dir, "lineitem").select_columns(
            ["l_returnflag", "l_quantity"]),
        "l_returnflag", "l_quantity", scale=1)
    return out.reset_index(drop=True)


def q_weighted_sample(sf_dir: str):
    """Quality-proportional deterministic downsample
    (sampling.weighted_hash_sample): each document survives with
    probability min(n_chars, 1000)/1000 — longer/higher-signal docs
    kept, thin docs thinned — via the integer comparison
    hash_u32(doc_id)·1000 < min(n_chars,1000)·2³², so the exact
    sample is a pure function of the id and SQL-reproducible."""
    from frontera_ray.stages.sampling import weighted_hash_sample

    out = weighted_hash_sample(
        _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"]),
        id_col="doc_id", weight_col="n_chars",
        weight_cap=1000).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_normalize_text(sf_dir: str):
    """Text normalization stage (lowercase, collapse every non-[a-z0-9]
    run to one space, trim) — the canonical-form step ahead of exact
    dedup / shingling, fully vectorized in Arrow RE2 kernels."""
    import pyarrow.compute as _pc

    def norm(batch: pa.Table) -> pa.Table:
        x = _pc.utf8_lower(batch["text"])
        x = _pc.replace_substring_regex(x, pattern="[^a-z0-9]+",
                                        replacement=" ")
        x = _pc.utf8_trim(x, characters=" ")
        return pa.table({"doc_id": batch["doc_id"], "norm_text": x,
                         "n_norm_chars": _pc.utf8_length(x)
                         .cast(pa.int64())})

    out = (_read(sf_dir, "documents")
           .select_columns(["doc_id", "text"])
           .map_batches(norm, batch_format="pyarrow")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_first_last_order(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE window collapsed per key
    (relational.per_key_first_last): every customer's first and most
    recent order price in cents — the lifecycle-feature shape, one
    keyed exchange. ~10k customer keys: hash exchange (see
    active_customers measurement)."""
    from frontera_ray.stages.relational import (cluster_cpus,
                                                per_key_first_last)

    orders = (_read(sf_dir, "orders")
              .select_columns(["o_orderkey", "o_custkey", "o_orderdate",
                               "o_totalprice"])
              .map_batches(lambda b: pa.table({
                  "o_custkey": b["o_custkey"],
                  "ts_us": b["o_orderdate"].cast(pa.int64()),
                  "o_orderkey": b["o_orderkey"],
                  "cents": pa.array(
                      np.round(b["o_totalprice"].to_numpy() * 100)
                      .astype(np.int64), pa.int64()),
              }), batch_format="pyarrow"))
    out = per_key_first_last(orders, "o_custkey", "ts_us", "cents",
                             tiebreak="o_orderkey",
                             exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_dense_rank(sf_dir: str):
    """DENSE_RANK window (relational.per_key_dense_rank): each event's
    dense price rank within its event_type — ties share a rank, ranks
    stay consecutive (the leaderboard / price-tier feature). One keyed
    exchange + one lexsort; ~5 type keys so the sort exchange wins
    (hash aggregator fixed cost dominates at this cardinality, same
    measurement as minmax_norm)."""
    from frontera_ray.stages.relational import per_key_dense_rank

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "event_type", "value"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "event_type": b["event_type"],
              "cents": pa.array(
                  np.round(b["value"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    out = per_key_dense_rank(ev, "event_type", "cents").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_group_stats(sf_dir: str):
    """Per-group second moments, integer-exact
    (relational.grouped_moments): VAR_SAMP and COVAR numerators of
    (quantity, discount%) per returnflag from combiner partials — the
    feature-statistics / drift-monitoring aggregate. No shuffle: int64
    partial sums per block, 3-row driver merge, exact big-int
    finalization (nothing rounds, so the ppm variance oracle-matches
    HUGEINT SQL arithmetic bit for bit)."""
    from frontera_ray.stages.relational import grouped_moments

    li = (_read(sf_dir, "lineitem")
          .select_columns(["l_returnflag", "l_quantity", "l_discount"])
          .map_batches(lambda b: pa.table({
              "l_returnflag": b["l_returnflag"],
              "qty": pa.array(
                  np.round(b["l_quantity"].to_numpy())
                  .astype(np.int64), pa.int64()),
              "disc_pct": pa.array(
                  np.round(b["l_discount"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    out = grouped_moments(li, "l_returnflag", "qty", "disc_pct")
    return out.sort_values("l_returnflag").reset_index(drop=True)


_COPURCHASE_CACHE: dict = {}


def _supplier_copurchase_edges(sf_dir: str):
    """Shared edge stream for `triangles` and `clustering`: suppliers
    co-occurring in an order, restricted to HIGH-QUANTITY lineitems
    (qty >= 48) so the graph stays sparse at small scale. Returns
    (edges_ds, n_nodes); one keyed exchange (sort path — measured
    1.7 s vs 2.2 s hash warm at 32 cpus on 13k filtered order keys;
    at cluster scale with 10^8+ orders the hash path wins).

    The ~10 graph queries over this table each paid the same scan +
    exchange (~2-3 s at sf0.1); the MATERIALIZED edge set is memoized
    per (sf_dir, Ray job) — the classic shared-scan / common-subplan
    reuse a real engine's view cache performs. The job-id key drops
    the memo when the Ray session changes (materialized blocks die
    with their session)."""
    import pyarrow.parquet as pq
    import ray

    from frontera_ray.stages.pagerank import cooccurrence_edges

    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    hit = _COPURCHASE_CACHE.get((sf_dir, job))
    if hit is not None:
        return hit

    n_nodes = int(pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey"])["s_suppkey"].to_numpy().max()) + 1
    li = (_read(sf_dir, "lineitem")
          .select_columns(["l_orderkey", "l_suppkey", "l_quantity"])
          .map_batches(lambda b: b.filter(
              pc.greater_equal(b["l_quantity"], 48.0)).select(
              ["l_orderkey", "l_suppkey"]), batch_format="pyarrow"))
    edges = cooccurrence_edges(li, "l_orderkey", "l_suppkey", n_nodes).materialize()
    _COPURCHASE_CACHE.clear()  # one entry: sessions invalidate cheaply
    _COPURCHASE_CACHE[(sf_dir, job)] = (edges, n_nodes)
    return edges, n_nodes


def q_clustering(sf_dir: str):
    """Per-node local clustering coefficient of the same sparse
    supplier co-purchase graph as `triangles`
    (pagerank.node_clustering): deg, incident-triangle count and
    lcc_ppm = ⌊2·tri·10⁶/(deg·(deg−1))⌋ per supplier, integer-exact —
    the per-entity community-density feature (e.g. spam-farm /
    link-ring detection on a host graph). One keyed exchange for
    pair generation, then node-range fan-out against the broadcast
    bitset; no second shuffle."""
    from frontera_ray.stages.pagerank import node_clustering

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    out = node_clustering(edges, n_nodes).to_pandas()
    return out.reset_index(drop=True)


def q_jaccard_join(sf_dir: str):
    """EXACT full-corpus word-5-gram Jaccard similarity join at
    tau = 1/2 via rarity-ordered prefix filtering
    (dedup.jaccard_join_pairs) — the exact-set-similarity SCALE path
    (slim prefix rows through ONE all-to-all; candidates are
    output-scale by construction), where ngram_jaccard's bounded
    brute-force slice routes for unbounded corpora. Integer-exact
    inter/union so the whole join oracle-checks in SQL."""
    from frontera_ray.stages.dedup import jaccard_join_pairs

    return jaccard_join_pairs(_read(sf_dir, "documents"),
                              t_num=1, t_den=2, shingle_k=5)


def q_edit_join(sf_dir: str):
    """Levenshtein-distance <= 1 fuzzy self-join on each document's
    24-char text prefix (dedup.edit_distance_join_le1): SymSpell-style
    deletion-neighborhood candidate generation (public algorithm) —
    slim variant-hash rows through ONE keyed exchange, early-out exact
    verify over candidate ids only. The typo'd-key / near-identical-
    title matching primitive; oracled against DuckDB levenshtein."""
    from frontera_ray.stages.dedup import edit_distance_join_le1

    docs = (_read(sf_dir, "documents")
            .select_columns(["doc_id", "text"])
            .map_batches(lambda b: pa.table({
                "doc_id": b["doc_id"],
                "s": pc.utf8_slice_codeunits(b["text"], 0, 24),
            }), batch_format="pyarrow"))
    return edit_distance_join_le1(docs, id_col="doc_id", string_col="s")


def q_triangles(sf_dir: str):
    """Exact triangle count of the supplier co-purchase graph (edge =
    two suppliers sharing an order): co-occurrence pair generation is
    one keyed exchange on the order (pagerank.cooccurrence_edges) —
    the ONLY exchange; multi-edges feed the idempotent bit-OR
    adjacency directly and forward counting fans out over node ranges
    against the broadcast bitset (pagerank.triangle_count) — the
    graph-clustering / community signal, bounded by the supplier
    universe, never all-pairs. Edges come from HIGH-QUANTITY lineitems
    (qty ≥ 48) so the graph is sparse rather than degenerate-complete
    at small scale."""
    import pandas as pd

    from frontera_ray.stages.pagerank import triangle_count

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    res = triangle_count(edges, n_nodes)
    return pd.DataFrame([{"n_edges": res["n_edges"],
                          "n_triangles": res["n_triangles"]}]).astype(
        "int64")


def q_graph_bfs(sf_dir: str):
    """Bounded-depth multi-source BFS levels (pagerank.bfs_levels) over
    the same sparse supplier co-purchase graph as `triangles`: seeds =
    suppliers with suppkey % 5 == 1, max depth 4 — the batch
    reachability / crawl-depth primitive (frontera's BFS strategy
    assigns exactly this hop count). Per level: one streaming edge
    pass against the broadcast packed frontier bitset, packed-register
    combine on the driver; NO shuffle. Oracled against a DuckDB
    recursive CTE (min level per reached node)."""
    from frontera_ray.stages.pagerank import bfs_levels

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    seeds = np.arange(1, n_nodes, 5, dtype=np.int64)  # suppkey % 5 == 1
    out = bfs_levels(edges, n_nodes, seeds, max_depth=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_graph_bfs_join(sf_dir: str):
    """JOIN-PATH BFS levels (pagerank.bfs_levels_join) over the same
    graph and seed set as graph_bfs: the min-PLUS twin of
    label_prop_join (seeds at 0, +1 per hop, both edge directions via
    the forward all-to-all + reverse gather on the static routes) — no
    dense level register, no frontier bitset broadcast. Exact integer
    parity with the dense path; same recursive-CTE oracle."""
    from frontera_ray.stages.pagerank import bfs_levels_join

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    seeds = np.arange(1, n_nodes, 5, dtype=np.int64)
    out = bfs_levels_join(edges, seeds, max_depth=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_copurchase(sf_dir: str):
    """Frequent item-pair mining with support + lift
    (itemsets.pair_lift): parts co-ordered in >= 2 orders, the
    A-priori / co-purchase primitive. Basket-local vectorized pair
    generation behind one keyed exchange on the order, then one
    combined-count exchange over a single multiplexed key stream
    (pairs / item presence / basket markers); pair output is
    candidate-scale, item counts bounded by the part universe
    (broadcast, like the pagerank node vector). Integer-exact
    support_ppm / lift_ppm so the full operator oracle-checks."""
    import pyarrow.parquet as pq

    from frontera_ray.stages.itemsets import pair_lift

    n_items = int(pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"])["p_partkey"].to_numpy().max()) + 1
    from frontera_ray.stages.relational import cluster_cpus

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_partkey"])
    # two keyed exchanges (basket, then pair key): the pair-key space
    # is ~1M at sf0.1, where per-key map_groups pays 76 s vs 2.9 s on
    # the hash path (measured, 32 cpus); small sessions keep the sort
    return pair_lift(li, "l_orderkey", "l_partkey", n_items,
                     min_pair=2,
                     exchange=_choose_exchange("tasks"))


def q_compaction_plan(sf_dir: str):
    """Target-size output-file compaction plan
    (relational.compaction_plan): pack documents (in doc_id order) into
    ~10 KB files by cumulative size — the lakehouse small-file
    coalescing planner, built on a DISTRIBUTED PREFIX SUM (one sort
    exchange, per-block offset broadcast, per-file partial combine;
    the driver sees O(blocks + files) rows, never documents)."""
    from frontera_ray.stages.relational import compaction_plan

    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "n_chars"])
    return compaction_plan(docs, "doc_id", "n_chars", target=10_000) \
        .to_pandas()


def q_zorder_cells(sf_dir: str):
    """Z-order (Morton) layout zone map (relational.zorder_cells):
    interleave (user_id, cents) into 32-bit z-values and report each
    4096-cell bucket's count + per-dimension min/max — the
    multi-dimensional clustering/data-skipping layout primitive.
    Pure bit math in map_batches + a bounded register combine; NO
    shuffle. Oracled against an unrolled 32-term bit expression."""
    from frontera_ray.stages.relational import zorder_cells

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "value"])
          .map_batches(lambda b: pa.table({
              "x": b["user_id"],
              "y": pa.array(np.round(b["value"].to_numpy() * 100)
                            .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    return zorder_cells(ev, "x", "y", cell_shift=20).to_pandas()


def q_crawl_budget(sf_dir: str):
    """Per-host crawl-budget allocation by the largest-remainder
    (Hamilton) method (relational.largest_remainder_alloc): split a
    10,000-page budget across hosts proportionally to their content
    mass (sum of n_chars), integer-exact with Σalloc == budget — the
    batch twin of the frontier's per-domain caps. Host weights via
    grouped_int_sum (combiner + ONE keyed exchange); the allocator
    itself is three register passes + a top-R remainder rank."""
    from frontera_ray.stages.relational import (grouped_int_sum,
                                                largest_remainder_alloc)

    docs = (_read(sf_dir, "documents")
            .select_columns(["doc_id", "n_chars"])
            .map_batches(lambda b: pa.table({
                "host": pa.array(b["doc_id"].to_numpy() % 20, pa.int64()),
                "w": pa.array(b["n_chars"].to_numpy()
                              .astype(np.int64), pa.int64()),
            }), batch_format="pyarrow"))
    weights = grouped_int_sum(docs, "host", "w")
    return largest_remainder_alloc(weights, "host", "w",
                                   budget=10_000).to_pandas()


def q_snapshot_diff(sf_dir: str):
    """Snapshot delta between two corpus versions
    (relational.snapshot_diff): v2 simulates a recrawl (docs %17
    dropped, %10 re-fetched with changed content, %13 newly
    discovered under shifted ids) and the diff emits DELTA-scale
    (key, status) rows — added / removed / changed — through ONE
    keyed exchange; unchanged keys never leave the kernel. The query
    reports per-status counts (register combine over the delta)."""
    from frontera_ray.fingerprint import md5_hex_batch
    from frontera_ray.stages.relational import snapshot_diff

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def v1(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "h": pa.array(md5_hex_batch(b["text"].to_pylist()),
                          pa.string())})

    def v2(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        t = b["text"].to_pylist()
        kept_ids = [int(i) for i in d if i % 17 != 0]
        kept_tx = [tx + "!" if i % 10 == 0 else tx
                   for i, tx in zip(d, t) if i % 17 != 0]
        add_ids = [int(i) + 1_000_000 for i in d if i % 13 == 0]
        add_tx = [f"new-{i}" for i in d if i % 13 == 0]
        return pa.table({
            "doc_id": pa.array(kept_ids + add_ids, pa.int64()),
            "h": pa.array(md5_hex_batch(kept_tx + add_tx), pa.string())})

    delta = snapshot_diff(
        docs.map_batches(v1, batch_format="pyarrow"),
        docs.map_batches(v2, batch_format="pyarrow"),
        "doc_id", "h")

    # tiny per-status register combine over the delta stream
    def status_counts(b: pa.Table) -> pa.Table:
        s, n = np.unique(np.asarray(b["status"].to_pylist(), object),
                         return_counts=True)
        return pa.table({"status": pa.array(s.tolist(), pa.string()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    from collections import Counter
    cnt: Counter = Counter()
    for t in delta.map_batches(status_counts, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for s, n in zip(t["status"].to_pylist(), t["n"].to_pylist()):
            cnt[s] += int(n)
    import pandas as pd
    return pd.DataFrame(
        [{"status": s, "n": int(cnt[s])} for s in sorted(cnt)],
        columns=["status", "n"])


def q_assign_ids(sf_dir: str):
    """Global dense row-id assignment (relational.global_row_ids — the
    zipWithIndex primitive): number documents 0..N-1 in the order of a
    60-bit md5-derived shuffle key (a deterministic random permutation,
    the order a training-shard writer wants). One sort exchange + an
    O(blocks) offset scan; row ids are assigned block-locally."""
    from frontera_ray.fingerprint import md5_hex_batch
    from frontera_ray.stages.relational import global_row_ids

    def skey(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        h = md5_hex_batch([str(int(i)) for i in ids])
        return pa.table({
            "doc_id": b["doc_id"],
            "skey": pa.array([int(x[:15], 16) for x in h], pa.int64())})

    docs = _read(sf_dir, "documents").select_columns(["doc_id"]) \
        .map_batches(skey, batch_format="pyarrow")
    out = global_row_ids(docs, "skey").to_pandas()
    return out[["doc_id", "row_id"]].sort_values("doc_id") \
        .reset_index(drop=True)


def q_label_prop(sf_dir: str):
    """Four synchronous rounds of min-label propagation — the
    hash-to-min connected-components recurrence — over the sparse
    supplier co-purchase graph (pagerank.min_label_prop): per round,
    one streaming edge pass against the broadcast label vector with a
    dense int64 min-register combine; NO shuffle. Oracled against 4
    unrolled CTE propagation steps in DuckDB."""
    from frontera_ray.stages.pagerank import min_label_prop

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    out = min_label_prop(edges, n_nodes, iters=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_label_prop_join(sf_dir: str):
    """JOIN-PATH min-label propagation (pagerank.min_label_prop_join)
    over the same co-purchase graph as label_prop: labels
    hash-partitioned by node, per round one forward (dst, min
    src-label) all-to-all plus the reverse label gather on the static
    routes — no dense register anywhere; exact integer parity with the
    dense path, so the same unrolled-CTE oracle covers both."""
    from frontera_ray.stages.pagerank import min_label_prop_join

    edges, _n_nodes = _supplier_copurchase_edges(sf_dir)
    out = min_label_prop_join(edges, iters=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_ktruss(sf_dir: str):
    """Fixed-round 4-truss peeling (pagerank.ktruss) over the
    co-purchase graph: 3 synchronous rounds dropping every edge in
    fewer than 2 triangles — the edge-cohesion link-farm/community
    core one level up from k-core. Bitset adjacency + chunked
    popcount supports; oracled against 3 unrolled support+filter CTE
    rounds with the final support recomputed over the survivors."""
    from frontera_ray.stages.pagerank import ktruss

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    out = ktruss(edges, n_nodes, k=4, rounds=3).to_pandas()
    return out.sort_values(["u", "v"]).reset_index(drop=True)


def q_sssp_hops(sf_dir: str):
    """Bounded-hop weighted shortest paths
    (pagerank.sssp_rounds_join): 3 synchronous Bellman-Ford rounds
    over the co-purchase graph with endpoint-derived integer weights
    (w = 1 + (u+v) % 9) from the suppkey%10==1 source set — dist(v)
    after round k is exactly min path weight over <= k hops, which the
    recursive twin computes with a hop-bounded path enumeration. The
    weighted generalization of graph_bfs (crawl click-distance with
    per-link costs); parallel edges collapse under the min."""
    from frontera_ray.stages.pagerank import sssp_rounds_join

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)

    def weigh(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy()
        d = b["dst"].to_numpy()
        return pa.table({
            "src": b["src"], "dst": b["dst"],
            "w": pa.array((1 + (s + d) % 9).astype(np.float64),
                          pa.float64())})

    wds = edges.map_batches(weigh, batch_format="pyarrow")
    sources = np.arange(1, n_nodes, 10, dtype=np.int64)
    out = sssp_rounds_join(wds, sources, "w", rounds=3).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_cc_converged(sf_dir: str):
    """Connected components to CONVERGENCE
    (pagerank.connected_components_join) over the supplier co-purchase
    graph: per round one edge-relax all-to-all + one pointer-jumping
    shortcut (label-of-label fetch routed by the same node hash), with
    distributed change-count termination — O(log diameter) rounds, no
    dense register, no fixed iteration guess. Every node's label is
    its component minimum, which the DuckDB twin computes as min
    reachable id via a recursive CTE."""
    from frontera_ray.stages.pagerank import connected_components_join

    edges, _n = _supplier_copurchase_edges(sf_dir)
    out = connected_components_join(edges).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_rate_limit(sf_dir: str):
    """Fixed-window per-key rate limiting: admit at most 3 events per
    (user, day window), earliest-first — the quota/throttling
    primitive (the batch twin of the frontier's per-host round caps,
    reference frontera's BC_MAX_REQUESTS_PER_HOST batch shaping).
    Composite (user, window) key packed into one int64, then the
    per_key_topk machinery ascending — ONE keyed exchange."""
    from frontera_ray.stages.relational import per_key_topk

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "user_id", "ts"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "user_id": b["user_id"],
              "win": pa.array(b["ts"].cast(pa.int64()).to_numpy()
                              // 86_400_000_000, pa.int64()),
              "ts_us": b["ts"].cast(pa.int64()),
              "ck": pa.array(
                  b["user_id"].to_numpy() * (1 << 32)
                  + b["ts"].cast(pa.int64()).to_numpy()
                  // 86_400_000_000,
                  pa.int64()),
          }), batch_format="pyarrow"))
    from frontera_ray.stages.relational import cluster_cpus

    # user x day composite keys: ~45k at sf0.1 — past the per-key
    # map_groups wall (15.5 s groups vs ~2 s hash, measured)
    kept = per_key_topk(ev, "ck", "ts_us", 3, descending=False,
                        tiebreak="event_id",
                        exchange=_choose_exchange("tasks"))
    out = kept.to_pandas()[["event_id", "user_id", "win"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_source_share(sf_dir: str):
    """RATIO_TO_REPORT window (relational.per_key_share): each
    document's ppm share of its source's total characters, integer
    exact — the per-stratum contribution feature (e.g. sampling-weight
    computation per corpus source)."""
    from frontera_ray.stages.relational import per_key_share

    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "source", "n_chars"])
    out = per_key_share(docs, "source", "n_chars").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_cume_dist(sf_dir: str):
    """CUME_DIST window with peer-group semantics
    (relational.per_key_cume_dist): each event's cumulative
    distribution point within its event_type, micro-scaled — the
    quantile-position feature without a global sort."""
    from frontera_ray.stages.relational import per_key_cume_dist

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "event_type", "value"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "event_type": b["event_type"],
              "cents": pa.array(
                  np.round(b["value"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    out = per_key_cume_dist(ev, "event_type", "cents").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_event_seq(sf_dir: str):
    """Per-user ordered behavior string (relational.concat_groups):
    comma-joined event_type sequence ordered by time — the session
    string a behavior model consumes; (user_id, ts) is unique in the
    corpus so the order is total."""
    from frontera_ray.stages.relational import concat_groups

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_type"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_type": b["event_type"],
          }), batch_format="pyarrow"))
    out = concat_groups(ev, "user_id", "ts_us", "event_type",
                        sep=",").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_moving_sum(sf_dir: str):
    """Windowed-frame aggregate (relational.per_key_moving_sum):
    4-row moving sum of each user's event values ordered by time —
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW, computed from two reads
    of a zero-padded cumsum after one keyed exchange."""
    from frontera_ray.stages.relational import per_key_moving_sum

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "user_id", "ts", "value"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "cents": pa.array(
                  np.round(b["value"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    # ~1.5k user keys: sort exchange (see event_transitions note)
    out = per_key_moving_sum(ev, "user_id", "ts_us", "cents", 4,
                             tiebreak="event_id").to_pandas()
    out = out[["event_id", "user_id", "cents", "win_sum"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_minmax_norm(sf_dir: str):
    """Per-key min-max feature scaling (relational.per_key_minmax_norm):
    each event's value normalized to ppm within its event_type —
    MIN/MAX OVER (PARTITION BY ...) without floats (integer cents in,
    integer ppm out). One keyed exchange."""
    from frontera_ray.stages.relational import per_key_minmax_norm

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "event_type", "value"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "event_type": b["event_type"],
              "cents": pa.array(
                  np.round(b["value"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    # 5 event_type keys: the sort exchange is 5 kernel calls — never
    # worth the ~2 s hash-aggregator fixed cost
    out = per_key_minmax_norm(ev, "event_type", "cents").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_chunk_docs(sf_dir: str):
    """Overlapping document chunking (text.chunk_table): the 1->N
    flat-map ahead of tokenize/pack — 256-char windows, stride 192,
    every char covered, vectorized counts/offsets, streaming (no
    shuffle)."""
    from frontera_ray.stages.text import chunk_table

    out = (_read(sf_dir, "documents")
           .select_columns(["doc_id", "text"])
           .map_batches(chunk_table, batch_format="pyarrow")).to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def q_span_dedup(sf_dir: str):
    """Corpus-level repeated-passage removal (RefinedWeb / C4 "remove
    duplicated lines across documents", over 10-token spans since this
    corpus has no newline structure): spans appearing in >1 distinct
    doc are removed from ALL docs, docs reassembled from surviving
    spans. One hash-shuffle span count, hot set broadcast (bounded by
    duplicated content), pass-2 rebuild streaming with one pc.is_in."""
    from frontera_ray.stages.text import span_dedup

    out = span_dedup(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        w=10, max_docs=1).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_skew_join_revenue(sf_dir: str):
    """Skew-aware hybrid join (relational.skew_join): lineitem JOIN
    orders where heavy-hitter order keys never enter the all-to-all —
    their order rows broadcast, line rows joined as a streaming map;
    cold keys ride the normal tagged keyed exchange. The hot/cold
    split is answer-invariant, so the same SQL oracle covers both
    paths. Post-join revenue rollup via the combiner aggregate."""
    from frontera_ray.stages.relational import (cluster_cpus,
                                                partial_groupby_agg,
                                                skew_join)

    lines = (_read(sf_dir, "lineitem")
             .select_columns(["l_orderkey", "l_extendedprice"])
             .map_batches(lambda b: pa.table({
                 "l_orderkey": b["l_orderkey"],
                 "cents": pa.array(
                     np.round(b["l_extendedprice"].to_numpy() * 100)
                     .astype(np.int64), pa.int64()),
             }), batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders")
              .select_columns(["o_orderkey", "o_orderpriority"])
              .map_batches(lambda b: pa.table({
                  "l_orderkey": b["o_orderkey"],
                  "o_orderpriority": b["o_orderpriority"],
              }), batch_format="pyarrow"))
    j = skew_join(lines, orders, "l_orderkey", ["cents"],
                  ["o_orderpriority"], hot_count=10,
                  exchange=_choose_exchange("tasks"))
    out = partial_groupby_agg(j, ["o_orderpriority"],
                              {"n_lines": ("cents", "count"),
                               "revenue_cents": ("cents", "sum")})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_hll_grouped(sf_dir: str):
    """Per-group HyperLogLog COUNT(DISTINCT): register partials per
    (block, event_type), driver max-merge per group (sketches
    .hll_count_distinct_grouped), next to the exact per-group answer.
    Same bit-reproducible integer register arithmetic as hll_distinct,
    with the group key carried through every stage."""
    from frontera_ray.stages.relational import grouped_count_distinct
    from frontera_ray.stages.sketches import hll_count_distinct_grouped

    # materialized only to share one read between the sketch and its
    # exact companion; the 100-TB path runs the sketch alone
    ev = _read(sf_dir, "events").select_columns(
        ["event_type", "user_id"]).materialize()
    est = hll_count_distinct_grouped(ev, "event_type", "user_id")
    ex = grouped_count_distinct(ev, "event_type", "user_id",
                                combine="driver")
    out = est.merge(ex, on="event_type")
    return out.sort_values("event_type").reset_index(drop=True)


def q_kmeans(sf_dir: str):
    """Fixed-iteration Lloyd k-means (k=8, 2 update rounds) over the
    embeddings table (ann.kmeans_fixed): deterministic smallest-vec_id
    seeds, broadcast centroid matrix per pass, streaming per-block
    partial sums, exact integer inertia. Oracle = the unrolled
    recurrence as chained CTEs with the same 1e-9 rounding."""
    from frontera_ray.stages.ann import kmeans_fixed

    return kmeans_fixed(_read(sf_dir, "embeddings"), k=8, iters=2)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic near-dup pairs (ann.semantic_dedup_pairs):
    deterministic k-means (k=8, 1 update round) buckets the embedding
    space, within-cluster slabbed cosine finds pairs >= 0.4 — all-pairs
    cost bounded by the cluster size, ONE cluster-keyed exchange ships
    each embedding once. Oracle = the kmeans CTE recurrence + a
    same-cluster self-join at the cosine threshold."""
    from frontera_ray.stages.ann import semantic_dedup_pairs

    return semantic_dedup_pairs(_read(sf_dir, "embeddings"), k=8, iters=1,
                                threshold=0.4)


def q_knn_join(sf_dir: str):
    """k=1 kNN self-join over banded-LSH candidates (ann.knn_join_lsh):
    every embedding's best cosine match among vectors sharing any band
    bucket — the contrastive-pair-mining shape. One bucket-keyed
    exchange + a slim per-vector winner reduce; oracle recomputes the
    sign-bit codes and picks the per-vector argmax over the banded
    candidate property."""
    from frontera_ray.stages.ann import knn_join_lsh

    return knn_join_lsh(_read(sf_dir, "embeddings"))


def q_knn_classify(sf_dir: str):
    """k-NN label prediction (k=5, majority vote, tie → smaller
    label) of the first 50 embeddings against the rest as train set —
    the end-to-end eval shape behind weak-labeling and
    nearest-neighbor audit passes: distributed per-block partial
    top-k against the broadcast query matrix (the brute_force_topk
    kernel over the train-filtered stream), neighbor labels fetched
    pair-scoped, the vote a tiny driver reduce. Deterministic ranking
    (round(sim,9) DESC, id ASC) op-matched to the SQL window."""
    import pandas as pd
    import ray
    from functools import partial as _p

    from frontera_ray.stages.ann import (_merge_topk, _query_rows,
                                         block_topk_batch)

    ds = _read(sf_dir, "embeddings")
    qids, qmat = _query_rows(
        ds.select_columns(["vec_id", "embedding"]), range(50))
    train = ds.select_columns(["vec_id", "embedding"]).map_batches(
        lambda b: b.filter(pc.greater_equal(b["vec_id"], 50)),
        batch_format="pyarrow")
    query_ref = ray.put((qids, qmat))
    partials = train.map_batches(
        _p(block_topk_batch, query_ref=query_ref, k=5),
        batch_format="pyarrow", batch_size=4096)
    merged = pa.concat_tables(list(
        partials.iter_batches(batch_format="pyarrow", batch_size=None)))
    top = _merge_topk(merged, 5).to_pandas()

    need = set(int(v) for v in top["vec_id"]) | set(int(q) for q in qids)
    need_ref = ray.put(need)

    def pick(batch: pa.Table) -> pa.Table:
        nd = ray.get(need_ref)
        ids = batch["vec_id"].to_numpy()
        m = np.fromiter((int(i) in nd for i in ids), bool, len(ids))
        return batch.filter(pa.array(m))

    lab = (ds.select_columns(["vec_id", "label"])
           .map_batches(pick, batch_format="pyarrow").to_pandas())
    lmap = dict(zip(lab["vec_id"].astype(int), lab["label"].astype(int)))
    top["nl"] = top["vec_id"].map(lmap)
    rows = []
    for q, g in top.groupby("query_id"):
        counts = g.groupby("nl").size().reset_index(name="n")
        counts = counts.sort_values(["n", "nl"],
                                    ascending=[False, True])
        pred, votes = int(counts.iloc[0]["nl"]), int(counts.iloc[0]["n"])
        true = lmap[int(q)]
        rows.append({"query_id": int(q), "true_label": true,
                     "pred_label": pred, "n_votes": votes,
                     "correct": pred == true})
    out = pd.DataFrame(rows).sort_values("query_id").reset_index(drop=True)
    for c in ["query_id", "true_label", "pred_label", "n_votes"]:
        out[c] = out[c].astype("int64")
    return out


def q_proto_prune(sf_dir: str):
    """Prototype-distance pruning (ann.proto_prune): keep each
    k-means cluster's 80% most prototypical embeddings (smallest
    centroid distance) — the easy-example-keep curation step. Slim
    (id, cluster, d2) rows ride the one exchange; oracle = the kmeans
    CTE recurrence + a per-cluster rank cutoff."""
    from frontera_ray.stages.ann import proto_prune

    return proto_prune(_read(sf_dir, "embeddings"), k=8, iters=1,
                       keep_frac=0.8)


def q_compress_ratio(sf_dir: str):
    """Per-doc zlib compressibility (text.compress_ratio): the
    Gopher-era templated-text gate. Rows-only (no deflate in SQL);
    pytest asserts the repetitive < natural < random monotonicity and
    determinism."""
    from frontera_ray.stages.text import compress_ratio

    out = compress_ratio(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_entropy(sf_dir: str):
    """Per-doc token-distribution entropy (text.doc_entropy): the
    lexical-diversity signal — low entropy for the length flags
    templated/spammy text. Shuffle-free (docs whole within blocks);
    float expression op-matched to the SQL twin at micro rounding."""
    from frontera_ray.stages.text import doc_entropy

    out = doc_entropy(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_hash_features(sf_dir: str):
    """Feature-hashing featurizer (text.hash_features): sparse 64-dim
    signed bag-of-words vectors with no vocabulary pass (dimension +
    sign carved from each token's md5) — the constant-memory
    featurizer ahead of linear probes. Streaming, shuffle-free;
    long-format output."""
    from frontera_ray.stages.text import hash_features

    out = hash_features(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        d=64).to_pandas()
    return out.sort_values(["doc_id", "dim"]).reset_index(drop=True)


def q_bigram_pmi(sf_dir: str):
    """Top-20 bigram collocations by PMI (min support 5): one explode
    pass emits unigram + bigram counts together, one groupby exchange,
    vocabulary-bounded unigram broadcast, streaming per-block score +
    partial top-k (text.pmi_top_bigrams)."""
    from frontera_ray.stages.text import pmi_top_bigrams

    return pmi_top_bigrams(
        _read(sf_dir, "documents").select_columns(["text"]),
        k=20, min_count=5)


def q_running_total(sf_dir: str):
    """Per-user ordered window SCAN over events: cumulative count +
    integer-cents running sum + lag inter-arrival gap, all from one
    keyed exchange and one vectorized run pass (relational.window_scan
    — the running-total / lag window-function family)."""
    from frontera_ray.stages.relational import window_scan

    out = window_scan(_read(sf_dir, "events")).to_pandas()
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


_PR_NODES = 256
_PR_MIX = 2654435761  # Knuth multiplicative hash constant


def _doc_graph_edges(sf_dir: str, weighted: bool = False):
    """Shared doc-derived link graph for the whole link-analysis query
    family (pagerank / ppr / hits and their join-path twins): src =
    doc_id %% N, dst = mixed residue, optional weight 1 + doc_id %% 7.
    ONE definition keeps the seven Ray pipelines bit-identical with
    each other and with their SQL oracles."""

    def edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        cols = {
            "src": pa.array(d % _PR_NODES, pa.int64()),
            "dst": pa.array((d * _PR_MIX) % _PR_NODES, pa.int64()),
        }
        if weighted:
            cols["w"] = pa.array((1 + d % 7).astype(np.float64),
                                 pa.float64())
        return pa.table(cols)

    return _read(sf_dir, "documents").select_columns(["doc_id"]) \
        .map_batches(edges, batch_format="pyarrow")


def q_pagerank(sf_dir: str):
    """Fixed-iteration PageRank (5 rounds, d=0.85) over a deterministic
    doc-derived link graph (src = doc_id % 256, dst = mixed residue):
    distinct-edge exchange, then per-iteration streaming dense partial
    combine against the broadcast rank vector — the batch re-scoring
    companion of the crawl's online OPIC flow."""
    from frontera_ray.stages.pagerank import pagerank

    ds = _doc_graph_edges(sf_dir)
    out = pagerank(ds, n_nodes=_PR_NODES, iters=5).to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_pagerank_weighted(sf_dir: str):
    """WEIGHTED PageRank on the join path (pagerank_join with
    weight_col): anchor-weight link analysis — contribution
    w(u,v)/W_out(u) per distinct edge, parallel-edge weights summed in
    the src-partition collapse. Weights w = 1 + doc_id % 7 over the
    same doc-derived graph; integer-valued weights make every W_out
    sum exact in float64, so only final-rank rounding differs from the
    SQL twin."""
    from frontera_ray.stages.pagerank import pagerank_join

    ds = _doc_graph_edges(sf_dir, weighted=True)
    out = pagerank_join(ds, iters=5, weight_col="w").to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_pagerank_join(sf_dir: str):
    """The JOIN-PATH PageRank (pagerank.pagerank_join) over the same
    doc-derived graph as q_pagerank: rank shards hash-partitioned by
    node, edges partitioned ONCE by src (dedup + outdegree fall out of
    that one exchange), each iteration a partition-local ranks⋈edges
    reduceat plus one pre-aggregated (dst, contrib) all-to-all — no
    O(n_nodes) vector anywhere, the 10^10-URL-graph execution shape.
    Same recurrence, same SQL oracle as the dense path."""
    from frontera_ray.stages.pagerank import pagerank_join

    ds = _doc_graph_edges(sf_dir)
    out = pagerank_join(ds, iters=5).to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (long format) — class prototypes
    via streaming partial sum-vectors + tiny driver combine."""
    from frontera_ray.stages.ann import label_centroids

    return label_centroids(_read(sf_dir, "embeddings")).to_pandas()


_OUTLIER_QS = (0.05, 0.95)


def q_length_outliers(sf_dir: str):
    """Robust-quantile outlier filter: exact p5/p95 of n_chars from the
    no-sort histogram-bisection quantile pass, then one streaming
    filter keeps docs strictly outside the band (the classic
    corpus-cleaning length cut, composed from two scale-safe passes)."""
    from frontera_ray.stages.relational import quantile_unbounded

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "n_chars"])
    res = quantile_unbounded(ds, "n_chars", list(_OUTLIER_QS))
    lo, hi = res[_OUTLIER_QS[0]], res[_OUTLIER_QS[1]]

    def pick(b: pa.Table) -> pa.Table:
        n = b["n_chars"]
        mask = pc.or_(pc.less(n, lo), pc.greater(n, hi))
        kept = b.filter(mask)
        side = pc.if_else(pc.less(kept["n_chars"], lo), "low", "high")
        return pa.table({"doc_id": kept["doc_id"],
                         "n_chars": kept["n_chars"],
                         "side": side.cast(pa.string())})

    out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_cms_counts(sf_dir: str):
    """Count-Min-Sketch frequency oracle next to exact truth: one
    streaming pass builds the 4×4096 register matrix (128 KiB partials,
    additive merge — the corpus tokens never leave their blocks), then
    the exact heavy-hitter set probes it. est >= cnt always (collisions
    only add); integer registers make the estimate bit-reproducible in
    SQL."""
    import pandas as pd
    from frontera_ray.stages.sketches import cms_build, cms_estimate
    from frontera_ray.stages.text import heavy_hitters

    docs = _read(sf_dir, "documents").select_columns(["text"])
    hh = heavy_hitters(docs, _HH_NUM, _HH_DEN)
    regs = cms_build(docs)
    hh = hh.sort_values("token").reset_index(drop=True)
    hh["est"] = cms_estimate(regs, hh["token"].tolist())
    return hh


def q_join_size_est(sf_dir: str):
    """Self-join cardinality estimate from the Count-Min registers
    (sketches.cms_f2_join_size): est = min_j Σ regs² over-estimates
    F2 = Σ c_k² — the shuffle-free join-size / skew statistic a
    planner consults before picking a join strategy. Exact F2
    companion via one native groupby count; integer registers are
    bit-reproduced by the SQL twin."""
    import pandas as pd
    from frontera_ray.stages.sketches import cms_f2_join_size

    est, exact = cms_f2_join_size(
        _read(sf_dir, "events").select_columns(["user_id"]), "user_id")
    return pd.DataFrame({"est": [est], "exact": [exact]})


def q_top_event_type(sf_dir: str):
    """Per-user categorical mode (most frequent event_type,
    deterministic count-desc / type-asc tie-break): per-block pair
    pre-aggregation + one keyed exchange."""
    from frontera_ray.stages.relational import grouped_mode

    out = grouped_mode(_read(sf_dir, "events")
                       .select_columns(["user_id", "event_type"]),
                       "user_id", "event_type").to_pandas()
    out = out.rename(columns={"top_val": "top_type"})
    return out.sort_values("user_id").reset_index(drop=True)


def q_centroid_assign(sf_dir: str):
    """Nearest-centroid classification of every embedding against the
    per-label class prototypes (the FineWeb-Edu-style classifier
    scoring shape): centroids from the streaming label_centroids pass
    broadcast as one small matrix, per-block vectorized distance
    argmin, confusion-matrix combine on the driver. Distances are
    rounded (1e-9) before the argmin on both sides so summation order
    can't flip near-ties; ties break toward the smaller label."""
    import ray
    from frontera_ray.stages.ann import _matrix, label_centroids

    cent = label_centroids(_read(sf_dir, "embeddings")).to_pandas()
    piv = cent.pivot(index="label", columns="dim", values="c")
    labels = piv.index.to_numpy(np.int64)          # ascending
    C = piv.to_numpy(np.float64)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        X = _matrix(batch).astype(np.float64)
        d2 = np.round(((X[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2), 9)
        a = np.argmin(d2, axis=1)  # first min == smallest label index
        return pa.table({
            "true_label": batch["label"].cast(pa.int64()),
            "assigned": pa.array(labels[a], pa.int64()),
        })

    import pandas as pd
    parts = []
    for t in (_read(sf_dir, "embeddings")
              .map_batches(assign, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        df = t.to_pandas()
        parts.append(df.groupby(["true_label", "assigned"],
                                as_index=False).size())
    out = (pd.concat(parts).groupby(["true_label", "assigned"],
                                    as_index=False)["size"].sum()
           .rename(columns={"size": "n"}))
    return out.sort_values(["true_label", "assigned"]).reset_index(drop=True)


def q_image_caption_curate(sf_dir: str):
    """Flagship multimodal curation composite over the 3,211
    image+caption rows: phash-dedup keeper map + metadata-only cheap
    gates (caption tokens, dims/aspect) with the actor-pool decode
    validation running ONLY on cheap-gate survivors. Rows-only checked
    here (binary payloads + SyntheticWeb corpus aren't SQL views);
    gate-by-gate invariants live in tests/test_stages.py."""
    from frontera_ray.stages.images import curate_image_captions

    out = curate_image_captions(_image_url_corpus(),
                                pool=_image_pool()).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def q_funnel_depth(sf_dir: str):
    """Conversion-funnel depth per user (view -> click -> purchase,
    each step strictly after the previous step's first qualifying
    event): one keyed exchange, the kernel vectorized ACROSS keys
    (one masked reduceat per step — no per-user Python)."""
    from frontera_ray.stages.relational import funnel_depth

    out = funnel_depth(_read(sf_dir, "events")).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_reassemble_chunks(sf_dir: str):
    """Ordered document reassembly: each doc split into three chunks
    (emitted deliberately out of order), reassembled by the ordered
    per-key concat exchange; output proves byte-exact round-trip via
    length + md5 of the rebuilt text."""
    from frontera_ray.stages.relational import concat_groups

    # per-row slicing is INPUT SYNTHESIS for the test (variable slice
    # bounds have no vectorized Arrow kernel); the operator under test
    # is the concat exchange below
    def chunk3(b: pa.Table) -> pa.Table:
        txt = b["text"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy()
        n = np.fromiter((len(t) for t in txt), np.int64, len(txt))
        p = n // 3
        out_ids, out_idx, out_part = [], [], []
        for emit in (2, 0, 1):  # deliberate disorder
            for i in range(len(txt)):
                lo = [0, p[i], 2 * p[i]][emit]
                hi = [p[i], 2 * p[i], None][emit]
                out_ids.append(ids[i])
                out_idx.append(emit)
                out_part.append(txt[i][lo:hi])
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "idx": pa.array(out_idx, pa.int64()),
                         "part": pa.array(out_part, pa.string())})

    chunks = _read(sf_dir, "documents").select_columns(["doc_id", "text"]) \
        .map_batches(chunk3, batch_format="pyarrow")
    joined = concat_groups(chunks, "doc_id", "idx", "part")

    import hashlib

    def digest(b: pa.Table) -> pa.Table:
        txt = b["text"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars2": pc.utf8_length(b["text"]).cast(pa.int64()),
            "text_md5": pa.array(
                [hashlib.md5(t.encode("utf8")).hexdigest() for t in txt],
                pa.string()),
        })

    out = joined.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_group_corr(sf_dir: str):
    """Per-group Pearson correlation (relational.grouped_moments):
    corr(quantity, discount%) per returnflag, finalized as
    cov_num / sqrt(var_x_num * var_y_num) from the EXACT integer
    moment registers (the sample-size factors cancel, so this equals
    SQL corr() bit-for-bit up to the micro rounding) — the
    feature-correlation / leakage-screen statistic of a curation
    pass. Same no-shuffle combine as `group_stats`; numerators here
    fit float64 exactly (< 2^53)."""
    import math

    from frontera_ray.stages.relational import grouped_moments

    li = (_read(sf_dir, "lineitem")
          .select_columns(["l_returnflag", "l_quantity", "l_discount"])
          .map_batches(lambda b: pa.table({
              "l_returnflag": b["l_returnflag"],
              "qty": pa.array(
                  np.round(b["l_quantity"].to_numpy())
                  .astype(np.int64), pa.int64()),
              "disc_pct": pa.array(
                  np.round(b["l_discount"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    m = grouped_moments(li, "l_returnflag", "qty", "disc_pct")
    corr = [
        int(round(c / math.sqrt(vx * vy) * 1e6)) if vx > 0 and vy > 0
        else 0
        for c, vx, vy in zip(m["cov_xy_num"], m["var_x_num"],
                             m["var_y_num"])]
    out = m[["l_returnflag", "n_rows"]].copy()
    out["corr_micro"] = np.asarray(corr, dtype=np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_target_encode(sf_dir: str):
    """Leave-one-out target encoding (relational.target_encode_loo):
    each order's priority class encoded by the mean total price of the
    OTHER orders in its class — the leakage-safe categorical encoder.
    Combiner aggregate + broadcast + one streaming encode pass;
    integer (num, den) pairs keep the oracle exact."""
    from frontera_ray.stages.relational import target_encode_loo

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_orderpriority": batch["o_orderpriority"],
            "cents": pa.array(np.round(batch["o_totalprice"].to_numpy()
                                       * 100).astype(np.int64), pa.int64())})

    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_orderpriority", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow")
    out = target_encode_loo(orders, "o_orderpriority", "cents",
                            "o_orderkey").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_corr_matrix(sf_dir: str):
    """Pairwise correlation matrix (relational.corr_matrix): all
    pairwise Pearson correlations of (quantity, discount%, tax%) in
    ONE streaming register pass — the feature-redundancy profile of a
    dataset card. Integer registers, no shuffle; SQL corr() parity at
    micro rounding."""
    from frontera_ray.stages.relational import corr_matrix

    li = (_read(sf_dir, "lineitem")
          .select_columns(["l_quantity", "l_discount", "l_tax"])
          .map_batches(lambda b: pa.table({
              "qty": pa.array(np.round(b["l_quantity"].to_numpy())
                              .astype(np.int64), pa.int64()),
              "disc_pct": pa.array(
                  np.round(b["l_discount"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
              "tax_pct": pa.array(
                  np.round(b["l_tax"].to_numpy() * 100)
                  .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    out = corr_matrix(li, ["qty", "disc_pct", "tax_pct"])
    return out.sort_values(["col_x", "col_y"]).reset_index(drop=True)


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type mix
    (relational.grouped_entropy) — the bot-detection / behavioral-
    diversity signal: near-zero entropy = a machine hammering one
    event type. Per-block (user, type) count combiner, ONE keyed
    exchange of partial-count rows, vectorized reduceat finalize."""
    from frontera_ray.stages.relational import grouped_entropy

    out = grouped_entropy(
        _read(sf_dir, "events").select_columns(["user_id", "event_type"]),
        "user_id", "event_type").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_hist2d(sf_dir: str):
    """Joint 2-D histogram of (quantity, extendedprice)
    (sketches.fixed_histogram_2d): one composite bincount register per
    block, driver merge — the joint-distribution panel of a dataset
    card. Exact: the bin rule is the identical double expression on
    both sides."""
    from frontera_ray.stages.sketches import fixed_histogram_2d

    return fixed_histogram_2d(
        _read(sf_dir, "lineitem").select_columns(
            ["l_quantity", "l_extendedprice"]),
        "l_quantity", "l_extendedprice",
        x_lo=0.0, x_width=5.0, x_bins=10,
        y_lo=0.0, y_width=10000.0, y_bins=10)


def q_psi_drift(sf_dir: str):
    """Population Stability Index between the two event_id-parity
    slices of the value distribution (sketches.psi_drift) — the
    distribution-drift monitor of a curation loop. One streaming pass
    of two bincount registers per block; per-bin add-1-smoothed
    (p-q)·ln(p/q) in integer micro units, order-free."""
    from frontera_ray.stages.sketches import psi_drift

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "value": batch["value"],
            "side": pa.array(batch["event_id"].to_numpy() % 2, pa.int64())})

    ev = _read(sf_dir, "events").select_columns(
        ["event_id", "value"]).map_batches(prep, batch_format="pyarrow")
    return psi_drift(ev, "value", "side", lo=0.0, width=25.0, n_bins=20)


def q_value_histogram(sf_dir: str):
    """Exact fixed-bin value histogram (sketches.fixed_histogram) —
    the distribution-profile / dataset-card primitive: 20 bins of
    width 25 over [0, 500) plus clamp rows; each block contributes
    one 22-slot int64 register vector (np.bincount), the driver sums
    registers — values never move."""
    from frontera_ray.stages.sketches import fixed_histogram

    return fixed_histogram(
        _read(sf_dir, "events").select_columns(["value"]),
        "value", lo=0.0, width=25.0, n_bins=20).to_pandas()


def q_stratified_sample(sf_dir: str):
    """Stratified fixed-COUNT sample: exactly 30 documents per
    language, chosen as the 30 smallest md5-hash values within each
    stratum (ties by doc_id) — the balanced-evaluation-set /
    per-language audit-sample shape. Deterministic: the sample is a
    pure function of the ids (retries and re-runs agree), and
    complements `doc_sample`'s per-stratum RATE sampling
    (sampling.stratified_hash_sample) with a per-stratum COUNT
    guarantee via per_key_topk on the hash order."""
    from frontera_ray.stages.relational import per_key_topk
    from frontera_ray.stages.sampling import hash_u32

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch["doc_id"].to_pylist())
        return pa.table({"lang": batch["lang"], "doc_id": batch["doc_id"],
                         "h": pa.array(h.astype(np.int64), pa.int64())})

    ds = (_read(sf_dir, "documents").select_columns(["doc_id", "lang"])
          .map_batches(add_hash, batch_format="pyarrow"))
    out = per_key_topk(ds, "lang", "h", k=30, descending=False,
                       tiebreak="doc_id").to_pandas()
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def q_interval_join(sf_dir: str):
    """Interval-OVERLAP join (relational.interval_overlap_join): every
    click interval [ts, ts + floor(value)] paired with every view
    interval it overlaps — the sessions×incidents / attribution-window
    primitive that range_join (point-in-interval) cannot express.
    Buckets of 1024 s, one keyed exchange, owner-bucket dedup,
    vectorized cross per bucket run."""
    from frontera_ray.stages.relational import interval_overlap_join

    def mk_intervals(b: pa.Table) -> pa.Table:
        e = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy() \
            // 1_000_000
        length = np.floor(b["value"].to_numpy()).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"], "event_type": b["event_type"],
            "lo": pa.array(e, pa.int64()),
            "hi": pa.array(e + length, pa.int64())})

    ds = (_read(sf_dir, "events")
          .select_columns(["event_id", "ts", "event_type", "value"])
          .map_batches(mk_intervals, batch_format="pyarrow"))
    out = interval_overlap_join(ds, "lo", "hi", "event_type",
                                left_type="click", right_type="view",
                                bucket_w=1024).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_band_join(sf_dir: str):
    """Numeric BAND self-join (|price_a - price_b| <= $20 between
    URGENT and LOW orders) — the measurement-tolerance / near-price
    matching primitive, expressed through the interval-overlap
    machinery: a band join IS the overlap of [v, v+w] intervals, so
    the bucket replication + owner-bucket dedup apply unchanged."""
    from frontera_ray.stages.relational import interval_overlap_join

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderpriority": b["o_orderpriority"],
            "lo": pa.array(cents, pa.int64()),
            "hi": pa.array(cents + 2000, pa.int64())})

    ds = (_read(sf_dir, "orders")
          .select_columns(["o_orderkey", "o_orderpriority", "o_totalprice"])
          .map_batches(prep, batch_format="pyarrow"))
    out = interval_overlap_join(ds, "lo", "hi", "o_orderpriority",
                                left_type="1-URGENT", right_type="5-LOW",
                                id_col="o_orderkey",
                                bucket_w=2048).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embedding column (ann.pca_fit): one
    (d²+d+1)-float64 register per block (Σxxᵀ, Σx, n), driver
    eigendecomposition — the embedding-space drift-profile /
    compaction step. Output is the stable spectrum summary
    (eigenvalue + explained-variance ppm per component); rows-only
    like ridge_probe (block-order float combine ~1e-12), pytest
    parity vs the full-data numpy eigendecomposition."""
    from frontera_ray.stages.ann import pca_fit

    w, comp, mean, n = pca_fit(
        _read(sf_dir, "embeddings").select_columns(["embedding"]))
    tot = float(w.sum())
    import pandas as pd

    return pd.DataFrame({
        "component": np.arange(len(w), dtype=np.int64),
        "eigval_micro": np.round(w * 1e6).astype(np.int64),
        "explained_ppm": np.round(w / tot * 1e6).astype(np.int64),
        "n_rows": np.int64(n),
    })


def q_winnow_dup(sf_dir: str):
    """Shared-region near-dup pairs (dedup.winnow_dup_pairs): docs
    sharing >= 2 winnowed fingerprints — the plagiarism/boilerplate
    overlap detector that catches locally duplicated passages
    whole-document Jaccard dilutes. One fp-keyed exchange, vectorized
    run pair expansion, hot-fp guard; driver sees the pair list
    only."""
    from frontera_ray.stages.dedup import winnow_dup_pairs

    return winnow_dup_pairs(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]))


def q_column_profile(sf_dir: str):
    """Dataset-card column profiler (sketches.profile_columns): per
    column (n_rows, n_null, min, max) in ONE streaming pass — numeric
    columns by value, strings by character length, timestamps by
    floor-epoch-seconds — as a tiny per-block register combine (one
    row per column per block; values never move)."""
    from frontera_ray.stages.sketches import profile_columns

    return profile_columns(_read(sf_dir, "orders"), {
        "o_orderkey": "num", "o_custkey": "num", "o_totalprice": "num",
        "o_orderstatus": "str", "o_orderpriority": "str",
        "o_orderdate": "ts"})


def q_range_window_sum(sf_dir: str):
    """Value-RANGE windowed frame (relational.per_key_range_sum):
    every event gains the user's trailing-1-hour spend — SQL's RANGE
    BETWEEN 3600000000 PRECEDING AND CURRENT ROW over epoch-us, the
    variable-spacing rolling feature ROWS frames cannot express.
    Exact peer-tie semantics; one keyed exchange + vectorized merge
    passes."""
    from frontera_ray.stages.relational import per_key_range_sum

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "cents": pa.array(
                np.round(b["value"].to_numpy() * 100).astype(np.int64),
                pa.int64())})

    ds = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_id", "ts", "value"])
          .map_batches(prep, batch_format="pyarrow"))
    out = per_key_range_sum(ds, "user_id", "ts_us", "cents",
                            window=3_600_000_000).to_pandas()
    return (out[["user_id", "event_id", "range_sum"]]
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


def q_bm25_topk(sf_dir: str):
    """Distributed BM25 retrieval (text.bm25_topk): top-20 documents
    for a fixed 4-token query — compact per-doc feature pass, corpus
    stats as a register combine, per-block partial top-k. Per-term
    micro-rounding makes the score an order-free integer sum, so the
    SQL twin (identical expression tree) hash-matches exactly."""
    from frontera_ray.stages.text import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"]),
        query_tokens=["data", "hash", "scan", "batch"], k=20)


def q_lang_confusion(sf_dir: str):
    """Classifier-evaluation confusion matrix: the langid prediction
    (text.langid_table) against the corpus's labeled `lang` column,
    as (lang_true, lang_pred, n) cells — one fused prediction pass,
    then a combiner groupby over the bounded label-pair space
    (relational.partial_groupby_agg); no shuffle."""
    from frontera_ray.stages.relational import partial_groupby_agg
    from frontera_ray.stages.text import langid_table

    def pred(b: pa.Table) -> pa.Table:
        t = langid_table(b)
        return pa.table({"lang_true": b["lang"],
                         "lang_pred": t["lang_pred"]})

    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text", "lang"]).map_batches(
        pred, batch_format="pyarrow")
    out = partial_groupby_agg(ds, ["lang_true", "lang_pred"],
                              {"n": ("lang_pred", "count")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang_true", "lang_pred"]) \
        .reset_index(drop=True)


def q_class_f1(sf_dir: str):
    """Per-class precision / recall / F1 of the langid classifier vs
    the labeled `lang` column, in EXACT integer ppm (F1 as
    2·tp//(pred_n+true_n) — the harmonic form needs no float): the
    per-class report card behind every classifier-gate decision,
    built from the same bounded confusion cells as `lang_confusion`
    (one fused prediction pass + combiner; no shuffle)."""
    import pandas as pd

    cells = q_lang_confusion(sf_dir)
    classes = sorted(set(cells["lang_true"]) | set(cells["lang_pred"]))
    rows = []
    for c in classes:
        tp = int(cells.loc[(cells["lang_true"] == c)
                           & (cells["lang_pred"] == c), "n"].sum())
        pred_n = int(cells.loc[cells["lang_pred"] == c, "n"].sum())
        true_n = int(cells.loc[cells["lang_true"] == c, "n"].sum())
        rows.append({
            "lang": c, "tp": tp, "pred_n": pred_n, "true_n": true_n,
            "precision_ppm": 1_000_000 * tp // pred_n if pred_n else 0,
            "recall_ppm": 1_000_000 * tp // true_n if true_n else 0,
            "f1_ppm": (2_000_000 * tp // (pred_n + true_n)
                       if pred_n + true_n else 0),
        })
    out = pd.DataFrame(rows)
    for c in ["tp", "pred_n", "true_n", "precision_ppm", "recall_ppm",
              "f1_ppm"]:
        out[c] = out[c].astype("int64")
    return out


def q_cohen_kappa(sf_dir: str):
    """Cohen's kappa of the langid classifier vs the labeled `lang`
    column — chance-corrected agreement, the standard
    annotation-quality / classifier-evaluation scalar. Built entirely
    from the bounded confusion cells (same combiner pass as
    `lang_confusion`); the kappa arithmetic runs on exact integer
    marginals and micro-rounds once, matching the SQL expression tree
    term for term."""
    import pandas as pd

    cells = q_lang_confusion(sf_dir)
    t = int(cells["n"].sum())
    agree = int(cells.loc[cells["lang_true"] == cells["lang_pred"],
                          "n"].sum())
    rows = cells.groupby("lang_true")["n"].sum()
    cols = cells.groupby("lang_pred")["n"].sum()
    lbls = rows.index.intersection(cols.index)
    s = int(sum(int(rows[m]) * int(cols[m]) for m in lbls))
    po = agree / t
    pe = s / (t * t)
    kappa_micro = int(np.floor((po - pe) / (1 - pe) * 1e6 + 0.5))
    return pd.DataFrame([{"total": t, "agree": agree,
                          "kappa_micro": kappa_micro}]).astype("int64")


def q_peak_rate(sf_dir: str):
    """Peak sliding-window rate per key: each user's MAX event count
    over any 1-hour window hopping every 15 minutes — the burst /
    rate-spike detector (the observability twin of the frontier's
    per-host overuse threshold, reference frontera's
    OVERUSED_SLOT_FACTOR flow). Hopping expansion + combiner counts
    (relational.hopping_window_counts), then a bounded per-user max;
    ties on the peak resolve to the earliest window."""
    from frontera_ray.stages.relational import hopping_window_counts

    ev = _read(sf_dir, "events").select_columns(["user_id", "ts"])
    wins = hopping_window_counts(ev, ts_col="ts", window_s=3600,
                                 hop_s=900, keys=("user_id",))
    idx = wins.sort_values(["user_id", "n", "window_start"],
                           ascending=[True, False, True]) \
        .groupby("user_id", as_index=False).first()
    out = idx.rename(columns={"n": "peak_n",
                              "window_start": "peak_window"})
    out = out[["user_id", "peak_window", "peak_n"]]
    out["peak_n"] = out["peak_n"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_k_anon_violations(sf_dir: str):
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    n_chars//100): every QI group with fewer than k=5 members — the
    privacy / re-identification-risk gate a training-data release runs
    before publishing. One combiner groupby over the bounded QI space
    (relational.partial_groupby_agg), violation-scale output."""
    from frontera_ray.stages.relational import partial_groupby_agg

    ds = (_read(sf_dir, "documents")
          .select_columns(["lang", "source", "n_chars"])
          .map_batches(lambda b: pa.table({
              "lang": b["lang"],
              "source": b["source"],
              "size_bucket": pa.array(
                  b["n_chars"].to_numpy().astype(np.int64) // 100,
                  pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ds, ["lang", "source", "size_bucket"],
                            {"n": ("lang", "count")})
    g["n"] = g["n"].astype("int64")
    out = g[g["n"] < 5]
    return out.sort_values(["lang", "source", "size_bucket"]) \
        .reset_index(drop=True)


def q_postings(sf_dir: str):
    """Capped inverted-index build (text.build_postings): token ->
    (exact df, csv of the first 10 doc ids) for tokens with df >= 20 —
    the retrieval-index materialization. Vectorized explode + ONE
    keyed exchange on the token; vocabulary-scale output."""
    from frontera_ray.stages.text import build_postings

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    return build_postings(docs, cap=10, min_df=20).to_pandas()


def q_rrf_fusion(sf_dir: str):
    """Hybrid-retrieval reciprocal-rank fusion: fuse the BM25 lexical
    ranking (text.bm25_topk, top-50) with a quality-prior ranking
    (quality_features_table -> relational.global_topk top-50) via
    RRF with k=60 (Cormack et al., public algorithm), integer-exact
    (rrf_micro = Σ 10⁶ // (60 + rank)). Both rankings are distributed
    (register-combine stats, per-block partial top-k); the fusion
    itself merges two k-sized lists on the driver — output-scale."""
    import pandas as pd

    from frontera_ray.stages.relational import global_topk
    from frontera_ray.stages.text import bm25_topk, quality_features_table

    docs = _read(sf_dir, "documents")
    l1 = bm25_topk(docs.select_columns(["doc_id", "text"]),
                   query_tokens=["data", "hash", "scan", "batch"], k=50) \
        .reset_index(drop=True)
    l1["r"] = np.arange(1, len(l1) + 1, dtype=np.int64)

    qual = docs.map_batches(quality_features_table,
                            batch_format="pyarrow") \
        .map_batches(lambda b: b.select(["doc_id", "quality_score"]),
                     batch_format="pyarrow")
    l2 = global_topk(qual, "quality_score", 50, descending=True,
                     tiebreak="doc_id").to_pandas()
    l2["r"] = np.arange(1, len(l2) + 1, dtype=np.int64)

    m = pd.merge(l1[["doc_id", "r"]], l2[["doc_id", "r"]],
                 on="doc_id", how="outer", suffixes=("_1", "_2"))
    c1 = np.where(m["r_1"].notna(),
                  1_000_000 // (60 + m["r_1"].fillna(1).astype(np.int64)),
                  0)
    c2 = np.where(m["r_2"].notna(),
                  1_000_000 // (60 + m["r_2"].fillna(1).astype(np.int64)),
                  0)
    out = pd.DataFrame({"doc_id": m["doc_id"].astype(np.int64),
                        "rrf_micro": (c1 + c2).astype(np.int64)})
    out = out.sort_values(["rrf_micro", "doc_id"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def q_orders_unpivot(sf_dir: str):
    """UNPIVOT / melt (relational.unpivot): orders' numeric metrics
    reshaped wide->long into (o_orderkey, name, value) rows — the
    generic per-metric stream; pure per-block transform, no
    shuffle."""
    from frontera_ray.stages.relational import unpivot

    out = unpivot(_read(sf_dir, "orders")
                  .select_columns(["o_orderkey", "o_custkey",
                                   "o_totalprice"]),
                  "o_orderkey", ["o_custkey", "o_totalprice"]).to_pandas()
    return out.sort_values(["o_orderkey", "name"]).reset_index(drop=True)


def q_cdc_merge(sf_dir: str):
    """CDC MERGE with deletes (relational.cdc_merge): the event stream
    compacts to one surviving row per user (max ts, min event_id on
    ties) and users whose LAST event is an 'error' are tombstoned out
    — Delta/Iceberg MERGE semantics; latest_events is the delete-free
    special case. One keyed exchange + a streaming tombstone filter."""
    from frontera_ray.stages.relational import cdc_merge, cluster_cpus

    ev = _read(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts", "event_type"]).map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_type": b["event_type"],
        }), batch_format="pyarrow")
    out = cdc_merge(ev, "user_id", "ts_us", "event_type", "error",
                    tiebreak="event_id",
                    exchange=_choose_exchange("tasks")).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_image_embed_neardup(sf_dir: str):
    """Cross-family composite: image corpus -> actor-pool visual
    feature extraction (images.ImageFeatureStage: decode + 8x8
    grayscale grid, a deterministic stand-in for a vision encoder) ->
    the SAME banded-LSH cosine near-dup machinery the text embeddings
    use (ann.cosine_neardup_lsh, slim bucket exchange). The
    image->embedding->dedup composition of a multimodal curation
    pipeline; rows-only (pixel-derived floats), recall pytest vs the
    brute pair set.

    The feature table is materialized before the LSH: embeddings are
    ~1000x smaller than pixels (the standard persisted intermediate of
    a multimodal curation pipeline), and the LSH's prefilter variant
    re-consumes its input — without the pin that re-runs the whole
    decode+encode actor chain per pass. bits=64 (8 bits/band) keeps
    per-band codes selective (256/band, not the 4/band the default
    bits=16 gives) so buckets stay near-singleton instead of
    all-colliding into an all-pairs verify; recall at the 0.9995
    threshold stays ~1.0 (p=0.990/plane -> 1-(1-p^8)^8)."""
    from frontera_ray.stages.ann import cosine_neardup_lsh
    from frontera_ray.stages.images import ImageFeatureStage

    feats = (_image_url_corpus()
             .map_batches(_fetch_payload_batch, batch_format="pyarrow")
             .map_batches(ImageFeatureStage, batch_format="pyarrow",
                          batch_size=_IMG_FUSED_BS, concurrency=_image_pool())
             ).materialize()
    return cosine_neardup_lsh(feats, threshold=0.9995, bits=64, bands=8)


def q_hits(sf_dir: str):
    """HITS hubs & authorities (4 iterations) over the SAME
    doc-derived link graph as `pagerank` — the second classic
    link-analysis scorer (Kleinberg 1999): hub = "points at good
    pages" (seed/index prioritization in a crawl), authority = "is
    pointed at by good hubs" (content scoring). Streaming edge passes
    against broadcast score vectors, register combine, L1
    normalization per half-step; oracled against 4 unrolled CTE
    iterations (final scores rounded 1e-9)."""
    from frontera_ray.stages.pagerank import hits

    ds = _doc_graph_edges(sf_dir)
    out = hits(ds, n_nodes=_PR_NODES, iters=4).to_pandas()
    out["hub"] = out["hub"].round(9)
    out["authority"] = out["authority"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_hits_join(sf_dir: str):
    """JOIN-PATH HITS (pagerank.hits_join) over the same graph as
    q_hits: the forward (dst, Σ h(src)) all-to-all for authorities and
    the REVERSE value-fetch along the same static routes for hubs —
    no O(n_nodes) vector anywhere, the driver reduces only P scalar L1
    partials per half-step. Same recurrence, same SQL oracle as the
    dense path."""
    from frontera_ray.stages.pagerank import hits_join

    ds = _doc_graph_edges(sf_dir)
    out = hits_join(ds, iters=4).to_pandas()
    out["hub"] = out["hub"].round(9)
    out["authority"] = out["authority"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_degree_dist(sf_dir: str):
    """Degree distribution of the distinct-edge link graph
    (pagerank.degree_histogram): (side, deg, n_nodes) for in- and
    out-degree — the first skew read on a crawled web graph (power-law
    slope, supernode detection; decides salting before any per-node
    shuffle). ONE streaming edge pass with stacked bincount registers,
    NO shuffle; output is distinct-degree-scale."""
    from frontera_ray.stages.pagerank import degree_histogram

    ds = _doc_graph_edges(sf_dir)
    out = degree_histogram(ds, n_nodes=_PR_NODES).to_pandas()
    return out.sort_values(["side", "deg"]).reset_index(drop=True)


def q_kmv_source_sim(sf_dir: str):
    """Pairwise corpus-slice similarity via bottom-k (KMV) sketches
    (sketches.kmv_jaccard_pairs): which sources feed near-identical
    content — the shard/provider overlap audit run before mixing
    corpora. Each source's distinct word-3-gram md5 hashes reduce to
    the 128 smallest (per-block register partials, driver merge —
    sketches move, never grams); the pairwise estimate
    10^6*|K_a∩K_b∩bottom_k(union)|//k_eff is integer-exact, so the
    whole sketch pipeline oracle-checks against DuckDB row_number()
    twins."""
    from frontera_ray.stages.sketches import kmv_jaccard_pairs

    docs = _read(sf_dir, "documents").select_columns(["source", "text"])
    out = kmv_jaccard_pairs(docs, "source", k=128, shingle_k=3) \
        .to_pandas()
    return out.sort_values(["group_a", "group_b"]).reset_index(drop=True)


def q_quality_keepers(sf_dir: str):
    """Quality-aware near-dup keeper resolution
    (dedup.keeper_table_best): within each minhash component keep the
    HIGHEST-quality member (tiebreak min doc_id) — what a production
    dedup pass actually keeps (the best copy, not the first). Pairs ->
    pair-scoped union-find; member quality fetched via one
    broadcast-filter pass (member-scale, never the corpus); final map
    broadcast over the corpus as a streaming lookup. Oracled end to
    end: recursive-CTE components + the quality expression + a
    window-function argmax."""
    from frontera_ray.stages.dedup import keeper_table_best, \
        minhash_neardup_pairs
    from frontera_ray.stages.text import quality_features_table

    ds = _read(sf_dir, "documents")
    pairs = minhash_neardup_pairs(ds, threshold=0.5)
    scores = ds.select_columns(["doc_id", "text"]) \
        .map_batches(quality_features_table, batch_format="pyarrow") \
        .map_batches(lambda b: b.select(["doc_id", "quality_score"]),
                     batch_format="pyarrow")
    out = keeper_table_best(ds, pairs, scores,
                            score_col="quality_score").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift statistic
    (relational.ks_2sample), INTEGER-EXACT: D = ks_num/ks_den between
    the event-value distributions of the two user cohorts (user_id
    parity) — the nonparametric drift test beside the binned
    `psi_drift`. One partial-combine pass (value-count registers), a
    distinct-value driver fold; ks_micro = 10^6*D truncated."""
    from frontera_ray.stages.relational import ks_2sample

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "value"])
          .map_batches(lambda b: pa.table({
              "value": b["value"],
              "side": pa.array(b["user_id"].to_numpy() % 2, pa.int64()),
          }), batch_format="pyarrow"))
    return ks_2sample(ev, "value", "side", scale=100).to_pandas()


def q_containment_join(sf_dir: str):
    """ASYMMETRIC n-gram containment pairs (dedup.containment_pairs):
    ordered (a, b) with |grams(a)∩grams(b)| >= 60% of |grams(a)| over
    the doc_id<200 slice — the sub-document inclusion detector
    (quotes, boilerplate wrappers) that symmetric Jaccard misses
    (Broder 1997's containment vs resemblance). Integer-exact
    (a, b, inter_size, a_size); bounded-slice distributed brute,
    unbounded corpora route through minhash buckets."""
    from frontera_ray.stages.dedup import containment_pairs

    return containment_pairs(_read(sf_dir, "documents"), limit_ids=200,
                             shingle_k=3, threshold_pct=60).to_pandas()


def q_hill_tail(sf_dir: str):
    """Hill tail-index estimator (Hill 1975, the standard power-law
    tail diagnostic) over the per-user event-count distribution:
    hill = mean(ln(x_i / x_thr)) over the top-k order statistics
    (k=10, threshold = the (k+1)-th), reported in micro-units — the
    quantitative companion of `degree_dist`/`count_gini` skew reads
    (1/hill ~ the Pareto alpha that decides hot-key salting). Counts
    are a distributed combiner groupby; the top-(k+1) order statistics
    come from per-block partial top-k (`relational.global_topk`); the
    driver folds k+1 rows."""
    import math

    import pandas as pd

    from frontera_ray.stages.relational import global_topk

    k = 10
    ev = (_read(sf_dir, "events")
          .select_columns(["user_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    from frontera_ray.stages.relational import grouped_int_sum
    counts = grouped_int_sum(ev, "user_id", "one")
    top = global_topk(counts, "one", k + 1, descending=True,
                      tiebreak="user_id").to_pandas()
    thr = float(top["one"].iloc[k])
    hill = sum(math.log(float(x) / thr) for x in top["one"][:k]) / k
    return pd.DataFrame([{
        "k": np.int64(k),
        "x_thr": np.int64(top["one"].iloc[k]),
        "hill_micro": np.int64(math.floor(1_000_000 * hill + 0.5))}])


def q_recrawl_schedule(sf_dir: str):
    """Change-rate-driven revisit scheduling (the Cho &
    Garcia-Molina 2003 recrawl-policy shape frontera's DELAY/decay
    revisits approximate): per user (stand-in for per host), estimate
    the change rate from observed fetches (n_changed = 'click' events
    over n_obs total) and emit the next-fetch interval
    clamp(86400*n_obs // max(n_changed,1), [1h, 7d]) — all-integer.
    One combiner groupby (bounded key space), vectorized clamp."""
    from frontera_ray.stages.relational import partial_groupby_agg

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_type"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
              "chg": pa.array(
                  (np.asarray(b["event_type"].to_pylist(), dtype=object)
                   == "click").astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, "user_id",
                            {"n_obs": ("one", "sum"),
                             "n_changed": ("chg", "sum")})
    n_obs = g["n_obs"].to_numpy().astype(np.int64)
    n_chg = g["n_changed"].to_numpy().astype(np.int64)
    g["n_obs"] = n_obs
    g["n_changed"] = n_chg
    g["interval_s"] = np.minimum(
        604_800, np.maximum(3_600, (86_400 * n_obs)
                            // np.maximum(n_chg, 1))).astype(np.int64)
    return g.sort_values("user_id").reset_index(drop=True)


def q_mix_epochs(sf_dir: str):
    """UniMax training-mixture allocation (sampling.unimax_epochs;
    Chung et al. 2023): split a global token budget (4/3 of the corpus
    so the cap binds) across sources, no source repeating more than 2
    epochs — size-ascending walk, leftovers roll to larger sources,
    all-integer. Per-source sums are a distributed combiner exchange;
    oracled against a recursive-CTE twin of the walk."""
    import pyarrow.parquet as pq

    from frontera_ray.stages.sampling import unimax_epochs

    total = int(pq.read_table(f"{sf_dir}/documents.parquet",
                              columns=["n_chars"])["n_chars"]
                .to_numpy().sum())
    docs = _read(sf_dir, "documents").select_columns(
        ["source", "n_chars"])
    return unimax_epochs(docs, "source", "n_chars",
                         budget=(4 * total) // 3,
                         max_epochs=2).to_pandas()


def q_lsh_bucket_stats(sf_dir: str):
    """LSH bucket census (dedup.minhash_band_rows): per band, the
    bucket-size histogram of the 16x4 minhash banding — the skew read
    on the near-dup exchange itself (a super-hot bucket is exactly the
    key you salt before the bucket all-to-all; the pair pipeline's
    collision prefilter consumes the same census). Band rows -> ONE
    keyed exchange on the exact signature tuple (collision-free,
    unlike the pair path's packed crc32 key) -> per-block histogram
    partials; output is distinct-(band,size)-scale."""
    import pandas as pd

    from frontera_ray.stages.dedup import minhash_band_rows

    ds = (_read(sf_dir, "documents")
          .select_columns(["doc_id", "text"])
          .map_batches(minhash_band_rows, batch_format="pyarrow"))
    if _choose_exchange("tasks") == "tasks":
        # raw-task shuffle + run-count kernel (measured ~2x the native
        # sort aggregate on the ~1M string-keyed band rows)
        from frontera_ray.stages.relational import task_exchange

        def bucket_counts(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"bkey": pa.array([], pa.string()),
                                 "count()": pa.array([], pa.int64())})
            k = np.asarray(batch["bkey"].to_pylist(), dtype=object)
            order = np.argsort(k, kind="stable")
            ks = k[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], ks[1:] != ks[:-1])))
            cnt = np.diff(np.append(starts, len(ks)))
            return pa.table({
                "bkey": pa.array(ks[starts], pa.string()),
                "count()": pa.array(cnt.astype(np.int64), pa.int64())})

        sizes = task_exchange(ds, "bkey", bucket_counts)
    else:
        sizes = ds.groupby("bkey").count()

    def hist_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "bucket_size": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        bands = np.array([int(k.split(":", 1)[0])
                          for k in batch["bkey"].to_pylist()], np.int64)
        cnts = batch["count()"].to_numpy().astype(np.int64)
        key = bands * 1_000_000 + cnts  # sizes << 1e6
        uk, n = np.unique(key, return_counts=True)
        return pa.table({
            "band": pa.array(uk // 1_000_000, pa.int64()),
            "bucket_size": pa.array(uk % 1_000_000, pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64())})

    from collections import Counter
    acc: Counter = Counter()
    for t in sizes.map_batches(hist_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for band, sz, n in zip(t["band"].to_pylist(),
                               t["bucket_size"].to_pylist(),
                               t["n"].to_pylist()):
            acc[(band, sz)] += n
    rows = [{"band": b, "bucket_size": s, "n_buckets": n}
            for (b, s), n in sorted(acc.items())]
    return pd.DataFrame(rows, columns=["band", "bucket_size",
                                       "n_buckets"]).astype("int64")


def q_zipf_fit(sf_dir: str):
    """Zipf rank-frequency slope over the top-100 tokens — the
    corpus-statistics fit (slope ~ -1 for natural language; the
    deviation is a synthetic-data / boilerplate signal): log-log
    least squares over (rank, count), slope in micro-units. Token
    counts are the vectorized explode + hash-shuffle groupby
    (`token_df`'s shape); the top-100 order statistics come from
    per-block partial top-k; the driver folds 100 rows."""
    import math

    import pandas as pd
    import pyarrow.compute as _pc

    from frontera_ray.stages.relational import global_topk

    def explode(batch: pa.Table) -> pa.Table:
        toks = _pc.utf8_split_whitespace(batch["text"])
        flat = _pc.list_flatten(toks)
        t = pa.table({"token": flat})
        return t.filter(_pc.not_equal(t["token"], ""))

    tc = _read(sf_dir, "documents").select_columns(["text"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("token").count()
    top = global_topk(tc, "count()", 100, descending=True,
                      tiebreak="token").to_pandas()
    k = len(top)
    xs = [math.log(float(i + 1)) for i in range(k)]
    ys = [math.log(float(c)) for c in top["count()"]]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return pd.DataFrame([{
        "k": np.int64(k),
        "slope_micro": np.int64(math.floor(1_000_000 * slope + 0.5))}])


def q_dedup_inflation(sf_dir: str):
    """Dedup savings accounting: how many documents / tokens would a
    minhash near-dup pass drop (keeper != self) — the
    before-you-commit cost/benefit read on a dedup run (CCNet/Gopher
    report exactly this number). Pairs -> pair-scoped union-find ->
    broadcast membership; ONE streaming corpus pass folds doc/token
    registers; savings_ppm integer-exact."""
    import pandas as pd
    import ray

    from frontera_ray.stages.dedup import dedup_keepers, minhash_neardup_pairs
    from frontera_ray.stages.text import token_count_table

    ds = _read(sf_dir, "documents")
    pairs = minhash_neardup_pairs(ds, threshold=0.5)
    comp = dedup_keepers(None, zip(pairs["a"].to_pylist(),
                                   pairs["b"].to_pylist()))
    dup_ids = np.fromiter(
        (i for i, kp in comp.items() if kp != i), dtype=np.int64)
    dup_ids.sort()
    ref = ray.put(dup_ids)
    cache: dict = {}

    def fold(batch: pa.Table) -> pa.Table:
        if "d" not in cache:
            cache["d"] = ray.get(ref)
        t = token_count_table(batch)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        nt = t["n_tokens"].to_numpy().astype(np.int64)
        dup = np.isin(ids, cache["d"])
        return pa.table({
            "docs": pa.array([len(ids)], pa.int64()),
            "dup_docs": pa.array([int(dup.sum())], pa.int64()),
            "tokens": pa.array([int(nt.sum())], pa.int64()),
            "dup_tokens": pa.array([int(nt[dup].sum())], pa.int64())})

    tot = np.zeros(4, np.int64)
    for t in ds.select_columns(["doc_id", "text"]) \
            .map_batches(fold, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        tot += np.array([t["docs"][0].as_py(), t["dup_docs"][0].as_py(),
                         t["tokens"][0].as_py(),
                         t["dup_tokens"][0].as_py()], np.int64)
    return pd.DataFrame([{
        "total_docs": tot[0], "dup_docs": tot[1],
        "total_tokens": tot[2], "dup_tokens": tot[3],
        "savings_ppm": (1_000_000 * tot[3]) // tot[2] if tot[2] else 0,
    }]).astype("int64")


def q_weighted_quantile(sf_dir: str):
    """Weighted discrete quantiles (relational.weighted_quantile_disc):
    the quantity-weighted p25/p50/p75/p95 of the lineitem price — the
    weighted-percentile primitive (bytes-weighted latency, token-
    weighted doc length). All-integer rank arithmetic over a
    bounded-domain register combine."""
    from frontera_ray.stages.relational import weighted_quantile_disc

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_extendedprice", "l_quantity"])
    return weighted_quantile_disc(li, "l_extendedprice", "l_quantity",
                                  [250, 500, 750, 950],
                                  scale=100).to_pandas()


def q_kcore(sf_dir: str):
    """Fixed-round k-core peeling (pagerank.kcore; Seidman 1983) of the
    sparse supplier co-purchase graph: 4 peeling rounds at k=3 — the
    link-ring / dense-core detector a crawl runs over its host graph
    (spam farms survive peeling, tendrils fall away). Undirected
    distinct edges via one keyed exchange; each round ONE streaming
    edge pass against the broadcast alive bitset (degree registers);
    survivors + within-core degree, all-integer."""
    from frontera_ray.stages.pagerank import kcore

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    out = kcore(edges, n_nodes, k=3, rounds=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_watermark_late(sf_dir: str):
    """Watermark / late-data audit (relational.watermark_lateness):
    in event_id arrival order, a row is LATE when its event time
    trails the running max of earlier arrivals by > 30 min; per-day
    (n_total, n_late, late_ppm), integer-exact. A distributed
    PREFIX-MAX scan (the compaction planner's prefix-sum with a max
    combine) — the out-of-orderness measurement behind any
    allowed-lateness choice."""
    from frontera_ray.stages.relational import watermark_lateness

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "ts"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "ts_us": b["ts"].cast(pa.int64()),
          }), batch_format="pyarrow"))
    return watermark_lateness(ev, "event_id", "ts_us",
                              lateness_us=1_800_000_000).to_pandas()


def q_lsh_eval(sf_dir: str):
    """Banding-quality evaluation (dedup.lsh_banding_eval): exact
    candidate precision/recall of the 16x4 minhash banding against
    ground-truth Jaccard >= 50% over the doc_id<200 slice — the
    empirical check of the analytic 1-(1-s^r)^b recall curve an LSH
    deployment runs before trusting the banding at corpus scale.
    Single integer-exact row; sketching + banding + verify all
    reproduced by the SQL twin."""
    from frontera_ray.stages.dedup import lsh_banding_eval

    return lsh_banding_eval(_read(sf_dir, "documents"), limit_ids=200,
                            threshold_pct=50).to_pandas()


def q_assortativity(sf_dir: str):
    """Degree-assortativity moment sums (pagerank.assortativity_sums;
    Newman 2002) of the supplier co-purchase graph — do hubs link to
    hubs (r > 0, community-forming) or to leaves (r < 0,
    hub-and-spoke)? ALL-INTEGER (m_pairs, s1, sxx, sxy) so the operator
    hash-checks; r = (m·sxy − s1²)/(m·sxx − s1²) is one division away.
    Broadcast-bitset adjacency + node-range fan-out, one 4-register
    partial per block, no shuffle."""
    from frontera_ray.stages.pagerank import assortativity_sums

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    return assortativity_sums(edges, n_nodes).to_pandas()


def q_posting_bytes(sf_dir: str):
    """Inverted-index size planning (text.posting_sizes): per token
    (df >= 10), the exact delta+varint posting-list byte count (7-bit
    varint over doc-id gaps, the classic index compression layout) —
    the storage estimate a retrieval-index build prices before
    committing. Vectorized explode + ONE token exchange + vectorized
    gap/byte math; vocabulary-scale output."""
    from frontera_ray.stages.text import posting_sizes

    docs = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = pa.concat_tables(list(
        posting_sizes(docs, min_df=10).iter_batches(
            batch_format="pyarrow", batch_size=None))).to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def q_group_trend(sf_dir: str):
    """Per-user OLS value trend (relational.grouped_ols_trend): exact
    integer numerator/denominator of the least-squares slope of event
    value (cents) over time (hour index) — the per-host drift signal a
    revisit scorer consumes (is this host's yield rising or falling).
    One combiner aggregate over five integer registers per key."""
    from frontera_ray.stages.relational import grouped_ols_trend

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "value"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "t": pa.array(b["ts"].cast(pa.int64()).to_numpy()
                            // 3_600_000_000, pa.int64()),
              "y": pa.array(np.floor(
                  b["value"].to_numpy() * 100 + 0.5).astype(np.int64),
                  pa.int64()),
          }), batch_format="pyarrow"))
    return grouped_ols_trend(ev, "user_id", "t", "y")


def q_neg_samples(sf_dir: str):
    """Deterministic negative sampling for contrastive training pairs:
    each document draws 3 pseudo-random negatives via md5(doc_id ':' j)
    mod N (self-collisions step to the next id) — reproducible across
    retries/re-runs with NO RNG state, the same purity argument as
    `hash_split`/`doc_sample`. One vectorized streaming pass."""
    import pandas as pd

    from frontera_ray.fingerprint import md5_hex_batch

    n_docs = int(_read(sf_dir, "documents").count())

    def negs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        rep = np.repeat(ids, 3)
        js = np.tile(np.array([1, 2, 3], np.int64), len(ids))
        h = md5_hex_batch([f"{d}:{j}" for d, j in zip(rep, js)])
        neg = np.array([int(x[:8], 16) for x in h], np.int64) % n_docs
        neg = np.where(neg == rep, (neg + 1) % n_docs, neg)
        return pa.table({"doc_id": pa.array(rep, pa.int64()),
                         "j": pa.array(js, pa.int64()),
                         "neg_id": pa.array(neg, pa.int64())})

    out = pa.concat_tables(list(
        _read(sf_dir, "documents").select_columns(["doc_id"])
        .map_batches(negs, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))) \
        .to_pandas()
    return out.sort_values(["doc_id", "j"]).reset_index(drop=True)


def q_interleave(sf_dir: str):
    """Balanced source interleaving: assign each document the global
    training-shard position that round-robins sources (pos orders by
    (within-source rank, source)) — the mixing order a multi-corpus
    training run feeds the data loader so no source clusters. One
    keyed exchange for within-source ranks + the distributed
    prefix-sum row numbering (`relational.global_row_ids`)."""
    import ray

    from frontera_ray.stages.relational import (global_row_ids,
                                                keyed_exchange)

    docs = _read(sf_dir, "documents").select_columns(
        ["doc_id", "source"])
    srcs = sorted({s for t in docs.select_columns(["source"])
                   .iter_batches(batch_format="pyarrow",
                                 batch_size=None)
                   for s in t["source"].to_pylist()})
    lex = {s: i for i, s in enumerate(srcs)}
    lex_ref = ray.put(lex)
    cache: dict = {}

    def rank_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "skey": pa.array([], pa.int64())})
        if "l" not in cache:
            cache["l"] = ray.get(lex_ref)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, src))
        s_s, i_s = src[order], ids[order]
        new_run = np.concatenate(([True], s_s[1:] != s_s[:-1]))
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        rank = np.arange(len(i_s)) - starts[run_id] + 1
        lexidx = np.array([cache["l"][s] for s in s_s], np.int64)
        return pa.table({
            "doc_id": pa.array(i_s, pa.int64()),
            "skey": pa.array(rank * 1024 + lexidx, pa.int64())})

    ranked = keyed_exchange(docs, "source", rank_block, "groups")
    out = pa.concat_tables(list(
        global_row_ids(ranked, "skey").iter_batches(
            batch_format="pyarrow", batch_size=None))).to_pandas()
    out = out[["doc_id", "row_id"]].rename(columns={"row_id": "pos"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_coverage_curve(sf_dir: str):
    """Vocabulary coverage curve: the corpus-token share covered by the
    top-k tokens (k = 10/50/100, ppm-exact) — the tokenizer/vocab
    sizing read (how much of the stream does a small vocab explain).
    Token counts via explode + hash-shuffle groupby; top-k via
    per-block partials; one register pass for the total."""
    import pandas as pd
    import pyarrow.compute as _pc

    from frontera_ray.stages.relational import global_topk

    def explode(batch: pa.Table) -> pa.Table:
        toks = _pc.utf8_split_whitespace(batch["text"])
        flat = _pc.list_flatten(toks)
        t = pa.table({"token": flat})
        return t.filter(_pc.not_equal(t["token"], ""))

    exploded = _read(sf_dir, "documents").select_columns(["text"]) \
        .map_batches(explode, batch_format="pyarrow")
    total = int(exploded.count())
    tc = exploded.groupby("token").count()
    top = global_topk(tc, "count()", 100, descending=True,
                      tiebreak="token").to_pandas()
    counts = top["count()"].to_numpy().astype(np.int64)
    rows = [{"k": k, "covered_ppm":
             (1_000_000 * int(counts[:k].sum())) // total}
            for k in (10, 50, 100)]
    return pd.DataFrame(rows).astype("int64")


def q_seq_3grams(sf_dir: str):
    """Per-user event-type 3-gram counts — sequence-pattern mining one
    order deeper than the `event_transitions` Markov matrix (the
    behavior-model / funnel-template miner). One keyed exchange on the
    user; the kernel emits only (s1>s2>s3, n) partials per block, so
    the exchange output is pattern-vocabulary-scale (|types|³ <= 125
    here); driver folds a Counter."""
    import pandas as pd

    from frontera_ray.stages.relational import keyed_exchange

    def triples(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"pat": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u = batch["user_id"].to_numpy()
        ts = batch["ts_us"].to_numpy()
        eid = batch["event_id"].to_numpy()
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u_s, e_s = u[order], et[order]
        ok = np.zeros(max(len(u_s) - 2, 0), dtype=bool)
        if len(ok):
            ok = (u_s[:-2] == u_s[1:-1]) & (u_s[1:-1] == u_s[2:])
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            return pa.table({"pat": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pats = np.array([f"{e_s[i]}>{e_s[i + 1]}>{e_s[i + 2]}"
                         for i in idx], dtype=object)
        up, cn = np.unique(pats, return_counts=True)
        return pa.table({"pat": pa.array(up.tolist(), pa.string()),
                         "n": pa.array(cn.astype(np.int64), pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_type", "event_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_type": b["event_type"],
              "event_id": b["event_id"],
          }), batch_format="pyarrow"))
    from collections import Counter
    acc: Counter = Counter()
    for t in keyed_exchange(ev, "user_id", triples, "groups") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for p, n in zip(t["pat"].to_pylist(), t["n"].to_pylist()):
            acc[p] += int(n)
    return pd.DataFrame(
        [{"pat": p, "n": int(n)} for p, n in sorted(acc.items())],
        columns=["pat", "n"])


def q_politeness_audit(sf_dir: str):
    """Politeness-compliance audit over the fetch log: per user
    (stand-in for per host), the minimum inter-arrival gap and the
    count of gaps under the 5-minute politeness floor — the batch
    check a crawl operator runs against the frontier's
    per-host-delay guarantee (reference frontera's DELAY/crawl-delay
    budget, verified after the fact). Reuses the LAG-delta window
    machinery + one combiner aggregate."""
    from frontera_ray.stages.relational import (partial_groupby_agg,
                                                per_key_lag_delta)

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_id": b["event_id"],
          }), batch_format="pyarrow"))
    lag = per_key_lag_delta(ev, "user_id", "ts_us",
                            out_col="delta_us", tiebreak="event_id")

    def derive(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["delta_us"]))
        dv = t["delta_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "gap": pa.array(dv, pa.int64()),
            "viol": pa.array((dv < 300_000_000).astype(np.int64),
                             pa.int64())})

    g = partial_groupby_agg(
        lag.map_batches(derive, batch_format="pyarrow"), "user_id",
        {"min_gap_us": ("gap", "min"), "n_violations": ("viol", "sum"),
         "n_gaps": ("gap", "count")})
    for c in ("min_gap_us", "n_violations", "n_gaps"):
        g[c] = g[c].astype("int64")
    return g.sort_values("user_id").reset_index(drop=True)


def q_dedup_by_source(sf_dir: str):
    """Per-source near-dup rate: which provider ships duplicates — the
    grouped version of `dedup_inflation` a curation team acts on
    (drop or down-weight the dirty source). Pairs -> pair-scoped
    union-find -> broadcast membership; ONE streaming pass folds
    per-source (docs, dups) registers; dup_ppm integer-exact."""
    import pandas as pd
    import ray

    from frontera_ray.stages.dedup import dedup_keepers, minhash_neardup_pairs

    ds = _read(sf_dir, "documents")
    pairs = minhash_neardup_pairs(ds, threshold=0.5)
    comp = dedup_keepers(None, zip(pairs["a"].to_pylist(),
                                   pairs["b"].to_pylist()))
    dup_ids = np.fromiter(
        (i for i, kp in comp.items() if kp != i), dtype=np.int64)
    dup_ids.sort()
    ref = ray.put(dup_ids)
    cache: dict = {}

    def fold(batch: pa.Table) -> pa.Table:
        if "d" not in cache:
            cache["d"] = ray.get(ref)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        dup = np.isin(ids, cache["d"]).astype(np.int64)
        return pa.table({
            "source": batch["source"],
            "one": pa.array(np.ones(len(ids), np.int64), pa.int64()),
            "dup": pa.array(dup, pa.int64())})

    from frontera_ray.stages.relational import partial_groupby_agg
    g = partial_groupby_agg(
        ds.select_columns(["doc_id", "source"])
        .map_batches(fold, batch_format="pyarrow"), "source",
        {"n_docs": ("one", "sum"), "n_dups": ("dup", "sum")})
    g["n_docs"] = g["n_docs"].astype("int64")
    g["n_dups"] = g["n_dups"].astype("int64")
    g["dup_ppm"] = (1_000_000 * g["n_dups"]) // g["n_docs"]
    return g.sort_values("source").reset_index(drop=True)


def q_rfm_features(sf_dir: str):
    """RFM feature engineering (recency / frequency / monetary — the
    classic behavioral feature triple a ranking or churn model trains
    on): per user, microseconds since last event (against the corpus
    max timestamp), event count, and integer-cents total value. One
    combiner aggregate over three registers + a global max register;
    all-integer."""
    from frontera_ray.stages.relational import partial_groupby_agg

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "value"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
              "cents": pa.array(np.floor(
                  b["value"].to_numpy() * 100 + 0.5).astype(np.int64),
                  pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, "user_id",
                            {"last_ts": ("ts_us", "max"),
                             "frequency": ("one", "sum"),
                             "monetary_cents": ("cents", "sum")})
    now = int(g["last_ts"].max())
    g["recency_us"] = (now - g["last_ts"]).astype("int64")
    g["frequency"] = g["frequency"].astype("int64")
    g["monetary_cents"] = g["monetary_cents"].astype("int64")
    out = g[["user_id", "recency_us", "frequency", "monetary_cents"]]
    return out.sort_values("user_id").reset_index(drop=True)


def q_split_leakage(sf_dir: str):
    """Train/test split LEAKAGE audit at NEAR-DUP granularity: minhash
    near-dup pairs (Jaccard >= 0.5) whose two members land on opposite
    sides of the deterministic 90/10 hash split — a train-side
    near-copy of a test doc inflates eval, so this list must be empty
    (or acted on) before training. The pair stream is result-scale;
    the split side is a pure hash function of the id (`hash_split`'s
    ladder), so the audit is one vectorized pass over the pairs —
    the corpus never moves twice."""
    import pandas as pd

    from frontera_ray.stages.dedup import minhash_neardup_pairs
    from frontera_ray.stages.sampling import hash_u32

    pairs = minhash_neardup_pairs(_read(sf_dir, "documents"),
                                  threshold=0.5)
    a = pairs["a"].to_numpy().astype(np.int64)
    b = pairs["b"].to_numpy().astype(np.int64)
    CUT = 3865470566  # 90% of 2^32; 1 = test
    sa = (hash_u32(a, salt="split") >= CUT).astype(np.int64)
    sb = (hash_u32(b, salt="split") >= CUT).astype(np.int64)
    cross = sa != sb
    out = pd.DataFrame({
        "a": a[cross], "b": b[cross],
        "side_a": sa[cross], "side_b": sb[cross]}).astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_wow_change(sf_dir: str):
    """Week-over-week traffic drift per user (host stand-in): weekly
    event counts, the previous week's count (LAG) and the integer-ppm
    change — the per-host yield-drift alarm an operations review reads
    (pairs with `group_trend`'s slope). Weekly counts are one combiner
    aggregate on the packed (user, week) key; the LAG rides the
    existing keyed-exchange delta machinery."""
    from frontera_ray.stages.relational import (keyed_exchange,
                                                partial_groupby_agg)

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "week": pa.array(b["ts"].cast(pa.int64()).to_numpy()
                               // 604_800_000_000, pa.int64()),
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, ["user_id", "week"],
                            {"n": ("one", "sum")})
    import ray
    wk = ray.data.from_pandas(g)

    def lag_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "week": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "prev_n": pa.array([], pa.int64()),
                          "change_ppm": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        u = batch["user_id"].to_numpy()
        w = batch["week"].to_numpy()
        n = batch["n"].to_numpy().astype(np.int64)
        order = np.lexsort((w, u))
        u_s, w_s, n_s = u[order], w[order], n[order]
        new_run = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        prev = np.empty(len(n_s), np.int64)
        prev[1:] = n_s[:-1]
        # previous WEEK must be consecutive; gaps or run starts get -1
        consec = np.zeros(len(n_s), dtype=bool)
        consec[1:] = (~new_run[1:]) & (w_s[1:] == w_s[:-1] + 1)
        prev[~consec] = -1
        keep = consec
        num = 1_000_000 * (n_s[keep] - prev[keep])
        den = prev[keep]
        # DuckDB's // truncates toward zero; numpy floors — align by
        # bumping negative inexact quotients up one
        chg = num // den
        chg[(num % den != 0) & (num < 0)] += 1
        return pa.table({
            "user_id": pa.array(u_s[keep], pa.int64()),
            "week": pa.array(w_s[keep], pa.int64()),
            "n": pa.array(n_s[keep], pa.int64()),
            "prev_n": pa.array(prev[keep], pa.int64()),
            "change_ppm": pa.array(chg, pa.int64())})

    out = pa.concat_tables(list(
        keyed_exchange(wk, "user_id", lag_block, _choose_exchange("tasks"))
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return out.to_pandas().sort_values(["user_id", "week"]) \
        .reset_index(drop=True)


def q_fd_audit(sf_dir: str):
    """Functional-dependency data-quality audit: does customer ->
    market segment hold per nation, i.e. for each (c_nationkey,
    c_mktsegment) candidate FD c_custkey%100 -> c_mktsegment, report
    keys with more than one distinct dependent — the schema-inference
    / data-contract check a pipeline runs before trusting a column as
    an attribute of a key. One composite-key count-distinct
    (grouped_count_distinct's combiner shape), violation-scale
    output (key, n_distinct)."""
    from frontera_ray.stages.relational import partial_groupby_agg

    cust = (_read(sf_dir, "customer")
            .select_columns(["c_custkey", "c_mktsegment"])
            .map_batches(lambda b: pa.table({
                "key": pa.array(b["c_custkey"].to_numpy() % 100,
                                pa.int64()),
                "seg": b["c_mktsegment"],
            }), batch_format="pyarrow"))
    # per-block distinct (key, seg) pairs, then per-key distinct count
    g = partial_groupby_agg(
        cust.map_batches(lambda b: pa.table({
            "key": b["key"], "seg": b["seg"],
            "one": pa.array(np.ones(len(b), np.int64), pa.int64())}),
            batch_format="pyarrow"),
        ["key", "seg"], {"n": ("one", "sum")})
    counts = g.groupby("key").size().reset_index(name="n_distinct")
    counts["n_distinct"] = counts["n_distinct"].astype("int64")
    out = counts[counts["n_distinct"] > 1]
    return out.sort_values("key").reset_index(drop=True)


def q_ri_audit(sf_dir: str):
    """Referential-integrity audit: lineitems whose l_orderkey has no
    parent order, and orders with no lineitems — the two-sided
    orphan/childless census a lakehouse contract check runs between
    fact tables. ONE tagged-union keyed exchange (the semi/anti-join
    shape); the kernel reduces each key run to its (has_parent,
    has_child) bits, so the exchange output is two counter registers."""
    import pandas as pd

    from frontera_ray.stages.relational import keyed_exchange

    li = _read(sf_dir, "lineitem").select_columns(["l_orderkey"]) \
        .map_batches(lambda b: pa.table({
            "k": b["l_orderkey"],
            "side": pa.array(np.zeros(len(b), np.int64), pa.int64()),
        }), batch_format="pyarrow")
    orders = _read(sf_dir, "orders").select_columns(["o_orderkey"]) \
        .map_batches(lambda b: pa.table({
            "k": b["o_orderkey"],
            "side": pa.array(np.ones(len(b), np.int64), pa.int64()),
        }), batch_format="pyarrow")

    def audit_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "orphan_lineitems": pa.array([], pa.int64()),
                "childless_orders": pa.array([], pa.int64())})
        k = batch["k"].to_numpy()
        side = batch["side"].to_numpy()
        order = np.argsort(k, kind="stable")
        k_s, s_s = k[order], side[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k_s[1:] != k_s[:-1])))
        ends = np.append(starts[1:], len(k_s))
        run_id = np.cumsum(
            np.concatenate(([True], k_s[1:] != k_s[:-1]))) - 1
        has_order = np.bincount(run_id, weights=(s_s == 1),
                                minlength=len(starts)) > 0
        n_li = np.bincount(run_id, weights=(s_s == 0),
                           minlength=len(starts)).astype(np.int64)
        orphan = int(n_li[~has_order].sum())
        childless = int(((n_li == 0) & has_order).sum())
        return pa.table({
            "orphan_lineitems": pa.array([orphan], pa.int64()),
            "childless_orders": pa.array([childless], pa.int64())})

    from frontera_ray.stages.relational import cluster_cpus

    tot = np.zeros(2, np.int64)
    # ~150k order keys: the groups path pays a map_groups call per key
    # (10.7 s measured at sf0.1/32); the kernel is run-aware, so a
    # parallel exchange drops in (tasks 0.52 s vs hash 1.74 s measured)
    for t in keyed_exchange(li.union(orders), "k", audit_block,
                            _choose_exchange("tasks")) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t):
            tot += np.array([int(t["orphan_lineitems"].to_numpy().sum()),
                             int(t["childless_orders"].to_numpy().sum())],
                            np.int64)
    return pd.DataFrame([{"orphan_lineitems": tot[0],
                          "childless_orders": tot[1]}]).astype("int64")


def q_quota_sample(sf_dir: str):
    """Deterministic QUOTA sampling: exactly 10 documents per language
    stratum, chosen by smallest md5('q'||doc_id) — the balanced
    eval-set constructor (equal representation regardless of stratum
    size), reproducible with no RNG state (`hash_split`'s purity
    argument). One keyed exchange through the per_key_topk machinery,
    hash ascending."""
    from frontera_ray.stages.relational import per_key_topk
    from frontera_ray.stages.sampling import hash_u32

    docs = (_read(sf_dir, "documents")
            .select_columns(["doc_id", "lang"])
            .map_batches(lambda b: pa.table({
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "h": pa.array(hash_u32(
                    b["doc_id"].to_numpy().astype(np.int64),
                    salt="q").astype(np.int64), pa.int64()),
            }), batch_format="pyarrow"))
    kept = per_key_topk(docs, "lang", "h", 10, descending=False,
                        tiebreak="doc_id")
    out = kept.to_pandas()[["lang", "doc_id"]]
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def q_diverse_sample(sf_dir: str):
    """Diversity-aware sampling: cluster the embedding space against
    the deterministic k-means seed centroids (vec_id < 8, the
    `kmeans`/`proto_prune` recurrence at assignment step 1), then keep
    5 vectors per cluster by smallest md5('div'||vec_id) — the
    cluster-then-sample recipe that keeps coverage of the embedding
    space instead of oversampling the dense core (SemDeDup-adjacent
    curation). Broadcast 8x64 centroid matrix, per-block vectorized
    rounded-distance argmin, per-cluster hash quota."""
    import ray

    from frontera_ray.stages.ann import _matrix, _query_rows
    from frontera_ray.stages.relational import per_key_topk
    from frontera_ray.stages.sampling import hash_u32

    ds = _read(sf_dir, "embeddings")
    _qids, C = _query_rows(ds, list(range(8)))
    C = C.astype(np.float64)  # vec_id-ascending rows
    c_ref = ray.put(C)
    cache: dict = {}

    def assign(batch: pa.Table) -> pa.Table:
        if "c" not in cache:
            cache["c"] = ray.get(c_ref)
        X = _matrix(batch).astype(np.float64)
        d2 = ((X[:, None, :] - cache["c"][None, :, :]) ** 2).sum(axis=2)
        d2 = np.round(d2, 9)  # pre-argmin rounding, both sides
        cl = np.argmin(d2, axis=1).astype(np.int64)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        return pa.table({
            "cluster": pa.array(cl, pa.int64()),
            "vec_id": pa.array(ids, pa.int64()),
            "h": pa.array(hash_u32(ids, salt="div").astype(np.int64),
                          pa.int64())})

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    kept = per_key_topk(assigned, "cluster", "h", 5, descending=False,
                        tiebreak="vec_id")
    out = kept.to_pandas()[["cluster", "vec_id"]]
    return out.sort_values(["cluster", "vec_id"]).reset_index(drop=True)


def q_markov_probs(sf_dir: str):
    """Markov conditional-probability table: the `event_transitions`
    counts row-normalized to integer ppm (P(next | prev)) — the
    behavior model actually consumed downstream (transitions are the
    sufficient statistic; this is the estimator). One keyed exchange
    for the counts; normalization folds over the tiny (|types|²) pair
    vocabulary."""
    from frontera_ray.stages.relational import transition_counts

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_type", "event_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_type": b["event_type"],
              "event_id": b["event_id"],
          }), batch_format="pyarrow"))
    out = transition_counts(ev, "user_id", "ts_us", "event_type",
                            tiebreak="event_id")
    tot = out.groupby("from_val")["n"].transform("sum")
    out["p_ppm"] = ((1_000_000 * out["n"]) // tot).astype("int64")
    return out.sort_values(["from_val", "to_val"]).reset_index(drop=True)


def q_langid_margin(sf_dir: str):
    """Language-ID confidence margin per doc: the top-1 and top-2
    stopword-vote counts and their gap — the mixed-language /
    low-confidence detector layered on `langid` (margin 0 = ambiguous,
    route to review or drop). One vectorized pass (the same RE2 count
    stack as langid), all-integer."""
    from frontera_ray.stages.text import LANG_PATTERNS

    def margins(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch["text"])
        counts = np.stack([
            pc.count_substring_regex(lower, pat).to_numpy()
            for _, pat in LANG_PATTERNS]).astype(np.int64)
        part = np.sort(counts, axis=0)
        c1, c2 = part[-1], part[-2]
        return pa.table({
            "doc_id": batch["doc_id"],
            "c_top1": pa.array(c1, pa.int64()),
            "c_top2": pa.array(c2, pa.int64()),
            "margin": pa.array(c1 - c2, pa.int64())})

    out = pa.concat_tables(list(
        _read(sf_dir, "documents").select_columns(["doc_id", "text"])
        .map_batches(margins, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_diameter_est(sf_dir: str):
    """Graph diameter lower bound via the double-BFS sweep (the
    standard iFUB-style estimate): BFS from the smallest present node,
    take the farthest node (max level, tiebreak min id), BFS again
    from it — the second eccentricity bounds the diameter. Two
    `pagerank.bfs_levels` passes (streaming edge sweeps against packed
    frontier bitsets, no shuffle) over the supplier co-purchase
    graph."""
    import pandas as pd

    from frontera_ray.stages.pagerank import bfs_levels

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    edges = edges.materialize()
    # seed = smallest node present in the edge set
    lo = n_nodes
    for t in edges.iter_batches(batch_format="pyarrow",
                                batch_size=None):
        if len(t):
            lo = min(lo, int(t["src"].to_numpy().min()),
                     int(t["dst"].to_numpy().min()))
    b1 = bfs_levels(edges, n_nodes, [lo], max_depth=32).to_pandas()
    far1 = b1.sort_values(["lvl", "node"],
                          ascending=[False, True]).iloc[0]
    b2 = bfs_levels(edges, n_nodes, [int(far1.node)],
                    max_depth=32).to_pandas()
    far2 = b2.sort_values(["lvl", "node"],
                          ascending=[False, True]).iloc[0]
    return pd.DataFrame([{
        "start": np.int64(lo),
        "far_node": np.int64(far1.node),
        "ecc": np.int64(far2.lvl),
        "far_node2": np.int64(far2.node)}])


def q_lsh_s_curve(sf_dir: str):
    """Empirical LSH S-curve (dedup.lsh_s_curve): per Jaccard decile
    (gram-sharing pairs over the doc_id<200 slice), the ppm of pairs
    the 16x4 banding proposes — the measured 1-(1-s^r)^b collision
    curve, the diagnostic that picks (bands, rows) before a
    corpus-scale dedup run."""
    from frontera_ray.stages.dedup import lsh_s_curve

    return lsh_s_curve(_read(sf_dir, "documents"),
                       limit_ids=200).to_pandas()




def _event_score_label(sf_dir: str):
    """Shared derive for the ML-eval queries: the event value in exact
    cents as the 'model score' and event_type == 'purchase' as the
    binary label (a deterministic stand-in for any learned gate's
    score/label pair — the eval machinery is the operator)."""
    return (_read(sf_dir, "events")
            .select_columns(["event_type", "value"])
            .map_batches(lambda b: pa.table({
                "score_c": pa.array(np.floor(
                    b["value"].to_numpy() * 100 + 0.5).astype(np.int64),
                    pa.int64()),
                "lab": pa.array(
                    pc.equal(b["event_type"], "purchase").to_numpy(
                        zero_copy_only=False).astype(np.int64),
                    pa.int64()),
            }), batch_format="pyarrow"))


def q_auc_roc(sf_dir: str):
    """EXACT ROC AUC (relational.roc_auc_binary) of the event value as
    a predictor of the 'purchase' label — the threshold-free
    ranking-quality number any learned filter (quality classifier,
    near-dup scorer) reports before its threshold is chosen.
    Mann-Whitney rank identity with midrank ties, ALL-INTEGER
    (auc_num2 / auc_den2 = 2PN), so the whole statistic hash-checks.
    One value-count register pass (the ks_2sample partial-combine
    shape): the corpus never moves, only the bounded cents domain."""
    from frontera_ray.stages.relational import roc_auc_binary

    return roc_auc_binary(_event_score_label(sf_dir),
                          "score_c", "lab").to_pandas()


def _event_conf_label(sf_dir: str):
    """Confidence in integer percent-cents [0,100]: cents/500 rounded
    (value spans ~[0,500]) — the deterministic 'predicted probability'
    column the calibration queries bin."""
    return _event_score_label(sf_dir).map_batches(
        lambda b: pa.table({
            "conf_c": pa.array(np.minimum(
                (b["score_c"].to_numpy() + 250) // 500, 100), pa.int64()),
            "lab": b["lab"],
        }), batch_format="pyarrow")


def q_calibration_bins(sf_dir: str):
    """Reliability-diagram table (relational.calibration_table): 10
    confidence bins x (n, positives, exact confidence sum, acc_ppm,
    conf_ppm) — the is-the-model-calibrated read run on every learned
    gate before its scores are trusted as probabilities. One combiner
    aggregate over the bounded bin space; every column integer."""
    from frontera_ray.stages.relational import calibration_table

    return calibration_table(_event_conf_label(sf_dir), "conf_c", "lab",
                             n_bins=10, conf_max=100)


def q_ece(sf_dir: str):
    """Expected Calibration Error, INTEGER-EXACT: because
    |acc_b − conf_b| = |100·pos_b − conf_sum_b| / (100·n_b), the
    n_b/N-weighted sum telescopes to ece_num = Σ_b |100·pos_b −
    conf_sum_b| over ece_den = 100·N — no per-bin division, so the
    one-number calibration summary hash-checks exactly. Folds the
    `calibration_bins` combiner output (bin-scale) on the driver."""
    import pandas as pd

    from frontera_ray.stages.relational import calibration_table

    bins = calibration_table(_event_conf_label(sf_dir), "conf_c", "lab",
                             n_bins=10, conf_max=100)
    num = int(np.abs(100 * bins["n_pos"].to_numpy().astype(np.int64)
                     - bins["conf_sum_c"].to_numpy().astype(
                         np.int64)).sum())
    n_total = int(bins["n"].to_numpy().sum())
    den = 100 * n_total
    return pd.DataFrame([{
        "n_total": n_total, "ece_num": num, "ece_den": den,
        "ece_micro": (1_000_000 * num) // den if den else 0,
    }]).astype("int64")


def q_cusum_change(sf_dir: str):
    """Per-user CUSUM changepoint magnitude
    (relational.per_key_cusum): max_i |n·prefix_i − i·total| over each
    user's time-ordered value series (exact cents) — flags a mid-series
    level shift (the per-host yield-drop detector beside
    `group_trend`'s monotone slope; Page 1954's cumulative-sum test
    kept integral). ONE keyed exchange, run-aware vectorized kernel
    (cumsum + reduceat per run)."""
    from frontera_ray.stages.relational import per_key_cusum

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_id", "value"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts": b["ts"],
              "event_id": b["event_id"],
              "v": pa.array(np.floor(
                  b["value"].to_numpy() * 100 + 0.5).astype(np.int64),
                  pa.int64()),
          }), batch_format="pyarrow"))
    out = per_key_cusum(ev, "user_id", "ts", "v",
                        tiebreak="event_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


_NDCG_DISC = np.array([1000000, 630930, 500000, 430677, 386853,
                       356207, 333333, 315465, 301030, 289065],
                      dtype=np.int64)
_NDCG_DISC_SQL = ("CASE rk WHEN 1 THEN 1000000 WHEN 2 THEN 630930 "
                  "WHEN 3 THEN 500000 WHEN 4 THEN 430677 "
                  "WHEN 5 THEN 386853 WHEN 6 THEN 356207 "
                  "WHEN 7 THEN 333333 WHEN 8 THEN 315465 "
                  "WHEN 9 THEN 301030 WHEN 10 THEN 289065 END")


def _doc_rank_rel(sf_dir: str):
    """Shared derive for the ranking-eval queries: per doc its language
    (the 'query' group), punctuation count (the 'model score' ranking
    key — deliberately independent of the relevance label) and a
    graded length relevance (2: n_chars>=450, 1: >=300, else 0 —
    thresholds at the corpus ~p90/~median so every grade is
    populated at all scale factors)."""

    def derive(b: pa.Table) -> pa.Table:
        n_chars = b["n_chars"].to_numpy()
        rel = np.where(n_chars >= 450, 2,
                       np.where(n_chars >= 300, 1, 0)).astype(np.int64)
        n_punct = pc.count_substring_regex(
            b["text"], "[.!,;:?]").to_numpy().astype(np.int64)
        return pa.table({"lang": b["lang"], "doc_id": b["doc_id"],
                         "n_punct": pa.array(n_punct, pa.int64()),
                         "rel": pa.array(rel, pa.int64())})

    return (_read(sf_dir, "documents")
            .select_columns(["doc_id", "lang", "n_chars", "text"])
            .map_batches(derive, batch_format="pyarrow"))


def q_ndcg10(sf_dir: str):
    """NDCG@10 per language group — the graded ranking-quality eval
    (Järvelin & Kekäläinen 2002) of the punctuation 'model score'
    against length relevance. Discount weights are PINNED integer
    micro-constants (floor(10^6/log2(r+1)+0.5) for r=1..10, identical
    literals in the SQL twin), so DCG, ideal DCG and the final ppm
    ratio are integer-exact end to end. Distributed shape: ONE keyed
    exchange for the per-group top-10 (relational.per_key_rank) plus
    one combiner aggregate for the per-group relevance counts (the
    ideal list needs only how many rel-2 / rel-1 docs exist); the
    driver folds group-count-scale rows."""
    import pandas as pd

    from frontera_ray.stages.relational import (partial_groupby_agg,
                                                per_key_rank)

    ds = _doc_rank_rel(sf_dir)
    ranked = pa.concat_tables(list(
        per_key_rank(ds, "lang", "n_punct", k=10, descending=True,
                     tiebreak="doc_id", rank_col="rk")
        .iter_batches(batch_format="pyarrow", batch_size=None)))         .to_pandas()
    counts = partial_groupby_agg(
        ds.map_batches(lambda b: pa.table({
            "lang": b["lang"],
            "r2": pa.array((b["rel"].to_numpy() == 2).astype(np.int64)),
            "r1": pa.array((b["rel"].to_numpy() == 1).astype(np.int64)),
        }), batch_format="pyarrow"),
        "lang", {"n2": ("r2", "sum"), "n1": ("r1", "sum")})
    dcg = (ranked.assign(
        w=lambda d: d["rel"].to_numpy()
        * _NDCG_DISC[d["rk"].to_numpy() - 1])
        .groupby("lang", as_index=False)["w"].sum()
        .rename(columns={"w": "dcg_micro"}))
    rows = []
    for _, row in counts.iterrows():
        n2, n1 = int(row["n2"]), int(row["n1"])
        ideal = ([2] * min(n2, 10) + [1] * max(0, min(n1, 10 - n2)))[:10]
        idcg = int(sum(r * int(_NDCG_DISC[i])
                       for i, r in enumerate(ideal)))
        rows.append({"lang": row["lang"], "idcg_micro": idcg})
    out = dcg.merge(pd.DataFrame(rows), on="lang", how="outer")
    out["dcg_micro"] = out["dcg_micro"].fillna(0).astype("int64")
    out["idcg_micro"] = out["idcg_micro"].fillna(0).astype("int64")
    idcg = out["idcg_micro"].to_numpy()
    dcgv = out["dcg_micro"].to_numpy()
    out["ndcg_ppm"] = np.where(
        idcg > 0, (1_000_000 * dcgv) // np.maximum(idcg, 1), 0)         .astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q_mrr(sf_dir: str):
    """Mean-reciprocal-rank inputs per language group: the rank of the
    FIRST highly-relevant doc (rel=2, n_chars>=450) under the punctuation ranking,
    and rr_micro = 10^6 // rank — the did-the-ranker-surface-anything
    eval beside `ndcg10`'s graded gain. Two bounded passes, no global
    sort: (1) per-group best relevant row (per_key_topk k=1 on the
    relevant slice); (2) a combiner count of rows ranked strictly
    better than it (score desc, id asc) — rank = 1 + count. Groups
    with no relevant doc emit no row (same as the SQL twin)."""
    import pandas as pd

    from frontera_ray.stages.relational import (partial_groupby_agg,
                                                per_key_topk)

    ds = _doc_rank_rel(sf_dir)
    rel = ds.map_batches(
        lambda b: b.filter(pc.equal(b["rel"], 2)),
        batch_format="pyarrow")
    best = pa.concat_tables(list(
        per_key_topk(rel, "lang", "n_punct", k=1, descending=True,
                     tiebreak="doc_id")
        .iter_batches(batch_format="pyarrow", batch_size=None)))         .to_pandas()
    if len(best) == 0:
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "first_rank": pd.Series([], dtype="int64"),
                             "rr_micro": pd.Series([], dtype="int64")})
    tgt = {r["lang"]: (int(r["n_punct"]), int(r["doc_id"]))
           for _, r in best.iterrows()}

    def better(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_numpy(zero_copy_only=False)
        np_ = b["n_punct"].to_numpy()
        did = b["doc_id"].to_numpy()
        flags = np.zeros(len(b), np.int64)
        for lg, (p_star, d_star) in tgt.items():
            m = lang == lg
            flags[m] = ((np_[m] > p_star)
                        | ((np_[m] == p_star) & (did[m] < d_star)))                 .astype(np.int64)
        return pa.table({"lang": b["lang"],
                         "bet": pa.array(flags, pa.int64())})

    cnt = partial_groupby_agg(
        ds.map_batches(better, batch_format="pyarrow"),
        "lang", {"n_better": ("bet", "sum")})
    cnt = cnt[cnt["lang"].isin(tgt)]
    cnt["first_rank"] = cnt["n_better"].astype("int64") + 1
    cnt["rr_micro"] = (1_000_000 // cnt["first_rank"]).astype("int64")
    return cnt[["lang", "first_rank", "rr_micro"]]         .sort_values("lang").reset_index(drop=True)


def q_link_predict(sf_dir: str):
    """Per-edge link-prediction / embeddedness indices
    (pagerank.link_prediction_edges) over the supplier co-purchase
    graph: common-neighbor count, integer resource-allocation score
    (Σ 10^6 // deg(z), Zhou-Lü-Zhang 2009) and neighborhood-Jaccard
    ppm — the tie-strength features a spam/link-ring or
    recommendation model consumes. Bitset adjacency from ONE
    idempotent-OR pass, node-range fan-out against the broadcast
    bitset, vectorized popcount + weight matmul; ALL-INTEGER."""
    from frontera_ray.stages.pagerank import link_prediction_edges

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    out = link_prediction_edges(edges, n_nodes).to_pandas()
    return out.sort_values(["u", "v"]).reset_index(drop=True)


def q_bloom_sizing(sf_dir: str):
    """Bloom-filter capacity plan per corpus source — the sizing read
    the crawl's URL-seen shards (state/urlseen.py) run before
    allocation: for n keys at 1% FPR, m = ceil(n·ln(0.01)/ln(2)²)
    bits and k = round(m/n·ln 2) hashes, both via PINNED integer
    approximation constants (9.5851 bits/key and ln2·10^6 = 693147 —
    identical literals in the SQL twin, so the plan is exact BY
    CONSTRUCTION, no float libm parity risk). One combiner count per
    source + vectorized integer math."""
    from frontera_ray.stages.relational import partial_groupby_agg

    g = partial_groupby_agg(
        _read(sf_dir, "documents").select_columns(["source"])
        .map_batches(lambda b: b.append_column(
            "one", pa.array(np.ones(len(b), np.int64))),
            batch_format="pyarrow"),
        "source", {"n": ("one", "sum")})
    n = g["n"].to_numpy().astype(np.int64)
    m_bits = (n * 95851 + 9999) // 10000
    g["m_bits"] = m_bits
    g["k_hashes"] = np.maximum(
        1, (m_bits * 693147 + n * 500000) // (n * 1_000_000))
    g["n_bytes"] = (m_bits + 7) // 8
    return g.sort_values("source").reset_index(drop=True)


def q_shard_plan(sf_dir: str):
    """Hash-shard load plan: assign every event's user to one of 16
    shards by the repo's md5-top-32 hash (sampling.hash_u32 — the same
    pure-function-of-the-key contract as the crawl's host partitioner)
    and report per-shard rows, distinct keys and load_ppm =
    10^6·n_rows·16 // total — the skew read taken BEFORE committing a
    partitioning key (a shard far above 10^6 ppm says salt it). One
    vectorized hash pass; per-shard distinct keys via the dedup
    combiner (relational.grouped_count_distinct); counts are a
    combiner aggregate."""
    from frontera_ray.stages.relational import (grouped_count_distinct,
                                                partial_groupby_agg)
    from frontera_ray.stages.sampling import hash_u32

    def assign(b: pa.Table) -> pa.Table:
        h = hash_u32(b["user_id"].to_pylist())
        return pa.table({
            "shard": pa.array((h % 16).astype(np.int64), pa.int64()),
            "user_id": b["user_id"],
            "one": pa.array(np.ones(len(b), np.int64), pa.int64())})

    ds = _read(sf_dir, "events").select_columns(["user_id"])         .map_batches(assign, batch_format="pyarrow")
    rows = partial_groupby_agg(ds, "shard", {"n_rows": ("one", "sum")})
    keys = grouped_count_distinct(ds, "shard", "user_id",
                                  combine="driver")
    out = rows.merge(keys, on="shard")
    total = int(out["n_rows"].sum())
    out["n_keys"] = out["n_distinct"].astype("int64")
    out["load_ppm"] = (1_000_000 * out["n_rows"].astype("int64") * 16
                       ) // total
    return out[["shard", "n_rows", "n_keys", "load_ppm"]]         .sort_values("shard").reset_index(drop=True)




def q_two_hop_reach(sf_dir: str):
    """Exact 2-hop neighborhood size per supplier
    (pagerank.two_hop_reach): |{w != v : dist(v,w) <= 2}| — the
    neighborhood-expansion read beside degree (how fast influence
    spreads from this node; the radius-2 point ANF/HyperBall
    approximate at scale). Bitset adjacency from ONE idempotent-OR
    pass, node-range fan-out, per-node OR-reduction of neighbor rows +
    popcount; node-bounded output, ALL-INTEGER."""
    from frontera_ray.stages.pagerank import two_hop_reach

    edges, n_nodes = _supplier_copurchase_edges(sf_dir)
    out = two_hop_reach(edges, n_nodes).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_l_diversity(sf_dir: str):
    """l-diversity audit (Machanavajjhala et al. 2007 — the
    k-anonymity refinement): quasi-identifier groups (lang,
    n_chars//100) whose SENSITIVE attribute (source) takes fewer than
    l=3 distinct values — a group can be k-anonymous yet leak the
    sensitive value if all members share it. Per-block distinct-pair
    combiner (relational.grouped_count_distinct) + one combiner count
    over the bounded QI space; violation-scale output."""
    from frontera_ray.stages.relational import (grouped_count_distinct,
                                                partial_groupby_agg)

    ds = (_read(sf_dir, "documents")
          .select_columns(["lang", "source", "n_chars"])
          .map_batches(lambda b: pa.table({
              "qi": pc.binary_join_element_wise(
                  b["lang"],
                  pc.cast(pc.divide(b["n_chars"], 100), pa.string()),
                  "|"),
              "source": b["source"],
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    n = partial_groupby_agg(ds, "qi", {"n": ("one", "sum")})
    dv = grouped_count_distinct(ds, "qi", "source", combine="driver")
    out = n.merge(dv, on="qi")
    out["n"] = out["n"].astype("int64")
    out["n_sensitive"] = out["n_distinct"].astype("int64")
    out = out[out["n_sensitive"] < 3][["qi", "n", "n_sensitive"]]
    return out.sort_values("qi").reset_index(drop=True)


def q_ab_ztest(sf_dir: str):
    """Two-proportion z-test between user cohorts (A = even user_id,
    B = odd): does the 'purchase' conversion rate differ? The pooled
    z² statistic kept EXACT-RATIONAL —

        z² = (x_a·n_b − x_b·n_a)²·(n_a+n_b)
             / (n_a·n_b·x·(n_a+n_b−x)),  x = x_a + x_b

    — and reported as z2_ppm (10^6-scaled integer division; the
    intermediate products exceed int64 so the driver folds in Python
    bigints and the SQL twin in HUGEINT). Four integer registers via
    one combiner pass; the experiment-analysis primitive behind any
    A/B rollout decision (z² > 3.84 ≈ p < 0.05)."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_type"])
          .map_batches(lambda b: pa.table({
              "side": pa.array(b["user_id"].to_numpy() % 2, pa.int64()),
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
              "conv": pa.array(
                  pc.equal(b["event_type"], "purchase").to_numpy(
                      zero_copy_only=False).astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, "side", {"n": ("one", "sum"),
                                         "x": ("conv", "sum")})         .set_index("side")
    n_a, x_a = int(g.loc[0, "n"]), int(g.loc[0, "x"])
    n_b, x_b = int(g.loc[1, "n"]), int(g.loc[1, "x"])
    x = x_a + x_b
    num = (x_a * n_b - x_b * n_a) ** 2 * (n_a + n_b)
    den = n_a * n_b * x * (n_a + n_b - x)
    return pd.DataFrame([{
        "n_a": n_a, "x_a": x_a, "n_b": n_b, "x_b": x_b,
        "z2_ppm": (1_000_000 * num) // den if den else 0,
    }]).astype("int64")


def q_simpson_diversity(sf_dir: str):
    """Per-source Simpson concentration index, INTEGER-EXACT:
    simpson_ppm = 10^6·Σ_lang n_l(n_l−1) // (N(N−1)) — the probability
    two random docs from the source share a language (1/simpson =
    effective number of languages; the concentration twin of
    `host_entropy`'s Shannon read — which sources are monolingual
    enough to shortcut langid). One combiner aggregate over the
    bounded (source, lang) space, driver fold per source."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    ds = (_read(sf_dir, "documents")
          .select_columns(["source", "lang"])
          .map_batches(lambda b: b.append_column(
              "one", pa.array(np.ones(len(b), np.int64))),
              batch_format="pyarrow"))
    g = partial_groupby_agg(ds, ["source", "lang"],
                            {"n": ("one", "sum")})
    rows = []
    for source, grp in g.groupby("source"):
        n_l = grp["n"].to_numpy().astype(np.int64)
        n_tot = int(n_l.sum())
        num = int((n_l * (n_l - 1)).sum())
        den = n_tot * (n_tot - 1)
        rows.append({"source": source, "n": n_tot,
                     "simpson_ppm": (1_000_000 * num) // den
                     if den else 0})
    return pd.DataFrame(rows).sort_values("source")         .reset_index(drop=True)




def q_fano_factor(sf_dir: str):
    """Per-user inter-arrival burstiness registers: the Fano factor of
    the gap series (variance-to-mean, the quantitative burstiness read
    behind `politeness_audit`'s threshold count — a Poisson arrival
    process has F = 1, bursty traffic F >> 1) kept EXACT-RATIONAL:
    fano_num = n·Σg² − (Σg)², fano_den = n·Σg (F is one division away).
    Gaps are measured in WHOLE SECONDS (µs gaps square past int64 —
    and a politeness read doesn't care about sub-second jitter).
    Gaps via the LAG-delta keyed exchange
    (relational.per_key_lag_delta); registers via one combiner
    aggregate. Users with < 2 events (no gaps) emit no row."""
    from frontera_ray.stages.relational import (partial_groupby_agg,
                                                per_key_lag_delta)

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_id": b["event_id"],
          }), batch_format="pyarrow"))
    gaps = per_key_lag_delta(ev, "user_id", "ts_us", out_col="gap",
                             tiebreak="event_id")

    def regs(b: pa.Table) -> pa.Table:
        valid = pc.is_valid(b["gap"])
        uid = b["user_id"].filter(valid)
        g = b["gap"].drop_null().to_numpy().astype(np.int64) // 1_000_000
        return pa.table({"user_id": uid,
                         "one": pa.array(np.ones(len(g), np.int64),
                                         pa.int64()),
                         "g": pa.array(g, pa.int64()),
                         "gg": pa.array(g * g, pa.int64())})

    gaps = gaps.map_batches(regs, batch_format="pyarrow")
    out = partial_groupby_agg(gaps, "user_id",
                              {"n_gaps": ("one", "sum"),
                               "sg": ("g", "sum"),
                               "sgg": ("gg", "sum")})
    n = out["n_gaps"].to_numpy().astype(np.int64)
    sg = out["sg"].to_numpy().astype(np.int64)
    sgg = out["sgg"].to_numpy().astype(np.int64)
    out["fano_num"] = n * sgg - sg * sg
    out["fano_den"] = n * sg
    return out[["user_id", "n_gaps", "fano_num", "fano_den"]]         .sort_values("user_id").reset_index(drop=True)


def q_event_autocorr(sf_dir: str):
    """Lag-1 autocorrelation registers of each event type's DENSE
    hourly count series (zeros included between the type's first and
    last hour), EXACT-INTEGER: with S = Σc, A = Σc_t·c_{t+1},

        r1_num = n²·A − n·S·(2S − c_1 − c_n) + (n−1)·S²
        r1_den = n²·Σc² − n·S²

    (both sides of r1 = cov/var scaled by n² — r1 is one division
    away, and keeping the rational avoids the floor-vs-trunc signed
    division mismatch). The hour-resolution self-similarity /
    seasonality read a traffic forecaster starts from. One combiner
    aggregate over the bounded (type, hour) space; the dense grid and
    the lag products fold on the driver at series scale."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "ts"])
          .map_batches(lambda b: pa.table({
              "event_type": b["event_type"],
              "hour": pa.array(b["ts"].cast(pa.int64()).to_numpy()
                               // 3_600_000_000, pa.int64()),
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, ["event_type", "hour"],
                            {"n": ("one", "sum")})
    rows = []
    for etype, grp in g.groupby("event_type"):
        h = grp["hour"].to_numpy().astype(np.int64)
        cnt = grp["n"].to_numpy().astype(np.int64)
        lo, hi = int(h.min()), int(h.max())
        c = np.zeros(hi - lo + 1, dtype=np.int64)
        c[h - lo] = cnt
        n = len(c)
        S = int(c.sum())
        A = int((c[:-1] * c[1:]).sum()) if n > 1 else 0
        sq = int((c * c).sum())
        num = n * n * A - n * S * (2 * S - int(c[0]) - int(c[-1]))             + (n - 1) * S * S
        den = n * n * sq - n * S * S
        rows.append({"event_type": etype, "n_hours": n,
                     "r1_num": num, "r1_den": den})
    return pd.DataFrame(rows).sort_values("event_type")         .reset_index(drop=True)


def q_markov_entropy(sf_dir: str):
    """Per-state conditional transition entropy of the user behavior
    chain, in integer micro-nats: for each from-state i with row total
    c_i, h_micro = Σ_j c_ij · floor(10⁶·ln(c_i/c_ij) + 0.5) — the
    per-term floor makes the sum order-free, and h_micro/(10⁶·c_i) is
    the per-transition entropy H(next | state=i) (how predictable each
    state's successor is — the sequence-model difficulty read beside
    `markov_probs`' estimates). Same single keyed exchange as
    `event_transitions` (pre-aggregated pair partials), entropy folded
    over the tiny transition vocabulary."""
    import math

    import pandas as pd

    from frontera_ray.stages.relational import transition_counts

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "ts", "event_type", "event_id"])
          .map_batches(lambda b: pa.table({
              "user_id": b["user_id"],
              "ts_us": b["ts"].cast(pa.int64()),
              "event_type": b["event_type"],
              "event_id": b["event_id"],
          }), batch_format="pyarrow"))
    tc = transition_counts(ev, "user_id", "ts_us", "event_type",
                           tiebreak="event_id")
    rows = []
    for fv, grp in tc.groupby("from_val"):
        c = grp["n"].to_numpy().astype(np.int64)
        ci = int(c.sum())
        h = int(sum(int(n_ij) * int(math.floor(
            1_000_000 * math.log(ci / n_ij) + 0.5)) for n_ij in c))
        rows.append({"from_val": fv, "c_i": ci, "h_micro": h})
    return pd.DataFrame(rows).sort_values("from_val")         .reset_index(drop=True)


def q_seasonality_chi2(sf_dir: str):
    """Hour-of-day seasonality χ² against the uniform profile,
    EXACT-RATIONAL: with 24 cells c_h (missing hours count as zero)
    and N = Σc, χ² = Σ(c_h − N/24)²/(N/24) = chi2_num / chi2_den with
    chi2_num = Σ(24·c_h − N)² and chi2_den = 24·N — the is-there-a-
    daily-cycle gate (χ² >> 35 at 23 dof says schedule-aware
    recrawling pays). One combiner aggregate over the 24-cell space;
    reported per event type plus the exact ppm ratio."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "ts"])
          .map_batches(lambda b: pa.table({
              "event_type": b["event_type"],
              "hod": pa.array((b["ts"].cast(pa.int64()).to_numpy()
                               // 3_600_000_000) % 24, pa.int64()),
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, ["event_type", "hod"],
                            {"n": ("one", "sum")})
    rows = []
    for etype, grp in g.groupby("event_type"):
        c = np.zeros(24, dtype=np.int64)
        c[grp["hod"].to_numpy().astype(np.int64)] =             grp["n"].to_numpy().astype(np.int64)
        N = int(c.sum())
        num = int(((24 * c - N) ** 2).sum())
        den = 24 * N
        rows.append({"event_type": etype, "n": N, "chi2_num": num,
                     "chi2_den": den,
                     "chi2_ppm": (1_000_000 * num) // den if den else 0})
    return pd.DataFrame(rows).sort_values("event_type")         .reset_index(drop=True)




def q_ttr(sf_dir: str):
    """Per-document type-token ratio (text.ttr_table): lexical
    richness in ppm — the Gopher/C4-style repetitiveness gate beside
    `doc_entropy` (boilerplate sits low, keyword stuffing high).
    Shuffle-free in-block explode + reduceat; ALL-INTEGER."""
    from frontera_ray.stages.text import ttr_table

    out = ttr_table(_read(sf_dir, "documents")
                    .select_columns(["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_readability(sf_dir: str):
    """Flesch reading-ease per document (text.readability_table),
    ALL-INTEGER milli-units with the regex syllable proxy — the
    classic readability quality gate (Flesch 1948): extreme scores
    flag legalese / auto-generated text. One vectorized RE2 count
    stack per block, shuffle-free, integer division floored at 1
    sentence/word so the SQL twin is exact."""
    from frontera_ray.stages.text import readability_table

    out = readability_table(_read(sf_dir, "documents")
                            .select_columns(["doc_id", "text"]))         .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_meta(sf_dir: str):
    """Metadata-sniff census over the md5-derived image corpus
    (images.synth_image_meta — the input_hint table synthesized
    deterministically from documents): per (fmt, w, h) size class the
    image count and total decoded-pixel channel count — the batching /
    capacity read that runs on typed metadata before any decode.
    Combiner rollup, no shuffle; every derivation is the same md5
    integer expression in the DuckDB twin."""
    from frontera_ray.stages.images import synth_image_meta
    from frontera_ray.stages.relational import partial_groupby_agg

    meta = (_read(sf_dir, "documents").select_columns(["doc_id"])
            .map_batches(synth_image_meta, batch_format="pyarrow"))
    out = partial_groupby_agg(
        meta.map_batches(
            lambda b: b.append_column(
                "px", pa.array(b["w"].to_numpy() * b["h"].to_numpy() * 3,
                               pa.int64())),
            batch_format="pyarrow"),
        ["fmt", "w", "h"], {"n": ("px", "count"), "px_total": ("px", "sum")})
    return out.sort_values(["fmt", "w", "h"]).reset_index(drop=True)


def q_image_aspect_card(sf_dir: str):
    """Aspect-ratio bucketing card over the md5-derived image corpus
    (the SQL-oracled twin of `image_aspect_buckets`, which runs the
    same kernel over the web-graph URL corpus): each image snaps to
    the nearest canonical aspect bucket in log-aspect space
    (images.aspect_bucket_table — the SDXL-style pre-batching step)
    and the card rolls up count + total padding-waste ppm per bucket.
    Metadata-only (no decode), combiner rollup; the DuckDB twin
    re-derives w/h from the same md5 expression and replays the
    nearest-log-bucket argmin (ties to the smaller bucket) and the
    waste formula on the same IEEE doubles."""
    from frontera_ray.stages.images import (aspect_bucket_table,
                                            synth_image_meta)
    from frontera_ray.stages.relational import partial_groupby_agg

    meta = (_read(sf_dir, "documents").select_columns(["doc_id"])
            .map_batches(synth_image_meta, batch_format="pyarrow")
            .map_batches(
                lambda b: b.select(["doc_id", "w", "h"])
                           .rename_columns(["image_id", "w", "h"]),
                batch_format="pyarrow"))
    buckets = meta.map_batches(aspect_bucket_table, batch_format="pyarrow")
    out = partial_groupby_agg(
        buckets, ["bucket_ppm"],
        {"n": ("waste_ppm", "count"), "waste_ppm_sum": ("waste_ppm", "sum")})
    return out.sort_values("bucket_ppm").reset_index(drop=True)


def q_phash_pairs(sf_dir: str):
    """Perceptual-hash near-dup pairs over the derived image corpus
    with PLANTED near-dup clusters (images.synth_phash_table: group
    hash xor member bit flips -> within-group hammings {0,1,2}),
    through the shared distributed bit-block-LSH + vectorized
    Hamming-verify exchange (dedup.hamming64_neardup_pairs, exact
    recall at blocks >= h+1). The DuckDB twin re-derives every phash
    with the same md5/xor expressions and brute-joins with
    bit_count(xor(...)) — the first EXACT SQL oracle on the 64-bit
    sketch LSH scale path itself."""
    from frontera_ray.stages.dedup import hamming64_neardup_pairs
    from frontera_ray.stages.images import synth_phash_table

    sk = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(synth_phash_table, batch_format="pyarrow"))
    out = hamming64_neardup_pairs(sk, max_hamming=2).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_image_decode_parity(sf_dir: str):
    """Per-image decoded-pixel channel sum through the REAL codec round
    trip (images.decode_parity_table: seeded pixel gen -> genuine PNG /
    QIMG encode -> genuine decode -> sum), validated against a DuckDB
    twin that recomputes every pixel from the closed-form integer
    expression (uint32 xorshift noise + gradient, fmt-aware
    dequantization for the lossy codec) via generate_series — the
    input_hint's per-row decoded-pixel exactness invariant, checked by
    an independent engine. Shuffle-free map stage."""
    from frontera_ray.stages.images import decode_parity_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(decode_parity_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_phash_bit_balance(sf_dir: str):
    """Sketch bit-balance census over the derived phash column: per bit
    position the set-count and balance ppm — the LSH-quality diagnostic
    run before committing a banding (a biased bit skews every band
    bucket it joins; uniform md5-derived sketches sit near 500000 ppm).
    64-row per-block partials + combiner rollup, no wide shuffle."""
    from frontera_ray.stages.images import phash_bit_balance_partial
    from frontera_ray.stages.relational import partial_groupby_agg

    parts = (_read(sf_dir, "documents").select_columns(["doc_id"])
             .map_batches(phash_bit_balance_partial,
                          batch_format="pyarrow"))
    out = partial_groupby_agg(parts, ["bit"],
                              {"ones": ("ones", "sum"), "n": ("n", "sum")})
    out["balance_ppm"] = (1_000_000 * out["ones"]) // out["n"]
    return out.sort_values("bit").reset_index(drop=True)


def q_thumb_parity(sf_dir: str):
    """Thumbnail sums through the full real image path (gen -> encode
    -> decode -> nearest-neighbor resize) vs a DuckDB twin that
    recomputes each SAMPLED pixel closed-form — oracles the resize
    kernel's exact index math on top of both codecs
    (images.thumb_parity_table). Shuffle-free map stage."""
    from frontera_ray.stages.images import thumb_parity_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(thumb_parity_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_gate(sf_dir: str):
    """LAION-style typed-metadata image+caption curation gate
    (images.image_gate_table): fixed-order gates (small side, aspect
    ratio, caption token count over the text-prefix caption) with
    first-failing reason codes — the pre-decode filter that runs on
    header metadata before any pixel work. Exact DuckDB twin."""
    from frontera_ray.stages.images import image_gate_table

    out = (_read(sf_dir, "documents")
           .select_columns(["doc_id", "text"])
           .map_batches(image_gate_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_psnr_gate(sf_dir: str):
    """The north rule's per-row lossy-decode invariant (PSNR >= 40 dB)
    as an EXACT integer operator (images.psnr_gate_table): real encode
    -> real decode -> squared-error sum, gate as 65025*n_px >=
    10000*sq_err_sum (no floats anywhere). The DuckDB twin recomputes
    the quantization error closed-form ((val%8 - 4)^2 for the lossy
    codec, 0 for lossless) — both the decoder and the dB bound are
    checked by an independent engine. Shuffle-free."""
    from frontera_ray.stages.images import psnr_gate_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(psnr_gate_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_fertility(sf_dir: str):
    """Tokenizer fertility per language — BPE-ish tokens emitted per
    whitespace word (the multilingual-tokenizer efficiency metric;
    high-fertility languages cost more context per word, which drives
    vocab-allocation decisions like UniMax's). Per-block partial sums
    feed a combiner rollup over the tiny language key set;
    fertility_ppm is exact integer division on both sides."""
    from frontera_ray.stages.text import bpe_token_count_table
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        c = bpe_token_count_table(b)
        return pa.table({"lang": b["lang"],
                         "n_ws_tokens": c["n_ws_tokens"],
                         "n_bpe_tokens": c["n_bpe_tokens"]})

    counts = (_read(sf_dir, "documents")
              .select_columns(["doc_id", "lang", "text"])
              .map_batches(kern, batch_format="pyarrow"))
    out = partial_groupby_agg(
        counts, ["lang"],
        {"words": ("n_ws_tokens", "sum"), "bpe": ("n_bpe_tokens", "sum")})
    out["fertility_ppm"] = (1_000_000 * out["bpe"]) // out["words"]
    return out.sort_values("lang").reset_index(drop=True)


def q_bootstrap_ci(sf_dir: str):
    """Poisson-bootstrap replicate table for mean order value
    (relational.poisson_bootstrap_means — Chamandy et al. 2012, the
    planet-scale A/B CI primitive): 32 replicates in ONE streaming
    pass, each row drawing deterministic hash-derived Poisson(1)
    weights (pinned integer CDF thresholds, md5 + 32-bit
    xorshift-multiply mix — identical expressions in the DuckDB twin).
    No per-replicate pass, no materialized resamples, no RNG object;
    per-replicate exact integer (n_w, sum_w, mean) — the spread of the
    32 means IS the CI. Combiner rollup over 32 keys, no shuffle."""
    from frontera_ray.stages.relational import poisson_bootstrap_means

    cents = (_read(sf_dir, "orders")
             .select_columns(["o_orderkey", "o_totalprice"])
             .map_batches(lambda b: pa.table({
                 "o_orderkey": b["o_orderkey"],
                 "cents": pa.array(
                     np.round(b["o_totalprice"].to_numpy() * 100)
                     .astype(np.int64), pa.int64())}),
                 batch_format="pyarrow"))
    return poisson_bootstrap_means(cents, "o_orderkey", "cents",
                                   replicates=32)


def q_pareto_docs(sf_dir: str):
    """Documents on the (type-token-ratio, token-count) maximization
    Pareto front (relational.pareto_front_2d): the data-selection
    frontier — docs not weakly dominated on both lexical richness and
    length. Distributed skyline: block-local fronts, then the exact
    global front of the bounded union; the corpus never lands on the
    driver. DuckDB twin is the NOT EXISTS dominator scan."""
    from frontera_ray.stages.relational import pareto_front_2d
    from frontera_ray.stages.text import ttr_table

    t = ttr_table(_read(sf_dir, "documents")
                  .select_columns(["doc_id", "text"]))
    return pareto_front_2d(t, "doc_id", "ttr_ppm", "n_tokens")


def q_bloom_fp_audit(sf_dir: str):
    """Bit-level audit of the PRODUCTION URL-seen bloom filter
    (state/urlseen.BloomFilter — splitmix64 double hashing,
    Kirsch–Mitzenmacher probing): even-fingerprint URLs build the real
    filter as OR-merged per-block partial blooms (the associative
    scale shape — a 10^10-key bloom builds the same way, shard by
    shard), odd-fingerprint URLs probe it, and every probe row reports
    its pass bit. Probe ∩ build = ∅ by construction, so every pass IS
    a false positive — the measured FP rate at this load factor. The
    DuckDB twin replicates splitmix64 exactly (64-bit multiplies via
    32-bit splits in HUGEINT) and re-derives each of the 7 bit
    positions, so a single drifted bit in the production filter's hash
    path fails the hash. Deliberately tiny filter (1024 bits) so false
    positives exist at sf0.01."""
    import ray
    from frontera_ray.stages.images import md5_u64
    from frontera_ray.state.urlseen import BloomFilter
    from frontera_ray.urls import canonicalize_batch

    NUM_BITS, NUM_HASHES = 1024, 7

    def fp_table(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = canonicalize_batch(_raw_urls(ids))
        return pa.table({
            "doc_id": batch["doc_id"],
            "fp": pa.array(md5_u64(urls).view(np.int64), pa.int64())})

    fps = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(fp_table, batch_format="pyarrow"))

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(NUM_BITS, NUM_HASHES)
        ids = batch["doc_id"].to_numpy()
        f = batch["fp"].to_numpy().view(np.uint64)
        bf.add_batch(f[ids % 2 == 0])
        return pa.table({"words": pa.array([bf.words.tobytes()],
                                           pa.binary())})

    merged = BloomFilter(NUM_BITS, NUM_HASHES)
    for row in fps.map_batches(partial_bloom,
                               batch_format="pyarrow").take_all():
        merged.words |= np.frombuffer(row["words"], dtype=np.uint64)
    words_ref = ray.put(merged.words)

    def probe(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(NUM_BITS, NUM_HASHES)
        bf.words = ray.get(words_ref)
        ids = batch["doc_id"].to_numpy()
        odd = ids % 2 == 1
        f = batch["fp"].to_numpy().view(np.uint64)[odd]
        return pa.table({
            "doc_id": pa.array(ids[odd], pa.int64()),
            "bloom_pass": pa.array(bf.contains_batch(f), pa.bool_())})

    out = fps.map_batches(probe, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_welch_t(sf_dir: str):
    """Welch's t² between returned ('R') and acknowledged ('A')
    lineitem quantities, EXACT-RATIONAL — the means twin of
    `ab_ztest`'s proportions test:

        t² = (S₁n₂−S₂n₁)²(n₁−1)(n₂−1)
             / [(n₁SS₁−S₁²)n₂²(n₂−1) + (n₂SS₂−S₂²)n₁²(n₁−1)]

    from six integer registers (n, Σx, Σx²) per side via one combiner
    pass; the driver folds in Python bigints, the SQL twin in HUGEINT
    (overflow would error loudly, never silently truncate), final
    t2_ppm integer. The continuous-metric A/B primitive."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    li = (_read(sf_dir, "lineitem")
          .select_columns(["l_returnflag", "l_quantity"])
          .map_batches(lambda b: pa.table({
              "flag": b["l_returnflag"],
              "q": pa.array(np.round(b["l_quantity"].to_numpy())
                            .astype(np.int64), pa.int64()),
              "qq": pa.array((np.round(b["l_quantity"].to_numpy())
                              .astype(np.int64)) ** 2, pa.int64()),
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
          }).filter(pc.is_in(b["l_returnflag"],
                             value_set=pa.array(["A", "R"]))),
              batch_format="pyarrow"))
    g = partial_groupby_agg(li, "flag", {
        "n": ("one", "sum"), "s": ("q", "sum"), "ss": ("qq", "sum")}) \
        .set_index("flag")
    n1, s1, ss1 = (int(g.loc["A", c]) for c in ("n", "s", "ss"))
    n2, s2, ss2 = (int(g.loc["R", c]) for c in ("n", "s", "ss"))
    num = (s1 * n2 - s2 * n1) ** 2 * (n1 - 1) * (n2 - 1)
    den = ((n1 * ss1 - s1 * s1) * n2 * n2 * (n2 - 1)
           + (n2 * ss2 - s2 * s2) * n1 * n1 * (n1 - 1))
    return pd.DataFrame([{
        "n_a": n1, "sum_a": s1, "ss_a": ss1,
        "n_b": n2, "sum_b": s2, "ss_b": ss2,
        "t2_ppm": (1_000_000 * num) // den if den else 0,
    }]).astype("int64")


def _qd_census(sf_dir: str):
    """Shared 2-D value census for the rank-correlation family:
    (round(l_quantity), round(l_discount*100)) cell counts — both
    grids are bounded (50 × 11 cells) so the census, not the rows, is
    what crosses the wire: block-partial `np.unique` counts rolled up
    by the combiner. The 100-TB shape for any rank statistic over
    bounded value grids (ranks come from marginals of the census, so
    no global sort ever runs)."""
    from frontera_ray.stages.relational import partial_groupby_agg

    def part(b: pa.Table) -> pa.Table:
        q = np.round(b["l_quantity"].to_numpy()).astype(np.int64)
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        key = q * 1000 + d
        uv, cnt = np.unique(key, return_counts=True)
        return pa.table({"q": pa.array(uv // 1000, pa.int64()),
                         "d": pa.array(uv % 1000, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    ds = (_read(sf_dir, "lineitem")
          .select_columns(["l_quantity", "l_discount"])
          .map_batches(part, batch_format="pyarrow"))
    return partial_groupby_agg(ds, ["q", "d"], {"n": ("n", "sum")})


def _doubled_ranks(vals: np.ndarray, cnts: np.ndarray) -> np.ndarray:
    """Doubled mid-ranks (2 × average rank, so .5 tie credits stay
    integral) per distinct value: for a tie group of size t with c
    smaller elements, 2·rank = 2c + t + 1."""
    order = np.argsort(vals, kind="stable")
    c = np.zeros(len(vals), dtype=object)
    cum = 0
    for i in order:
        c[i] = 2 * cum + int(cnts[i]) + 1
        cum += int(cnts[i])
    return c


def q_spearman_corr(sf_dir: str):
    """Spearman rank-correlation REGISTERS between lineitem quantity
    and discount, EXACT integers end-to-end: the 2-D bounded-grid
    census (no global sort — mid-ranks derive from census marginals),
    then the six Pearson-on-ranks registers (n, Σrx, Σry, Σrx², Σry²,
    Σrx·ry) in DOUBLED-rank units folded in Python bigints. The
    monotone-association twin of `group_corr`'s linear Pearson; the
    SQL twin replays the doubled mid-ranks with window cumulatives in
    HUGEINT."""
    import pandas as pd

    cen = _qd_census(sf_dir)
    qv = cen["q"].to_numpy()
    dv = cen["d"].to_numpy()
    nv = cen["n"].to_numpy()
    # marginal doubled mid-ranks mapped back onto cells
    uq, iq = np.unique(qv, return_inverse=True)
    nq = np.zeros(len(uq), dtype=np.int64)
    np.add.at(nq, iq, nv)
    rq = _doubled_ranks(uq, nq)[iq]
    ud, idx = np.unique(dv, return_inverse=True)
    nd = np.zeros(len(ud), dtype=np.int64)
    np.add.at(nd, idx, nv)
    rd = _doubled_ranks(ud, nd)[idx]
    n = sx = sy = sxx = syy = sxy = 0
    for w, rx, ry in zip(nv.tolist(), rq.tolist(), rd.tolist()):
        n += w
        sx += w * rx
        sy += w * ry
        sxx += w * rx * rx
        syy += w * ry * ry
        sxy += w * rx * ry
    return pd.DataFrame([{"n": n, "sum_rx": sx, "sum_ry": sy,
                          "sum_rx2": sxx, "sum_ry2": syy,
                          "sum_rxy": sxy}]).astype("int64")


def q_kendall_tau(sf_dir: str):
    """Kendall tau-b REGISTERS between lineitem quantity and discount,
    EXACT integers: concordant / discordant / x-tie / y-tie pair
    counts computed from the same bounded 2-D census (550 cells → a
    550×550 vectorized cell-pair comparison on the driver instead of
    the O(n²) row-pair scan — the only way tau exists at 10^9 rows).
    The SQL twin brute-joins the census against itself."""
    import pandas as pd

    cen = _qd_census(sf_dir)
    qv = cen["q"].to_numpy()
    dv = cen["d"].to_numpy()
    nv = cen["n"].to_numpy().astype(object)
    lt_q = qv[:, None] < qv[None, :]
    lt_d = dv[:, None] < dv[None, :]
    gt_d = dv[:, None] > dv[None, :]
    pairs = nv[:, None] * nv[None, :]
    conc = int((pairs * (lt_q & lt_d)).sum())
    disc = int((pairs * (lt_q & gt_d)).sum())
    n = int(nv.sum())
    uq, iq = np.unique(qv, return_inverse=True)
    nq = np.zeros(len(uq), dtype=object)
    np.add.at(nq, iq, nv)
    tie_x = int(sum(t * (t - 1) // 2 for t in nq.tolist()))
    ud, idx = np.unique(dv, return_inverse=True)
    nd = np.zeros(len(ud), dtype=object)
    np.add.at(nd, idx, nv)
    tie_y = int(sum(t * (t - 1) // 2 for t in nd.tolist()))
    return pd.DataFrame([{"n": n, "concordant": conc, "discordant": disc,
                          "tie_x_pairs": tie_x, "tie_y_pairs": tie_y}]) \
        .astype("int64")


def q_decayed_counts(sf_dir: str):
    """Exponentially time-decayed per-user event counts with an
    INTEGER half-life kernel (the recrawl-priority / trending-key
    read): each event weighs 2^(8 − min(age_weeks, 8)) against a
    pinned anchor — whole-bucket decay keeps every weight and sum an
    exact integer, where a fractional-exponent decay would make the
    result depend on float summation order. One combiner rollup over
    the bounded user space; top-20 by decayed weight (ties to the
    smaller user_id)."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    anchor_us = 1706745600000000  # 2024-02-01 00:00:00 UTC
    week_us = 7 * 86400 * 10**6

    def part(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        age = np.minimum((anchor_us - ts) // week_us, 8)
        w = np.left_shift(np.int64(1), 8 - age)
        return pa.table({"user_id": b["user_id"],
                         "wt": pa.array(w, pa.int64())})

    ds = (_read(sf_dir, "events").select_columns(["ts", "user_id"])
          .map_batches(part, batch_format="pyarrow"))
    g = partial_groupby_agg(ds, "user_id", {"decayed_w": ("wt", "sum")})
    out = g.sort_values(["decayed_w", "user_id"],
                        ascending=[False, True]).head(20)
    return out.reset_index(drop=True).astype("int64")


def q_hash_ring_plan(sf_dir: str):
    """Consistent-hash-ring shard plan (Karger et al. 1997): 8 shards
    × 16 md5-derived virtual nodes; every distinct user key routes to
    the first ring position clockwise of its hash (wraparound to the
    global minimum). Output is the per-shard key census — the balance
    read taken before committing a ring (vnode count tunes variance).
    The ring is tiny and broadcast; assignment is one vectorized
    searchsorted per block + a combiner rollup. DuckDB twin re-derives
    ring and assignments from the same md5 expressions."""
    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg

    ring_pos = md5_u64([f"ring:{s}:{v}" for s in range(8)
                        for v in range(16)])
    ring_shard = np.repeat(np.arange(8, dtype=np.int64), 16)
    order = np.argsort(ring_pos)
    ring_pos, ring_shard = ring_pos[order], ring_shard[order]

    def assign(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        h = md5_u64([f"key:{u}" for u in uid])
        idx = np.searchsorted(ring_pos, h, side="left")
        idx[idx == len(ring_pos)] = 0  # wraparound
        return pa.table({
            "shard": pa.array(ring_shard[idx], pa.int64()),
            "one": pa.array(np.ones(len(uid), np.int64), pa.int64())})

    keys = (_read(sf_dir, "events").select_columns(["user_id"])
            .groupby("user_id").count()
            .map_batches(lambda b: b.select(["user_id"]),
                         batch_format="pyarrow")
            .map_batches(assign, batch_format="pyarrow"))
    out = partial_groupby_agg(keys, ["shard"], {"n_keys": ("one", "sum")})
    return out.sort_values("shard").reset_index(drop=True)


def q_ewma_residuals(sf_dir: str):
    """Per-user integer floor-EWMA tracker (relational.
    per_key_floor_ewma, α = 1/2): final smoothed value-state and the
    worst one-step residual per key, in exact centi-units — the
    adaptive per-host rate model + spike detector of a politeness
    scheduler, kept integer so the recursive-CTE DuckDB twin replays
    the exact state sequence. One keyed exchange; the recurrence is
    vectorized across keys per position."""
    from frontera_ray.stages.relational import per_key_floor_ewma

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v": pa.array(np.floor(b["value"].to_numpy() * 100 + 0.5)
                          .astype(np.int64), pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_id", "ts", "value"])
          .map_batches(prep, batch_format="pyarrow"))
    out = per_key_floor_ewma(ev, "user_id", "ts_us", "v",
                             tiebreak="event_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_backoff_plan(sf_dir: str):
    """Exponential-backoff budget audit (relational.
    per_key_error_backoff): consecutive error events per user cost
    2^min(pos, 6) seconds of backoff — the retry-headroom read a
    polite fetcher runs per host before scheduling (error-prone hosts
    burn their own politeness budget). One keyed exchange, vectorized
    run/change-point sweep; gaps-and-islands SQL twin."""
    from frontera_ray.stages.relational import per_key_error_backoff

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "err": pc.cast(pc.equal(b["event_type"], "error"),
                           pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_id", "ts", "event_type"])
          .map_batches(prep, batch_format="pyarrow"))
    out = per_key_error_backoff(ev, "user_id", "ts_us", "err",
                                tiebreak="event_id", cap=6).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_quantile_normalize(sf_dir: str):
    """Quantile normalization of doc length across sources
    (relational.quantile_normalize_buckets, B = 10): each doc's
    n_chars is replaced by the corpus-wide exact milli mean of its
    within-source quantile bucket — the batch-effect removal that
    makes length-based quality gates comparable across sources with
    different length scales. One keyed exchange + B-row census +
    broadcast map."""
    from frontera_ray.stages.relational import quantile_normalize_buckets

    out = quantile_normalize_buckets(
        _read(sf_dir, "documents").select_columns(
            ["doc_id", "source", "n_chars"]),
        "source", "n_chars", "doc_id", n_buckets=10).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs test per event class
    (relational.per_key_runs_test): values dichotomized around each
    class's own PERCENTILE_DISC median, same-side runs counted, z in
    milli — the is-this-sequence-random read (trend / oscillation
    detection) a monitoring pipeline runs beside cusum_change /
    page_hinkley. Integer registers; z evaluated with the identical
    IEEE double expression as the DuckDB twin."""
    from frontera_ray.stages.relational import per_key_runs_test

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v": pa.array(np.floor(b["value"].to_numpy() * 100 + 0.5)
                          .astype(np.int64), pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "event_id", "ts", "value"])
          .map_batches(prep, batch_format="pyarrow"))
    out = per_key_runs_test(ev, "event_type", "ts_us", "v",
                            tiebreak="event_id").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_stump_split(sf_dir: str):
    """Best decision-stump threshold (relational.stump_split_best):
    the value cut that best separates purchases from other events by
    EXACT Gini gain (pico-scaled bigint scores, min-threshold
    tie-break) — the one-feature CART primitive / feature-usefulness
    read beside gini_split's categorical variant. Census domain is
    the value discretization, not the row count."""
    from frontera_ray.stages.relational import stump_split_best

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": pa.array(np.floor(b["value"].to_numpy() * 100 + 0.5)
                          .astype(np.int64), pa.int64()),
            "c": pc.cast(pc.equal(b["event_type"], "purchase"),
                         pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "value"])
          .map_batches(prep, batch_format="pyarrow"))
    return stump_split_best(ev, "v", "c").to_pandas()


def q_embedding_mmd(sf_dir: str):
    """Linear-kernel MMD² between the even- and odd-id embedding
    cohorts (ann.embedding_mmd_linear): exact-integer ‖μ_a − μ_b‖²
    over quantized components, in micro units — the embedding-drift
    two-sample test run between corpus snapshots before trusting
    cached ANN indexes (the vector counterpart of psi_drift).
    Shuffle-free register pass, Python-bigint fold."""
    from frontera_ray.stages.ann import embedding_mmd_linear

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "side": pa.array(b["vec_id"].to_numpy() % 2, pa.int64()),
            "embedding": b["embedding"]})

    return embedding_mmd_linear(
        _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
        .map_batches(prep, batch_format="pyarrow"))


def q_cramers_v(sf_dir: str):
    """Cramér's V over the event_type × day-of-week contingency table
    — the effect-SIZE companion to chi_square's per-cell test (a huge
    corpus makes any dependence "significant"; V says whether it
    matters): V = sqrt(χ²/(N·min(r−1,c−1))), with χ² folded from the
    same per-cell integer micro contributions as the chi_square query
    (so the sum is order-free) and the final sqrt the identical IEEE
    expression as the twin. One combiner aggregate."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy()
        dow = (ts // 86_400_000_000 + 4) % 7
        return pa.table({"event_type": batch["event_type"],
                         "dow": pa.array(dow, pa.int64())})

    cells = partial_groupby_agg(
        _read(sf_dir, "events").select_columns(["event_type", "ts"])
        .map_batches(prep, batch_format="pyarrow"),
        ["event_type", "dow"], {"n": ("dow", "count")})
    df = cells.reset_index(drop=True)
    total = float(df["n"].sum())
    row_tot = df.groupby("event_type")["n"].transform("sum").astype(float)
    col_tot = df.groupby("dow")["n"].transform("sum").astype(float)
    exp = row_tot * col_tot / total
    chi_micro = np.round(
        ((df["n"].astype(float) - exp) ** 2 / exp).to_numpy() * 1e6) \
        .astype(np.int64)
    chi2_micro_total = int(chi_micro.sum())
    r = int(df["event_type"].nunique())
    c = int(df["dow"].nunique())
    N = int(df["n"].sum())
    k = min(r - 1, c - 1)
    v_milli = int(np.floor(
        1000.0 * np.sqrt((chi2_micro_total / 1_000_000.0) / (N * k))
        + 0.5))
    return pd.DataFrame({
        "n": [N], "n_rows": [r], "n_cols": [c],
        "chi2_micro_total": [chi2_micro_total], "v_milli": [v_milli]})


def q_url_template_census(sf_dir: str):
    """URL path-template mining over the derived corpus — the
    wildcard/trap-pattern read of frontier dedup (a position where
    every URL shares one segment is TEMPLATE; a position with
    per-page-unique segments is a PARAMETER slot — the distinction
    behind URL-normalization rules like /product/*/review): per
    (host, path position) the URL count, distinct-segment count, top
    segment + its ppm share, and the templated verdict. REAL string
    parsing on both sides; one (host,pos)-hash exchange co-locates
    each position's segments whole."""
    import pandas as pd

    from frontera_ray.stages.relational import hash_partitioned

    def explode(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        urls = pa.array(
            [f"http://h{i % 64}.test" + "/seg" * (1 + i % 6) + f"/p{i}"
             for i in d], pa.string())
        parts = pc.split_pattern(urls, "/")
        parent = pc.list_parent_indices(parts).to_numpy()
        flat = pc.list_flatten(parts)
        offs = np.diff(parts.offsets.to_numpy() if not isinstance(
            parts, pa.ChunkedArray) else parts.combine_chunks()
            .offsets.to_numpy())
        starts = np.concatenate(([0], np.cumsum(offs)[:-1]))
        pos = np.arange(len(flat)) - np.repeat(starts, offs) - 2
        host = pc.list_element(parts, 2)
        t = pa.table({
            "hp": pc.binary_join_element_wise(
                pc.take(host, pa.array(parent)).cast(pa.string()),
                pa.array((pos - 0).astype("U"), pa.string()), "|"),
            "host": pc.take(host, pa.array(parent)),
            "pos": pa.array(pos, pa.int64()),
            "seg": flat})
        return t.filter(pa.array(pos >= 1))

    def census(b: pa.Table) -> pa.Table:
        empty = pa.table({"host": pa.array([], pa.string()),
                          "pos": pa.array([], pa.int64()),
                          "n_urls": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64()),
                          "top_seg": pa.array([], pa.string()),
                          "top_share_ppm": pa.array([], pa.int64()),
                          "templated": pa.array([], pa.bool_())})
        if len(b) == 0:
            return empty
        df = pd.DataFrame({
            "host": b["host"].to_numpy(zero_copy_only=False),
            "pos": b["pos"].to_numpy(),
            "seg": b["seg"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["host", "pos", "seg"], as_index=False).size()
        g = g.sort_values(["host", "pos", "size", "seg"],
                          ascending=[True, True, False, True])
        agg = g.groupby(["host", "pos"], as_index=False).agg(
            n_urls=("size", "sum"), n_distinct=("size", "count"),
            top_seg=("seg", "first"), top_n=("size", "first"))
        return pa.table({
            "host": pa.array(agg["host"].astype(object), pa.string()),
            "pos": pa.array(agg["pos"].to_numpy(np.int64)),
            "n_urls": pa.array(agg["n_urls"].to_numpy(np.int64)),
            "n_distinct": pa.array(agg["n_distinct"].to_numpy(np.int64)),
            "top_seg": pa.array(agg["top_seg"].astype(object),
                                pa.string()),
            "top_share_ppm": pa.array(
                (1_000_000 * agg["top_n"].to_numpy(np.int64))
                // agg["n_urls"].to_numpy(np.int64), pa.int64()),
            "templated": pa.array(
                agg["n_distinct"].to_numpy(np.int64) == 1, pa.bool_())})

    ds = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(explode, batch_format="pyarrow"))
    out = pa.concat_tables(list(
        hash_partitioned(ds, "hp")
        .map_batches(census, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None))) \
        .to_pandas()
    return out.sort_values(["host", "pos"]).reset_index(drop=True)


def q_t_closeness(sf_dir: str):
    """t-closeness audit (relational.grouped_w1_vs_global; Li 2007 —
    the step beyond k_anon_violations / l_diversity): per
    quasi-identifier class (event_type) the exact-integer W1 distance
    between the class's value distribution and the global one, in
    micro units — a class can be large AND diverse yet still leak via
    distributional skew; the worst class sets the table's t. One
    (group, value, count) census pass; driver folds registers bounded
    by the value discretization."""
    from frontera_ray.stages.relational import grouped_w1_vs_global

    return grouped_w1_vs_global(
        _read(sf_dir, "events").select_columns(["event_type", "value"]),
        "value", "event_type", scale=100).to_pandas()


def q_watermark_plan(sf_dir: str):
    """Allowed-lateness planning read
    (relational.watermark_ooo_percentiles): the p50/p95/p99/max
    out-of-orderness (ms) of the event stream in arrival order — the
    number a streaming deployment sets its watermark delay to BEFORE
    running watermark_late's audit of a chosen bound. Distributed
    prefix-max scan + bounded lateness census; quantile_disc rank
    convention matches DuckDB exactly."""
    from frontera_ray.stages.relational import watermark_ooo_percentiles

    ev = (_read(sf_dir, "events")
          .select_columns(["event_id", "ts"])
          .map_batches(lambda b: pa.table({
              "event_id": b["event_id"],
              "ts_us": b["ts"].cast(pa.int64()),
          }), batch_format="pyarrow"))
    return watermark_ooo_percentiles(ev, "event_id", "ts_us",
                                     unit_us=1000).to_pandas()


def q_wasserstein1(sf_dir: str):
    """Two-sample 1-Wasserstein distance between the user-parity
    cohorts' event-value distributions
    (relational.wasserstein1_2sample), INTEGER-EXACT — the transport
    MAGNITUDE beside ks_drift's max-gap: KS alerts on the worst point,
    W1 on total mass moved (what drift monitoring actually pages on).
    Same value-count register pass; Python-bigint fold, HUGEINT twin."""
    from frontera_ray.stages.relational import wasserstein1_2sample

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "value"])
          .map_batches(lambda b: pa.table({
              "value": b["value"],
              "side": pa.array(b["user_id"].to_numpy() % 2, pa.int64()),
          }), batch_format="pyarrow"))
    return wasserstein1_2sample(ev, "value", "side", scale=100).to_pandas()


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled mixture allocation (alpha = 0.5, the
    multilingual sampling rule of mBERT/XLM-R): per-source weights
    proportional to sqrt(n_docs) via EXACT integer isqrt(n·10^6)
    (float sqrt + ±1 correction — identical expression in the twin),
    then Hamilton largest-remainder apportionment of a 10,000-sample
    budget (deterministic ties by source; Σalloc == budget exactly).
    The upsampling-low-resource / downsampling-high-resource read
    beside mix_epochs' UniMax water-filling."""
    import pandas as pd

    from frontera_ray.stages.relational import (hamilton_alloc,
                                                isqrt_exact,
                                                partial_groupby_agg)

    docs = (_read(sf_dir, "documents").select_columns(["source"])
            .map_batches(lambda b: b.append_column(
                "one", pa.array(np.ones(len(b), np.int64), pa.int64())),
                batch_format="pyarrow"))
    g = partial_groupby_agg(docs, ["source"], {"n_docs": ("one", "sum")}) \
        .sort_values("source").reset_index(drop=True)
    n = g["n_docs"].to_numpy().astype(np.int64)
    w = isqrt_exact(n * 1_000_000)
    alloc = hamilton_alloc(w, 10_000,
                           np.arange(len(g), dtype=np.int64))
    return pd.DataFrame({"source": g["source"], "n_docs": n,
                         "w": w, "alloc": alloc})


def q_jain_fairness(sf_dir: str):
    """Jain's fairness index over per-user event counts — THE
    scheduler-fairness number (Jain et al. 1984): J = (Σx)²/(n·Σx²),
    1 = perfectly fair, 1/n = one key hogs everything; the read a
    politeness scheduler reports next to per-host service counts.
    EXACT-RATIONAL: one distributed count groupby, then a three-
    register combiner fold; jain_ppm integer both sides."""
    import pandas as pd

    counts = (_read(sf_dir, "events").select_columns(["user_id"])
              .groupby("user_id").count()
              .map_batches(lambda b: pa.table({
                  "x": b["count()"],
                  "xx": pa.array(b["count()"].to_numpy() ** 2, pa.int64()),
                  "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
              }), batch_format="pyarrow"))
    regs = counts.sum(["x", "xx", "one"])
    n, sx, ss = (int(regs["sum(one)"]), int(regs["sum(x)"]),
                 int(regs["sum(xx)"]))
    return pd.DataFrame([{
        "n_keys": n, "sum_x": sx, "ss_x": ss,
        "jain_ppm": (1_000_000 * sx * sx) // (n * ss) if n * ss else 0,
    }]).astype("int64")


def q_wilson_lb(sf_dir: str):
    """Wilson score lower bound (z=2) per event type for the
    high-value-event rate — THE rank-by-rate-under-uncertainty
    primitive (low-volume keys can't fake a high rate): with
    x = hits, n = trials,

        lb ≈ (x + 2 − 2·√(x(n−x)/n + 1)) / (n + 4),

    kept EXACT by integer isqrt on the 10^6-scaled radicand (identical
    float-sqrt-plus-correction expression in the twin) and floored at
    0 before the division so both engines agree on sign handling.
    One combiner pass over the event-type registers."""
    import pandas as pd

    from frontera_ray.stages.relational import (isqrt_exact,
                                                partial_groupby_agg)

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "value"])
          .map_batches(lambda b: pa.table({
              "event_type": b["event_type"],
              "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
              "hit": pa.array(
                  (b["value"].to_numpy() > 50).astype(np.int64),
                  pa.int64())}), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, ["event_type"],
                            {"n": ("one", "sum"), "x": ("hit", "sum")}) \
        .sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy().astype(np.int64)
    x = g["x"].to_numpy().astype(np.int64)
    t = isqrt_exact((x * (n - x) * 1_000_000) // np.maximum(n, 1)
                    + 1_000_000)
    num = np.maximum(1000 * x + 2000 - 2 * t, 0)
    g["rate_ppm"] = (1_000_000 * x) // np.maximum(n, 1)
    g["wilson_lb_ppm"] = (1000 * num) // (n + 4)
    return g


def q_sigma_breach(sf_dir: str):
    """Per-event-type 2-sigma breach census over event values
    (relational.sigma_breach_table) — the outlier-rate monitor behind
    the 3-sigma rule, EXACT with no square root: the breach predicate
    is the integer inequality (n·x−S)²(n−1) > 4n(nSS−S²), evaluated
    as d² > floor(R) with a broadcast per-key bound (provably the same
    predicate — see kernel docstring). Two streaming register passes,
    no shuffle."""
    from frontera_ray.stages.relational import sigma_breach_table

    ev = _read(sf_dir, "events").select_columns(["event_type", "value"])
    return sigma_breach_table(ev, "event_type", "value", scale=100, z=2)


def q_otsu_threshold(sf_dir: str):
    """Otsu's threshold over the event-value histogram
    (relational.otsu_threshold, Otsu 1979) — the classic image
    binarization / automatic gate-picking rule, EXACT: between-class
    variance compared via bigint cross-multiplied floors, argmax with
    smallest-t ties; one bounded-support register pass."""
    from frontera_ray.stages.relational import otsu_threshold

    ev = _read(sf_dir, "events").select_columns(["value"])
    return otsu_threshold(ev, "value", scale=100)


def q_simpson_paradox(sf_dir: str):
    """Simpson's-paradox detector: per-stratum (event type) sign of
    the cohort rate difference vs the pooled sign, via exact integer
    cross-multiplication sign(x_a·n_b − x_b·n_a) — flags strata whose
    direction REVERSES under aggregation (the classic confounding trap
    any cohort metric rollup must check). One combiner pass over
    4-register stratum rows; pooled fold on the driver."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "user_id", "value"])
          .map_batches(lambda b: pa.table({
              "event_type": b["event_type"],
              "na": pa.array((b["user_id"].to_numpy() % 2 == 0)
                             .astype(np.int64), pa.int64()),
              "xa": pa.array(((b["user_id"].to_numpy() % 2 == 0)
                              & (b["value"].to_numpy() > 50))
                             .astype(np.int64), pa.int64()),
              "nb": pa.array((b["user_id"].to_numpy() % 2 == 1)
                             .astype(np.int64), pa.int64()),
              "xb": pa.array(((b["user_id"].to_numpy() % 2 == 1)
                              & (b["value"].to_numpy() > 50))
                             .astype(np.int64), pa.int64()),
          }), batch_format="pyarrow"))
    g = partial_groupby_agg(ev, ["event_type"],
                            {"n_a": ("na", "sum"), "x_a": ("xa", "sum"),
                             "n_b": ("nb", "sum"), "x_b": ("xb", "sum")}) \
        .sort_values("event_type").reset_index(drop=True)
    d = (g["x_a"] * g["n_b"] - g["x_b"] * g["n_a"]).astype("int64")
    g["d_sign"] = np.sign(d).astype(np.int64)
    pooled = int(np.sign(int(g["x_a"].sum()) * int(g["n_b"].sum())
                         - int(g["x_b"].sum()) * int(g["n_a"].sum())))
    g["paradox"] = ((g["d_sign"] != 0) & (pooled != 0)
                    & (g["d_sign"] != pooled))
    return g


def q_benford_audit(sf_dir: str):
    """Benford first-digit audit over order totals — the classic
    fabricated-numbers / data-quality screen: observed leading-digit
    shares (exact ppm) against the PINNED Benford expectations
    log10(1+1/d)·10^6 (integer literals summing to exactly 10^6, the
    same in the twin); dev_ppm = |obs − exp|. Digit extraction is a
    vectorized divide-down loop (== substr of the decimal rendering
    for positive ints). One 9-key combiner pass."""
    from frontera_ray.stages.relational import partial_groupby_agg

    EXP = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
           6: 66947, 7: 57992, 8: 51153, 9: 45757}

    def kern(b: pa.Table) -> pa.Table:
        cents = np.round(b["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        d = cents[cents > 0]
        for _ in range(18):
            big = d >= 10
            if not big.any():
                break
            d = np.where(big, d // 10, d)
        return pa.table({
            "digit": pa.array(d, pa.int64()),
            "one": pa.array(np.ones(len(d), np.int64), pa.int64())})

    g = partial_groupby_agg(
        _read(sf_dir, "orders").select_columns(["o_totalprice"])
        .map_batches(kern, batch_format="pyarrow"),
        ["digit"], {"n_obs": ("one", "sum")}) \
        .sort_values("digit").reset_index(drop=True)
    total = int(g["n_obs"].sum())
    g["obs_ppm"] = (1_000_000 * g["n_obs"]) // total
    g["exp_ppm"] = g["digit"].map(EXP).astype("int64")
    g["dev_ppm"] = (g["obs_ppm"] - g["exp_ppm"]).abs().astype("int64")
    return g


def q_pr_curve(sf_dir: str):
    """Full precision-recall curve for 'value predicts purchase' —
    the threshold-sweep eval artifact beside the scalar `auc_roc`:
    one value-count register pass (v, pos, neg partials merged on the
    driver — bounded by the distinct-cents domain, the ks_drift
    shape), then descending suffix sums give (tp, fp) at every
    distinct threshold; prec/rec exact ppm. No per-threshold pass, no
    sort shuffle."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        v = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        lab = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        pos = np.bincount(inv, weights=lab, minlength=len(uv))
        neg = np.bincount(inv, weights=~lab, minlength=len(uv))
        return pa.table({
            "v": pa.array(uv, pa.int64()),
            "pos": pa.array(pos.astype(np.int64), pa.int64()),
            "neg": pa.array(neg.astype(np.int64), pa.int64())})

    acc: dict[int, list[int]] = {}
    ds = (_read(sf_dir, "events").select_columns(["event_type", "value"])
          .map_batches(partial, batch_format="pyarrow"))
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for v, p_, n_ in zip(t["v"].to_numpy(), t["pos"].to_numpy(),
                             t["neg"].to_numpy()):
            cur = acc.setdefault(int(v), [0, 0])
            cur[0] += int(p_)
            cur[1] += int(n_)
    vs = np.array(sorted(acc, reverse=True), dtype=np.int64)
    pos = np.array([acc[int(v)][0] for v in vs], dtype=np.int64)
    neg = np.array([acc[int(v)][1] for v in vs], dtype=np.int64)
    tp, fp = np.cumsum(pos), np.cumsum(neg)
    p_tot = int(tp[-1]) if len(tp) else 0
    out = pd.DataFrame({
        "thr_cents": vs, "tp": tp, "fp": fp, "fn": p_tot - tp,
        "prec_ppm": (1_000_000 * tp) // np.maximum(tp + fp, 1),
        "rec_ppm": (1_000_000 * tp) // max(p_tot, 1)})
    return out.sort_values("thr_cents").reset_index(drop=True) \
        .astype("int64")


def q_ohlc_bars(sf_dir: str):
    """Daily OHLC bars per event type (open/high/low/close of the
    value stream, cents) — the telemetry/finance roll that compresses
    a stream to per-window endpoints. OHLC is ASSOCIATIVE (open =
    value at min (ts, id), close at max, high/low plain extrema), so
    blocks emit per-key candidate rows and the driver folds ~150 keys
    — one streaming pass, no sort, no shuffle; ties pinned by
    (ts, event_id)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        ty = b["event_type"].to_numpy(zero_copy_only=False)
        tu = b["ts"].cast(pa.int64()).to_numpy()
        day = tu // 86_400_000_000
        c = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        eid = b["event_id"].to_numpy()
        key = np.char.add(np.char.add(ty.astype(str), "|"),
                          day.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        rows = {"event_type": [], "day": [], "o_tu": [], "o_id": [],
                "open_c": [], "high_c": [], "low_c": [], "c_tu": [],
                "c_id": [], "close_c": [], "n": []}
        for g in range(len(uk)):
            m = inv == g
            tug, eidg, cg = tu[m], eid[m], c[m]
            first = np.lexsort((eidg, tug))[0]
            last = np.lexsort((-eidg, -tug))[0]
            t, d = uk[g].rsplit("|", 1)
            rows["event_type"].append(t)
            rows["day"].append(int(d))
            rows["o_tu"].append(int(tug[first]))
            rows["o_id"].append(int(eidg[first]))
            rows["open_c"].append(int(cg[first]))
            rows["high_c"].append(int(cg.max()))
            rows["low_c"].append(int(cg.min()))
            rows["c_tu"].append(int(tug[last]))
            rows["c_id"].append(int(eidg[last]))
            rows["close_c"].append(int(cg[last]))
            rows["n"].append(int(m.sum()))
        return pa.table(rows)

    acc: dict[tuple, list] = {}
    ds = (_read(sf_dir, "events")
          .select_columns(["event_id", "ts", "event_type", "value"])
          .map_batches(partial, batch_format="pyarrow"))
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in t.to_pylist():
            k = (r["event_type"], r["day"])
            cur = acc.get(k)
            if cur is None:
                acc[k] = [r["o_tu"], r["o_id"], r["open_c"], r["high_c"],
                          r["low_c"], r["c_tu"], r["c_id"], r["close_c"],
                          r["n"]]
            else:
                if (r["o_tu"], r["o_id"]) < (cur[0], cur[1]):
                    cur[0], cur[1], cur[2] = r["o_tu"], r["o_id"], \
                        r["open_c"]
                cur[3] = max(cur[3], r["high_c"])
                cur[4] = min(cur[4], r["low_c"])
                if (r["c_tu"], r["c_id"]) > (cur[5], cur[6]):
                    cur[5], cur[6], cur[7] = r["c_tu"], r["c_id"], \
                        r["close_c"]
                cur[8] += r["n"]
    out = pd.DataFrame([
        {"event_type": k[0], "day": k[1], "open_c": v[2],
         "high_c": v[3], "low_c": v[4], "close_c": v[7], "n": v[8]}
        for k, v in acc.items()])
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def q_tukey_fences(sf_dir: str):
    """Tukey IQR-fence outlier census per event type — the ROBUST
    outlier read beside `sigma_breach`'s normal-assuming z-test:
    exact discrete quartiles (percentile_disc over the cents
    histogram, grouped_quantile_disc's partial-combine shape), fences
    at q3 + 1.5·IQR / q1 − 1.5·IQR evaluated in DOUBLED integer units
    (2x > 2·q3 + 3·IQR — no halves, no floats), breach counts from a
    second streaming pass against the broadcast per-key fences."""
    from frontera_ray.stages.relational import (grouped_quantile_disc,
                                                partial_groupby_agg)

    ev = (_read(sf_dir, "events")
          .select_columns(["event_type", "value"])
          .map_batches(lambda b: pa.table({
              "event_type": b["event_type"],
              "c": pa.array(np.floor(b["value"].to_numpy() * 100 + 0.5)
                            .astype(np.int64), pa.int64())}),
              batch_format="pyarrow"))
    qt = grouped_quantile_disc(ev, "event_type", "c", [0.25, 0.75])
    fences = {r["event_type"]: (int(r["q25_scaled"]), int(r["q75_scaled"]))
              for _, r in qt.iterrows()}

    import ray
    fref = ray.put(fences)

    def breach(b: pa.Table) -> pa.Table:
        f = ray.get(fref)
        keys = b["event_type"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy()
        hi = np.zeros(len(c), np.int64)
        lo = np.zeros(len(c), np.int64)
        for k, (q1, q3) in f.items():
            m = keys == k
            iqr = q3 - q1
            hi[m] = (2 * c[m] > 2 * q3 + 3 * iqr).astype(np.int64)
            lo[m] = (2 * c[m] < 2 * q1 - 3 * iqr).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "hi": pa.array(hi, pa.int64()),
                         "lo": pa.array(lo, pa.int64()),
                         "one": pa.array(np.ones(len(c), np.int64),
                                         pa.int64())})

    out = partial_groupby_agg(ev.map_batches(breach,
                                             batch_format="pyarrow"),
                              ["event_type"],
                              {"n": ("one", "sum"),
                               "n_out_hi": ("hi", "sum"),
                               "n_out_lo": ("lo", "sum")}) \
        .sort_values("event_type").reset_index(drop=True)
    out["q1_c"] = out["event_type"].map({k: v[0]
                                         for k, v in fences.items()})
    out["q3_c"] = out["event_type"].map({k: v[1]
                                         for k, v in fences.items()})
    out["out_ppm"] = (1_000_000 * (out["n_out_hi"] + out["n_out_lo"])) \
        // out["n"]
    return out


def q_hapax_share(sf_dir: str):
    """Per-source hapax-legomenon share (text.hapax_share_by_source):
    distinct tokens per source and how many occur exactly once in the
    whole corpus — the OCR-noise / templated-source screen beside TTR
    (noisy scrapes are hapax-rich, boilerplate is hapax-poor). One
    token-hash exchange co-locates corpus totals with per-source
    membership; partials are O(sources) per partition."""
    from frontera_ray.stages.text import hapax_share_by_source

    return hapax_share_by_source(
        _read(sf_dir, "documents").select_columns(["source", "text"]))


def q_count_of_counts(sf_dir: str):
    """Good–Turing frequency-of-frequencies over the corpus token
    stream: N_r = number of distinct tokens occurring exactly r times
    — THE input table of Good–Turing / Kneser–Ney smoothing (r* =
    (r+1)N_{r+1}/N_r) and the vocabulary-truncation read. Vectorized
    explode -> hash-shuffle token count (high-cardinality key, same
    exchange as token_df) -> per-block count-of-counts partials ->
    combiner over the tiny r domain."""
    import pyarrow.compute as _pc

    from frontera_ray.stages.relational import partial_groupby_agg

    def explode(batch: pa.Table) -> pa.Table:
        toks = _pc.utf8_split_whitespace(batch["text"])
        t = pa.table({"token": _pc.list_flatten(toks)})
        return t.filter(_pc.not_equal(t["token"], ""))

    counts = (_read(sf_dir, "documents").select_columns(["text"])
              .map_batches(explode, batch_format="pyarrow")
              .groupby("token").count())
    parts = counts.map_batches(lambda b: pa.table({
        "r": b["count()"],
        "one": pa.array(np.ones(len(b), np.int64), pa.int64())}),
        batch_format="pyarrow")
    out = partial_groupby_agg(parts, ["r"], {"n_r": ("one", "sum")})
    return out.sort_values("r").reset_index(drop=True)


def q_reshard_move_cost(sf_dir: str):
    """Resharding move-cost audit, 8 -> 12 shards (the grow-the-
    cluster decision behind the north rule's N->4N story): under
    MODULO placement a key stays only when h%24 < 8, so 2/3 of keys
    move (and the stayers still churn between old shards at other
    growth factors); under the CONSISTENT RING (Karger 1997; the
    hash_ring_plan machinery, 16 vnodes/shard) only keys claimed by
    the NEW shards move (~4/12 = 1/3, never old->old) — the property
    that makes live frontier resharding affordable. Measured at
    sf0.01: mod 626,666 ppm vs ring 320,000 ppm. Exact per-key census
    over distinct users, one combiner pass; DuckDB twin re-derives
    both placements from the same md5 expressions."""
    import pandas as pd

    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg

    def ring(n_shards: int):
        pos = md5_u64([f"ring:{s}:{v}" for s in range(n_shards)
                       for v in range(16)])
        shard = np.repeat(np.arange(n_shards, dtype=np.int64), 16)
        o = np.argsort(pos)
        return pos[o], shard[o]

    p8, s8 = ring(8)
    p12, s12 = ring(12)

    def assign(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        h = md5_u64([f"key:{u}" for u in uid])
        i8 = np.searchsorted(p8, h, side="left")
        i8[i8 == len(p8)] = 0
        i12 = np.searchsorted(p12, h, side="left")
        i12[i12 == len(p12)] = 0
        ring_moved = (s8[i8] != s12[i12]).astype(np.int64)
        mod_moved = ((h % np.uint64(8)).astype(np.int64)
                     != (h % np.uint64(12)).astype(np.int64)) \
            .astype(np.int64)
        one = np.ones(len(uid), np.int64)
        return pa.table({
            "strategy": pa.array(["mod"] * len(uid) + ["ring"] * len(uid),
                                 pa.string()),
            "moved": pa.array(np.concatenate([mod_moved, ring_moved]),
                              pa.int64()),
            "one": pa.array(np.concatenate([one, one]), pa.int64())})

    keys = (_read(sf_dir, "events").select_columns(["user_id"])
            .groupby("user_id").count()
            .map_batches(lambda b: b.select(["user_id"]),
                         batch_format="pyarrow")
            .map_batches(assign, batch_format="pyarrow"))
    out = partial_groupby_agg(keys, ["strategy"],
                              {"n_keys": ("one", "sum"),
                               "moved": ("moved", "sum")})
    out["moved_ppm"] = (1_000_000 * out["moved"]) // out["n_keys"]
    return out.sort_values("strategy").reset_index(drop=True)


def q_tile_variance(sf_dir: str):
    """Flat-image gate: per-image quadrant pixel sums + integer
    between-tile variance through the real encode->decode path
    (images.tile_variance_table); DuckDB twin recomputes every
    quadrant closed-form — the solid-color/letterbox screen run
    before any model decode. Shuffle-free."""
    from frontera_ray.stages.images import tile_variance_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(tile_variance_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_url_lcp_compression(sf_dir: str):
    """Prefix-compression sizing for frontier URL storage (the
    delta/front-coding estimate behind every sorted-string-table URL
    store): global `ds.sort` on the canonical URL, per-block
    vectorized LCP-with-predecessor (padded uint8 matrix, cumulative
    equality), block-BOUNDARY LCPs stitched exactly from the bounded
    (first_url, last_url) partial rows — the only data that leaves the
    blocks. Output: n_urls, total_bytes, lcp_bytes, savings_ppm (the
    bytes front-coding would not store)."""
    import pandas as pd

    def lcp_matrix(urls: list) -> np.ndarray:
        a = np.zeros((len(urls), 64), dtype=np.uint8)
        for i, s in enumerate(urls):
            b = s.encode()[:64]
            a[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        eq = a[1:] == a[:-1]
        # stop the prefix at the first mismatch OR at either end
        both = (a[1:] != 0) & (a[:-1] != 0)
        run = np.cumprod(eq & both, axis=1)
        return run.sum(axis=1).astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        urls = b["url"].to_pylist()
        lcps = lcp_matrix(urls) if len(urls) > 1 else \
            np.zeros(0, np.int64)
        return pa.table({
            "n": pa.array([len(urls)], pa.int64()),
            "tot": pa.array([sum(len(u) for u in urls)], pa.int64()),
            "lcp": pa.array([int(lcps.sum())], pa.int64()),
            "first": pa.array([urls[0] if urls else ""], pa.string()),
            "last": pa.array([urls[-1] if urls else ""], pa.string())})

    from frontera_ray.urls import canonicalize_batch

    ds = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(lambda b: pa.table({
              "url": pa.array(
                  canonicalize_batch(_raw_urls(b["doc_id"].to_numpy())),
                  pa.string())}), batch_format="pyarrow")
          .sort("url")
          .map_batches(partial, batch_format="pyarrow"))
    rows = sorted((r for r in ds.take_all() if r["n"]),
                  key=lambda r: r["first"])
    n = sum(r["n"] for r in rows)
    tot = sum(r["tot"] for r in rows)
    lcp = sum(r["lcp"] for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        lcp += int(lcp_matrix([prev["last"], cur["first"]])[0])
    return pd.DataFrame([{
        "n_urls": n, "total_bytes": tot, "lcp_bytes": lcp,
        "savings_ppm": (1_000_000 * lcp) // tot if tot else 0,
    }]).astype("int64")


def q_channel_histogram(sf_dir: str):
    """Corpus color-distribution audit: per-channel 16-bin pixel
    histograms through the REAL encode->decode path (the standard
    image-stats artifact behind normalization constants and
    color-cast screens); 48-row per-block partials -> combiner. The
    DuckDB twin rebins every pixel closed-form, so decoder drift in
    any bin fails the hash."""
    from frontera_ray.payload import (_gen_pixels_group, png_decode,
                                      png_encode, qimg_decode,
                                      qimg_encode)
    from frontera_ray.stages.images import (_SYNTH_H, _SYNTH_W,
                                            synth_image_seed)
    from frontera_ray.stages.relational import partial_groupby_agg

    def partial(batch: pa.Table) -> pa.Table:
        u = synth_image_seed(batch)
        six = (u % np.uint64(6)).astype(np.int64)
        is_png = (u >> np.uint64(3)) % np.uint64(2) == 0
        hist = np.zeros((3, 16), dtype=np.int64)
        for si in np.unique(six):
            idx = np.nonzero(six == si)[0]
            w, h = int(_SYNTH_W[si]), int(_SYNTH_H[si])
            pix = _gen_pixels_group(u[idx], w, h)
            for j, i in enumerate(idx):
                out = png_decode(png_encode(pix[j])) if is_png[i] \
                    else qimg_decode(qimg_encode(pix[j]))
                for c in range(3):
                    hist[c] += np.bincount(
                        (out[:, :, c] >> 4).ravel(),
                        minlength=16).astype(np.int64)
        ch = np.repeat(np.arange(3, dtype=np.int64), 16)
        bins = np.tile(np.arange(16, dtype=np.int64), 3)
        return pa.table({"channel": pa.array(ch, pa.int64()),
                         "bin": pa.array(bins, pa.int64()),
                         "n": pa.array(hist.ravel(), pa.int64())})

    parts = (_read(sf_dir, "documents").select_columns(["doc_id"])
             .map_batches(partial, batch_format="pyarrow"))
    out = partial_groupby_agg(parts, ["channel", "bin"],
                              {"n_px": ("n", "sum")})
    return out.sort_values(["channel", "bin"]).reset_index(drop=True)



def q_image_sharpness(sf_dir: str):
    """Blur/sharpness screen over the derived image+caption corpus
    (images.sharpness_table): per-image horizontal gradient energy
    through the REAL encode->decode path, exact integers (grad_sum /
    n_pairs / milli-mean / blur flag). The DuckDB twin recomputes BOTH
    neighbor pixels closed-form with fmt-aware dequantization — the
    out-of-focus / upscaled-placeholder gate of image curation.
    Shuffle-free map_batches."""
    from frontera_ray.stages.images import sharpness_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(sharpness_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_luma(sf_dir: str):
    """Exposure census over the derived corpus (images.luma_table):
    integer BT.601 luma mass per decoded image, per-pixel milli-mean,
    dark/mid/bright bucket — the near-black / blown-out screen. The
    DuckDB twin pivots the three generated channels per pixel
    closed-form. Shuffle-free map_batches."""
    from frontera_ray.stages.images import luma_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(luma_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_color_cast(sf_dir: str):
    """Color-cast + quantization-provenance forensics over the derived
    corpus (images.color_forensics_table, ONE decode pass): per-channel
    pixel-sum masses + integer cast score (the white-balance screen),
    and the pixels-only lossy-codec sniff (count of values ≡ 4 mod 8 —
    all of them for the qimg quantizer, ~1/8 for PNG) checked against
    the container header — the transcoded-duplicate signal in
    image+caption curation. Shuffle-free map_batches; the DuckDB twin
    recomputes every pixel closed-form."""
    from frontera_ray.stages.images import color_forensics_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(color_forensics_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_grad_orientation(sf_dir: str):
    """Gradient-anisotropy screen over the derived corpus
    (images.grad_orientation_table): horizontal AND vertical gradient
    energies per decoded image plus the normalized integer anisotropy
    ratio — interlacing / scanline-banding / single-axis-upscale
    detection, complementing the horizontal-only sharpness gate.
    Shuffle-free map_batches; the DuckDB twin recomputes both neighbor
    pixels of both orientations closed-form."""
    from frontera_ray.stages.images import grad_orientation_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(grad_orientation_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


_URL_EXTS = np.asarray(["jpg", "png", "gif", "webp",
                        "html", "php", "css", "js"], dtype=object)
_IMG_EXTS = {"jpg", "png", "gif", "webp"}


def q_url_extension_census(sf_dir: str):
    """Media-type share of the frontier, per host — the prioritization
    read an image-payload crawler performs before spending fetch
    budget: parse the file extension out of every URL and roll up each
    host's image-URL share (a host serving mostly css/js chrome is
    deprioritized; an image-dense host is boosted). REAL string
    parsing on both sides over the same derived URL corpus: the Ray
    kernel extracts host and extension with vectorized Arrow regex
    kernels, the DuckDB twin re-parses the same strings with
    regexp_extract. Bounded (host, ext) census -> combiner rollup."""
    import pandas as pd

    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        u = md5_u64([f"url:{i}" for i in d])
        exts = _URL_EXTS[((u >> np.uint64(8)) % np.uint64(8)).astype(np.int64)]
        urls = pa.array(
            [f"http://h{int(x) % 64}.test/d{(int(x) >> 6) % 16}/f{i}.{e}"
             for i, x, e in zip(d, u, exts)], pa.string())
        host = pc.struct_field(
            pc.extract_regex(urls, r"^http://(?P<host>[^/]+)/"), "host")
        ext = pc.struct_field(
            pc.extract_regex(urls, r"\.(?P<ext>[a-z0-9]+)$"), "ext")
        g = (pd.DataFrame({
            "host": host.to_numpy(zero_copy_only=False),
            "ext": ext.to_numpy(zero_copy_only=False)})
            .groupby(["host", "ext"], as_index=False).size())
        return pa.table({"host": pa.array(g["host"], pa.string()),
                         "ext": pa.array(g["ext"], pa.string()),
                         "n": pa.array(g["size"], pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "documents").select_columns(["doc_id"])
         .map_batches(kern, batch_format="pyarrow")),
        ["host", "ext"], {"n": ("n", "sum")})
    cen["is_img"] = cen["ext"].isin(_IMG_EXTS).astype("int64") * cen["n"]
    out = (cen.groupby("host")
           .agg(n_urls=("n", "sum"), n_image=("is_img", "sum"))
           .reset_index())
    out["image_share_ppm"] = (out["n_image"] * 1_000_000
                              // out["n_urls"]).astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def q_image_blockiness(sf_dir: str):
    """Block-coding forensics over the derived corpus
    (images.blockiness_table): per decoded image the horizontal
    gradient mass split on the 8x8 block-boundary column lattice
    (x % 8 == 7) vs interior pairs, ratio in milli — a block-coded
    re-encode concentrates gradient energy on the lattice, the
    transcoded-duplicate screen beside color_cast's quantizer sniff.
    Shuffle-free map_batches; the DuckDB twin recomputes both pixels
    of every pair closed-form and splits on the same lattice."""
    from frontera_ray.stages.images import blockiness_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(blockiness_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_border_energy(sf_dir: str):
    """Letterbox / pillarbox screen over the derived corpus
    (images.border_energy_table): per decoded image the exact integer
    variance registers of the 2-pixel border ring vs the interior and
    their milli ratio — a letterboxed or frame-padded duplicate has a
    near-zero-variance border while its interior still matches, the
    crop-before-dedup signal of image curation. Per-image fold in
    Python bigints (the twin's HUGEINT); shuffle-free map_batches."""
    from frontera_ray.stages.images import border_energy_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(border_energy_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_clipping(sf_dir: str):
    """Exposure-clipping census over the derived corpus
    (images.clipping_table): per decoded image the count of values
    crushed to 0 / blown to 255 and the clip_ppm gate — the
    histogram-endpoint screen that catches clipped-tail images a
    mean-level exposure bucket misses (the qimg lattice ≡ 4 mod 8
    can never clip; the lossless path clips ~2/256 of values).
    Shuffle-free map_batches; closed-form DuckDB twin."""
    from frontera_ray.stages.images import clipping_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(clipping_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_image_palette(sf_dir: str):
    """Palette-size / posterization audit over the derived corpus
    (images.palette_table): DISTINCT (r,g,b) triples per decoded
    image and the colors-per-pixel ratio — palette re-encodes and
    quantizers collapse it (here the qimg 512×-coarser lattice shows
    measurably more triple collisions than the lossless path, which
    the `posterized` gate separates). Shuffle-free map_batches; the
    DuckDB twin pivots the three closed-form channels per coordinate
    and replays count(DISTINCT packed)."""
    from frontera_ray.stages.images import palette_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(palette_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_caption_alignment(sf_dir: str):
    """Image↔caption alignment gate over the derived corpus
    (images.caption_alignment_table) — the CLIP-filtering shape
    (decode → visual grid embedding → text feature-hash embedding →
    cosine gate) in EXACT integers: integer dot + squared norms and
    the integer-exact misaligned test (cos < 0.1). One fused
    map_batches pass, no shuffle; the DuckDB twin recomputes the
    sampled pixels closed-form and replays the same md5 token
    sketch."""
    from frontera_ray.stages.images import caption_alignment_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(caption_alignment_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_phash_keeper_best(sf_dir: str):
    """Quality-aware image keep-list (images.sink_keeper_table,
    keeper='best_area') over the planted phash corpus with derived
    per-image dimensions: each hamming<=2 near-dup component keeps its
    highest-resolution member (max w*h, tie min image_id STRING — the
    keep-the-best-copy rule of image training-data dedup). Exercises
    the full production path: exact-sketch collapse to best-member
    representatives, bit-block LSH pairs, union-find components,
    vectorized component-argmax, broadcast assign. The DuckDB twin
    re-derives phash + dims, brute-pairs distinct sketches, closes
    components with a recursive CTE and picks the same argmax."""
    from frontera_ray.stages.images import (_SYNTH_H, _SYNTH_W,
                                            sink_keeper_table,
                                            synth_image_seed,
                                            synth_phash_table)

    def rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        ph = synth_phash_table(b)["simhash"].to_numpy()
        u = synth_image_seed(b)
        six = (u % np.uint64(6)).astype(np.int64)
        return pa.table({
            "image_id": pa.array([str(i) for i in ids], pa.string()),
            "phash": pa.array(ph, pa.int64()),
            "w": pa.array(_SYNTH_W[six].astype(np.int32), pa.int32()),
            "h": pa.array(_SYNTH_H[six].astype(np.int32), pa.int32()),
        })

    ds = _read(sf_dir, "documents").select_columns(["doc_id"]) \
        .map_batches(rows, batch_format="pyarrow")
    out = sink_keeper_table(ds, max_hamming=2,
                            keeper="best_area").to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def q_phash_dup_locality(sf_dir: str):
    """Locality census of perceptual near-dup pairs — mirror-vs-reuse
    attribution: every phash pair (planted corpus, distributed
    bit-block LSH + Hamming verify) is classified by its two sides'
    `source`, separating WITHIN-source reuse (same site re-serving an
    image) from CROSS-source mirroring (syndication / scraper farms) —
    the read that decides whether image dedup can shard by source at
    100 TB or must pair globally. Pair-scoped: only the bounded pair
    stream and its ids touch the driver; the corpus is streamed once
    through a broadcast id filter to fetch the two sides' sources."""
    import pandas as pd
    import ray

    from frontera_ray.stages.dedup import hamming64_neardup_pairs
    from frontera_ray.stages.images import synth_phash_table

    sk = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(synth_phash_table, batch_format="pyarrow"))
    pairs = hamming64_neardup_pairs(sk, max_hamming=2)
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    need_ref = ray.put(set(np.concatenate([a, b]).tolist()))

    def pick(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids = batch["doc_id"].to_numpy()
        mask = np.fromiter((int(i) in need for i in ids), bool, len(ids))
        return batch.filter(pa.array(mask))

    src = (_read(sf_dir, "documents").select_columns(["doc_id", "source"])
           .map_batches(pick, batch_format="pyarrow").to_pandas())
    m = dict(zip(src["doc_id"], src["source"]))
    sa = np.asarray([m[int(i)] for i in a], dtype=object)
    sb = np.asarray([m[int(i)] for i in b], dtype=object)
    lo = np.minimum(sa, sb)
    hi = np.maximum(sa, sb)
    out = (pd.DataFrame({"src_a": lo, "src_b": hi,
                         "same_source": sa == sb})
           .groupby(["src_a", "src_b", "same_source"], as_index=False)
           .size().rename(columns={"size": "n_pairs"}))
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


def q_line_length_stats(sf_dir: str):
    """Per-document line-length profile — the code-vs-prose screen of
    pretraining curation (CCNet/RedPajama-style: prose has short-ish
    uniform lines after wrapping, code and minified blobs have extreme
    max line lengths or very many tiny lines): n_lines, max/total line
    length, mean line length in exact integers, and the `long_line`
    gate. Vectorized Arrow split kernels; the DuckDB twin re-splits
    the same strings with string_split/unnest."""
    def kern(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(b["text"], "\n")
        parent = pc.list_parent_indices(lines)
        lens = pc.utf8_length(pc.list_flatten(lines)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(b)
        n_lines = np.zeros(n, np.int64)
        tot = np.zeros(n, np.int64)
        mx = np.zeros(n, np.int64)
        p = parent.to_numpy()
        np.add.at(n_lines, p, 1)
        np.add.at(tot, p, lens)
        np.maximum.at(mx, p, lens)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "total_len": pa.array(tot, pa.int64()),
            "max_line_len": pa.array(mx, pa.int64()),
            "mean_line_len": pa.array(tot // n_lines, pa.int64()),
            "long_line": pa.array(mx >= 120, pa.bool_()),
        })

    out = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_char_class_profile(sf_dir: str):
    """Character-class profile per document: alpha / digit /
    whitespace / punctuation-other counts and the alpha share in exact
    ppm — the C4-style "mostly natural language?" screen (a low alpha
    share is tables, logs, or base64 spill). One vectorized RE2 pass
    per class on both sides."""
    def kern(b: pa.Table) -> pa.Table:
        total = pc.utf8_length(b["text"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        alpha = pc.count_substring_regex(b["text"], r"[A-Za-z]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        digit = pc.count_substring_regex(b["text"], r"[0-9]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        space = pc.count_substring_regex(b["text"], r"\s") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        other = total - alpha - digit - space
        alpha_ppm = np.where(total > 0,
                             1_000_000 * alpha // np.maximum(total, 1), 0)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars": pa.array(total, pa.int64()),
            "n_alpha": pa.array(alpha, pa.int64()),
            "n_digit": pa.array(digit, pa.int64()),
            "n_space": pa.array(space, pa.int64()),
            "n_other": pa.array(other, pa.int64()),
            "alpha_ppm": pa.array(alpha_ppm, pa.int64()),
            "natural": pa.array(alpha_ppm >= 500_000, pa.bool_()),
        })

    out = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_gopher_rules(sf_dir: str):
    """The Gopher format gates (Rae et al. 2021, public): per document
    the bullet-line ratio, ellipsis-line ratio and symbol-to-word
    ratio in exact integer ppm, and the composite `flagged` verdict
    (bullet > 90%, ellipsis-end > 30%, symbols > 10% of words) — the
    most-cited rule set in pretraining curation. Vectorized Arrow
    split/starts_with/ends_with kernels; the DuckDB twin re-parses
    the same strings."""
    def kern(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(b["text"], "\n")
        parent = pc.list_parent_indices(lines).to_numpy()
        flat = pc.list_flatten(lines)
        n = len(b)
        bullet = (pc.starts_with(flat, "- ").to_numpy(zero_copy_only=False)
                  | pc.starts_with(flat, "* ").to_numpy(zero_copy_only=False)
                  | pc.starts_with(flat, "• ").to_numpy(zero_copy_only=False))
        ell = pc.ends_with(flat, "...").to_numpy(zero_copy_only=False)
        n_lines = np.zeros(n, np.int64)
        n_bullet = np.zeros(n, np.int64)
        n_ell = np.zeros(n, np.int64)
        np.add.at(n_lines, parent, 1)
        np.add.at(n_bullet, parent, bullet.astype(np.int64))
        np.add.at(n_ell, parent, ell.astype(np.int64))
        n_words = pc.count_substring_regex(b["text"], r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_sym = (pc.count_substring_regex(b["text"], "#")
                 .to_numpy(zero_copy_only=False).astype(np.int64)
                 + pc.count_substring_regex(b["text"], r"\.\.\.")
                 .to_numpy(zero_copy_only=False).astype(np.int64))
        bullet_ppm = 1_000_000 * n_bullet // n_lines
        ell_ppm = 1_000_000 * n_ell // n_lines
        sym_ppm = np.where(n_words > 0,
                           1_000_000 * n_sym // np.maximum(n_words, 1), 0)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "bullet_ppm": pa.array(bullet_ppm, pa.int64()),
            "ellipsis_ppm": pa.array(ell_ppm, pa.int64()),
            "symbol_ppm": pa.array(sym_ppm, pa.int64()),
            "flagged": pa.array((bullet_ppm > 900_000)
                                | (ell_ppm > 300_000)
                                | (sym_ppm > 100_000), pa.bool_()),
        })

    out = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_control_char_gate(sf_dir: str):
    """Control-character hygiene gate: per document the count of C0
    control bytes (excluding tab/newline/CR) — binary-spill and
    mojibake detection, the cheapest corruption screen in a text
    pipeline. Vectorized RE2 count on both sides (Arrow
    count_substring_regex vs DuckDB regexp_extract_all length)."""
    def kern(b: pa.Table) -> pa.Table:
        n_ctrl = pc.count_substring_regex(
            b["text"], r"[\x00-\x08\x0b\x0c\x0e-\x1f]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_ctrl": pa.array(n_ctrl, pa.int64()),
            "clean": pa.array(n_ctrl == 0, pa.bool_()),
        })

    out = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_line_dedup(sf_dir: str):
    """Line-level boilerplate dedup (CCNet / RefinedWeb-style): a
    nonempty line that appears in >= 3 DISTINCT documents of the SAME
    source is boilerplate (nav bars, footers, cookie banners) and is
    struck; per document report the nonempty-line count, boilerplate
    share in exact ppm, the character mass that survives, and the
    `flagged` gate (> 30% boilerplate). Pass 1 explodes to distinct
    (source, line, doc) rows (vectorized Arrow split + C++ in-batch
    group_by distinct — a doc lives wholly inside one batch) and
    counts docs per (source, line) on ONE key-hash repartition +
    per-partition C++ group_by (text.line_boilerplate_census). The
    filtered boilerplate set is small by construction (each entry is
    backed by >= 3 docs) and is broadcast ONCE via ray.put; pass 2
    marks membership with one vectorized ``pc.is_in`` per batch. At
    corpus scale, when the boiler set exceeds the broadcast bound,
    ``text.line_boilerplate_profile`` switches to its union-tag
    keyed-exchange mark path (NO driver materialization — tested
    byte-identical to the broadcast path)."""
    from frontera_ray.stages.text import line_boilerplate_profile

    cols = ["doc_id", "source", "text"]
    out = line_boilerplate_profile(
        _read(sf_dir, "documents").select_columns(cols),
        _read(sf_dir, "documents").select_columns(cols)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_template_3gram(sf_dir: str):
    """Templated-source detection: per source the most frequent token
    3-gram, its count, the source's total 3-gram mass and the top
    gram's share in exact ppm — a source whose single top template
    gram owns a large share is boilerplate-generated (listing pages,
    auto-generated mirrors) and a candidate for source-level
    down-weighting. One vectorized window pass (flat token array +
    parent-run mask — no per-row Python) with an IN-BATCH C++
    group_by combine, then ONE key-hash repartition
    (relational.hash_partitioned — every skey's partial counts land
    whole in one block, so a per-PARTITION C++ group_by finishes the
    census exactly) instead of Ray's sort-based groupby aggregate,
    which costs ~8x more on a high-cardinality string key (measured
    5-6 s vs ~2 s at sf0.1). The driver merges only per-partition
    per-source winners — bounded by sources x partitions, never the
    gram census."""
    SEP = "\x1f"

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(b["text"])
        parent = pc.list_parent_indices(toks).to_numpy()
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        if len(flat) < 3:
            return pa.table({"skey": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        f = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        g = pc.binary_join_element_wise(
            f.slice(0, len(f) - 2), f.slice(1, len(f) - 2),
            f.slice(2, len(f) - 2), " ")
        mask = (parent[:-2] == parent[1:-1]) & (parent[:-2] == parent[2:])
        src = b["source"].take(pa.array(parent[:-2]))
        skey = pc.binary_join_element_wise(src, g, SEP)
        t = pa.table({"skey": skey.filter(pa.array(mask))})
        part = t.group_by("skey").aggregate([("skey", "count")])
        return pa.table({"skey": part["skey"],
                         "cnt": part["skey_count"].cast(pa.int64())})

    from frontera_ray.stages.relational import hash_partitioned

    agg = hash_partitioned(
        _read(sf_dir, "documents")
        .select_columns(["source", "text"])
        .map_batches(explode, batch_format="pyarrow"), "skey")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        if len(b) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "top_gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "block_total": pa.array([], pa.int64())})
        b = b.group_by("skey").aggregate([("cnt", "sum")])
        sk = b["skey"].to_pandas().str.split(SEP, n=1, expand=True)
        df = pd.DataFrame({"source": sk[0], "gram": sk[1],
                           "cnt": b["cnt_sum"].to_pandas()})
        tot = df.groupby("source")["cnt"].sum()
        top = (df.sort_values(["cnt", "gram"], ascending=[False, True])
                 .groupby("source").head(1))
        top = top.set_index("source")
        out = pd.DataFrame({
            "source": tot.index.to_numpy(),
            "top_gram": top["gram"].reindex(tot.index).to_numpy(),
            "cnt": top["cnt"].reindex(tot.index).to_numpy(),
            "block_total": tot.to_numpy()})
        return pa.Table.from_pandas(out, preserve_index=False)

    import pandas as pd
    parts = pa.concat_tables(
        list(agg.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
                .iter_batches(batch_format="pyarrow", batch_size=None))
    ).to_pandas()
    tot = parts.groupby("source")["block_total"].sum()
    top = (parts.sort_values(["cnt", "top_gram"], ascending=[False, True])
                .groupby("source").head(1).set_index("source"))
    out = pd.DataFrame({
        "source": tot.index.to_numpy(),
        "top_gram": top["top_gram"].reindex(tot.index).to_numpy(),
        "cnt": top["cnt"].reindex(tot.index).astype("int64").to_numpy(),
        "n_grams": tot.astype("int64").to_numpy(),
    })
    out["share_ppm"] = (1_000_000 * out["cnt"] // out["n_grams"]).astype(
        "int64")
    return out.sort_values("source").reset_index(drop=True)


def q_prefix_dup(sf_dir: str):
    """Prefix-duplicate clusters (truncated-mirror / re-scrape screen):
    documents sharing the same 64-char text prefix are one cluster —
    the cheap bucket key that catches truncation dups exact-hash dedup
    misses (same head, tail cut at different lengths). Per cluster
    with >= 2 docs: the prefix, member count and the min-doc_id
    keeper. One vectorized slice kernel + one hash-shuffle groupby on
    the HIGH-cardinality prefix key (Min+Count fused in the same
    exchange)."""
    import ray

    def kern(b: pa.Table) -> pa.Table:
        return pa.table({
            "prefix": pc.utf8_slice_codeunits(b["text"], 0, 64),
            "doc_id": b["doc_id"],
        })

    agg = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(kern, batch_format="pyarrow")
           .groupby("prefix").aggregate(
               ray.data.aggregate.Count(),
               ray.data.aggregate.Min("doc_id")))

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["count()"], 2))
        return pa.table({
            "prefix": b["prefix"],
            "n_docs": b["count()"].cast(pa.int64()),
            "keeper": b["min(doc_id)"].cast(pa.int64()),
        })

    out = (agg.map_batches(finish, batch_format="pyarrow")).to_pandas()
    return out.sort_values("prefix").reset_index(drop=True)


def q_url_depth_census(sf_dir: str):
    """Per-host URL path-depth census — the frontier depth-budget read
    (a BFS/DFS depth-decay strategy allocates budget per depth; a host
    whose frontier is dominated by deep URLs is a trap or an archive
    to down-prioritize): n_urls, max/mean depth (exact integer mean),
    deep-URL share in ppm (depth >= 6). Derived deterministic URL
    corpus (same doc_id recurrence family as url_param_census), REAL
    parsing on both sides: the Ray kernel counts path separators with
    vectorized Arrow kernels, the DuckDB twin re-splits the same
    strings. 64 hosts -> combiner rollup, no shuffle."""
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        urls = pa.array(
            [f"http://h{i % 64}.test" + "/seg" * (1 + i % 6) + f"/p{i}"
             for i in d], pa.string())
        depth = pc.subtract(
            pc.count_substring(urls, "/"), 2).cast(pa.int64())
        host = pc.list_element(pc.split_pattern(urls, "/"), 2)
        deep = pc.greater_equal(depth, 6).cast(pa.int64())
        return pa.table({"host": host, "depth": depth, "deep": deep})

    ds = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(kern, batch_format="pyarrow"))
    df = partial_groupby_agg(ds, "host", {
        "n_urls": ("depth", "count"),
        "max_depth": ("depth", "max"),
        "sum_depth": ("depth", "sum"),
        "n_deep": ("deep", "sum"),
    })
    df["mean_depth"] = (df["sum_depth"] // df["n_urls"]).astype("int64")
    df["deep_ppm"] = (1_000_000 * df["n_deep"] // df["n_urls"]).astype(
        "int64")
    out = df[["host", "n_urls", "max_depth", "mean_depth",
              "deep_ppm"]].copy()
    for c in ("n_urls", "max_depth"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def q_image_channel_corr(sf_dir: str):
    """Cross-channel correlation census over the derived corpus
    (images.channel_corr_table, one decode pass): exact integer R-G /
    G-B covariances, Pearson correlation in ppm, and the
    grayscale/sepia gate — the desaturated-duplicate screen (a
    grayscale re-encode defeats exact-hash dedup but shows
    corr ≈ 1e6 here). Shuffle-free map_batches; the DuckDB twin
    recomputes every pixel of every channel pair closed-form."""
    from frontera_ray.stages.images import channel_corr_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(channel_corr_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_source_lang_mi(sf_dir: str):
    """Source × language mutual-information cells — the
    corpus-segregation read of mixture design (MI near zero: every
    source contributes every language, safe to weight independently;
    high MI: languages live in single sources and source-level dedup
    or down-weighting shifts the language mix). Per (source, lang)
    cell the count and the exact micro-nat MI term
    floor(1e6 · (n_sl/N) · ln(n_sl·N / (n_s·n_l)) + 0.5) — identical
    IEEE double ops on both sides (the bigram_pmi ln-parity pattern).
    Counts via combiner rollup (cells are few), margins on the
    driver."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"], "lang": b["lang"],
                         "one": pa.array(np.ones(len(b), np.int64),
                                         pa.int64())})

    ds = (_read(sf_dir, "documents").select_columns(["source", "lang"])
          .map_batches(kern, batch_format="pyarrow"))
    df = partial_groupby_agg(ds, ["source", "lang"],
                             {"n_sl": ("one", "sum")})
    n_s = df.groupby("source")["n_sl"].transform("sum").to_numpy()
    n_l = df.groupby("lang")["n_sl"].transform("sum").to_numpy()
    n_sl = df["n_sl"].to_numpy().astype(np.int64)
    N = int(n_sl.sum())
    term = np.floor(
        1_000_000.0 * (n_sl.astype(np.float64) / N)
        * np.log(n_sl.astype(np.float64) * N
                 / (n_s.astype(np.float64) * n_l.astype(np.float64)))
        + 0.5).astype(np.int64)
    out = pd.DataFrame({
        "source": df["source"], "lang": df["lang"],
        "n_sl": n_sl, "n_source": n_s.astype("int64"),
        "n_lang": n_l.astype("int64"), "mi_term_micro": term,
    })
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


def q_brier_score(sf_dir: str):
    """EXACT Brier score of the derived confidence column against the
    'purchase' label — the proper-scoring-rule companion to
    q_calibration_bins/q_ece (a model can be well-ranked (AUC) and
    calibrated on average (ECE) yet still diffuse; Brier catches it).
    Confidence in integer percent cc ∈ [0,100], so the squared error
    (cc − 100·lab)² is exact; brier_micro = 100·Σse // n. One partial
    pass, single-row register — the corpus never moves."""
    def part(b: pa.Table) -> pa.Table:
        cc = b["conf_c"].to_numpy()
        lab = b["lab"].to_numpy()
        se = (cc - 100 * lab) ** 2
        return pa.table({
            "n": pa.array([len(cc)], pa.int64()),
            "n_pos": pa.array([int(lab.sum())], pa.int64()),
            "sum_se": pa.array([int(se.sum())], pa.int64()),
        })

    parts = pa.concat_tables(
        list(_event_conf_label(sf_dir)
             .map_batches(part, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None))
    ).to_pandas().sum()
    import pandas as pd
    n, n_pos, sum_se = (int(parts["n"]), int(parts["n_pos"]),
                        int(parts["sum_se"]))
    return pd.DataFrame({
        "n": [n], "n_pos": [n_pos], "sum_se": [sum_se],
        "brier_micro": [100 * sum_se // n],
    }).astype("int64")


def q_gopher_word_rules(sf_dir: str):
    """The Gopher WORD-level quality rules (Rae et al. 2021 — the
    companion set to q_gopher_rules' format gates): per document the
    word count (gate: 50..100000), exact mean word length in
    milli-chars (gate: 3000..10000) and the stop-word evidence count
    from the canonical 10-word set (gate: >= 2 instances), plus the
    composite `passes`. One vectorized split + np.add.at reduction +
    one pc.is_in membership sweep; the DuckDB twin re-splits the same
    strings."""
    STOP = ["the", "of", "and", "to", "in", "a", "be", "that",
            "have", "it"]
    stop_arr = pa.array(STOP, pa.string())

    def kern(b: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(b["text"])
        parent = pc.list_parent_indices(toks).to_numpy()
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        is_stop = pc.is_in(flat, value_set=stop_arr) \
            .to_numpy(zero_copy_only=False).astype(bool) & keep
        n = len(b)
        n_words = np.zeros(n, np.int64)
        sum_len = np.zeros(n, np.int64)
        n_stop = np.zeros(n, np.int64)
        np.add.at(n_words, parent, keep.astype(np.int64))
        np.add.at(sum_len, parent, np.where(keep, lens, 0))
        np.add.at(n_stop, parent, is_stop.astype(np.int64))
        mean_milli = np.where(n_words > 0,
                              1000 * sum_len // np.maximum(n_words, 1), 0)
        word_gate = (n_words >= 50) & (n_words <= 100_000)
        len_gate = (mean_milli >= 3000) & (mean_milli <= 10_000)
        stop_gate = n_stop >= 2
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len_milli": pa.array(mean_milli, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "word_gate": pa.array(word_gate, pa.bool_()),
            "len_gate": pa.array(len_gate, pa.bool_()),
            "stop_gate": pa.array(stop_gate, pa.bool_()),
            "passes": pa.array(word_gate & len_gate & stop_gate,
                               pa.bool_()),
        })

    out = (_read(sf_dir, "documents").select_columns(["doc_id", "text"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_audio_clipping(sf_dir: str):
    """Clipped-audio census through the REAL qaud round trip
    (images.audio_clipping_table): per clip the count/ppm of samples
    at |s| >= 8000 and the hot-master gate — only the loudest
    amplitude class reaches the region, so the gate separates the
    classes exactly like real clipping separates damaged masters.
    Shuffle-free map_batches; the DuckDB twin recomputes every
    SAMPLE closed-form."""
    from frontera_ray.stages.images import audio_clipping_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(audio_clipping_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_video_scene_cuts(sf_dir: str):
    """Shot-boundary census through the REAL qvid round trip
    (images.video_scene_cuts_table): per video the adjacent-frame
    delta-mass extrema and the count of hard cuts (pair mass >=
    48000) — the slideshow / static-clip discriminator. Shuffle-free;
    the DuckDB twin recomputes BOTH frames of every pixel pair."""
    from frontera_ray.stages.images import video_scene_cuts_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(video_scene_cuts_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_embedding_norm_census(sf_dir: str):
    """Embedding-norm census per label — the broken-encoder screen a
    training pipeline runs before ANN/dedup (all-zero vectors, norm
    collapse, norm blow-ups all poison cosine geometry): per label the
    vector count, zero-vector count, and min/max/mean of the squared
    norm in EXACT integer units (each component floor-quantized at
    2^20 before squaring — float32→float64 widening and the
    power-of-two scale are both exact, so Ray and DuckDB compute
    identical integers). Vectorized flatten + np.add.at over parent
    runs; labels are few -> combiner rollup, no shuffle."""
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        parent = pc.list_parent_indices(emb).to_numpy()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(flat * 1048576.0).astype(np.int64)
        n = len(b)
        norm2 = np.zeros(n, np.int64)
        np.add.at(norm2, parent, q * q)
        return pa.table({
            "label": b["label"].cast(pa.int64()),
            "norm2": pa.array(norm2, pa.int64()),
            "is_zero": pa.array((norm2 == 0).astype(np.int64), pa.int64()),
        })

    ds = (_read(sf_dir, "embeddings").select_columns(["label", "embedding"])
          .map_batches(kern, batch_format="pyarrow"))
    df = partial_groupby_agg(ds, "label", {
        "n_vecs": ("norm2", "count"),
        "n_zero": ("is_zero", "sum"),
        "min_norm2": ("norm2", "min"),
        "max_norm2": ("norm2", "max"),
        "sum_norm2": ("norm2", "sum"),
    })
    df["mean_norm2"] = (df["sum_norm2"] // df["n_vecs"]).astype("int64")
    out = df[["label", "n_vecs", "n_zero", "min_norm2", "max_norm2",
              "mean_norm2"]].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


def q_embedding_dim_census(sf_dir: str):
    """Per-DIMENSION embedding census — the dead/dominant-dimension
    screen (a dimension with near-zero variance wastes index bits; one
    with outsized mass makes cosine geometry anisotropic): for each of
    the d dimensions, the exact integer sum and sum-of-squares of the
    2^20-floor-quantized components plus the zero-component count.
    The transposed aggregate: each block reduces its vectors into a
    d-row partial with one np.add.at sweep (no shuffle — output is d
    rows regardless of corpus size), partials merged on the driver.
    The DuckDB twin unnests each list WITH ORDINALITY and re-sums."""
    def partial(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(flat * 1048576.0).astype(np.int64)
        widths = np.diff(emb.offsets.to_numpy())
        d = int(widths.max()) if len(widths) else 0
        # dimension index of every flat component (lists are uniform
        # width here; ragged inputs still index correctly per vector);
        # starts are recomputed from widths so sliced arrays with a
        # nonzero first offset stay correct
        starts = np.concatenate(([0], np.cumsum(widths)[:-1])) \
            if len(widths) else np.zeros(0, np.int64)
        dim = np.arange(len(q)) - np.repeat(starts, widths)
        s = np.zeros(d, np.int64)
        ss = np.zeros(d, np.int64)
        nz = np.zeros(d, np.int64)
        cnt = np.zeros(d, np.int64)
        np.add.at(s, dim, q)
        np.add.at(ss, dim, q * q)
        np.add.at(nz, dim, (q == 0).astype(np.int64))
        np.add.at(cnt, dim, 1)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "sum_q": pa.array(s, pa.int64()),
            "sum_q2": pa.array(ss, pa.int64()),
            "n_zero": pa.array(nz, pa.int64()),
        })

    parts = pa.concat_tables(
        list(_read(sf_dir, "embeddings").select_columns(["embedding"])
             .map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    df = parts.to_pandas().groupby("dim", as_index=False).sum()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("dim").reset_index(drop=True)


def q_cluster_separation(sf_dir: str):
    """Between-label separation audit (ann.cluster_separation_pairs):
    per label pair the exact-ppm Davies-Bouldin-style score
    d²(μ_a,μ_b)/(var_a+var_b) over 2^20-quantized components — the
    are-these-clusters-real read before stratified dedup/sampling
    trusts a labeling. One shuffle-free register pass (per-block
    per-label (n, ss, S) partials), O(labels·d) driver fold in Python
    bigints; the DuckDB twin re-derives every register with HUGEINT."""
    from frontera_ray.stages.ann import cluster_separation_pairs

    return cluster_separation_pairs(
        _read(sf_dir, "embeddings").select_columns(["label", "embedding"]))


def q_audio_features(sf_dir: str):
    """Audio loudness / silence / voiced-unvoiced screens through the
    REAL qaud codec round trip (images.audio_features_table): per clip
    the exact integer Σs² (rms² milli-units), peak sample and
    zero-crossing count, with the loud gate separating the amplitude
    classes — the audio modality run through the image family's
    closed-form-oracle pattern (every decoded SAMPLE recomputed by the
    DuckDB twin). Shuffle-free map_batches."""
    from frontera_ray.stages.images import audio_features_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(audio_features_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_video_motion(sf_dir: str):
    """Temporal-motion census through the REAL qvid container round
    trip (images.video_motion_table): per video the exact integer
    inter-frame delta mass over decoded pixels — the static-clip /
    slideshow screen of video curation. The DuckDB twin recomputes
    BOTH frames of every pixel pair closed-form with qimg
    dequantization. Shuffle-free map_batches."""
    from frontera_ray.stages.images import video_motion_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(video_motion_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_audio_silence(sf_dir: str):
    """Silence-trim census through the REAL qaud round trip
    (images.audio_silence_table): per clip the trim points (first/last
    sample above threshold), quiet-sample share and all-silent flag —
    the dead-air screen of audio ingest. Per-sample closed-form DuckDB
    twin; shuffle-free map_batches."""
    from frontera_ray.stages.images import audio_silence_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(audio_silence_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_video_flicker(sf_dir: str):
    """Exposure-flicker census through the REAL qvid round trip
    (images.video_flicker_table): per-frame BT.601 luma masses and the
    integer between-frame variance proxy Σ(k·L_f − ΣL)² — the
    strobing / auto-exposure-hunting screen, the global-brightness
    twin of video_motion's local deltas. Per-frame closed-form DuckDB
    twin; shuffle-free map_batches."""
    from frontera_ray.stages.images import video_flicker_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(video_flicker_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_redirect_resolve(sf_dir: str):
    """Redirect-chain resolution to the canonical target — the
    pre-dedup canonicalization every frontier performs (frontera
    carries the full chain in Request.meta[b'redirect_urls'];
    core/models.py) — via DISTRIBUTED POINTER DOUBLING
    (relational.pointer_double_resolve): chains derived
    deterministically from doc_ids (u = md5_64('rd:'||id); nodes with
    u%3==0 redirect to id-1-(u%7), strictly decreasing so acyclic),
    resolved in ceil(log2 L) keyed exchanges of slim (src,dst,hops)
    rows — never a length-L sequential walk, never a driver loop over
    rows. The DuckDB twin walks every chain with WITH RECURSIVE."""
    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import pointer_double_resolve

    def init(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        u = md5_u64([f"rd:{i}" for i in ids])
        tgt = ids - 1 - (u % np.uint64(7)).astype(np.int64)
        has = ((u % np.uint64(3)) == 0) & (tgt >= 0)
        return pa.table({
            "src": pa.array(ids, pa.int64()),
            "dst": pa.array(np.where(has, tgt, ids), pa.int64()),
            "hops": pa.array(has.astype(np.int64), pa.int64()),
            "done": pa.array(~has, pa.bool_())})

    ds = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(init, batch_format="pyarrow"))
    out = pointer_double_resolve(ds).to_pandas()
    assert bool(out["done"].all()), "unresolved chains after rounds"
    out = out.rename(columns={"src": "doc_id", "dst": "final_id"})
    return (out[["doc_id", "final_id", "hops"]]
            .sort_values("doc_id").reset_index(drop=True))



def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U between the purchase and click cohorts on event
    value — the NONPARAMETRIC two-sample A/B read (no normality
    assumption; complements welch_t and ab_ztest), EXACT integers
    end-to-end: U in DOUBLED units (2U = 2*sum(c1*cum2) + sum(c1*c2)
    over the value census, so .5 tie credits stay integral) plus the
    pooled tie-correction term sum(t^3 - t) the variance needs. One
    block-partial value census (bounded by the price grid, the
    gini_split register shape) -> driver fold in Python bigints."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        sel = (et == "purchase") | (et == "click")
        v = np.floor(b["value"].to_numpy()[sel] * 100 + 0.5).astype(np.int64)
        g1 = et[sel] == "purchase"
        uv, inv = np.unique(v, return_inverse=True)
        c1 = np.bincount(inv, weights=g1, minlength=len(uv))
        c2 = np.bincount(inv, weights=~g1, minlength=len(uv))
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c1": pa.array(c1.astype(np.int64), pa.int64()),
                         "c2": pa.array(c2.astype(np.int64), pa.int64())})

    acc: dict[int, list[int]] = {}
    ds = (_read(sf_dir, "events").select_columns(["event_type", "value"])
          .map_batches(partial, batch_format="pyarrow"))
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for v, a, b_ in zip(t["v"].to_numpy(), t["c1"].to_numpy(),
                            t["c2"].to_numpy()):
            cur = acc.setdefault(int(v), [0, 0])
            cur[0] += int(a)
            cur[1] += int(b_)
    n1 = n2 = u2 = ties = 0
    cum2 = 0
    for v in sorted(acc):
        c1, c2 = acc[v]
        u2 += c1 * (2 * cum2 + c2)
        t_ = c1 + c2
        ties += t_ * t_ * t_ - t_
        n1 += c1
        n2 += c2
        cum2 += c2
    return pd.DataFrame([{"n1": n1, "n2": n2, "u2": u2,
                          "tie_cubes": ties}]).astype("int64")


def q_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis k-sample rank-test REGISTERS over event value
    across ALL FIVE event-type cohorts — the k-group extension of
    `mann_whitney` (is any cohort's value distribution shifted?),
    EXACT integers: one (value-cents, event_type) census (bounded by
    the price grid) -> global DOUBLED mid-ranks from the value
    marginals -> per-cohort (n, Σ2r) plus the pooled tie term Σ(t³−t)
    the H statistic's correction needs; Python-bigint driver fold,
    window-cumulative HUGEINT SQL twin."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def part(b: pa.Table) -> pa.Table:
        import pandas as _pd
        g = (_pd.DataFrame({
            "v": np.floor(b["value"].to_numpy() * 100 + 0.5)
                   .astype(np.int64),
            "event_type": b["event_type"].to_numpy(zero_copy_only=False)})
            .groupby(["v", "event_type"], as_index=False).size())
        return pa.table({"v": pa.array(g["v"], pa.int64()),
                         "event_type": pa.array(g["event_type"], pa.string()),
                         "n": pa.array(g["size"], pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "events").select_columns(["event_type", "value"])
         .map_batches(part, batch_format="pyarrow")),
        ["v", "event_type"], {"n": ("n", "sum")})
    vv = cen["v"].to_numpy()
    nn = cen["n"].to_numpy()
    uv, iv = np.unique(vv, return_inverse=True)
    tot = np.zeros(len(uv), dtype=np.int64)
    np.add.at(tot, iv, nn)
    r2 = _doubled_ranks(uv, tot)  # doubled mid-ranks per distinct value
    ties = sum(int(t) ** 3 - int(t) for t in tot.tolist())
    rows = {}
    for et, w, ivx in zip(cen["event_type"], nn.tolist(), iv.tolist()):
        n, rs = rows.get(et, (0, 0))
        rows[et] = (n + w, rs + w * r2[ivx])
    return pd.DataFrame(
        [{"event_type": et, "n": n, "rank_sum2": rs, "tie_cubes": ties}
         for et, (n, rs) in sorted(rows.items())]) \
        .astype({"n": "int64", "rank_sum2": "int64", "tie_cubes": "int64"})


def q_brown_forsythe(sf_dir: str):
    """Brown-Forsythe variance-homogeneity REGISTERS: lineitem
    quantity spread around each return-flag cohort's MEDIAN — the
    robust Levene variant that screens "same center, different
    spread?" before any pooled-variance test. EXACT integers: the
    (flag, quantity) census gives each cohort's DOUBLED median
    closed-form (lo+hi middle order statistics), and since the
    absolute deviation depends only on (flag, value), the ANOVA
    registers (n, Σ|2x−med2|, Σ(2x−med2)²) fold from the SAME census
    — one pass, no per-row second scan. Window-cumulative SQL twin."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def part(b: pa.Table) -> pa.Table:
        import pandas as _pd
        g = (_pd.DataFrame({
            "flag": b["l_returnflag"].to_numpy(zero_copy_only=False),
            "q": np.round(b["l_quantity"].to_numpy()).astype(np.int64)})
            .groupby(["flag", "q"], as_index=False).size())
        return pa.table({"flag": pa.array(g["flag"], pa.string()),
                         "q": pa.array(g["q"], pa.int64()),
                         "n": pa.array(g["size"], pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "lineitem")
         .select_columns(["l_returnflag", "l_quantity"])
         .map_batches(part, batch_format="pyarrow")),
        ["flag", "q"], {"n": ("n", "sum")})
    out = []
    for flag, g in cen.groupby("flag"):
        g = g.sort_values("q")
        qs = g["q"].to_numpy()
        ns = g["n"].to_numpy()
        ntot = int(ns.sum())
        cum = np.cumsum(ns)
        lo = int(qs[np.searchsorted(cum, (ntot + 1) // 2)])
        hi = int(qs[np.searchsorted(cum, ntot // 2 + 1)])
        med2 = lo + hi
        z = np.abs(2 * qs - med2)
        out.append({"flag": flag, "n": ntot,
                    "sum_z": int((ns * z).sum()),
                    "sum_z2": int((ns * z * z).sum())})
    return pd.DataFrame(out).astype(
        {"n": "int64", "sum_z": "int64", "sum_z2": "int64"})


def q_cochran_armitage(sf_dir: str):
    """Cochran-Armitage trend-test REGISTERS: does the return rate
    trend with the discount level? Ordered dose d = discount cents
    (0..10), binary outcome l_returnflag = 'R'; one bounded census ->
    the five integer registers (N, R, Σnd, Σnd², Σrd) that give the
    statistic T = Σd(Nr−Rn) and its variance closed-form — the
    dose-response screen behind ramp decisions, exact end-to-end."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def part(b: pa.Table) -> pa.Table:
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        r = (b["l_returnflag"].to_numpy(zero_copy_only=False)
             == "R").astype(np.int64)
        key = d * 2 + r
        uv, cnt = np.unique(key, return_counts=True)
        return pa.table({"d": pa.array(uv // 2, pa.int64()),
                         "r": pa.array(uv % 2, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "lineitem")
         .select_columns(["l_returnflag", "l_discount"])
         .map_batches(part, batch_format="pyarrow")),
        ["d", "r"], {"n": ("n", "sum")})
    dd = cen["d"].to_numpy()
    rr = cen["r"].to_numpy()
    nn = cen["n"].to_numpy()
    n = int(nn.sum())
    r_tot = int(nn[rr == 1].sum())
    sum_nd = int((nn * dd).sum())
    sum_nd2 = int((nn * dd * dd).sum())
    sum_rd = int((nn * dd)[rr == 1].sum())
    return pd.DataFrame([{"n": n, "r": r_tot, "sum_nd": sum_nd,
                          "sum_nd2": sum_nd2, "sum_rd": sum_rd}]) \
        .astype("int64")


def q_url_param_census(sf_dir: str):
    """Query-parameter census over a derived URL corpus — the
    URL-normalization read that decides which params a crawler strips
    before fingerprinting: per param key, how many URLs carry it and
    how many DISTINCT values it takes. A key whose distinct-value
    ratio is high ('sid' here — a session-pool id) is a
    trap/duplication amplifier the canonicalizer should drop; a
    low-cardinality key ('page', 'lang') is real pagination. REAL
    string parsing on both sides: the Ray kernel splits the url with
    vectorized Arrow kernels (split '?' -> '&' -> '='), the DuckDB
    twin re-parses the same strings with string_split/unnest. Census
    is bounded by the value pools, so one combiner rollup."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        urls = pa.array(
            [(f"http://h{i % 64}.test/p/{i}?sid=s{i % 4096}"
              f"&page={i % 5}&lang=l{i % 3}"
              if i % 2 == 0 else
              f"http://h{i % 64}.test/p/{i}?page={i % 5}")
             for i in d], pa.string())
        qs = pc.split_pattern(urls, "?")
        tail = pc.list_element(qs, 1)
        params = pc.split_pattern(tail, "&")
        flat = pc.list_flatten(params)
        kv = pc.split_pattern(flat, "=")
        g = (pd.DataFrame({
            "key": pc.list_element(kv, 0).to_numpy(zero_copy_only=False),
            "val": pc.list_element(kv, 1).to_numpy(zero_copy_only=False)})
            .groupby(["key", "val"], as_index=False).size())
        return pa.table({"key": pa.array(g["key"], pa.string()),
                         "val": pa.array(g["val"], pa.string()),
                         "n": pa.array(g["size"], pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "documents").select_columns(["doc_id"])
         .map_batches(kern, batch_format="pyarrow")),
        ["key", "val"], {"n": ("n", "sum")})
    out = (cen.groupby("key")
           .agg(n_urls=("n", "sum"), n_values=("val", "count"))
           .reset_index())
    out["distinct_ppm"] = (out["n_values"] * 1_000_000
                           // out["n_urls"]).astype("int64")
    out["strip"] = (out["distinct_ppm"] > 500_000).astype("int64")
    return (out.sort_values("key").reset_index(drop=True)
            .astype({"n_urls": "int64", "n_values": "int64"}))


def q_life_table(sf_dir: str):
    """Kaplan-Meier LIFE TABLE for time-to-first-purchase per user,
    right-censored at the user's last observed event — the survival /
    conversion-latency read (and the crawl twin: time-to-first-change
    for revisit policy). One combiner rollup per user (min ts, min
    purchase ts, max ts — all associative), then the day-grid census
    with at-risk counts n_risk(t) = Σ_{t'>=t} n(t'), exact integers;
    the KM product itself is one rational fold away and carries no
    extra information. Suffix-cumulative SQL twin."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    SENT = np.int64(2**62)

    def part(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        pur = np.where(et == "purchase", ts, SENT)
        g = (pd.DataFrame({"user_id": b["user_id"].to_numpy(),
                           "t0": ts, "tp": pur, "tmax": ts})
             .groupby("user_id", as_index=False)
             .agg(t0=("t0", "min"), tp=("tp", "min"), tmax=("tmax", "max")))
        return pa.table({"user_id": pa.array(g["user_id"], pa.int64()),
                         "t0": pa.array(g["t0"], pa.int64()),
                         "tp": pa.array(g["tp"], pa.int64()),
                         "tmax": pa.array(g["tmax"], pa.int64())})

    u = partial_groupby_agg(
        (_read(sf_dir, "events").select_columns(["user_id", "ts",
                                                 "event_type"])
         .map_batches(part, batch_format="pyarrow")),
        "user_id", {"t0": ("t0", "min"), "tp": ("tp", "min"),
                    "tmax": ("tmax", "max")})
    day = 86_400_000_000
    ev = u["tp"].to_numpy() < SENT
    t = np.where(ev, (u["tp"].to_numpy() - u["t0"].to_numpy()) // day,
                 (u["tmax"].to_numpy() - u["t0"].to_numpy()) // day)
    g = (pd.DataFrame({"t_days": t, "ev": ev.astype(np.int64)})
         .groupby("t_days")
         .agg(n_events=("ev", "sum"), n=("ev", "count"))
         .sort_index(ascending=False))
    g["n_risk"] = g["n"].cumsum()
    g["n_censored"] = g["n"] - g["n_events"]
    out = g.reset_index().sort_values("t_days")
    return (out[["t_days", "n_events", "n_censored", "n_risk"]]
            .reset_index(drop=True).astype("int64"))


def q_diff_in_diff(sf_dir: str):
    """Difference-in-differences CELL REGISTERS: purchase-value cents
    by (treat = odd user_id, post = on/after 2024-01-16) — the causal
    pre/post × treatment/control read; one bounded census pass emits
    the four (n, sum_cents) register pairs, and the DiD estimate
    (m̂11−m̂10)−(m̂01−m̂00) is one rational fold the analyst applies.
    Exact integers end-to-end."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    POST_US = 1705363200000000  # 2024-01-16 00:00:00 UTC

    def part(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        sel = et == "purchase"
        ts = b["ts"].to_numpy().astype("datetime64[us]").view(np.int64)[sel]
        cents = np.floor(b["value"].to_numpy()[sel] * 100 + 0.5) \
            .astype(np.int64)
        g = (pd.DataFrame({
            "treat": (b["user_id"].to_numpy()[sel] % 2).astype(np.int64),
            "post": (ts >= POST_US).astype(np.int64),
            "cents": cents})
            .groupby(["treat", "post"], as_index=False)
            .agg(n=("cents", "count"), sum_cents=("cents", "sum")))
        return pa.table({"treat": pa.array(g["treat"], pa.int64()),
                         "post": pa.array(g["post"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64()),
                         "sum_cents": pa.array(g["sum_cents"], pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "events")
         .select_columns(["user_id", "ts", "event_type", "value"])
         .map_batches(part, batch_format="pyarrow")),
        ["treat", "post"], {"n": ("n", "sum"),
                            "sum_cents": ("sum_cents", "sum")})
    return (cen.sort_values(["treat", "post"]).reset_index(drop=True)
            .astype("int64"))


def q_fisher_2x2(sf_dir: str):
    """Fisher-exact 2×2 contingency REGISTERS: purchase-vs-click ×
    weekend-vs-weekday event counts plus the cross-product odds-ratio
    terms (n11·n00, n10·n01) — the small-cell association read where
    the chi-square approximation breaks. One bounded census, exact
    integers end-to-end."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def part(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        sel = (et == "purchase") | (et == "click")
        ts = b["ts"].to_numpy().astype("datetime64[us]")[sel]
        # 1970-01-01 is a Thursday: weekday index = (epoch_day + 4) % 7
        dow = ((ts.astype("datetime64[D]").view(np.int64) + 4) % 7)
        g = (pd.DataFrame({"pur": (et[sel] == "purchase").astype(np.int64),
                           "wknd": (dow >= 5).astype(np.int64)})
             .groupby(["pur", "wknd"], as_index=False).size())
        return pa.table({"pur": pa.array(g["pur"], pa.int64()),
                         "wknd": pa.array(g["wknd"], pa.int64()),
                         "n": pa.array(g["size"], pa.int64())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "events").select_columns(["event_type", "ts"])
         .map_batches(part, batch_format="pyarrow")),
        ["pur", "wknd"], {"n": ("n", "sum")}).set_index(["pur", "wknd"])

    def cell(p, w):
        try:
            return int(cen.loc[(p, w), "n"])
        except KeyError:
            return 0
    n11, n10 = cell(1, 1), cell(1, 0)
    n01, n00 = cell(0, 1), cell(0, 0)
    return pd.DataFrame([{
        "n11": n11, "n10": n10, "n01": n01, "n00": n00,
        "odds_num": n11 * n00, "odds_den": n10 * n01}]).astype("int64")


def q_page_hinkley(sf_dir: str):
    """Page-Hinkley drift detection over the daily order-revenue
    series, EXACT integers: daily totals in cents via one combiner
    rollup (the day grid is calendar-bounded), then the PH scan
    PH_t = Σ(x_i − μ − δ) with alarm when PH_t − min_{s≤t} PH_s > λ —
    prefix sum + running prefix-min, the sequential-analysis
    changepoint screen (Page 1954; the streaming twin of
    `cusum_change`). Pinned integer μ/δ/λ so both sides fold the
    identical arithmetic; reports alarm count, first alarm day and
    the max excursion. μ = floor-mean of the daily series, δ = μ//100,
    λ = μ//2 — all integer-derived so the calibration is scale-free
    and both sides fold identical arithmetic."""
    import pandas as pd

    from frontera_ray.stages.relational import partial_groupby_agg

    def part(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].to_numpy().astype("datetime64[D]")
               .view(np.int64))
        cents = np.round(b["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        g = pd.DataFrame({"day": day, "cents": cents}) \
            .groupby("day", as_index=False)["cents"].sum()
        return pa.table({"day": pa.array(g["day"], pa.int64()),
                         "cents": pa.array(g["cents"], pa.int64())})

    days = partial_groupby_agg(
        (_read(sf_dir, "orders")
         .select_columns(["o_orderdate", "o_totalprice"])
         .map_batches(part, batch_format="pyarrow")),
        "day", {"cents": ("cents", "sum")}).sort_values("day")
    x = days["cents"].to_numpy()
    mu = int(x.sum()) // len(x)
    delta, lam = mu // 100, mu // 2
    ph = np.cumsum(x - mu - delta)
    run_min = np.minimum.accumulate(np.minimum(ph, 0))
    exc = ph - run_min
    alarms = exc > lam
    first = int(days["day"].to_numpy()[alarms][0]) if alarms.any() else -1
    return pd.DataFrame([{
        "n_days": len(x), "n_alarms": int(alarms.sum()),
        "first_alarm_day": first, "max_excursion": int(exc.max())}]) \
        .astype("int64")


def q_gini_split(sf_dir: str):
    """Best decision-stump split of event value vs the purchase label
    by Gini impurity reduction — the feature-screening read before any
    model training: minimize x0(c0−x0)c1 + x1(c1−x1)c0 over the
    (common positive factor 2/(N·c0·c1) dropped via the same floored
    bigint score in both engines), smallest-threshold ties. One
    value-count register pass (the pr_curve registers re-folded)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        v = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        lab = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        pos = np.bincount(inv, weights=lab, minlength=len(uv))
        neg = np.bincount(inv, weights=~lab, minlength=len(uv))
        return pa.table({
            "v": pa.array(uv, pa.int64()),
            "pos": pa.array(pos.astype(np.int64), pa.int64()),
            "neg": pa.array(neg.astype(np.int64), pa.int64())})

    acc: dict[int, list[int]] = {}
    ds = (_read(sf_dir, "events").select_columns(["event_type", "value"])
          .map_batches(partial, batch_format="pyarrow"))
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for v, p_, n_ in zip(t["v"].to_numpy(), t["pos"].to_numpy(),
                             t["neg"].to_numpy()):
            cur = acc.setdefault(int(v), [0, 0])
            cur[0] += int(p_)
            cur[1] += int(n_)
    vs = sorted(acc)
    x_tot = sum(v[0] for v in acc.values())
    n_tot = x_tot + sum(v[1] for v in acc.values())
    best = None
    c0 = x0 = 0
    for v in vs[:-1]:
        c0 += acc[v][0] + acc[v][1]
        x0 += acc[v][0]
        c1 = n_tot - c0
        x1 = x_tot - x0
        score = (x0 * (c0 - x0) * c1 + x1 * (c1 - x1) * c0) // (c0 * c1)
        if best is None or score < best[0]:
            best = (score, v, c0, x0)
    return pd.DataFrame([{
        "thr_cents": best[1], "c0": best[2], "x0": best[3],
        "score_floor": best[0]}]).astype("int64")


def q_robots_gate_audit(sf_dir: str):
    """SQL audit of the PRODUCTION robots gate: per doc a derived
    robots.txt body ('Disallow: /p/<doc_id%10>' + 'Crawl-delay:
    <u%5>') runs through the REAL DomainMetadata.set_robots /
    allowed() path (urllib.robotparser — the same object the live
    QueueShard gates with, state/queue.py), and the DuckDB twin
    re-derives the verdicts closed-form: blocked iff the decimal
    doc_id starts with the disallowed digit (robotparser prefix
    semantics over path+query), delay = u%5. A drifted prefix rule or
    delay extraction in the production gate fails the hash."""
    from frontera_ray.stages.images import md5_u64
    from frontera_ray.state.queue import DomainMetadata

    def kern(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        u = md5_u64([f"img:{i}" for i in ids])
        allowed = np.zeros(len(ids), dtype=bool)
        delays = np.zeros(len(ids), dtype=np.int64)
        for j, i in enumerate(ids):
            meta = DomainMetadata()
            # int() BEFORE the mod: numpy uint64 % python-int promotes
            # to float64 and corrupts the low bits
            body = (f"User-agent: *\nDisallow: /p/{i % 10}\n"
                    f"Crawl-delay: {int(u[j]) % 5}\n")
            meta.set_robots(body)
            allowed[j] = meta.allowed(
                f"http://host-{i % 20}.test/p/{i}?a=1&b=2")
            delays[j] = int(meta.crawl_delay)
        return pa.table({
            "doc_id": b["doc_id"],
            "allowed": pa.array(allowed, pa.bool_()),
            "crawl_delay": pa.array(delays, pa.int64())})

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_subnet_load_rollup(sf_dir: str):
    """Per-/24-subnet politeness rollup — the IP-level view frontera's
    overuse machinery keys on (slot key = resolved IP; many vhosts on
    one box must share a budget): hosts resolve to md5-derived IPs,
    page load rolls up per subnet, and the census carries each
    subnet's host count plus its hottest host's share (a subnet where
    one vhost dominates is a single-server farm; an even spread is a
    CDN). Bounded census -> combiner; integer ppm."""
    import pandas as pd

    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        host = np.asarray([f"host-{int(i) % 96}.test" for i in ids],
                          dtype=object)
        return pa.table({"host": pa.array(host, pa.string())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "documents").select_columns(["doc_id"])
         .map_batches(kern, batch_format="pyarrow")),
        ["host"], {"pages": ("host", "count")})
    u = md5_u64([f"ip:{h}" for h in cen["host"]])
    cen["subnet"] = np.asarray(
        [f"10.{int(x) % 16}.{(int(x) >> 4) % 8}.0/24" for x in u],
        dtype=object)
    cen["pages"] = cen["pages"].astype("int64")
    g = (cen.groupby("subnet")
         .agg(n_hosts=("host", "count"), pages=("pages", "sum"),
              max_host_pages=("pages", "max"))
         .reset_index())
    for c in ["n_hosts", "pages", "max_host_pages"]:
        g[c] = g[c].astype("int64")
    g["hot_share_ppm"] = (g["max_host_pages"] * 1_000_000
                          // g["pages"]).astype("int64")
    return g.sort_values("subnet").reset_index(drop=True)


def q_burst_rate(sf_dir: str):
    """Per-user burst detection: the max number of events inside ANY
    sliding 1-hour window (relational.per_key_burst) — the rate-spike
    read behind bot gating and hot-host overuse decisions, exact where
    tumbling buckets understate straddling bursts. One keyed exchange,
    kernel vectorized across keys (run-offset composite + two
    searchsorted calls); SQL twin via RANGE BETWEEN CURRENT ROW AND
    INTERVAL 1 HOUR FOLLOWING."""
    from frontera_ray.stages.relational import per_key_burst

    out = per_key_burst(
        _read(sf_dir, "events").select_columns(["user_id", "ts"]),
        "user_id", "ts", window_us=3_600_000_000).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_robots_precedence_audit(sf_dir: str):
    """Allow/Disallow PRECEDENCE audit of the production robots gate:
    per doc a robots body with an Allow carve-out listed BEFORE a
    broader Disallow ('Allow: /p/<d>1' then 'Disallow: /p/<d>', d a
    hash-derived digit) runs through the REAL DomainMetadata path
    (urllib.robotparser applies the first matching rule in file
    order), and the DuckDB twin replays the rule order closed-form on
    the decimal string: allowed iff the id doesn't start with d, OR
    starts with d||'1' (the carve-out wins). Complements
    robots_gate_audit (single-rule prefix semantics) — a gate that
    mis-orders Allow/Disallow fails this hash."""
    from frontera_ray.stages.images import md5_u64
    from frontera_ray.state.queue import DomainMetadata

    def kern(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        u = md5_u64([f"rp:{i}" for i in ids])
        allowed = np.zeros(len(ids), dtype=bool)
        digit = (u % np.uint64(10)).astype(np.int64)
        for j, i in enumerate(ids):
            d = int(digit[j])
            meta = DomainMetadata()
            meta.set_robots(
                f"User-agent: *\nAllow: /p/{d}1\nDisallow: /p/{d}\n")
            allowed[j] = meta.allowed(f"http://h.test/p/{i}")
        return pa.table({
            "doc_id": b["doc_id"],
            "rule_digit": pa.array(digit, pa.int64()),
            "allowed": pa.array(allowed, pa.bool_())})

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(kern, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_crawl_eta_plan(sf_dir: str):
    """Per-host crawl completion planning — the capacity read a
    frontier operator runs before committing fetch budget: each host's
    page backlog (streamed census) against its politeness constraint
    (robots crawl-delay ⇒ serial eta pages·delay) and its budget
    constraint (parallel fetch slots ⇒ eta ceil(pages/slots)); the
    plan's eta is the binding maximum and `binding` names the
    constraint — politeness-bound hosts cannot be bought faster with
    more workers (frontera's OverusedBuffer exists exactly for them).
    Integer-exact; delay/slots derive from the host md5 exactly as in
    robots_gate_audit."""
    import pandas as pd

    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        host = np.asarray([f"host-{int(i) % 20}.test" for i in ids],
                          dtype=object)
        return pa.table({"host": pa.array(host, pa.string())})

    cen = partial_groupby_agg(
        (_read(sf_dir, "documents").select_columns(["doc_id"])
         .map_batches(kern, batch_format="pyarrow")),
        ["host"], {"pages": ("host", "count")})
    u = md5_u64([f"host:{h}" for h in cen["host"]])
    cen["crawl_delay_s"] = (1 + (u % np.uint64(5))).astype("int64")
    cen["slots"] = (1 + ((u >> np.uint64(3)) % np.uint64(4))
                    ).astype("int64")
    cen["pages"] = cen["pages"].astype("int64")
    eta_pol = cen["pages"] * cen["crawl_delay_s"]
    eta_bud = -(-cen["pages"] // cen["slots"])  # ceil div
    cen["eta_s"] = np.maximum(eta_pol, eta_bud).astype("int64")
    cen["binding"] = np.where(eta_pol >= eta_bud,
                              "politeness", "budget")
    return cen.sort_values("host").reset_index(drop=True)


_ANCHOR_WORDS = np.asarray(["home", "next", "buy", "photo", "read",
                            "more", "login", "download"], dtype=object)


def q_anchor_text_census(sf_dir: str):
    """Anchor-text aggregation per link target — the indexer-side read
    of a crawl (what OTHER pages call a URL is a first-class ranking
    and spam signal; frontera's Link carries the anchor through the
    message bus): every page contributes its outlinks' anchor tokens,
    rolled up per (target, token) over the bounded target universe.
    REAL string handling on both sides — the Ray kernel builds the
    link rows then explodes 'anchor' with vectorized Arrow split
    kernels; the DuckDB twin re-derives the same links from the doc
    md5 and unnests string_split(anchor). One combiner rollup, no
    shuffle."""
    import pandas as pd

    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg

    def kern(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        u = md5_u64([f"lnk:{i}" for i in ids])
        t1 = (u % np.uint64(499)).astype(np.int64)
        a1 = np.char.add(np.char.add(
            _ANCHOR_WORDS[((u >> np.uint64(8)) % np.uint64(8))
                          .astype(np.int64)].astype(str), " "),
            _ANCHOR_WORDS[((u >> np.uint64(16)) % np.uint64(8))
                          .astype(np.int64)].astype(str))
        t2 = ((u >> np.uint64(24)) % np.uint64(499)).astype(np.int64)
        a2 = _ANCHOR_WORDS[((u >> np.uint64(32)) % np.uint64(8))
                           .astype(np.int64)].astype(str)
        target = pa.array(np.concatenate([t1, t2]), pa.int64())
        anchor = pa.array(np.concatenate([a1, a2]).astype(object),
                          pa.string())
        toks = pc.split_pattern(anchor, " ")
        parent = pc.list_parent_indices(toks)
        return pa.table({
            "target": target.take(parent),
            "token": pc.list_flatten(toks)})

    cen = partial_groupby_agg(
        (_read(sf_dir, "documents").select_columns(["doc_id"])
         .map_batches(kern, batch_format="pyarrow")),
        ["target", "token"], {"n": ("token", "count")})
    cen["n"] = cen["n"].astype("int64")
    return cen.sort_values(["target", "token"]).reset_index(drop=True)


def q_group_p95(sf_dir: str):
    """Per-event-type 95th-percentile value (PERCENTILE_DISC within
    group — relational.per_key_quantile_disc): the per-segment tail
    read a global quantile hides (one hot event class's p95 is the
    alerting/SLO line). ONE keyed exchange, vectorized order-statistic
    selection per key run; the value is selected, not interpolated,
    so floats round-trip exactly against DuckDB quantile_disc."""
    from frontera_ray.stages.relational import per_key_quantile_disc

    out = per_key_quantile_disc(
        _read(sf_dir, "events").select_columns(["event_type", "value"]),
        "event_type", "value", q=0.95, out_col="p95_value").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_top_user_share(sf_dir: str):
    """Value-concentration ("whale") census: the top-10 users' share
    of total event value in exact micro-units — the skew read that
    decides whether a per-user partition needs hot-key salting (the
    same question the crawl's per-host caps answer for hosts).
    Combiner pre-aggregation per user (high-cardinality sum via hash
    groupby), per-block partial top-10 + tiny driver merge; value
    mass in integer micros so the share is hash-exact."""
    import pandas as pd

    def to_micro(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy()
        return pa.table({
            "user_id": b["user_id"],
            "micro": pa.array(np.round(v * 1e6).astype(np.int64),
                              pa.int64())})

    ev = (_read(sf_dir, "events").select_columns(["user_id", "value"])
          .map_batches(to_micro, batch_format="pyarrow"))
    per_user = ev.groupby("user_id").sum("micro")

    def blk_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={"sum(micro)": "micro"})
        return pa.Table.from_pandas(
            df.sort_values(["micro", "user_id"],
                           ascending=[False, True]).head(10),
            preserve_index=False)

    parts = pa.concat_tables(list(
        per_user.map_batches(blk_top, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    top = (parts.to_pandas()
           .sort_values(["micro", "user_id"], ascending=[False, True])
           .head(10))
    total = 0
    for t in ev.select_columns(["micro"]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        s = pc.sum(t["micro"]).as_py()
        total += int(s) if s is not None else 0
    top_sum = int(top["micro"].sum())
    return pd.DataFrame([{
        "top_users": np.int64(len(top)),
        "top_micro": np.int64(top_sum),
        "total_micro": np.int64(total),
        "share_ppm": np.int64(1_000_000 * top_sum // total),
    }])


def q_slot_load_audit(sf_dir: str):
    """SQL audit of the PRODUCTION downloader-slot tracker
    (state/queue.SlotLoadTracker — the object that decides which keys
    the politeness layer parks): every event row dispatches one fetch
    for its user's host, rows with event_id % 3 == 0 also complete
    (dispatches fed first, then completes, so floors never trigger and
    net active = dispatched − completed exactly); overused iff
    active / concurrency(2) > slot_factor(5) — the reference's
    OVERUSED_SLOT_FACTOR rule. The real tracker's verdicts per key
    against the twin's closed-form census."""
    import pandas as pd

    from frontera_ray.state.queue import SlotLoadTracker

    class _E:
        __slots__ = ("host",)

        def __init__(self, host):
            self.host = host

    def regs(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        eid = b["event_id"].to_numpy()
        hosts = np.char.add("host-", (uid % 20).astype(str))
        comp = (eid % 3 == 0).astype(np.int64)
        return pa.table({
            "host": pa.array(hosts.astype(object), pa.string()),
            "disp": pa.array(np.ones(len(uid), np.int64), pa.int64()),
            "comp": pa.array(comp, pa.int64())})

    from frontera_ray.stages.relational import partial_groupby_agg

    g = partial_groupby_agg(
        _read(sf_dir, "events").select_columns(["event_id", "user_id"])
        .map_batches(regs, batch_format="pyarrow"),
        ["host"], {"dispatched": ("disp", "sum"),
                   "completed": ("comp", "sum")}) \
        .sort_values("host").reset_index(drop=True)

    tracker = SlotLoadTracker(concurrency=2, slot_factor=5.0)
    for _, r in g.iterrows():
        tracker.on_dispatch([_E(r["host"])] * int(r["dispatched"]))
    for _, r in g.iterrows():
        for _ in range(int(r["completed"])):
            tracker.on_complete(_E(r["host"]))
    over = set(tracker.overused_keys())
    g["active"] = (g["dispatched"] - g["completed"]).astype("int64")
    g["overused"] = g["host"].isin(over)
    return g


def _rev_c4(batch: pa.Table) -> np.ndarray:
    """Integer-exact discounted revenue: price-cents x (100 -
    discount-percent) = units of 10^-4 dollars (order-independent
    int64 sums; float price*(1-disc) is not associative here)."""
    price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    disc_b = np.round((1.0 - batch["l_discount"].to_numpy()) * 100).astype(np.int64)
    return price_c * disc_b


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promo-part revenue share for one ship month —
    date-pruned lineitem scan, broadcast part join (small dim shipped
    once via ray.put), conditional integer aggregate, ratio as exact
    integer ppm. No shuffle anywhere."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    lo, hi = np.datetime64("1996-09-01"), np.datetime64("1996-10-01")

    def prep(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        t = batch.filter(pa.array((ship >= lo) & (ship < hi)))
        return pa.table({"p_partkey": t["l_partkey"],
                         "rev_c4": pa.array(_rev_c4(t), pa.int64())})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(prep, batch_format="pyarrow")
    j = broadcast_join(li, part, key="p_partkey")

    def partial(batch: pa.Table) -> pa.Table:
        promo = pc.starts_with(batch["p_type"], "PROMO").to_numpy(
            zero_copy_only=False)
        rev = batch["rev_c4"].to_numpy()
        return pa.table({"promo_c4": pa.array([int(rev[promo].sum())], pa.int64()),
                         "total_c4": pa.array([int(rev.sum())], pa.int64())})

    parts = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo, total = int(parts["promo_c4"].sum()), int(parts["total_c4"].sum())
    import pandas as pd
    return pd.DataFrame({"promo_c4": [promo], "total_c4": [total],
                         "promo_ppm": [1_000_000 * promo // max(total, 1)]})


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue from RETURNED items
    (l_returnflag='R') — predicate-pruned lineitem scan, two broadcast
    joins (orders key map, customer names), combiner rollup on the
    customer key, tiny driver top-k."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import broadcast_join, partial_groupby_agg

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "rev_c4": pa.array(_rev_c4(t), pa.int64())})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(prep, batch_format="pyarrow")
    j = broadcast_join(li, orders, key="o_orderkey")
    g = partial_groupby_agg(j, "o_custkey",
                            {"revenue_c4": ("rev_c4", "sum")})
    g = g.rename(columns={"o_custkey": "c_custkey"}).merge(cust, on="c_custkey")
    g = g.sort_values(["revenue_c4", "c_custkey"],
                      ascending=[False, True]).head(20)
    return g[["c_custkey", "c_name", "revenue_c4"]].reset_index(drop=True)


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape: large-volume orders (per-order quantity sum >
    200) — HIGH-cardinality groupby on l_orderkey through ONE key-hash
    repartition + a vectorized per-partition sum kernel (a combiner
    would ship every order key to the driver; the native sort-groupby
    measured 4x slower here), then broadcast joins for order/customer
    attributes. Only the >200 survivors leave the exchange."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import task_exchange

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "qty": pa.array(np.round(
                             batch["l_quantity"].to_numpy()).astype(np.int64),
                             pa.int64())})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_quantity"]).map_batches(prep, batch_format="pyarrow")

    def big(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_orderkey", as_index=False)["qty"].sum() \
            .rename(columns={"qty": "sum_qty"})
        return pa.Table.from_pandas(g[g["sum_qty"] > 200],
                                    preserve_index=False)

    # raw-task shuffle (measured faster than the hash-aggregator wave
    # at this key cardinality; identical per-partition kernel contract)
    big_orders = task_exchange(li, "l_orderkey", big).to_pandas()
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"]).to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    out = big_orders.rename(columns={"l_orderkey": "o_orderkey"}) \
        .merge(orders, on="o_orderkey").merge(
            cust, left_on="o_custkey", right_on="c_custkey")
    out["o_total_cents"] = np.round(
        out["o_totalprice"].to_numpy() * 100).astype(np.int64)
    out = out.sort_values(["sum_qty", "o_orderkey"],
                          ascending=[False, True]).head(100)
    return out[["o_orderkey", "c_name", "o_total_cents",
                "sum_qty"]].reset_index(drop=True)


def q_supplier_share(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with MAX revenue in a ship
    quarter — date-pruned scan, combiner rollup on the bounded supplier
    key, argmax + name join on the tiny result."""
    import pyarrow.parquet as pq
    from frontera_ray.stages.relational import partial_groupby_agg

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")

    def prep(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy()
        t = batch.filter(pa.array((ship >= lo) & (ship < hi)))
        return pa.table({"s_suppkey": t["l_suppkey"],
                         "rev_c4": pa.array(_rev_c4(t), pa.int64())})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(prep, batch_format="pyarrow")
    g = partial_groupby_agg(li, "s_suppkey",
                            {"total_rev_c4": ("rev_c4", "sum")})
    winners = g[g["total_rev_c4"] == g["total_rev_c4"].max()]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(supp, on="s_suppkey").sort_values("s_suppkey")
    return out[["s_suppkey", "s_name", "total_rev_c4"]].reset_index(drop=True)


def q_avg_yearly(sf_dir: str):
    """TPC-H Q17 shape: revenue from small-quantity items (quantity
    below 20% of the part's average) — ONE key-hash exchange on
    l_partkey co-locates every part's rows, so the per-part sum/count
    AND the per-row sub-average filter happen in the same vectorized
    partition kernel (no second scan, no broadcast); the test is exact
    integers (5*qty*cnt < sum_qty <=> qty < 0.2*avg). Each partition
    emits one partial (total, count) row."""
    from frontera_ray.stages.relational import task_exchange

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["l_extendedprice"].to_numpy() * 100
                         ).astype(np.int64)
        qty = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
        return pa.table({"l_partkey": batch["l_partkey"],
                         "qty": pa.array(qty, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    li = _read(sf_dir, "lineitem").select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(prep, batch_format="pyarrow")

    def kern(batch: pa.Table) -> pa.Table:
        import pandas as pd
        qty = batch["qty"].to_numpy()
        codes = pd.factorize(batch["l_partkey"].to_numpy())[0]
        sums = np.bincount(codes, weights=qty).astype(np.int64)
        cnts = np.bincount(codes).astype(np.int64)
        keep = 5 * qty * cnts[codes] < sums[codes]
        cents = batch["cents"].to_numpy()[keep]
        return pa.table({"total_cents": pa.array([int(cents.sum())], pa.int64()),
                         "n_items": pa.array([int(keep.sum())], pa.int64())})

    # two-stage raw-task shuffle: measured 1.45 s (hash aggregators)
    # -> sub-second; the kernel contract (complete key groups per
    # partition) is identical
    parts = task_exchange(li, "l_partkey", kern).to_pandas()
    import pandas as pd
    return pd.DataFrame({"total_cents": [int(parts["total_cents"].sum())],
                         "n_items": [int(parts["n_items"].sum())]})


def q_phash_caption_conflict(sf_dir: str):
    """Duplicate images with CONFLICTING captions — the multimodal
    curation check that a phash-exact duplicate group carries more than
    one distinct caption (which one trains?). Derived corpus: planted
    phash groups (members 1,2 of each 4-doc group share an exact hash)
    x 64-char text-prefix captions. One key-hash exchange on the
    high-cardinality phash, vectorized pandas run aggregate per
    partition; conflict groups only leave the exchange."""
    from frontera_ray.stages.images import synth_phash_table
    from frontera_ray.stages.relational import hash_partitioned

    def derive(batch: pa.Table) -> pa.Table:
        ph = synth_phash_table(batch)
        cap = pc.utf8_slice_codeunits(batch["text"], 0, 64)
        return pa.table({"phash": ph["simhash"], "caption": cap,
                         "doc_id": batch["doc_id"]})

    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(derive, batch_format="pyarrow")

    def kern(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("phash").agg(
            n_images=("doc_id", "size"),
            n_captions=("caption", "nunique"),
            keeper_doc_id=("doc_id", "min")).reset_index()
        g = g[g["n_captions"] > 1]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = hash_partitioned(ds, "phash").map_batches(
        kern, batch_format="pyarrow", batch_size=None).to_pandas()
    return out.sort_values("phash").reset_index(drop=True)


def q_stopword_ratio(sf_dir: str):
    """Stopword-fraction quality gate (the classic corpus-filter signal:
    NL text has a stable stopword mass; keyword spam and boilerplate do
    not). Fully vectorized Arrow: lower -> split_whitespace ->
    list_flatten + is_in against the fixed list, per-doc sums via
    bincount on parent indices; ratio as exact integer ppm."""
    STOP = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]
    stop_set = pa.array(STOP, pa.string())

    def kern(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        toks = pc.utf8_split_whitespace(low)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        stop = pc.is_in(flat, value_set=stop_set).to_numpy(
            zero_copy_only=False)
        n = len(batch)
        n_tok = np.bincount(parent, weights=nonempty, minlength=n
                            ).astype(np.int64)
        n_stop = np.bincount(parent, weights=stop & nonempty, minlength=n
                             ).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "stop_ppm": pa.array(
                1_000_000 * n_stop // np.maximum(n_tok, 1), pa.int64())})

    out = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(kern, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the event-value series
    (relational.per_key_drawdown): running-peak minus current value,
    reduced to one row per key — the per-entity sag/decay monitor
    (per-host fetch-rate collapse, per-source quality drift). One keyed
    exchange; ONE np.maximum.accumulate computes every key's running
    peak (runs isolated by a 2^40 offset), no per-key Python."""
    from frontera_ray.stages.relational import per_key_drawdown

    out = per_key_drawdown(_read(sf_dir, "events")).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _langid_counts_sql(text_expr: str) -> str:
    """The stopword-vote count subexpressions over an arbitrary SQL
    text expression (the parameterized twin of text.langid_table)."""
    pats = [("c_en", r"\b(the|and|of|to|in)\b"),
            ("c_de", r"\b(der|und|die|das|ein)\b"),
            ("c_fr", r"\b(le|la|les|des|une)\b"),
            ("c_es", r"\b(el|los|las|una|que)\b"),
            ("c_zh", r"\b(de|le|shi|bu|zai)\b")]
    cols = ",\n        ".join(
        f"len(regexp_extract_all(lower({text_expr}), '{p}')) {name}"
        for name, p in pats)
    return f"""
      SELECT doc_id,
           CASE WHEN greatest(c_en,c_de,c_fr,c_es,c_zh) = 0 THEN 'und'
                WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
                WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
                WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
                WHEN c_es >= c_zh THEN 'es'
                ELSE 'zh' END AS lang_pred
      FROM (SELECT doc_id,
        {cols}
      FROM documents)"""


def _langid_full_prefix(batch: pa.Table, prefix_chars: int = 64):
    """(lang_full, lang_prefix) predictions per doc — full text vs its
    first ``prefix_chars`` chars, both through the same vectorized
    stopword-vote kernel."""
    from frontera_ray.stages.text import langid_table

    full = langid_table(batch)
    pref_batch = pa.table({
        "doc_id": batch["doc_id"],
        "text": pc.utf8_slice_codeunits(batch["text"], 0, prefix_chars)})
    pref = langid_table(pref_batch)
    return full["lang_pred"], pref["lang_pred"]


def q_langid_stability(sf_dir: str):
    """Language-ID stability under truncation: does the prediction on
    the first 64 chars agree with the full-document prediction? The
    cheap-gate-vs-full-gate consistency check you run before trusting a
    prefix-only fast path at scale. Per-doc row, fully vectorized
    (two RE2 count passes, argmax votes), shuffle-free."""

    def kern(batch: pa.Table) -> pa.Table:
        full, pref = _langid_full_prefix(batch)
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_full": full, "lang_prefix": pref,
            "stable": pa.array(
                pc.equal(full, pref).to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64())})

    out = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(kern, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_mcnemar_langid(sf_dir: str):
    """McNemar's paired test between the full-text and prefix-64
    language classifiers against the true label — the right
    significance test for 'is the cheap variant actually worse?'
    (paired per-item outcomes; only the discordant counts matter).
    Per-block partial counts -> 4-int combiner; the continuity-
    corrected statistic (|b-c|-1)^2/(b+c) is emitted in exact integer
    micro-units on both sides."""

    def partial(batch: pa.Table) -> pa.Table:
        full, pref = _langid_full_prefix(batch)
        t = batch["lang"].to_numpy(zero_copy_only=False)
        a_ok = full.to_numpy(zero_copy_only=False) == t
        b_ok = pref.to_numpy(zero_copy_only=False) == t
        return pa.table({
            "both_ok": pa.array([int((a_ok & b_ok).sum())], pa.int64()),
            "only_full": pa.array([int((a_ok & ~b_ok).sum())], pa.int64()),
            "only_prefix": pa.array([int((~a_ok & b_ok).sum())], pa.int64()),
            "both_wrong": pa.array([int((~a_ok & ~b_ok).sum())], pa.int64())})

    parts = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text", "lang"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    b, c = int(parts["only_full"].sum()), int(parts["only_prefix"].sum())
    stat = (1_000_000 * (abs(b - c) - 1) ** 2 // (b + c)) if b + c else 0
    import pandas as pd
    return pd.DataFrame({
        "both_ok": [int(parts["both_ok"].sum())],
        "only_full": [b], "only_prefix": [c],
        "both_wrong": [int(parts["both_wrong"].sum())],
        "mcnemar_micro": [stat]})


def q_caption_dup_images(sf_dir: str):
    """Stock-caption spam: one caption attached to MULTIPLE distinct
    images (the dual of phash_caption_conflict — boilerplate captions
    carry no alignment signal and train a caption model badly). 16-char
    text-prefix captions x planted-phash corpus; one key-hash exchange
    on the caption string, vectorized count-distinct per partition."""
    from frontera_ray.stages.images import synth_phash_table
    from frontera_ray.stages.relational import hash_partitioned

    def derive(batch: pa.Table) -> pa.Table:
        ph = synth_phash_table(batch)
        return pa.table({
            "caption": pc.utf8_slice_codeunits(batch["text"], 0, 16),
            "phash": ph["simhash"], "doc_id": batch["doc_id"]})

    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "text"]).map_batches(derive, batch_format="pyarrow")

    def kern(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("caption").agg(
            n_images=("doc_id", "size"),
            n_phashes=("phash", "nunique"),
            keeper_doc_id=("doc_id", "min")).reset_index()
        g = g[g["n_phashes"] > 1]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = hash_partitioned(ds, "caption").map_batches(
        kern, batch_format="pyarrow", batch_size=None).to_pandas()
    return out.sort_values("caption").reset_index(drop=True)


def q_ppr(sf_dir: str):
    """Personalized PageRank (Haveliwala 2002) over the doc-derived
    link graph: restart mass pinned to seed nodes 0..7 instead of the
    uniform jump, so rank measures random-walk proximity to the seed
    set — the focused-crawl / related-host scoring read. Same
    streaming machinery as `pagerank` (distinct-edge exchange,
    per-iteration dense partial combine against a broadcast rank
    vector); only the restart vector changes."""
    from frontera_ray.stages.pagerank import pagerank

    ds = _doc_graph_edges(sf_dir)
    teleport = np.zeros(_PR_NODES, np.float64)
    teleport[:8] = 1.0
    out = pagerank(ds, n_nodes=_PR_NODES, iters=5,
                   teleport=teleport).to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_ppr_join(sf_dir: str):
    """JOIN-PATH personalized PageRank: the same seed-set restart as
    ppr (uniform over nodes 0..7) expressed as a sparse seed LIST
    inside the partitioned shape (pagerank_join's seed_teleport) — no
    O(n_nodes) teleport vector, no dense rank vector; the
    focused-crawl proximity score at URL-graph scale. Same recurrence,
    same SQL oracle as ppr."""
    from frontera_ray.stages.pagerank import pagerank_join

    ds = _doc_graph_edges(sf_dir)
    out = pagerank_join(ds, iters=5,
                        seed_teleport=range(8)).to_pandas()
    out["rank"] = out["rank"].round(9)
    return out.sort_values("node").reset_index(drop=True)


def q_trap_urls(sf_dir: str):
    """Crawler-trap detection: flag URLs whose path repeats a segment
    (calendar/infinite-pagination traps — the classic frontier
    poisoning a broad crawl must drop before scheduling). Derived
    corpus plants repeated-'page' paths on doc_id % 37 == 0; detection
    is a vectorized segment-multiplicity census (split -> per-(url,
    segment) counts -> per-url max), not a per-row loop. Shuffle-free:
    a URL's segments never leave its batch."""

    def kern(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        paths = pa.array(
            [(f"cat/{'page/' * (2 + int(d) % 3)}{d}"
              if d % 37 == 0 else f"p/{d}") for d in ids], pa.string())
        segs = pc.split_pattern(paths, "/")
        flat = pc.list_flatten(segs)
        parent = pc.list_parent_indices(segs).to_numpy()
        import pandas as pd
        df = pd.DataFrame({"i": parent,
                           "seg": flat.to_numpy(zero_copy_only=False)})
        mult = df.groupby(["i", "seg"]).size().groupby("i").max()
        max_rep = np.ones(len(ids), dtype=np.int64)
        max_rep[mult.index.to_numpy()] = mult.to_numpy()
        n_segs = pc.list_value_length(segs).to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_segments": pa.array(n_segs, pa.int64()),
            "max_seg_repeat": pa.array(max_rep, pa.int64()),
            "is_trap": pa.array((max_rep >= 3).astype(np.int64), pa.int64())})

    out = _read(sf_dir, "documents").select_columns(
        ["doc_id"]).map_batches(kern, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_modularity(sf_dir: str):
    """Graph-partition modularity audit over the derived link graph
    (communities = node % 8): per-community within-edge count, in/out
    degree sums and the exact integer modularity contribution
    numerator 10^6*(m*e_c - dout_c*din_c) against denominator m^2 —
    the partition-quality read behind community-aware sharding. One
    distinct-edge exchange on the 64-cell (cs, cd) domain, then a
    combiner rollup; no division anywhere."""
    _N_COMM = 8

    def edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        import pandas as pd
        df = pd.DataFrame({"src": d % _PR_NODES,
                           "dst": (d * _PR_MIX) % _PR_NODES}
                          ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = _read(sf_dir, "documents").select_columns(["doc_id"]) \
        .map_batches(edges, batch_format="pyarrow")
    cells = ds.groupby(["src", "dst"]).count().map_batches(
        lambda b: pa.table({
            "cs": pa.array(b["src"].to_numpy() % _N_COMM, pa.int64()),
            "cd": pa.array(b["dst"].to_numpy() % _N_COMM, pa.int64()),
            "one": pa.array(np.ones(len(b), np.int64), pa.int64())}),
        batch_format="pyarrow")
    from frontera_ray.stages.relational import partial_groupby_agg
    g = partial_groupby_agg(cells, ["cs", "cd"], {"n": ("one", "sum")})
    m = int(g["n"].sum())
    import pandas as pd
    rows = []
    for c in range(_N_COMM):
        e_c = int(g.loc[(g.cs == c) & (g.cd == c), "n"].sum())
        dout = int(g.loc[g.cs == c, "n"].sum())
        din = int(g.loc[g.cd == c, "n"].sum())
        rows.append({"community": c, "e_within": e_c, "dout": dout,
                     "din": din,
                     "q_num_micro": 1_000_000 * (m * e_c - dout * din),
                     "m_edges": m})
    return pd.DataFrame(rows)


def q_balanced_downsample(sf_dir: str):
    """Balanced down-sampling to the smallest (lang, source) cell — the
    class-balancing step before training a classifier on skewed strata
    (every cell keeps exactly k = min cell count docs). Deterministic
    and order-free: within each cell keep the k smallest md5-derived
    64-bit keys (a seedless uniform draw both engines reproduce
    bit-exactly). Tiny combiner for the cell counts, then ONE keyed
    exchange with a vectorized rank<k kernel (relational.per_key_topk);
    no driver materialization of the corpus."""
    from frontera_ray.stages.images import md5_u64
    from frontera_ray.stages.relational import partial_groupby_agg, per_key_topk

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        cell = pc.binary_join_element_wise(
            batch["lang"], batch["source"], "|")
        return pa.table({
            "doc_id": batch["doc_id"], "lang": batch["lang"],
            "source": batch["source"], "cell": cell,
            "h": pa.array(md5_u64([str(i) for i in ids]), pa.uint64()),
            "one": pa.array(np.ones(len(ids), np.int64), pa.int64())})

    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "source"]).map_batches(
        derive, batch_format="pyarrow")
    counts = partial_groupby_agg(ds, "cell", {"n": ("one", "sum")})
    k = int(counts["n"].min())
    out = per_key_topk(ds, "cell", "h", k, descending=False,
                       tiebreak="doc_id").to_pandas()
    out = out[["lang", "source", "doc_id"]]
    return out.sort_values(["lang", "source", "doc_id"]).reset_index(drop=True)



_DICT_TAG_PATTERNS = ["batch", "bloom", "crawl", "filter", "hash join",
                      "missingword", "slow key", "window"]


def q_dict_tag_census(sf_dir: str):
    """Multi-pattern dictionary tagging census (text.dict_tag_census):
    per blocklist/lexicon pattern, containing-doc count + total
    non-overlapping occurrences — ONE vectorized Arrow count_substring
    kernel per pattern per block, dictionary-bounded partials, driver
    combine; includes multi-word substrings and an absent pattern.
    Oracle: occurrences = (len - len(replace)) / len(p)."""
    from frontera_ray.stages.text import dict_tag_census

    return dict_tag_census(_read(sf_dir, "documents"),
                           _DICT_TAG_PATTERNS)


def q_holt_trend(sf_dir: str):
    """Per-user integer floor Holt linear smoother (relational.
    per_key_holt_linear, alpha=1/2, beta=1/4): trend-aware
    double-exponential state per key in exact centi-units — the
    rising-rate forecast a politeness scheduler reads (the EWMA only
    averages; Holt extrapolates). One keyed exchange; recurrence
    vectorized across keys; floor division keeps negative trend states
    exact so the recursive-CTE twin replays the sequence."""
    from frontera_ray.stages.relational import per_key_holt_linear

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v": pa.array(np.floor(b["value"].to_numpy() * 100 + 0.5)
                          .astype(np.int64), pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_id", "ts", "value"])
          .map_batches(prep, batch_format="pyarrow"))
    out = per_key_holt_linear(ev, "user_id", "ts_us", "v",
                              tiebreak="event_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_image_dhash(sf_dir: str):
    """Difference-hash census over the derived image corpus
    (images.dhash_table): 8x9 sampled-grid milli-luma gradients
    through the REAL decode path, packed to a 64-bit sketch — the
    second perceptual hash beside phash (gradient structure survives
    brightness shifts average-hash misses). Shuffle-free map_batches;
    the DuckDB twin re-derives every sampled pixel closed-form."""
    from frontera_ray.stages.images import dhash_table

    out = (_read(sf_dir, "documents").select_columns(["doc_id"])
           .map_batches(dhash_table, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_rbo_rankings(sf_dir: str):
    """Rank-biased overlap (Webber et al. 2010, public measure)
    between two per-source document rankings — length-priority
    (n_chars desc) vs ingest order (doc_id asc) — truncated at depth
    50, p=0.9: the ranking-agreement read that compares two curation
    orders without requiring either to be complete. Scale shape:
    per-block partial top-50 per (source, ranking), driver merge of
    the bounded partials, result-sized RBO terms."""
    import pandas as pd

    k, p = 50, 0.9

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64())})
        if len(b) == 0:
            return empty
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        did = b["doc_id"].to_numpy().astype(np.int64)
        nc = b["n_chars"].to_numpy().astype(np.int64)
        keep = np.zeros(len(src), dtype=bool)
        for s in np.unique(src):
            m = np.flatnonzero(src == s)
            a_top = m[np.lexsort((did[m], -nc[m]))[:k]]
            b_top = m[np.argsort(did[m])[:k]]
            keep[a_top] = True
            keep[b_top] = True
        return pa.table({"source": pa.array(src[keep], pa.string()),
                         "doc_id": pa.array(did[keep], pa.int64()),
                         "n_chars": pa.array(nc[keep], pa.int64())})

    parts = pa.concat_tables(list(
        _read(sf_dir, "documents")
        .select_columns(["source", "doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    src = np.asarray(parts["source"].to_pylist(), dtype=object)
    did = parts["doc_id"].to_numpy().astype(np.int64)
    nc = parts["n_chars"].to_numpy().astype(np.int64)
    rows = []
    for s in sorted(set(src.tolist())):
        m = np.flatnonzero(src == s)
        # partials may duplicate a doc (top in both orders): dedup
        _, uniq = np.unique(did[m], return_index=True)
        m = m[uniq]
        a_list = did[m][np.lexsort((did[m], -nc[m]))[:k]]
        b_list = did[m][np.argsort(did[m])[:k]]
        a_set, b_set = set(), set()
        terms = 0.0
        for d in range(1, k + 1):
            if d <= len(a_list):
                a_set.add(int(a_list[d - 1]))
            if d <= len(b_list):
                b_set.add(int(b_list[d - 1]))
            terms += p ** (d - 1) * len(a_set & b_set) / d
        rows.append({"source": s, "rbo": round((1 - p) * terms, 6)})
    return pd.DataFrame(rows)



def q_pq_codebook(sf_dir: str):
    """Product-quantization codebook training + distortion census
    (ann.pq_codebook, the PQ half of IVF-PQ): 2 subspaces x 32 dims,
    k=4 sub-centroids each via the deterministic Lloyd recurrence,
    exact integer quantization distortion per cluster. Oracle = two
    sliced copies of the unrolled iters=1 k-means CTE, UNION ALL."""
    from frontera_ray.stages.ann import pq_codebook

    return pq_codebook(_read(sf_dir, "embeddings"), m=2, k=4, iters=1)



def q_hll_sliding(sf_dir: str):
    """Timestamped sliding-window HyperLogLog (sketches.hll_sliding):
    per (register, rho) a gap-coalesced run staircase of event stamps,
    lossless for the fixed window width — so ANY window end (past or
    trailing) answers from the one merged sketch exactly as a full
    replay would: distinct users in the last quarter-span at three
    window ends, with the exact companion. Register pairs are
    md5-bit-reproducible, so the DuckDB twin replays the plain EXISTS
    semantics (pair live iff some event stamp falls in the window) and
    the estimates hash-match."""
    import pandas as pd
    import pyarrow.compute as pc

    from frontera_ray.stages.sketches import hll_sliding

    ev = _read(sf_dir, "events").select_columns(["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64())})

    # shared read: min/max span pass + sketch pass + exact companion
    evp = ev.map_batches(prep, batch_format="pyarrow").materialize()
    lo = hi = None
    for t in evp.iter_batches(batch_format="pyarrow", batch_size=None):
        if len(t) == 0:
            continue
        tmin = pc.min(t["ts_us"]).as_py()
        tmax = pc.max(t["ts_us"]).as_py()
        lo = tmin if lo is None else min(lo, tmin)
        hi = tmax if hi is None else max(hi, tmax)
    span = hi - lo
    w_us = span // 4
    ends = [lo + span // 2, lo + 3 * (span // 4), hi]
    est = dict(hll_sliding(evp, "user_id", "ts_us", ends, w_us))

    # exact companion: per-block distinct (user, window) partials
    ends_np = np.asarray(ends, np.int64)

    def exact_partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy().astype(np.int64)
        ts = b["ts_us"].to_numpy().astype(np.int64)
        rows_e, rows_u = [], []
        for e in ends_np:
            m = (ts >= e - w_us) & (ts <= e)
            uu = np.unique(u[m])
            rows_e.append(np.full(len(uu), e, np.int64))
            rows_u.append(uu)
        return pa.table({
            "end_us": pa.array(np.concatenate(rows_e), pa.int64()),
            "user_id": pa.array(np.concatenate(rows_u), pa.int64())})

    parts = pa.concat_tables(list(
        evp.map_batches(exact_partial, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow", batch_size=None)))
    pe = parts["end_us"].to_numpy()
    pu = parts["user_id"].to_numpy()
    exact = {int(e): len(np.unique(pu[pe == e])) for e in ends_np}
    return pd.DataFrame({
        "end_us": ends,
        "est_distinct": [est[e] for e in ends],
        "n_exact": [exact[e] for e in ends]})



def q_sign_flip_test(sf_dir: str):
    """Hash-seeded sign-flip permutation test (relational.
    sign_flip_paired_test): per user, d = cents(after) - cents(before)
    around the ceil(n/2) split of their event history; 64 deterministic
    md5-bit sign patterns sample the exchangeable null, p numerator =
    #{k: |T_k| >= |T_obs|} — the nonparametric paired test beside
    ab_ztest/welch_t, integer-exact end to end."""
    from frontera_ray.stages.relational import sign_flip_paired_test

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "v": pa.array(np.floor(b["value"].to_numpy() * 100 + 0.5)
                          .astype(np.int64), pa.int64())})

    ev = (_read(sf_dir, "events")
          .select_columns(["user_id", "event_id", "ts", "value"])
          .map_batches(prep, batch_format="pyarrow"))
    return sign_flip_paired_test(ev, "user_id", "ts_us", "v",
                                 tiebreak="event_id")



def q_ann_ivfpq(sf_dir: str):
    """IVF-PQ ANN with ADC lookup tables (ann.ivfpq_topk_fixed): the
    billion-scale layout — coarse lists prune, PQ codes compress,
    queries score candidates with m integer LUT lookups instead of a
    d-dim distance. Deterministic Lloyd everywhere, so the oracle
    composes the ann_ivf coarse CTE with the pq_codebook subspace CTEs
    and an integer ADC join."""
    from frontera_ray.stages.ann import ivfpq_topk_fixed

    return ivfpq_topk_fixed(_read(sf_dir, "embeddings"), range(5), k=10,
                            nlist=8, nprobe=3, m=2, ksub=4, iters=1)



def q_crawl_dfs(sf_dir: str):
    """Flagship iterative crawl, DFS twin of `crawl_bfs`: score =
    1/(depth+1) under the min_score profile pops DEEPEST-first; with
    max_next_requests=1 the pop sequence is the exact preorder DFS of
    the synthetic forest — which over digit paths is lexicographic
    (host, path) order (a prefix sorts before its extensions), so the
    same recursive-CTE tree oracle applies with a different ORDER BY.
    Verified byte-for-byte against the engine."""
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.local import LocalFrontier, run_crawl_sequence
    from frontera_ray.strategies import DFSStrategy

    web = SyntheticWeb(32, seed=42, max_class=3)

    class _G:
        seeds = web.seeds()
        links_of = staticmethod(web.links_of)

    f = LocalFrontier(strategy=DFSStrategy(), profile="min_score")
    seq = run_crawl_sequence(f, _G, max_next_requests=1)
    urls = [e.url for reqs, _, _ in seq for e in reqs]
    return pa.table({
        "rank": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })



def q_pcsa_distinct(sf_dir: str):
    """Flajolet-Martin PCSA distinct count (sketches.pcsa_distinct):
    64 OR-mergeable bitmaps, est = m/0.77351 * 2^mean(lowest unset bit)
    — the original stochastic-averaging sketch beside HLL. Bitmaps are
    md5-bit-reproducible; the exact-integer register stats ride the
    output so the float est is cross-checked structurally too."""
    import pandas as pd

    from frontera_ray.stages.sketches import pcsa_distinct

    ev = _read(sf_dir, "events").select_columns(["user_id"])
    est, regs = pcsa_distinct(ev, "user_id")
    regs_u = regs.view(np.uint64)
    x = regs_u ^ (regs_u + np.uint64(1))
    low = np.array([int(v).bit_count() - 1 for v in x], np.int64)
    n_exact = len(np.unique(pa.concat_tables(list(
        ev.iter_batches(batch_format="pyarrow", batch_size=None)))
        ["user_id"].to_numpy()))
    raw = 64.0 / 0.77351 * (2.0 ** (low.sum() / 64.0))
    return pd.DataFrame([{
        "sum_low_unset": int(low.sum()),
        "est_r3": round(raw, 3),
        "n_exact": int(n_exact)}])


def q_ams_f2(sf_dir: str):
    """AMS second-moment (F2) sketch (sketches.ams_f2): 16 md5-bit
    +-1 projections, est = mean(Z_k^2) — integer-exact, one streaming
    pass — vs the exact self-join F2 (sum of squared user
    frequencies)."""
    import pandas as pd

    from frontera_ray.stages.sketches import ams_f2

    ev = _read(sf_dir, "events").select_columns(["user_id"])
    f2_est, _ = ams_f2(ev, "user_id")
    u = pa.concat_tables(list(
        ev.iter_batches(batch_format="pyarrow", batch_size=None)))
    _, cnt = np.unique(u["user_id"].to_numpy(), return_counts=True)
    f2_exact = int((cnt.astype(object) ** 2).sum())
    return pd.DataFrame([{"f2_est": int(f2_est),
                          "f2_exact": f2_exact}])



def q_sq8_census(sf_dir: str):
    """Scalar (SQ8) quantization census (ann.sq8_census): per-dim
    corpus min/max learned in one pass, 8-bit quantize/dequantize,
    exact nano-unit reconstruction-error totals — the second ANN
    compression beside PQ; the pair of distortion numbers is how you
    choose between them for a corpus."""
    from frontera_ray.stages.ann import sq8_census

    return sq8_census(_read(sf_dir, "embeddings"))


def q_dim_truncation(sf_dir: str):
    """Matryoshka-style dimension-ablation census
    (ann.dim_truncation_census): energy lost truncating embeddings to
    the first k dims, k in {8,16,32,64} — sizes the cheap prefilter
    index before a full-dim rerank. Integer nano energies, one pass."""
    from frontera_ray.stages.ann import dim_truncation_census

    return dim_truncation_census(_read(sf_dir, "embeddings"))



def q_binary_embed_audit(sf_dir: str):
    """Sign-bit (binary) quantization audit (ann.binary_embed_audit):
    cosine estimated from sign-pattern Hamming distance via
    cos(pi*h/d), measured against true cosine over the probe set's
    all-pairs — the third compression beside PQ/SQ8, 8 bytes/vector."""
    from frontera_ray.stages.ann import binary_embed_audit

    return binary_embed_audit(_read(sf_dir, "embeddings"), probe_ids=40)


QUERIES: dict[str, Callable[[str], Any]] = {
    "seed_normalize": q_seed_normalize,
    "dict_tag_census": q_dict_tag_census,
    "pq_codebook": q_pq_codebook,
    "hll_sliding": q_hll_sliding,
    "sign_flip_test": q_sign_flip_test,
    "ann_ivfpq": q_ann_ivfpq,
    "crawl_dfs": q_crawl_dfs,
    "pcsa_distinct": q_pcsa_distinct,
    "ams_f2": q_ams_f2,
    "sq8_census": q_sq8_census,
    "dim_truncation": q_dim_truncation,
    "binary_embed_audit": q_binary_embed_audit,
    "holt_trend": q_holt_trend,
    "image_dhash": q_image_dhash,
    "rbo_rankings": q_rbo_rankings,
    "url_fingerprint": q_url_fingerprint,
    "host_partition": q_host_partition,
    "score_depth": q_score_depth,
    "score_buckets": q_score_buckets,
    "per_host_cap": q_per_host_cap,
    "priority_topk": q_priority_topk,
    "crawl_visibility": q_crawl_visibility,
    "host_agg": q_host_agg,
    "batch_dedup": q_batch_dedup,
    "token_count": q_token_count,
    "token_count_bpe": q_token_count_bpe,
    "winnow_fp": q_winnow_fp,
    "quality": q_quality,
    "langid": q_langid,
    "exact_dedup": q_exact_dedup,
    "exact_keepers": q_exact_keepers,
    "ann_ivf": q_ann_ivf,
    "ngram_jaccard": q_ngram_jaccard,
    "ann_topk": q_ann_topk,
    "cosine_neardup": q_cosine_neardup,
    "revenue_nation": q_revenue_nation,
    "region_suppliers": q_region_suppliers,
    "part_types": q_part_types,
    "token_df": q_token_df,
    "tfidf": q_tfidf,
    "hopping_window": q_hopping_window,
    "doc_sample": q_doc_sample,
    "curate": q_curate,
    "quantity_quantiles": q_quantity_quantiles,
    "distinct_users": q_distinct_users,
    "priority_revenue": q_priority_revenue,
    "window_counts": q_window_counts,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "sessionize": q_sessionize,
    "agg_pricing": q_agg_pricing,
    "nation_orders": q_nation_orders,
    "home_page": q_home_page,
    "blacklist": q_blacklist,
    "same_domain": q_same_domain,
    "canonical_solver": q_canonical_solver,
    "sitemap_parse": q_sitemap_parse,
    "seed_reader": q_seed_reader,
    "discovery_scores": q_discovery_scores,
    "crawl_bfs": q_crawl_bfs,
    "fetch_pages": q_fetch_pages,
    "minhash_neardup": q_minhash_neardup,
    "dedup_keepers": q_dedup_keepers,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
    "ann_lsh": q_ann_lsh,
    "cosine_neardup_lsh": q_cosine_neardup_lsh,
    "phash_neardup": q_phash_neardup,
    "image_dedup_keepers": q_image_dedup_keepers,
    "image_stats": q_image_stats,
    "image_resize": q_image_resize,
    "incremental_dedup": q_incremental_dedup,
    "active_customers": q_active_customers,
    "hash_split": q_hash_split,
    "pii_redact": q_pii_redact,
    "decontaminate": q_decontaminate,
    "repetition": q_repetition,
    "pack_sequences": q_pack_sequences,
    "heavy_hitters": q_heavy_hitters,
    "orders_left_join": q_orders_left_join,
    "customers_full_join": q_customers_full_join,
    "rollup_revenue": q_rollup_revenue,
    "order_rank": q_order_rank,
    "latest_events": q_latest_events,
    "bigram_pmi": q_bigram_pmi,
    "kmeans": q_kmeans,
    "semantic_dedup": q_semantic_dedup,
    "knn_join": q_knn_join,
    "proto_prune": q_proto_prune,
    "hash_features": q_hash_features,
    "gate_attrition": q_gate_attrition,
    "corpus_card": q_corpus_card,
    "doc_entropy": q_doc_entropy,
    "compress_ratio": q_compress_ratio,
    "winsorize": q_winsorize,
    "session_durations": q_session_durations,
    "count_gini": q_count_gini,
    "host_entropy": q_host_entropy,
    "band_join": q_band_join,
    "hll_intersect": q_hll_intersect,
    "chi_square": q_chi_square,
    "vocab_drift": q_vocab_drift,
    "hll_grouped": q_hll_grouped,
    "percent_rank": q_percent_rank,
    "event_pivot": q_event_pivot,
    "order_ntile": q_order_ntile,
    "urgent_low_intersect": q_urgent_low_intersect,
    "urgent_only_except": q_urgent_only_except,
    "urgent_low_intersect_all": q_urgent_low_intersect_all,
    "urgent_only_except_all": q_urgent_only_except_all,
    "order_gaps": q_order_gaps,
    "locf_fill": q_locf_fill,
    "gap_fill": q_gap_fill,
    "windowed_dedup": q_windowed_dedup,
    "twap": q_twap,
    "decile_bins": q_decile_bins,
    "psi_drift": q_psi_drift,
    "prep_pipeline": q_prep_pipeline,
    "join_size_est": q_join_size_est,
    "image_aspect_buckets": q_image_aspect_buckets,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "interval_merge": q_interval_merge,
    "target_encode": q_target_encode,
    "running_distinct": q_running_distinct,
    "retention_cohorts": q_retention_cohorts,
    "hist2d": q_hist2d,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "event_transitions": q_event_transitions,
    "cube_revenue": q_cube_revenue,
    "grouping_sets": q_grouping_sets,
    "group_skew": q_group_skew,
    "skew_join_revenue": q_skew_join_revenue,
    "chunk_docs": q_chunk_docs,
    "span_dedup": q_span_dedup,
    "minmax_norm": q_minmax_norm,
    "moving_sum": q_moving_sum,
    "cume_dist": q_cume_dist,
    "event_seq": q_event_seq,
    "first_last_order": q_first_last_order,
    "source_share": q_source_share,
    "dense_rank": q_dense_rank,
    "group_stats": q_group_stats,
    "triangles": q_triangles,
    "graph_bfs": q_graph_bfs,
    "graph_bfs_join": q_graph_bfs_join,
    "copurchase": q_copurchase,
    "compaction_plan": q_compaction_plan,
    "zorder_cells": q_zorder_cells,
    "crawl_budget": q_crawl_budget,
    "snapshot_diff": q_snapshot_diff,
    "assign_ids": q_assign_ids,
    "label_prop": q_label_prop,
    "label_prop_join": q_label_prop_join,
    "cc_converged": q_cc_converged,
    "sssp_hops": q_sssp_hops,
    "ktruss": q_ktruss,
    "rate_limit": q_rate_limit,
    "jaccard_join": q_jaccard_join,
    "edit_join": q_edit_join,
    "weighted_sample": q_weighted_sample,
    "clustering": q_clustering,
    "group_mad": q_group_mad,
    "urgent_low_union": q_urgent_low_union,
    "window_users": q_window_users,
    "quantile_sketch": q_quantile_sketch,
    "ridge_probe": q_ridge_probe,
    "lang_top_tokens": q_lang_top_tokens,
    "props_extract": q_props_extract,
    "validity_intervals": q_validity_intervals,
    "hash_sample": q_hash_sample,
    "normalize_text": q_normalize_text,
    "dedup_keepers_cc": q_dedup_keepers_cc,
    "price_quantiles": q_price_quantiles,
    "percentile_cont": q_percentile_cont,
    "unigram_logprob": q_unigram_logprob,
    "bigram_logprob": q_bigram_logprob,
    "tokenize_ids": q_tokenize_ids,
    "corr_matrix": q_corr_matrix,
    "gram_novelty": q_gram_novelty,
    "bloom_semi_join": q_bloom_semi_join,
    "bloom_anti_join": q_bloom_anti_join,
    "hll_distinct": q_hll_distinct,
    "running_total": q_running_total,
    "pagerank": q_pagerank,
    "pagerank_join": q_pagerank_join,
    "pagerank_weighted": q_pagerank_weighted,
    "label_centroids": q_label_centroids,
    "length_outliers": q_length_outliers,
    "cms_counts": q_cms_counts,
    "top_event_type": q_top_event_type,
    "centroid_assign": q_centroid_assign,
    "image_caption_curate": q_image_caption_curate,
    "funnel_depth": q_funnel_depth,
    "reassemble_chunks": q_reassemble_chunks,
    "group_corr": q_group_corr,
    "user_entropy": q_user_entropy,
    "value_histogram": q_value_histogram,
    "stratified_sample": q_stratified_sample,
    "interval_join": q_interval_join,
    "embedding_pca": q_embedding_pca,
    "winnow_dup": q_winnow_dup,
    "column_profile": q_column_profile,
    "range_window_sum": q_range_window_sum,
    "bm25_topk": q_bm25_topk,
    "rrf_fusion": q_rrf_fusion,
    "lang_confusion": q_lang_confusion,
    "cohen_kappa": q_cohen_kappa,
    "peak_rate": q_peak_rate,
    "k_anon_violations": q_k_anon_violations,
    "postings": q_postings,
    "orders_unpivot": q_orders_unpivot,
    "cdc_merge": q_cdc_merge,
    "image_embed_neardup": q_image_embed_neardup,
    "hits": q_hits,
    "hits_join": q_hits_join,
    "degree_dist": q_degree_dist,
    "kmv_source_sim": q_kmv_source_sim,
    "quality_keepers": q_quality_keepers,
    "ks_drift": q_ks_drift,
    "containment_join": q_containment_join,
    "hill_tail": q_hill_tail,
    "recrawl_schedule": q_recrawl_schedule,
    "mix_epochs": q_mix_epochs,
    "lsh_bucket_stats": q_lsh_bucket_stats,
    "zipf_fit": q_zipf_fit,
    "dedup_inflation": q_dedup_inflation,
    "weighted_quantile": q_weighted_quantile,
    "kcore": q_kcore,
    "watermark_late": q_watermark_late,
    "lsh_eval": q_lsh_eval,
    "assortativity": q_assortativity,
    "posting_bytes": q_posting_bytes,
    "group_trend": q_group_trend,
    "neg_samples": q_neg_samples,
    "interleave": q_interleave,
    "coverage_curve": q_coverage_curve,
    "seq_3grams": q_seq_3grams,
    "politeness_audit": q_politeness_audit,
    "dedup_by_source": q_dedup_by_source,
    "rfm_features": q_rfm_features,
    "split_leakage": q_split_leakage,
    "wow_change": q_wow_change,
    "fd_audit": q_fd_audit,
    "ri_audit": q_ri_audit,
    "quota_sample": q_quota_sample,
    "diverse_sample": q_diverse_sample,
    "markov_probs": q_markov_probs,
    "langid_margin": q_langid_margin,
    "diameter_est": q_diameter_est,
    "lsh_s_curve": q_lsh_s_curve,
    "auc_roc": q_auc_roc,
    "calibration_bins": q_calibration_bins,
    "ece": q_ece,
    "cusum_change": q_cusum_change,
    "ndcg10": q_ndcg10,
    "mrr": q_mrr,
    "link_predict": q_link_predict,
    "bloom_sizing": q_bloom_sizing,
    "shard_plan": q_shard_plan,
    "two_hop_reach": q_two_hop_reach,
    "l_diversity": q_l_diversity,
    "ab_ztest": q_ab_ztest,
    "simpson_diversity": q_simpson_diversity,
    "fano_factor": q_fano_factor,
    "event_autocorr": q_event_autocorr,
    "markov_entropy": q_markov_entropy,
    "seasonality_chi2": q_seasonality_chi2,
    "ttr": q_ttr,
    "readability": q_readability,
    "image_meta": q_image_meta,
    "image_aspect_card": q_image_aspect_card,
    "phash_pairs": q_phash_pairs,
    "phash_keeper_best": q_phash_keeper_best,
    "image_decode_parity": q_image_decode_parity,
    "phash_bit_balance": q_phash_bit_balance,
    "thumb_parity": q_thumb_parity,
    "image_gate": q_image_gate,
    "psnr_gate": q_psnr_gate,
    "fertility": q_fertility,
    "bootstrap_ci": q_bootstrap_ci,
    "pareto_docs": q_pareto_docs,
    "bloom_fp_audit": q_bloom_fp_audit,
    "welch_t": q_welch_t,
    "spearman_corr": q_spearman_corr,
    "kendall_tau": q_kendall_tau,
    "decayed_counts": q_decayed_counts,
    "hash_ring_plan": q_hash_ring_plan,
    "wasserstein1": q_wasserstein1,
    "t_closeness": q_t_closeness,
    "watermark_plan": q_watermark_plan,
    "ewma_residuals": q_ewma_residuals,
    "backoff_plan": q_backoff_plan,
    "quantile_normalize": q_quantile_normalize,
    "runs_test": q_runs_test,
    "stump_split": q_stump_split,
    "embedding_mmd": q_embedding_mmd,
    "cramers_v": q_cramers_v,
    "url_template_census": q_url_template_census,
    "temperature_mix": q_temperature_mix,
    "jain_fairness": q_jain_fairness,
    "wilson_lb": q_wilson_lb,
    "sigma_breach": q_sigma_breach,
    "otsu_threshold": q_otsu_threshold,
    "simpson_paradox": q_simpson_paradox,
    "benford_audit": q_benford_audit,
    "pr_curve": q_pr_curve,
    "ohlc_bars": q_ohlc_bars,
    "tukey_fences": q_tukey_fences,
    "count_of_counts": q_count_of_counts,
    "hapax_share": q_hapax_share,
    "reshard_move_cost": q_reshard_move_cost,
    "tile_variance": q_tile_variance,
    "url_lcp_compression": q_url_lcp_compression,
    "channel_histogram": q_channel_histogram,
    "image_sharpness": q_image_sharpness,
    "image_luma": q_image_luma,
    "image_color_cast": q_image_color_cast,
    "image_grad_orientation": q_image_grad_orientation,
    "image_clipping": q_image_clipping,
    "image_blockiness": q_image_blockiness,
    "image_border_energy": q_image_border_energy,
    "image_palette": q_image_palette,
    "url_extension_census": q_url_extension_census,
    "caption_alignment": q_caption_alignment,
    "phash_dup_locality": q_phash_dup_locality,
    "crawl_eta_plan": q_crawl_eta_plan,
    "class_f1": q_class_f1,
    "group_p95": q_group_p95,
    "top_user_share": q_top_user_share,
    "anchor_text_census": q_anchor_text_census,
    "robots_precedence_audit": q_robots_precedence_audit,
    "burst_rate": q_burst_rate,
    "subnet_load_rollup": q_subnet_load_rollup,
    "audio_features": q_audio_features,
    "video_motion": q_video_motion,
    "audio_silence": q_audio_silence,
    "video_flicker": q_video_flicker,
    "knn_classify": q_knn_classify,
    "line_length_stats": q_line_length_stats,
    "control_char_gate": q_control_char_gate,
    "gopher_rules": q_gopher_rules,
    "char_class_profile": q_char_class_profile,
    "line_dedup": q_line_dedup,
    "template_3gram": q_template_3gram,
    "prefix_dup": q_prefix_dup,
    "url_depth_census": q_url_depth_census,
    "embedding_norm_census": q_embedding_norm_census,
    "cluster_separation": q_cluster_separation,
    "embedding_dim_census": q_embedding_dim_census,
    "audio_clipping": q_audio_clipping,
    "gopher_word_rules": q_gopher_word_rules,
    "brier_score": q_brier_score,
    "source_lang_mi": q_source_lang_mi,
    "image_channel_corr": q_image_channel_corr,
    "video_scene_cuts": q_video_scene_cuts,
    "redirect_resolve": q_redirect_resolve,
    "mann_whitney": q_mann_whitney,
    "gini_split": q_gini_split,
    "kruskal_wallis": q_kruskal_wallis,
    "url_param_census": q_url_param_census,
    "ppr": q_ppr,
    "ppr_join": q_ppr_join,
    "fisher_2x2": q_fisher_2x2,
    "life_table": q_life_table,
    "diff_in_diff": q_diff_in_diff,
    "page_hinkley": q_page_hinkley,
    "brown_forsythe": q_brown_forsythe,
    "cochran_armitage": q_cochran_armitage,
    "robots_gate_audit": q_robots_gate_audit,
    "slot_load_audit": q_slot_load_audit,
    "promo_revenue": q_promo_revenue,
    "returned_revenue": q_returned_revenue,
    "large_orders": q_large_orders,
    "supplier_share": q_supplier_share,
    "avg_yearly": q_avg_yearly,
    "phash_caption_conflict": q_phash_caption_conflict,
    "stopword_ratio": q_stopword_ratio,
    "drawdown": q_drawdown,
    "langid_stability": q_langid_stability,
    "mcnemar_langid": q_mcnemar_langid,
    "caption_dup_images": q_caption_dup_images,
    "trap_urls": q_trap_urls,
    "modularity": q_modularity,
    "balanced_downsample": q_balanced_downsample,
}


def entry() -> Any:
    """Flagship pipeline at sf0.001: distributed crawl of a synthetic
    web with image+caption sink, then read the sink back."""
    import ray
    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import run_crawl

    web = SyntheticWeb(8, seed=11, max_class=3)
    out = "/tmp/frontera_ray_entry"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    run_crawl(web, out, num_state_shards=2, num_queue_shards=2,
              batch_per_shard=128, max_rounds=50)
    return ray.data.read_parquet(out)


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def _img_val_sql(xe: str, ye: str = "gy.y::UBIGINT",
                 ce: str = "gc.c::UBIGINT") -> str:
    """Decoded-pixel-value SQL expression (fmt-aware dequantization)
    at generator coordinates (xe, ye, ce) — the closed-form twin of
    payload._gen_pixels_group + the qimg quantizer, shared by the
    image_sharpness / image_luma oracles. Expects the m CTE columns
    (fmt, s5, s7, s32, s256) in scope."""
    n1 = (f"((xor(xor(({xe} * 2654435761::UBIGINT)"
          f" % 4294967296::UBIGINT,"
          f" {ye} * 40503::UBIGINT),"
          f" {ce} * 69069::UBIGINT)"
          f" + m.s32) % 4294967296::UBIGINT)")
    raw = (f"(((xor({n1}, {n1} >> 13) & 63::UBIGINT)"
           f" + {xe} * m.s5 + {ye} * m.s7 + m.s256) % 256::UBIGINT)")
    return (f"(CASE WHEN m.fmt = 'qimg' THEN ({raw} // 8) * 8 + 4"
            f" ELSE {raw} END)::BIGINT")


_IMG_META_CTES = r"""
        d AS (SELECT doc_id,
                     ('0x'||substr(md5('img:'||
                        CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
              FROM documents),
        m AS (SELECT doc_id, u,
                     CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                          WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                          ELSE 80 END::BIGINT AS w,
                     CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                          WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                          ELSE 60 END::BIGINT AS h,
                     CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                          ELSE 'qimg' END AS fmt,
                     (1 + u % 5) AS s5, (1 + (u >> 4) % 7) AS s7,
                     (u & 4294967295::UBIGINT) AS s32,
                     (u % 256) AS s256
              FROM d)"""


def _image_sharpness_oracle() -> str:
    v0 = _img_val_sql("gx.x::UBIGINT")
    v1 = _img_val_sql("(gx.x + 1)::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        px AS (SELECT m.doc_id, m.fmt, m.w, m.h,
                      {v0} AS v0, {v1} AS v1
               FROM m, generate_series(0, 78) gx(x),
                    generate_series(0, 59) gy(y),
                    generate_series(0, 2) gc(c)
               WHERE gx.x < m.w - 1 AND gy.y < m.h)
        SELECT doc_id, fmt,
               ((w - 1) * h * 3)::BIGINT AS n_pairs,
               sum(abs(v1 - v0))::BIGINT AS grad_sum,
               ((1000 * sum(abs(v1 - v0))) // ((w - 1) * h * 3))::BIGINT
                 AS grad_milli,
               ((1000 * sum(abs(v1 - v0))) // ((w - 1) * h * 3) < 30000)
                 AS blurry
        FROM px GROUP BY doc_id, fmt, w, h ORDER BY doc_id"""


def _image_channel_corr_oracle() -> str:
    vr = _img_val_sql("gx.x::UBIGINT", "gy.y::UBIGINT", "0::UBIGINT")
    vg = _img_val_sql("gx.x::UBIGINT", "gy.y::UBIGINT", "1::UBIGINT")
    vb = _img_val_sql("gx.x::UBIGINT", "gy.y::UBIGINT", "2::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        px AS (SELECT m.doc_id, m.w, m.h,
                      {vr} AS r, {vg} AS g, {vb} AS b
               FROM m, generate_series(0, 79) gx(x),
                    generate_series(0, 59) gy(y)
               WHERE gx.x < m.w AND gy.y < m.h),
        agg AS (SELECT doc_id, (w * h)::BIGINT AS n,
                       sum(r)::BIGINT AS sr, sum(g)::BIGINT AS sg,
                       sum(b)::BIGINT AS sb,
                       sum(r*r)::BIGINT AS srr, sum(g*g)::BIGINT AS sgg,
                       sum(b*b)::BIGINT AS sbb,
                       sum(r*g)::BIGINT AS srg, sum(g*b)::BIGINT AS sgb
                FROM px GROUP BY doc_id, w, h),
        cv AS (SELECT doc_id,
                      (n*srg - sr*sg)::BIGINT AS cov_rg,
                      (n*sgb - sg*sb)::BIGINT AS cov_gb,
                      (n*srr - sr*sr)::BIGINT AS var_r,
                      (n*sgg - sg*sg)::BIGINT AS var_g,
                      (n*sbb - sb*sb)::BIGINT AS var_b
               FROM agg),
        cr AS (SELECT doc_id, cov_rg, cov_gb,
                      CASE WHEN var_r > 0 AND var_g > 0
                           THEN CAST(floor(1000000.0 * cov_rg
                                / sqrt(var_r::DOUBLE * var_g::DOUBLE)
                                + 0.5) AS BIGINT)
                           ELSE 1000000 END AS corr_rg_ppm,
                      CASE WHEN var_g > 0 AND var_b > 0
                           THEN CAST(floor(1000000.0 * cov_gb
                                / sqrt(var_g::DOUBLE * var_b::DOUBLE)
                                + 0.5) AS BIGINT)
                           ELSE 1000000 END AS corr_gb_ppm
               FROM cv)
        SELECT doc_id, cov_rg, cov_gb, corr_rg_ppm, corr_gb_ppm,
               (corr_rg_ppm >= 990000 AND corr_gb_ppm >= 990000)
                 AS grayish
        FROM cr ORDER BY doc_id"""


def _pq_oracle(m: int = 2, sub: int = 32, k: int = 4) -> str:
    """Per-subspace unrolled Lloyd CTE (iters=1) over sliced embedding
    dims + the exact nano-unit distortion census — the SQL twin of
    ann.pq_codebook (same recurrence as the 'kmeans'/'semantic_dedup'
    oracles, applied to embedding[off+1 .. off+sub])."""
    parts = []
    for s_ in range(m):
        off = s_ * sub
        parts.append(f"""
            SELECT {s_}::BIGINT AS subspace, cluster, n, distortion_nano
            FROM (
              WITH c0 AS (
                SELECT vec_id::BIGINT AS cl, i AS dim,
                       embedding[{off} + i + 1]::DOUBLE AS c
                FROM embeddings, generate_series(0, {sub - 1}) AS g(i)
                WHERE vec_id < {k}),
              d1 AS (
                SELECT e.vec_id, c.cl,
                       round(sum((e.embedding[{off} + c.dim + 1]::DOUBLE
                                  - c.c)
                                 * (e.embedding[{off} + c.dim + 1]::DOUBLE
                                    - c.c)), 9) AS d2
                FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
              a1 AS (
                SELECT vec_id, cl FROM (
                  SELECT vec_id, cl, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cl) AS rn
                  FROM d1) WHERE rn = 1),
              m1 AS (
                SELECT a.cl, g.i AS dim,
                       round(sum(e.embedding[{off} + g.i + 1]::DOUBLE)
                             / count(*), 9) AS c
                FROM embeddings e JOIN a1 a USING (vec_id),
                     generate_series(0, {sub - 1}) AS g(i)
                GROUP BY a.cl, g.i),
              c1 AS (SELECT c0.cl, c0.dim, COALESCE(m1.c, c0.c) AS c
                     FROM c0 LEFT JOIN m1
                       ON m1.cl = c0.cl AND m1.dim = c0.dim),
              df AS (
                SELECT e.vec_id, c.cl,
                       round(sum((e.embedding[{off} + c.dim + 1]::DOUBLE
                                  - c.c)
                                 * (e.embedding[{off} + c.dim + 1]::DOUBLE
                                    - c.c)), 9) AS d2
                FROM embeddings e, c1 c GROUP BY e.vec_id, c.cl),
              af AS (
                SELECT vec_id, cl, d2 FROM (
                  SELECT vec_id, cl, d2, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cl) AS rn
                  FROM df) WHERE rn = 1)
              SELECT cl AS cluster, count(*)::BIGINT AS n,
                     sum(CAST(round(d2 * 1000000000) AS BIGINT))::BIGINT
                       AS distortion_nano
              FROM af GROUP BY cl)""")
    return (" UNION ALL ".join(parts)
            + " ORDER BY subspace, cluster")


def _ivfpq_oracle(nlist: int = 8, nprobe: int = 3, m: int = 2,
                  sub: int = 32, ksub: int = 4, k: int = 10,
                  nq: int = 5) -> str:
    """IVF-PQ twin: the coarse iters=1 Lloyd CTE (identical to
    'ann_ivf') prunes to probed lists; per-subspace Lloyd CTEs
    (identical to 'pq_codebook') give codes; ADC = integer sum of
    per-subspace nano LUT entries; rank by (adc_nano, vec_id)."""
    subs = []
    for s_ in range(m):
        off = s_ * sub
        subs.append(f"""
            sc0_{s_} AS (
              SELECT vec_id::BIGINT AS cl, i AS dim,
                     embedding[{off} + i + 1]::DOUBLE AS c
              FROM embeddings, generate_series(0, {sub - 1}) AS g(i)
              WHERE vec_id < {ksub}),
            sd1_{s_} AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[{off} + c.dim + 1]::DOUBLE
                                - c.c)
                               * (e.embedding[{off} + c.dim + 1]::DOUBLE
                                  - c.c)), 9) AS d2
              FROM embeddings e, sc0_{s_} c GROUP BY e.vec_id, c.cl),
            sa1_{s_} AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM sd1_{s_}) WHERE rn = 1),
            sm1_{s_} AS (
              SELECT a.cl, g.i AS dim,
                     round(sum(e.embedding[{off} + g.i + 1]::DOUBLE)
                           / count(*), 9) AS c
              FROM embeddings e JOIN sa1_{s_} a USING (vec_id),
                   generate_series(0, {sub - 1}) AS g(i)
              GROUP BY a.cl, g.i),
            sc1_{s_} AS (SELECT sc0_{s_}.cl, sc0_{s_}.dim,
                                COALESCE(sm1_{s_}.c, sc0_{s_}.c) AS c
                         FROM sc0_{s_} LEFT JOIN sm1_{s_}
                           ON sm1_{s_}.cl = sc0_{s_}.cl
                          AND sm1_{s_}.dim = sc0_{s_}.dim),
            sdf_{s_} AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[{off} + c.dim + 1]::DOUBLE
                                - c.c)
                               * (e.embedding[{off} + c.dim + 1]::DOUBLE
                                  - c.c)), 9) AS d2
              FROM embeddings e, sc1_{s_} c GROUP BY e.vec_id, c.cl),
            code_{s_} AS (
              SELECT vec_id, cl AS code FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM sdf_{s_}) WHERE rn = 1),
            lut_{s_} AS (
              SELECT vec_id AS qid, cl AS code,
                     CAST(round(d2 * 1000000000) AS BIGINT) AS nano
              FROM sdf_{s_} WHERE vec_id < {nq})""")
    adc = " + ".join(f"l{s_}.nano" for s_ in range(m))
    joins = "".join(
        f"""
              JOIN code_{s_} cd{s_} ON cd{s_}.vec_id = cand.vec_id
              JOIN lut_{s_} l{s_} ON l{s_}.qid = cand.qid
                                 AND l{s_}.code = cd{s_}.code"""
        for s_ in range(m))
    return f"""
        WITH c0 AS (
          SELECT vec_id::BIGINT AS cl, i AS dim,
                 embedding[i+1]::DOUBLE AS c
          FROM embeddings, generate_series(0, 63) AS g(i)
          WHERE vec_id < {nlist}),
        d1 AS (
          SELECT e.vec_id, c.cl,
                 round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                           * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                   AS d2
          FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
        a1 AS (
          SELECT vec_id, cl FROM (
            SELECT vec_id, cl, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cl) AS rn
            FROM d1) WHERE rn = 1),
        m1 AS (
          SELECT a.cl, g.i AS dim,
                 round(sum(e.embedding[g.i+1]::DOUBLE) / count(*), 9)
                   AS c
          FROM embeddings e JOIN a1 a USING (vec_id),
               generate_series(0, 63) AS g(i)
          GROUP BY a.cl, g.i),
        c1 AS (SELECT c0.cl, c0.dim, COALESCE(m1.c, c0.c) AS c
               FROM c0 LEFT JOIN m1
                 ON m1.cl = c0.cl AND m1.dim = c0.dim),
        df AS (
          SELECT e.vec_id, c.cl,
                 round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                           * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                   AS d2
          FROM embeddings e, c1 c GROUP BY e.vec_id, c.cl),
        af AS (
          SELECT vec_id, cl FROM (
            SELECT vec_id, cl, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cl) AS rn
            FROM df) WHERE rn = 1),
        probe AS (
          SELECT vec_id AS qid, cl FROM (
            SELECT vec_id, cl, row_number() OVER (
              PARTITION BY vec_id ORDER BY d2, cl) AS rn
            FROM df WHERE vec_id < {nq}) WHERE rn <= {nprobe}),
        {",".join(subs)},
        cand AS (
          SELECT p.qid, a.vec_id FROM af a JOIN probe p ON a.cl = p.cl),
        scored AS (
          SELECT cand.qid AS query_id, cand.vec_id,
                 {adc} AS adc_nano
          FROM cand{joins})
        SELECT query_id, vec_id, rank::INTEGER AS rank, adc_nano FROM (
          SELECT query_id, vec_id, adc_nano, row_number() OVER (
            PARTITION BY query_id
            ORDER BY adc_nano, vec_id) AS rank
          FROM scored)
        WHERE rank <= {k}"""


def _image_dhash_oracle() -> str:
    v = _img_val_sql("((gcc.c * m.w) // 9)::UBIGINT",
                     "((gr.r * m.h) // 8)::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        g AS (SELECT m.doc_id, m.fmt, gr.r, gcc.c AS col,
                     sum((CASE gc.c WHEN 0 THEN 299 WHEN 1 THEN 587
                               ELSE 114 END) * {v})::BIGINT AS gray
              FROM m, generate_series(0, 7) gr(r),
                   generate_series(0, 8) gcc(c),
                   generate_series(0, 2) gc(c)
              GROUP BY m.doc_id, m.fmt, gr.r, gcc.c),
        b AS (SELECT g1.doc_id, g1.fmt, g1.r, g1.col,
                     CASE WHEN g2.gray > g1.gray THEN 1 ELSE 0 END
                       AS bit
              FROM g g1 JOIN g g2 ON g2.doc_id = g1.doc_id
                                 AND g2.r = g1.r
                                 AND g2.col = g1.col + 1
              WHERE g1.col < 8),
        h AS (SELECT doc_id, fmt,
                     sum(bit::HUGEINT
                         * (1::HUGEINT << (r * 8 + col)::INT)) AS u,
                     sum(bit)::BIGINT AS n_bits_set
              FROM b GROUP BY doc_id, fmt)
        SELECT doc_id, fmt,
               (CASE WHEN u >= 9223372036854775808::HUGEINT
                     THEN u - 18446744073709551616::HUGEINT
                     ELSE u END)::BIGINT AS dhash,
               n_bits_set
        FROM h ORDER BY doc_id"""


def _image_luma_oracle() -> str:
    v = _img_val_sql("gx.x::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        v AS (SELECT m.doc_id, m.fmt, m.w, m.h,
                     (CASE gc.c WHEN 0 THEN 299 WHEN 1 THEN 587
                           ELSE 114 END) * {v} AS lw
              FROM m, generate_series(0, 79) gx(x),
                   generate_series(0, 59) gy(y),
                   generate_series(0, 2) gc(c)
              WHERE gx.x < m.w AND gy.y < m.h)
        SELECT doc_id, fmt,
               sum(lw)::BIGINT AS luma_sum_milli,
               (sum(lw) // (w * h))::BIGINT AS mean_luma_milli,
               CASE WHEN sum(lw) // (w * h) < 85000 THEN 'dark'
                    WHEN sum(lw) // (w * h) > 170000 THEN 'bright'
                    ELSE 'mid' END AS bucket
        FROM v GROUP BY doc_id, fmt, w, h ORDER BY doc_id"""


def _image_color_cast_oracle() -> str:
    v = _img_val_sql("gx.x::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        v AS (SELECT m.doc_id, m.fmt, gc.c AS ch, {v} AS val
              FROM m, generate_series(0, 79) gx(x),
                   generate_series(0, 59) gy(y),
                   generate_series(0, 2) gc(c)
              WHERE gx.x < m.w AND gy.y < m.h),
        s AS (SELECT doc_id, fmt,
                     sum(CASE WHEN ch = 0 THEN val ELSE 0 END)::BIGINT
                       AS sum_r,
                     sum(CASE WHEN ch = 1 THEN val ELSE 0 END)::BIGINT
                       AS sum_g,
                     sum(CASE WHEN ch = 2 THEN val ELSE 0 END)::BIGINT
                       AS sum_b,
                     sum(CASE WHEN val % 8 = 4 THEN 1 ELSE 0 END)::BIGINT
                       AS n_quant,
                     count(*)::BIGINT AS n_vals
              FROM v GROUP BY doc_id, fmt),
        c AS (SELECT *,
                     (1000 * (greatest(sum_r, sum_g, sum_b)
                              - least(sum_r, sum_g, sum_b))
                      // (sum_r + sum_g + sum_b))::BIGINT AS cast_milli,
                     CASE WHEN n_quant = n_vals THEN 'qimg'
                          ELSE 'png' END AS sniffed_fmt
              FROM s)
        SELECT doc_id, fmt, sum_r, sum_g, sum_b, cast_milli,
               cast_milli >= 10 AS color_cast,
               n_quant, n_vals, sniffed_fmt,
               sniffed_fmt = fmt AS fmt_match
        FROM c ORDER BY doc_id"""


def _image_grad_orientation_oracle() -> str:
    v0 = _img_val_sql("gx.x::UBIGINT")
    v1x = _img_val_sql("(gx.x + 1)::UBIGINT")
    v1y = _img_val_sql("gx.x::UBIGINT", "(gy.y + 1)::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        hx AS (SELECT m.doc_id, sum(abs({v1x} - {v0}))::BIGINT AS grad_h
               FROM m, generate_series(0, 78) gx(x),
                    generate_series(0, 59) gy(y),
                    generate_series(0, 2) gc(c)
               WHERE gx.x < m.w - 1 AND gy.y < m.h
               GROUP BY m.doc_id),
        vy AS (SELECT m.doc_id, sum(abs({v1y} - {v0}))::BIGINT AS grad_v
               FROM m, generate_series(0, 79) gx(x),
                    generate_series(0, 58) gy(y),
                    generate_series(0, 2) gc(c)
               WHERE gx.x < m.w AND gy.y < m.h - 1
               GROUP BY m.doc_id),
        j AS (SELECT m.doc_id, m.fmt,
                     ((m.w - 1) * m.h * 3)::BIGINT AS n_h,
                     (m.w * (m.h - 1) * 3)::BIGINT AS n_v,
                     hx.grad_h, vy.grad_v,
                     CASE WHEN hx.grad_h > 0
                          THEN (1000 * vy.grad_v * ((m.w - 1) * m.h * 3))
                               // (hx.grad_h * (m.w * (m.h - 1) * 3))
                          ELSE -1 END::BIGINT AS aniso_milli
              FROM m JOIN hx USING (doc_id)
                     JOIN vy ON vy.doc_id = m.doc_id)
        SELECT doc_id, fmt, n_h, n_v, grad_h, grad_v, aniso_milli,
               (aniso_milli < 900 OR aniso_milli > 1100) AS banded
        FROM j ORDER BY doc_id"""


def _image_blockiness_oracle() -> str:
    v0 = _img_val_sql("gx.x::UBIGINT")
    v1 = _img_val_sql("(gx.x + 1)::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        px AS (SELECT m.doc_id, m.w, m.h,
                      CASE WHEN gx.x % 8 = 7 THEN 1 ELSE 0 END AS bnd,
                      abs({v1} - {v0}) AS dv
               FROM m, generate_series(0, 78) gx(x),
                    generate_series(0, 59) gy(y),
                    generate_series(0, 2) gc(c)
               WHERE gx.x < m.w - 1 AND gy.y < m.h),
        a AS (SELECT doc_id,
                     (((w - 9) // 8 + 1) * h * 3)::BIGINT AS n_boundary,
                     ((w - 1) * h * 3
                      - ((w - 9) // 8 + 1) * h * 3)::BIGINT AS n_interior,
                     sum(CASE WHEN bnd = 1 THEN dv ELSE 0 END)::BIGINT
                       AS grad_boundary,
                     sum(CASE WHEN bnd = 0 THEN dv ELSE 0 END)::BIGINT
                       AS grad_interior
              FROM px GROUP BY doc_id, w, h),
        r AS (SELECT *,
                     CASE WHEN grad_interior > 0 AND n_boundary > 0
                          THEN (1000 * grad_boundary * n_interior)
                               // (grad_interior * n_boundary)
                          ELSE -1 END::BIGINT AS blockiness_milli
              FROM a)
        SELECT doc_id, n_boundary, n_interior, grad_boundary,
               grad_interior, blockiness_milli,
               (blockiness_milli > 1100
                OR (blockiness_milli >= 0 AND blockiness_milli < 900))
                 AS blocky
        FROM r ORDER BY doc_id"""


def _image_border_energy_oracle() -> str:
    v = _img_val_sql("gx.x::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        px AS (SELECT m.doc_id,
                      CASE WHEN gx.x < 2 OR gx.x >= m.w - 2
                                OR gy.y < 2 OR gy.y >= m.h - 2
                           THEN 1 ELSE 0 END AS brd,
                      {v} AS val
               FROM m, generate_series(0, 79) gx(x),
                    generate_series(0, 59) gy(y),
                    generate_series(0, 2) gc(c)
               WHERE gx.x < m.w AND gy.y < m.h),
        a AS (SELECT doc_id,
                     sum(brd)::HUGEINT AS nb,
                     sum(1 - brd)::HUGEINT AS ni,
                     sum(CASE WHEN brd = 1 THEN val ELSE 0 END)::HUGEINT
                       AS sb,
                     sum(CASE WHEN brd = 0 THEN val ELSE 0 END)::HUGEINT
                       AS si,
                     sum(CASE WHEN brd = 1 THEN val * val
                              ELSE 0 END)::HUGEINT AS ssb,
                     sum(CASE WHEN brd = 0 THEN val * val
                              ELSE 0 END)::HUGEINT AS ssi
              FROM px GROUP BY doc_id),
        w AS (SELECT doc_id, nb, ni,
                     (nb * ssb - sb * sb) AS wb,
                     (ni * ssi - si * si) AS wi
              FROM a),
        r AS (SELECT doc_id, nb, ni, wb, wi,
                     CASE WHEN wi > 0
                          THEN ((1000 * wb * ni * ni)
                                // (wi * nb * nb))::BIGINT
                          ELSE -1 END AS border_ratio_milli
              FROM w)
        SELECT doc_id, nb::BIGINT AS n_border, ni::BIGINT AS n_interior,
               wb::BIGINT AS var_border_num,
               wi::BIGINT AS var_interior_num, border_ratio_milli,
               (border_ratio_milli >= 0 AND border_ratio_milli < 100)
                 AS framed
        FROM r ORDER BY doc_id"""


def _image_clipping_oracle() -> str:
    v = _img_val_sql("gx.x::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        v AS (SELECT m.doc_id, m.fmt, {v} AS val
              FROM m, generate_series(0, 79) gx(x),
                   generate_series(0, 59) gy(y),
                   generate_series(0, 2) gc(c)
              WHERE gx.x < m.w AND gy.y < m.h),
        s AS (SELECT doc_id, fmt,
                     sum(CASE WHEN val = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n_lo,
                     sum(CASE WHEN val = 255 THEN 1 ELSE 0 END)::BIGINT
                       AS n_hi,
                     count(*)::BIGINT AS n_vals
              FROM v GROUP BY doc_id, fmt)
        SELECT doc_id, fmt, n_lo, n_hi, n_vals,
               (1000000 * (n_lo + n_hi) // n_vals)::BIGINT AS clip_ppm,
               (1000000 * (n_lo + n_hi) // n_vals) >= 7800 AS clipped
        FROM s ORDER BY doc_id"""


def _image_palette_oracle() -> str:
    v0 = _img_val_sql("gx.x::UBIGINT", ce="0::UBIGINT")
    v1 = _img_val_sql("gx.x::UBIGINT", ce="1::UBIGINT")
    v2 = _img_val_sql("gx.x::UBIGINT", ce="2::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        px AS (SELECT m.doc_id, m.fmt, m.w, m.h,
                      {v0} * 65536 + {v1} * 256 + {v2} AS packed
               FROM m, generate_series(0, 79) gx(x),
                    generate_series(0, 59) gy(y)
               WHERE gx.x < m.w AND gy.y < m.h)
        SELECT doc_id, fmt, (w * h)::BIGINT AS n_px,
               count(DISTINCT packed)::BIGINT AS n_colors,
               (1000000 * count(DISTINCT packed) // (w * h))::BIGINT
                 AS colors_ppm,
               (1000000 * count(DISTINCT packed) // (w * h)) <= 900000
                 AS posterized
        FROM px GROUP BY doc_id, fmt, w, h ORDER BY doc_id"""


def _caption_alignment_oracle() -> str:
    xe = "((gj.j * m.w) // 8)::UBIGINT"
    ye = "((gi.i * m.h) // 8)::UBIGINT"
    v0 = _img_val_sql(xe, ye, "0::UBIGINT")
    v1 = _img_val_sql(xe, ye, "1::UBIGINT")
    v2 = _img_val_sql(xe, ye, "2::UBIGINT")
    return f"""
        WITH {_IMG_META_CTES},
        iv AS (SELECT m.doc_id, (gi.i * 8 + gj.j)::BIGINT AS dim,
                      ({v0} + {v1} + {v2})::BIGINT AS a
               FROM m, generate_series(0, 7) gi(i),
                    generate_series(0, 7) gj(j)),
        tok AS (SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS token
                FROM documents),
        th AS (SELECT doc_id,
                      ('0x'||substr(md5('ce:'||token),1,16))::UBIGINT AS hu
               FROM tok),
        cv AS (SELECT doc_id, (hu % 64)::BIGINT AS dim,
                      sum(CASE WHEN (hu >> 6) % 2 = 0
                               THEN 1 ELSE -1 END)::BIGINT AS b
               FROM th GROUP BY doc_id, dim),
        j AS (SELECT iv.doc_id,
                     sum(iv.a * coalesce(cv.b, 0))::BIGINT AS dot,
                     sum(iv.a * iv.a)::BIGINT AS na2
              FROM iv LEFT JOIN cv
                   ON iv.doc_id = cv.doc_id AND iv.dim = cv.dim
              GROUP BY iv.doc_id),
        nb AS (SELECT doc_id, sum(b * b)::BIGINT AS nb2
               FROM cv GROUP BY doc_id)
        SELECT j.doc_id, j.dot, j.na2,
               coalesce(nb.nb2, 0)::BIGINT AS nb2,
               (j.dot <= 0 OR 100 * j.dot * j.dot
                              < j.na2 * coalesce(nb.nb2, 0)) AS misaligned
        FROM j LEFT JOIN nb ON nb.doc_id = j.doc_id
        ORDER BY j.doc_id"""


def _aud_val_sql(te: str) -> str:
    """Decoded-sample SQL expression at sample index ``te`` — the
    closed-form twin of payload.gen_audio_group; expects m CTE columns
    (amp, s32) in scope."""
    x = f"(({te} * 2654435761::UBIGINT + m.s32) % 4294967296::UBIGINT)"
    return (f"((((xor({x}, {x} >> 13) & 4095::UBIGINT))::BIGINT - 2048)"
            f" * m.amp)")


def _audio_features_oracle() -> str:
    v0 = _aud_val_sql("gt.t::UBIGINT")
    v1 = _aud_val_sql("(gt.t + 1)::UBIGINT")
    return f"""
        WITH d AS (SELECT doc_id,
                          ('0x'||substr(md5('aud:'||
                             CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                   FROM documents),
        m AS (SELECT doc_id, (1600 + (u % 4) * 400)::BIGINT AS n,
                     (1 + (u >> 5) % 4)::BIGINT AS amp,
                     (u & 4294967295::UBIGINT) AS s32
              FROM d),
        v AS (SELECT m.doc_id, m.n, gt.t, {v0} AS v0, {v1} AS v1
              FROM m, generate_series(0, 2799) gt(t)
              WHERE gt.t < m.n)
        SELECT doc_id, n AS n_samples,
               sum(v0 * v0)::BIGINT AS sum_sq,
               max(abs(v0))::BIGINT AS peak,
               sum(CASE WHEN t < n - 1 AND v0 * v1 < 0
                        THEN 1 ELSE 0 END)::BIGINT AS zero_cross,
               (1000 * sum(v0 * v0) // n)::BIGINT AS rms2_milli,
               ((1000 * sum(v0 * v0) // n) >= 9000000000) AS loud
        FROM v GROUP BY doc_id, n ORDER BY doc_id"""


def _vid_val_sql(alias: str) -> str:
    """Decoded qimg pixel value at (gx.x, gy.y, gc.c) for frame row
    ``alias`` (expects alias columns s5, s7, s32, s256)."""
    n1 = (f"((xor(xor((gx.x::UBIGINT * 2654435761::UBIGINT)"
          f" % 4294967296::UBIGINT,"
          f" gy.y::UBIGINT * 40503::UBIGINT),"
          f" gc.c::UBIGINT * 69069::UBIGINT)"
          f" + {alias}.s32) % 4294967296::UBIGINT)")
    raw = (f"(((xor({n1}, {n1} >> 13) & 63::UBIGINT)"
           f" + gx.x::UBIGINT * {alias}.s5 + gy.y::UBIGINT * {alias}.s7"
           f" + {alias}.s256) % 256::UBIGINT)")
    return f"((({raw} // 8) * 8 + 4))::BIGINT"


def _video_motion_oracle() -> str:
    v1 = _vid_val_sql("a")
    v0 = _vid_val_sql("b")
    return f"""
        WITH d AS (SELECT doc_id,
                          ('0x'||substr(md5('vid:'||
                             CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                   FROM documents),
        mk AS (SELECT doc_id, (4 + (u % 3) * 2)::BIGINT AS k FROM d),
        fm AS (SELECT mk.doc_id, mk.k, gf.f,
                      ('0x'||substr(md5('vf:'||
                         CAST(doc_id AS VARCHAR)||':'||
                         CAST(gf.f AS VARCHAR)),1,16))::UBIGINT AS uf
               FROM mk, generate_series(0, 7) gf(f) WHERE gf.f < mk.k),
        fs AS (SELECT doc_id, k, f,
                      (1 + uf % 5) AS s5, (1 + (uf >> 4) % 7) AS s7,
                      (uf & 4294967295::UBIGINT) AS s32,
                      (uf % 256) AS s256
               FROM fm),
        px AS (SELECT a.doc_id, a.k,
                      abs({v1} - {v0}) AS dv
               FROM fs a JOIN fs b
                    ON b.doc_id = a.doc_id AND b.f = a.f - 1,
                    generate_series(0, 15) gx(x),
                    generate_series(0, 11) gy(y),
                    generate_series(0, 2) gc(c))
        SELECT doc_id, k AS n_frames, 16::BIGINT AS w, 12::BIGINT AS h,
               sum(dv)::BIGINT AS motion_sum,
               (1000 * sum(dv) // ((k - 1) * 16 * 12 * 3))::BIGINT
                 AS motion_per_px_milli
        FROM px GROUP BY doc_id, k ORDER BY doc_id"""


def _audio_silence_oracle() -> str:
    v0 = _aud_val_sql("gt.t::UBIGINT")
    return f"""
        WITH d AS (SELECT doc_id,
                          ('0x'||substr(md5('aud:'||
                             CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                   FROM documents),
        m AS (SELECT doc_id, (1600 + (u % 4) * 400)::BIGINT AS n,
                     (1 + (u >> 5) % 4)::BIGINT AS amp,
                     (u & 4294967295::UBIGINT) AS s32
              FROM d),
        v AS (SELECT m.doc_id, m.n, gt.t, abs({v0}) AS av
              FROM m, generate_series(0, 2799) gt(t)
              WHERE gt.t < m.n)
        SELECT doc_id, n AS n_samples,
               coalesce(min(CASE WHEN av > 1500 THEN t END), -1)::BIGINT
                 AS trim_start,
               coalesce(max(CASE WHEN av > 1500 THEN t END), -1)::BIGINT
                 AS trim_end,
               (1000000 * sum(CASE WHEN av <= 1500 THEN 1 ELSE 0 END)
                // n)::BIGINT AS quiet_ppm,
               (coalesce(min(CASE WHEN av > 1500 THEN t END), -1) < 0)
                 AS all_silent
        FROM v GROUP BY doc_id, n ORDER BY doc_id"""


def _audio_clipping_oracle() -> str:
    v0 = _aud_val_sql("gt.t::UBIGINT")
    return f"""
        WITH d AS (SELECT doc_id,
                          ('0x'||substr(md5('aud:'||
                             CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                   FROM documents),
        m AS (SELECT doc_id, (1600 + (u % 4) * 400)::BIGINT AS n,
                     (1 + (u >> 5) % 4)::BIGINT AS amp,
                     (u & 4294967295::UBIGINT) AS s32
              FROM d),
        v AS (SELECT m.doc_id, m.n, abs({v0}) AS av
              FROM m, generate_series(0, 2799) gt(t)
              WHERE gt.t < m.n),
        agg AS (SELECT doc_id, n,
                       sum(CASE WHEN av >= 8000 THEN 1 ELSE 0 END)
                         ::BIGINT AS n_clip
                FROM v GROUP BY doc_id, n)
        SELECT doc_id, n AS n_samples, n_clip,
               (1000000 * n_clip // n)::BIGINT AS clip_ppm,
               ((1000000 * n_clip // n) > 10000) AS clipped
        FROM agg ORDER BY doc_id"""


def _video_scene_cuts_oracle() -> str:
    v1 = _vid_val_sql("a")
    v0 = _vid_val_sql("b")
    return f"""
        WITH d AS (SELECT doc_id,
                          ('0x'||substr(md5('vid:'||
                             CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                   FROM documents),
        mk AS (SELECT doc_id, (4 + (u % 3) * 2)::BIGINT AS k FROM d),
        fm AS (SELECT mk.doc_id, mk.k, gf.f,
                      ('0x'||substr(md5('vf:'||
                         CAST(doc_id AS VARCHAR)||':'||
                         CAST(gf.f AS VARCHAR)),1,16))::UBIGINT AS uf
               FROM mk, generate_series(0, 7) gf(f) WHERE gf.f < mk.k),
        fs AS (SELECT doc_id, k, f,
                      (1 + uf % 5) AS s5, (1 + (uf >> 4) % 7) AS s7,
                      (uf & 4294967295::UBIGINT) AS s32,
                      (uf % 256) AS s256
               FROM fm),
        pair AS (SELECT a.doc_id, a.k, a.f,
                        sum(abs({v1} - {v0}))::BIGINT AS mass
                 FROM fs a JOIN fs b
                      ON b.doc_id = a.doc_id AND b.f = a.f - 1,
                      generate_series(0, 15) gx(x),
                      generate_series(0, 11) gy(y),
                      generate_series(0, 2) gc(c)
                 GROUP BY a.doc_id, a.k, a.f)
        SELECT doc_id, (k - 1)::BIGINT AS n_pairs,
               sum(CASE WHEN mass >= 48000 THEN 1 ELSE 0 END)::BIGINT
                 AS n_cuts,
               min(mass)::BIGINT AS pair_min,
               max(mass)::BIGINT AS pair_max
        FROM pair GROUP BY doc_id, k ORDER BY doc_id"""


def _video_flicker_oracle() -> str:
    val = _vid_val_sql("fs")
    return f"""
        WITH d AS (SELECT doc_id,
                          ('0x'||substr(md5('vid:'||
                             CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                   FROM documents),
        mk AS (SELECT doc_id, (4 + (u % 3) * 2)::BIGINT AS k FROM d),
        fm AS (SELECT mk.doc_id, mk.k, gf.f,
                      ('0x'||substr(md5('vf:'||
                         CAST(doc_id AS VARCHAR)||':'||
                         CAST(gf.f AS VARCHAR)),1,16))::UBIGINT AS uf
               FROM mk, generate_series(0, 7) gf(f) WHERE gf.f < mk.k),
        fs AS (SELECT doc_id, k, f,
                      (1 + uf % 5) AS s5, (1 + (uf >> 4) % 7) AS s7,
                      (uf & 4294967295::UBIGINT) AS s32,
                      (uf % 256) AS s256
               FROM fm),
        fl AS (SELECT fs.doc_id, fs.k, fs.f,
                      sum((CASE gc.c WHEN 0 THEN 299 WHEN 1 THEN 587
                           ELSE 114 END) * {val})::BIGINT AS lum
               FROM fs, generate_series(0, 15) gx(x),
                    generate_series(0, 11) gy(y),
                    generate_series(0, 2) gc(c)
               GROUP BY fs.doc_id, fs.k, fs.f),
        agg AS (SELECT doc_id, sum(lum)::BIGINT AS tot
                FROM fl GROUP BY 1)
        SELECT fl.doc_id, fl.k AS n_frames,
               agg.tot AS luma_total_milli,
               sum((fl.k * fl.lum - agg.tot)
                   * (fl.k * fl.lum - agg.tot))::BIGINT AS flicker_var
        FROM fl JOIN agg USING (doc_id)
        GROUP BY fl.doc_id, fl.k, agg.tot ORDER BY doc_id"""


def _plane_literal(row) -> str:
    # repr() gives the shortest round-trip decimal; DuckDB parses it
    # back to the identical float64, so the SQL sign bits match numpy's
    return "[" + ", ".join(repr(float(v)) for v in row) + "]::DOUBLE[]"


def _cosine_lsh_oracle() -> str:
    """Exact SQL twin of cosine_neardup_lsh (bits=16, bands=8, seed 42):
    the 16 hyperplane sign bits are computed with list_dot_product
    against the same seeded plane literals, the banded candidate
    property is (any band's 2 bits equal), and candidates are verified
    at cosine >= 0.6 — so the oracle checks candidate generation AND
    verify, not just the verified subset."""
    from frontera_ray.stages.ann import _hyperplanes

    planes = _hyperplanes(64, 16, 42)
    bit_cols = ",\n                   ".join(
        f"(list_dot_product(embedding::DOUBLE[], "
        f"{_plane_literal(planes[j])}) > 0) AS s{j}"
        for j in range(16))
    bands = " OR ".join(
        f"(x.s{2 * b} = y.s{2 * b} AND x.s{2 * b + 1} = y.s{2 * b + 1})"
        for b in range(8))
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {bit_cols}
            FROM embeddings)
        SELECT x.vec_id AS a, y.vec_id AS b,
               round(list_cosine_similarity(x.embedding::DOUBLE[],
                                            y.embedding::DOUBLE[]), 4) AS sim
        FROM b x JOIN b y ON x.vec_id < y.vec_id
        WHERE ({bands})
          AND list_cosine_similarity(x.embedding::DOUBLE[],
                                     y.embedding::DOUBLE[]) >= 0.6
        ORDER BY a, b"""


def _knn_join_oracle() -> str:
    """Exact SQL twin of knn_join_lsh (bits=16, bands=8, seed 42):
    candidates = ordered pairs sharing ANY band's 2 sign bits; winner
    per vector by (round(sim, 9) DESC, neighbor id ASC) — the same
    deterministic rank the Ray reduce uses; output sim re-rounded to 4
    from the 9-rounded ranking value (op-matching the Ray side)."""
    from frontera_ray.stages.ann import _hyperplanes

    planes = _hyperplanes(64, 16, 42)
    bit_cols = ",\n                   ".join(
        f"(list_dot_product(embedding::DOUBLE[], "
        f"{_plane_literal(planes[j])}) > 0) AS s{j}"
        for j in range(16))
    bands = " OR ".join(
        f"(x.s{2 * b} = y.s{2 * b} AND x.s{2 * b + 1} = y.s{2 * b + 1})"
        for b in range(8))
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {bit_cols}
            FROM embeddings),
        cand AS (
            SELECT x.vec_id AS a, y.vec_id AS nbr,
                   round(list_cosine_similarity(x.embedding::DOUBLE[],
                                                y.embedding::DOUBLE[]), 9)
                     AS sim_r9
            FROM b x JOIN b y ON x.vec_id <> y.vec_id
            WHERE ({bands})),
        ranked AS (
            SELECT a, nbr, sim_r9, row_number() OVER (
                PARTITION BY a ORDER BY sim_r9 DESC, nbr) AS rn
            FROM cand)
        SELECT a AS vec_id, nbr AS nbr_id, round(sim_r9, 4) AS sim
        FROM ranked WHERE rn = 1 ORDER BY vec_id"""


def _ann_lsh_oracle() -> str:
    """Exact SQL twin of lsh_topk (bits=8, seed 42, queries vec_id<5,
    Hamming<=1 probing): candidates are corpus vectors whose 8-bit sign
    code is within Hamming 1 of ANY query's code; exact top-10 per
    query over the candidate union, ranked by round(sim,9) desc,
    vec_id asc — the same deterministic merge the Ray path uses."""
    from frontera_ray.stages.ann import _hyperplanes

    planes = _hyperplanes(64, 8, 42)
    bit_cols = ",\n                   ".join(
        f"(list_dot_product(embedding::DOUBLE[], "
        f"{_plane_literal(planes[j])}) > 0) AS s{j}"
        for j in range(8))
    ham = " + ".join(f"CAST(b.s{j} <> q.s{j} AS INT)" for j in range(8))
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {bit_cols}
            FROM embeddings),
        q AS (SELECT * FROM b WHERE vec_id < 5),
        cand AS (
            SELECT * FROM b
            WHERE EXISTS (SELECT 1 FROM q WHERE {ham} <= 1)),
        ranked AS (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   list_cosine_similarity(c.embedding::DOUBLE[],
                                          q.embedding::DOUBLE[]) AS sim_raw,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round(list_cosine_similarity(
                                c.embedding::DOUBLE[],
                                q.embedding::DOUBLE[]), 9) DESC,
                              c.vec_id) AS rank
            FROM cand c, q)
        SELECT query_id, vec_id, rank::INTEGER AS rank,
               round(sim_raw, 4) AS sim
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank"""


def _simhash_cte() -> str:
    """Shared CTE body computing (doc_id, simhash) in SQL — the exact
    twin of stages/text.simhash64: whitespace tokens, 64-bit token
    hash = top 64 bits of md5 (the Python side uses the same
    definition so the fingerprint is oracle-checkable), majority vote
    per bit (2 * ones > n_tokens), signed int64 assembly with the top
    bit folded in as -2^63 (two's complement without UBIGINT
    overflow). Docs with no tokens get simhash 0 via the left join."""
    bit_cols = ",\n                   ".join(
        f"CASE WHEN 2 * sum(((h >> {b}) & 1)::BIGINT) > count(*) "
        f"THEN 1::BIGINT ELSE 0 END AS b{b}"
        for b in range(64))
    low_sum = " + ".join(f"(b{b} << {b})" for b in range(63))
    return f"""toks AS (
            SELECT doc_id,
                   ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
            FROM (SELECT doc_id,
                         unnest(string_split_regex(text, '\\s+')) AS tok
                  FROM documents)
            WHERE tok <> ''),
        votes AS (
            SELECT doc_id,
                   {bit_cols}
            FROM toks GROUP BY doc_id),
        sh AS (
            SELECT d.doc_id,
                   coalesce({low_sum}
                     + CASE WHEN b63 = 1 THEN -9223372036854775808
                            ELSE 0 END, 0) AS simhash
            FROM documents d LEFT JOIN votes v ON v.doc_id = d.doc_id)"""


def _simhash_oracle() -> str:
    return f"""
        WITH {_simhash_cte()}
        SELECT doc_id, simhash FROM sh ORDER BY doc_id"""


def _simhash_neardup_oracle(max_hamming: int = 6) -> str:
    """Oracle for simhash_neardup_pairs: because blocks >= max_hamming
    + 1 gives EXACT recall (pigeonhole — d flipped bits can touch at
    most d of the 7 blocks, leaving one identical), the LSH output
    equals the full brute pair set at Hamming <= 6, which SQL states
    directly: bit_count(xor(simhash_a, simhash_b)) <= 6 over the
    SQL-computed sketches. This checks the sketch, the block-LSH
    completeness property, and the verify in one query."""
    return f"""
        WITH {_simhash_cte()}
        SELECT x.doc_id AS a, y.doc_id AS b,
               bit_count(xor(x.simhash, y.simhash))::INTEGER AS hamming
        FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
        ORDER BY a, b"""


def _minhash_oracle() -> str:
    """Exact SQL twin of minhash_neardup_pairs (num_perm=64, bands=16,
    rows_per_band=4, shingle_k=3, threshold 0.5): 3-gram shingles
    hashed with md5-top-64 (same definition as the Python side), the 64
    universal-hash minima computed with numpy's uint64 WRAP semantics
    replicated via HUGEINT ``% 2^64`` before the Mersenne mod, banded
    candidates as ``EXISTS a band whose 4 minima all match``, and the
    integer-exact Jaccard verify over distinct gram hashes. (Docs with
    <3 tokens would need the whole-text-gram fallback branch — absent
    from the test corpus, asserted in TESTDATA expectations.)

    Caveat vs the Ray path: Ray keys buckets by crc32 of the minima
    bytes, so a crc32 COLLISION could admit an extra candidate pair
    (still exact-verified) that this oracle's minima-equality property
    would not — probability ~pairs x 16 x 2^-32, nil on the fixed
    corpus."""
    return rf"""
        WITH {_minhash_pairs_ctes()}
        SELECT a, b, inter_size, union_size FROM mh_pairs
        ORDER BY a, b"""


def _band_match_clauses() -> str:
    """The 16x4 banding candidate predicate over two sigs aliases x/y."""
    return " OR ".join(
        "(" + " AND ".join(
            f"x.s{4 * j + r} = y.s{4 * j + r}" for r in range(4)) + ")"
        for j in range(16))


def _minhash_sigs_ctes(where: str = "") -> str:
    """CTE prefix ending in ``sigs(doc_id, s0..s63)`` — the per-doc
    64-permutation minhash signatures over strict word-3-gram md5
    hashes (shared by the pair oracle, the LSH bucket-stats oracle and
    the banding-recall evaluation). ``where`` optionally bounds the
    document slice."""
    from frontera_ray.stages.dedup import _MERSENNE, _perm_params

    a, b = _perm_params(64)
    W = 1 << 64
    sig_cols = ",\n                   ".join(
        f"min(((({int(a[i])}::HUGEINT * h) % {W} + {int(b[i])}) % {W})"
        f" % {_MERSENNE}) AS s{i}"
        for i in range(64))
    return rf"""t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                   FROM documents {where}),
        gh AS (SELECT DISTINCT doc_id,
                      ('0x' || substr(md5(arr[i] || ' ' || arr[i+1] || ' '
                                          || arr[i+2]), 1, 16))::UBIGINT::HUGEINT AS h
               FROM t, UNNEST(range(1, len(arr) - 1)) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY 1),
        sigs AS (SELECT doc_id,
                   {sig_cols}
                 FROM gh GROUP BY doc_id)"""


def _minhash_pairs_ctes() -> str:
    """Reusable CTE chain ending in ``mh_pairs(a, b, inter_size,
    union_size)`` — the SQL twin of the minhash near-dup pipeline (see
    _minhash_oracle docstring)."""
    band_clauses = _band_match_clauses()
    return rf"""{_minhash_sigs_ctes()},
        cand AS (SELECT x.doc_id AS a, y.doc_id AS b
                 FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
                 WHERE {band_clauses}),
        inter AS (SELECT c.a, c.b, count(*) AS inter_size
                  FROM cand c
                  JOIN gh x ON x.doc_id = c.a
                  JOIN gh y ON y.doc_id = c.b AND y.h = x.h
                  GROUP BY 1, 2),
        mh_pairs AS (
            SELECT i.a, i.b, i.inter_size,
                   (sa.n + sb.n - i.inter_size) AS union_size
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.a
            JOIN sizes sb ON sb.doc_id = i.b
            WHERE 100 * i.inter_size >= 50 * (sa.n + sb.n - i.inter_size))"""


def _dedup_keepers_oracle() -> str:
    """Oracle for the near-dup keep-list: the minhash pair CTEs feed a
    recursive min-label propagation (connected components — every id
    reaches its component's minimum through undirected pair edges;
    UNION's set semantics terminate the fixpoint), keeper = min
    reachable id, identity for docs in no pair."""
    return f"""
        WITH RECURSIVE {_minhash_pairs_ctes()},
        edges AS (SELECT a, b FROM mh_pairs
                  UNION ALL SELECT b AS a, a AS b FROM mh_pairs),
        reach AS (
            SELECT doc_id AS id, doc_id AS comp FROM documents
            UNION
            SELECT e.b AS id, r.comp
            FROM reach r JOIN edges e ON e.a = r.id)
        SELECT id AS doc_id, min(comp) AS keeper_doc_id
        FROM reach GROUP BY id ORDER BY doc_id"""


def _dup_cluster_sizes_oracle() -> str:
    """Cluster-size histogram over the same minhash pair components as
    ``_dedup_keepers_oracle``; singleton (pair-free) docs drop out via
    HAVING so the histogram covers real duplicate clusters only."""
    return f"""
        WITH RECURSIVE {_minhash_pairs_ctes()},
        edges AS (SELECT a, b FROM mh_pairs
                  UNION ALL SELECT b AS a, a AS b FROM mh_pairs),
        reach AS (
            SELECT doc_id AS id, doc_id AS comp FROM documents
            UNION
            SELECT e.b AS id, r.comp
            FROM reach r JOIN edges e ON e.a = r.id),
        keep AS (SELECT id, min(comp) AS keeper FROM reach GROUP BY id),
        cs AS (SELECT keeper, count(*)::BIGINT AS sz FROM keep
               GROUP BY keeper HAVING count(*) > 1)
        SELECT sz AS cluster_size, count(*)::BIGINT AS n_clusters
        FROM cs GROUP BY sz ORDER BY sz"""


def _hll_intersect_oracle() -> str:
    """SQL twin of hll_intersect (p=14): per-side register CTEs with
    the same md5-top-64 hash and rho rule as the hll_distinct oracle,
    the union sketch as a register-wise MAX over both sides, the
    estimator applied three times, floors differenced like the Ray
    finalize."""
    def regs(tag: str, where: str) -> str:
        return f"""b{tag} AS (
            SELECT (h // 1125899906842624)::BIGINT AS idx,
                   (h % 1125899906842624)::BIGINT AS w
            FROM (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                         1, 16))::UBIGINT AS h
                  FROM events WHERE event_type = '{where}')),
        r{tag} AS (SELECT idx,
                          MAX(CASE WHEN w = 0 THEN 51
                                   ELSE 50 - length(bin(w)) + 1 END)
                            AS rho
                   FROM b{tag} GROUP BY idx)"""

    def est(tag: str, src: str) -> str:
        return f"""agg{tag} AS (
            SELECT SUM(1::BIGINT << (51 - rho))::HUGEINT AS s_live,
                   count(*)::BIGINT AS n_live FROM {src}),
        est{tag} AS (
            SELECT (0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0
                   * 16384.0 * 2251799813685248.0
                   / CAST(s_live + (16384 - n_live)::HUGEINT
                          * 2251799813685248 AS DOUBLE) AS raw,
                   16384 - n_live AS v0
            FROM agg{tag}),
        v{tag} AS (
            SELECT CAST(FLOOR(CASE WHEN raw <= 2.5 * 16384.0 AND v0 > 0
                                   THEN 16384.0 * ln(16384.0 / v0)
                                   ELSE raw END) AS BIGINT) AS v
            FROM est{tag})"""

    return f"""
        WITH {regs('a', 'click')},
        {regs('b', 'purchase')},
        ru AS (SELECT idx, MAX(rho) AS rho
               FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
               GROUP BY idx),
        {est('a', 'ra')},
        {est('b', 'rb')},
        {est('u', 'ru')}
        SELECT va.v AS est_click, vb.v AS est_purchase,
               va.v + vb.v - vu.v AS est_inter,
               (SELECT count(*) FROM (
                   SELECT user_id FROM events
                   WHERE event_type = 'click'
                   INTERSECT
                   SELECT user_id FROM events
                   WHERE event_type = 'purchase'))::BIGINT AS exact_inter
        FROM va, vb, vu"""


def _split_case_sql() -> str:
    """The split-ladder CASE over an ``h`` hash column: cut points are
    computed with the SAME numpy expression as the engine (np.round of
    a float cumsum — inlining hand-derived constants would drift by
    1 ulp). Shared by the hash_split and prep_pipeline oracles."""
    fracs = np.array([_SPLITS[n] for n in _SPLITS], dtype=np.float64)
    cuts = np.minimum(np.round(np.cumsum(fracs) * (1 << 32)),
                      1 << 32).astype(np.uint64)
    names = list(_SPLITS)
    return ("CASE "
            + " ".join(f"WHEN h < {int(c)} THEN '{n}'"
                       for n, c in zip(names[:-1], cuts[:-1]))
            + f" ELSE '{names[-1]}' END")


def _hash_split_oracle() -> str:
    """SQL twin of ``hash_split`` (see ``_split_case_sql``)."""
    case = _split_case_sql()
    return f"""
        SELECT doc_id, lang, {case} AS split
        FROM (SELECT doc_id, lang,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     )::BIGINT AS h
              FROM documents)
        ORDER BY doc_id"""


def _pagerank_weighted_oracle(iters: int = 5) -> str:
    """Exact SQL twin of q_pagerank_weighted: parallel-edge weights
    summed per (src,dst), denominator = out-WEIGHT, otherwise the same
    unrolled mass-leaking recurrence as _pagerank_oracle."""
    its = []
    for k in range(1, iters + 1):
        prev = "r0" if k == 1 else f"it{k - 1}"
        its.append(f"""it{k} AS (
            SELECT n.v,
                   (1.0 - 0.85) / (SELECT n FROM p)
                   + 0.85 * coalesce(sum(r.r / d.outw * ec.w), 0) AS r
            FROM nodes n
            LEFT JOIN ec ON ec.dst = n.v
            LEFT JOIN deg d ON d.src = ec.src
            LEFT JOIN {prev} r ON r.v = ec.src
            GROUP BY n.v)""")
    chain = ",\n        ".join(its)
    return f"""
        WITH e AS (SELECT doc_id % {_PR_NODES} AS src,
                          (doc_id * {_PR_MIX}) % {_PR_NODES} AS dst,
                          (1 + doc_id % 7)::DOUBLE AS w
                   FROM documents),
        ec AS (SELECT src, dst, sum(w) AS w FROM e GROUP BY src, dst),
        nodes AS (SELECT src AS v FROM ec UNION SELECT dst FROM ec),
        p AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        deg AS (SELECT src, sum(w) AS outw FROM ec GROUP BY src),
        r0 AS (SELECT v, 1.0 / (SELECT n FROM p) AS r FROM nodes),
        {chain}
        SELECT v AS node, round(r, 9) AS rank
        FROM it{iters} ORDER BY node"""


def _pagerank_oracle(iters: int = 5) -> str:
    """Exact SQL twin of q_pagerank: the same distinct-edge graph,
    node set (src ∪ dst), and mass-leaking recurrence unrolled as
    chained CTEs — (1.0 - 0.85) is written as the same IEEE expression
    the numpy side evaluates, and only the FINAL ranks are rounded
    (intermediate drift between np.add.at and SQL SUM ordering stays
    ~1e-13, far under the 1e-9 guard)."""
    its = []
    for k in range(1, iters + 1):
        prev = "r0" if k == 1 else f"it{k - 1}"
        its.append(f"""it{k} AS (
            SELECT n.v,
                   (1.0 - 0.85) / (SELECT n FROM p)
                   + 0.85 * coalesce(sum(r.r / d.outdeg), 0) AS r
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN deg d ON d.src = e.src
            LEFT JOIN {prev} r ON r.v = e.src
            GROUP BY n.v)""")
    chain = ",\n        ".join(its)
    return f"""
        WITH e AS (SELECT DISTINCT doc_id % {_PR_NODES} AS src,
                          (doc_id * {_PR_MIX}) % {_PR_NODES} AS dst
                   FROM documents),
        nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        p AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        deg AS (SELECT src, count(*)::DOUBLE AS outdeg
                FROM e GROUP BY src),
        r0 AS (SELECT v, 1.0 / (SELECT n FROM p) AS r FROM nodes),
        {chain}
        SELECT v AS node, round(r, 9) AS rank
        FROM it{iters} ORDER BY node"""


def _hits_oracle(iters: int = 4) -> str:
    """Exact SQL twin of q_hits: the same distinct-edge graph and the
    HITS recurrence with L1 normalization per half-step unrolled as
    chained CTEs; only the FINAL scores are rounded (1e-9 — numpy
    dense-sum vs SQL SUM drift is ~1e-15 relative per normalization,
    same guard as pagerank)."""
    its = []
    prev_h = "h0"
    for k in range(1, iters + 1):
        its.append(f"""a{k}r AS MATERIALIZED (
            SELECT n.v, coalesce(sum(p.s), 0) AS s
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN {prev_h} p ON p.v = e.src
            GROUP BY n.v),
        a{k} AS MATERIALIZED (
            SELECT v, s / (SELECT sum(s) FROM a{k}r) AS s
            FROM a{k}r),
        h{k}r AS MATERIALIZED (
            SELECT n.v, coalesce(sum(p.s), 0) AS s
            FROM nodes n
            LEFT JOIN e ON e.src = n.v
            LEFT JOIN a{k} p ON p.v = e.dst
            GROUP BY n.v),
        h{k} AS MATERIALIZED (
            SELECT v, s / (SELECT sum(s) FROM h{k}r) AS s
            FROM h{k}r)""")
        prev_h = f"h{k}"
    chain = ",\n        ".join(its)
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT doc_id % {_PR_NODES} AS src,
                   (doc_id * {_PR_MIX}) % {_PR_NODES} AS dst
            FROM documents),
        nodes AS MATERIALIZED (
            SELECT src AS v FROM e UNION SELECT dst FROM e),
        p AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        h0 AS MATERIALIZED (
            SELECT v, 1.0 / (SELECT n FROM p) AS s FROM nodes),
        {chain}
        SELECT n.v AS node, round(h{iters}.s, 9) AS hub,
               round(a{iters}.s, 9) AS authority
        FROM nodes n
        JOIN h{iters} ON h{iters}.v = n.v
        JOIN a{iters} ON a{iters}.v = n.v
        ORDER BY node"""


def _kmv_source_sim_oracle(k: int = 128) -> str:
    """Exact SQL twin of q_kmv_source_sim: per-source bottom-k of the
    distinct word-3-gram md5-top-64 hashes via row_number(), per-pair
    bottom-k of the sketch union, inter = membership in both sketches,
    jaccard_ppm integer-exact."""
    return f"""
        WITH t AS (SELECT source, regexp_extract_all(text, '\\S+') AS arr
                   FROM documents),
        gh AS (SELECT DISTINCT source,
                      ('0x' || substr(md5(arr[i] || ' ' || arr[i+1] || ' '
                                          || arr[i+2]), 1, 16))::UBIGINT AS h
               FROM t, UNNEST(range(1, len(arr) - 1)) AS r(i)),
        ks AS (SELECT source, h FROM (
                 SELECT source, h,
                        row_number() OVER (PARTITION BY source
                                           ORDER BY h) AS rn
                 FROM gh) WHERE rn <= {k}),
        srcs AS (SELECT DISTINCT source FROM ks),
        pairs AS (SELECT a.source AS ga, b.source AS gb
                  FROM srcs a JOIN srcs b ON a.source < b.source),
        uni AS (SELECT p.ga, p.gb, kk.h
                FROM pairs p JOIN ks kk
                  ON kk.source = p.ga OR kk.source = p.gb
                GROUP BY 1, 2, 3),
        unik AS (SELECT ga, gb, h FROM (
                   SELECT ga, gb, h,
                          row_number() OVER (PARTITION BY ga, gb
                                             ORDER BY h) AS rn
                   FROM uni) WHERE rn <= {k}),
        j AS (SELECT u.ga, u.gb, count(*)::BIGINT AS k_eff,
                     count(*) FILTER (WHERE ka.h IS NOT NULL
                                        AND kb.h IS NOT NULL)::BIGINT
                       AS inter
              FROM unik u
              LEFT JOIN ks ka ON ka.source = u.ga AND ka.h = u.h
              LEFT JOIN ks kb ON kb.source = u.gb AND kb.h = u.h
              GROUP BY 1, 2)
        SELECT ga AS group_a, gb AS group_b, k_eff, inter,
               ((1000000 * inter) // k_eff)::BIGINT AS jaccard_ppm
        FROM j ORDER BY group_a, group_b"""


def _lsh_bucket_stats_oracle(bands: int = 16, rpb: int = 4) -> str:
    """Exact SQL twin of q_lsh_bucket_stats: the shared sigs CTE, a
    16-way UNION ALL splitting the signature into band tuples, bucket
    sizes by exact-tuple GROUP BY, then the per-band size histogram."""
    branches = "\n              UNION ALL ".join(
        f"SELECT {j} AS band, "
        + ", ".join(f"s{j * rpb + r} AS c{r}" for r in range(rpb))
        + " FROM sigs"
        for j in range(bands))
    cols = ", ".join(f"c{r}" for r in range(rpb))
    return f"""
        WITH {_minhash_sigs_ctes()},
        bk AS ({branches}),
        sz AS (SELECT band, {cols}, count(*)::BIGINT AS sz
               FROM bk GROUP BY band, {cols})
        SELECT band, sz AS bucket_size, count(*)::BIGINT AS n_buckets
        FROM sz GROUP BY 1, 2 ORDER BY 1, 2"""


def _kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    """Exact SQL twin of q_kcore: the triangles edge CTE, then
    ``rounds`` unrolled MATERIALIZED peeling steps (alive_{i} = nodes
    with >= k neighbors inside alive_{i-1}), final within-core degree
    over the last alive set."""
    steps = []
    prev = "a0"
    for i in range(1, rounds + 1):
        steps.append(f"""a{i} AS MATERIALIZED (
            SELECT v FROM (
              SELECT d.v, count(*) AS c FROM (
                SELECT e.u AS v, e.v AS w FROM e
                UNION ALL SELECT e.v AS v, e.u AS w FROM e) d
              JOIN {prev} p1 ON p1.v = d.v
              JOIN {prev} p2 ON p2.v = d.w
              GROUP BY d.v)
            WHERE c >= {k})""")
        prev = f"a{i}"
    chain = ",\n            ".join(steps)
    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey
             AND x.l_suppkey < y.l_suppkey
            WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
        a0 AS MATERIALIZED (
            SELECT u AS v FROM e UNION SELECT v FROM e),
        {chain}
        SELECT d.v AS node, count(*)::BIGINT AS core_deg FROM (
            SELECT e.u AS v, e.v AS w FROM e
            UNION ALL SELECT e.v AS v, e.u AS w FROM e) d
        JOIN a{rounds} p1 ON p1.v = d.v
        JOIN a{rounds} p2 ON p2.v = d.w
        GROUP BY d.v ORDER BY node"""


def _lsh_eval_oracle(limit: int = 200, pct: int = 50) -> str:
    """Exact SQL twin of q_lsh_eval: slice-bounded sigs CTE, banding
    candidates, ground-truth Jaccard pairs, and the three counters."""
    return f"""
        WITH {_minhash_sigs_ctes(f"WHERE doc_id < {limit}")},
        cand AS (SELECT x.doc_id AS a, y.doc_id AS b
                 FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
                 WHERE {_band_match_clauses()}),
        inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                  FROM gh x JOIN gh y ON y.h = x.h
                                     AND y.doc_id > x.doc_id
                  GROUP BY 1, 2),
        tru AS (SELECT i.a, i.b
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.a
                JOIN sizes sb ON sb.doc_id = i.b
                WHERE 100 * i.i >= {pct} * (sa.n + sb.n - i.i)),
        hit AS (SELECT * FROM cand INTERSECT SELECT * FROM tru),
        c AS (SELECT (SELECT count(*) FROM tru)::BIGINT AS n_true,
                     (SELECT count(*) FROM cand)::BIGINT AS n_cand,
                     (SELECT count(*) FROM hit)::BIGINT AS n_hit)
        SELECT n_true, n_cand, n_hit,
               (CASE WHEN n_cand = 0 THEN 0
                     ELSE (1000000 * n_hit) // n_cand END)::BIGINT
                 AS precision_ppm,
               (CASE WHEN n_true = 0 THEN 0
                     ELSE (1000000 * n_hit) // n_true END)::BIGINT
                 AS recall_ppm
        FROM c"""


def _quality_keepers_oracle() -> str:
    """Quality-aware keeper: the minhash pair components (same
    recursive CTEs as _dedup_keepers_oracle) resolved to the
    highest-quality member per component (tiebreak min id) via a
    window-function argmax over the exact quality expression."""
    return f"""
        WITH RECURSIVE {_minhash_pairs_ctes()},
        edges AS (SELECT a, b FROM mh_pairs
                  UNION ALL SELECT b AS a, a AS b FROM mh_pairs),
        reach AS (
            SELECT doc_id AS id, doc_id AS comp FROM documents
            UNION
            SELECT e.b AS id, r.comp
            FROM reach r JOIN edges e ON e.a = r.id),
        keep AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
        q AS (SELECT doc_id,
                     round(0.4*least(1.0, n_tokens/100.0)
                         + 0.3*(1.0 - n_upper/greatest(length(text),1)::DOUBLE)
                         + 0.3*least(1.0, 20.0*n_punct/greatest(length(text),1)::DOUBLE),
                         4) AS qs
              FROM (SELECT doc_id, text,
                           len(regexp_extract_all(text, '\\S+')) AS n_tokens,
                           len(regexp_extract_all(text, '[.!,;:?]')) AS n_punct,
                           len(regexp_extract_all(text, '[A-Z]')) AS n_upper
                    FROM documents)),
        ranked AS (SELECT k.comp, k.id,
                          row_number() OVER (PARTITION BY k.comp
                                             ORDER BY q.qs DESC, k.id)
                            AS rn
                   FROM keep k JOIN q ON q.doc_id = k.id),
        best AS (SELECT comp, id AS keeper FROM ranked WHERE rn = 1)
        SELECT k.id AS doc_id, b.keeper AS keeper_doc_id
        FROM keep k JOIN best b ON b.comp = k.comp
        ORDER BY doc_id"""


_WINNOW_SEL_CTE = r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                       FROM documents),
            g AS (SELECT doc_id, i AS pos,
                         ('0x' || substr(md5(arr[i] || ' ' || arr[i+1] || ' '
                                             || arr[i+2]), 1, 16))::UBIGINT AS h
                  FROM t, UNNEST(range(1, len(arr) - 1)) AS r(i)),
            n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
            wm AS (SELECT doc_id, pos,
                          min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN CURRENT ROW
                                       AND 3 FOLLOWING) AS mh
                   FROM g),
            sel AS (SELECT DISTINCT w_.doc_id, mh
                    FROM wm w_ JOIN n ON n.doc_id = w_.doc_id
                    WHERE pos <= greatest(1, n.n - 3))"""


def _crawl_bfs_oracle_sql() -> str:
    """Recursive-CTE twin of q_crawl_bfs: the synthetic web is a pure
    function (host i's (max_depth, branching) tree, first child of every
    non-seed page on hosts i%7==3 advertised via a '?r=1' alias), and the
    BFS/min_score pop order is exactly (depth asc, seed order, link order)
    = ORDER BY (length(path), host, path) — verified byte-for-byte against
    the engine. The 32 per-host tree shapes are deterministic constants of
    the fixture (SyntheticWeb(32, seed=42, max_class=3)) inlined as VALUES."""
    from frontera_ray.graphs import _HOST_CLASSES, SyntheticWeb

    web = SyntheticWeb(32, seed=42, max_class=3)
    vals = ",".join(
        "({},{},{})".format(i, *_HOST_CLASSES[web._cls[i]]) for i in range(32))
    return f"""
        WITH RECURSIVE hosts(i, md, br) AS (VALUES {vals}),
        pages(i, md, br, path) AS (
          SELECT i, md, br, CAST('1' AS VARCHAR) FROM hosts
          UNION ALL
          SELECT p.i, p.md, p.br, p.path || CAST(g.k AS VARCHAR)
          FROM pages p JOIN generate_series(1, 9) AS g(k) ON g.k <= p.br
          WHERE length(p.path) + 1 <= p.md - 1
        )
        SELECT row_number() OVER (ORDER BY length(path), i, path) - 1 AS rank,
               'http://host-' || lpad(CAST(i AS VARCHAR), 5, '0')
                 || '.test/' || path ||
               CASE WHEN i % 7 = 3 AND length(path) > 1 AND path LIKE '%1'
                    THEN '?r=1' ELSE '' END AS url
        FROM pages ORDER BY rank"""


def oracle_sql() -> dict[str, str]:
    sql = {
        "crawl_bfs": _crawl_bfs_oracle_sql(),
        "crawl_dfs": _crawl_bfs_oracle_sql().replace(
            "ORDER BY length(path), i, path", "ORDER BY i, path"),
        # occurrences = (len - len(replace))/len(p): both sides count
        # non-overlapping matches; patterns inlined from the shared list
        "dict_tag_census": """
            SELECT p AS pattern,
                   count(*) FILTER (WHERE contains(text, p))::BIGINT
                     AS n_docs,
                   COALESCE(sum((length(text)
                                 - length(replace(text, p, '')))
                                // length(p)), 0)::BIGINT
                     AS n_occurrences
            FROM documents, (VALUES {pats}) pats(p)
            GROUP BY p ORDER BY p""".format(pats=", ".join(
                "('{}')".format(p) for p in _DICT_TAG_PATTERNS)),
        # the Holt recurrence replayed exactly: floor() (not //, which
        # truncates toward zero) keeps negative trend states identical
        "holt_trend": r"""
            WITH RECURSIVE v AS (
                SELECT user_id,
                       floor(value * 100 + 0.5)::BIGINT AS v,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts),
                                                   event_id) AS r
                FROM events),
            s AS (
                SELECT user_id, r, v AS l, 0::BIGINT AS b
                FROM v WHERE r = 1
                UNION ALL
                SELECT v.user_id, v.r,
                       CAST(floor((v.v + s.l + s.b) / 2.0) AS BIGINT)
                         AS l,
                       CAST(floor((CAST(floor((v.v + s.l + s.b) / 2.0)
                                        AS BIGINT) - s.l + 3 * s.b)
                                  / 4.0) AS BIGINT) AS b
                FROM s JOIN v ON v.user_id = s.user_id
                            AND v.r = s.r + 1),
            f AS (SELECT user_id, r, l, b,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY r DESC) AS rr
                  FROM s)
            SELECT user_id, r::BIGINT AS n, l::BIGINT AS level_final,
                   b::BIGINT AS trend_final,
                   (l + b)::BIGINT AS forecast_next
            FROM f WHERE rr = 1 ORDER BY user_id""",
        "image_dhash": _image_dhash_oracle(),
        "pq_codebook": _pq_oracle(),
        # sign-bit cosine estimator audit: identical formula order
        # (cos(pi*h/64), errors floored at +0.5 micro)
        "binary_embed_audit": """
            WITH p AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id < 40),
            h AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                         (SELECT count(*) FROM generate_series(0, 63) g(i)
                          WHERE (a.embedding[g.i + 1]::DOUBLE >= 0)
                                <> (b.embedding[g.i + 1]::DOUBLE >= 0))
                           AS ham,
                         list_cosine_similarity(
                           a.embedding::DOUBLE[],
                           b.embedding::DOUBLE[]) AS tru
                  FROM p a JOIN p b ON a.vec_id < b.vec_id),
            e AS (SELECT abs(tru - cos(pi() * ham / 64.0)) AS err
                  FROM h)
            SELECT count(*)::BIGINT AS n_pairs,
                   CAST(floor(avg(err) * 1000000 + 0.5) AS BIGINT)
                     AS mean_err_micro,
                   CAST(floor(max(err) * 1000000 + 0.5) AS BIGINT)
                     AS max_err_micro
            FROM e""",

        # SQ8 replay: identical op order (q first, then lo + q*rng/255),
        # per-vector error rounded 1e-9 then nano-int summed
        "sq8_census": """
            WITH dims AS (
              SELECT g.i AS d,
                     min(embedding[g.i + 1]::DOUBLE) AS lo,
                     max(embedding[g.i + 1]::DOUBLE) AS hi
              FROM embeddings, generate_series(0, 63) g(i)
              GROUP BY g.i),
            dr AS (SELECT d, lo,
                          CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END
                            AS rng
                   FROM dims),
            q AS (SELECT e.vec_id, d.d,
                         e.embedding[d.d + 1]::DOUBLE AS v, d.lo, d.rng,
                         round(255.0 * (e.embedding[d.d + 1]::DOUBLE
                                        - d.lo) / d.rng) AS qv
                  FROM embeddings e, dr d),
            ev AS (SELECT vec_id,
                          CAST(round(round(sum(
                            pow(v - (lo + qv * rng / 255.0), 2)), 9)
                            * 1000000000) AS BIGINT) AS nano
                   FROM q GROUP BY vec_id)
            SELECT count(*)::BIGINT AS n_vectors,
                   sum(nano)::BIGINT AS total_err_nano,
                   max(nano)::BIGINT AS max_err_nano
            FROM ev""",
        "dim_truncation": """
            WITH el AS (
              SELECT e.vec_id, g.i AS d,
                     CAST(round(round(pow(
                       e.embedding[g.i + 1]::DOUBLE, 2), 9)
                       * 1000000000) AS BIGINT) AS nano
              FROM embeddings e, generate_series(0, 63) g(i)),
            tot AS (SELECT sum(nano)::BIGINT AS total FROM el),
            ks AS (SELECT unnest([8, 16, 32, 64]) AS k),
            kept AS (SELECT ks.k, sum(el.nano)::BIGINT AS kept_nano
                     FROM ks JOIN el ON el.d < ks.k GROUP BY ks.k)
            SELECT k::BIGINT AS k, kept_nano,
                   (SELECT total FROM tot) AS total_nano,
                   (1000000 * ((SELECT total FROM tot) - kept_nano)
                    // (SELECT total FROM tot))::BIGINT AS lost_ppm
            FROM kept ORDER BY k""",

        # PCSA bitmaps replayed with bit_or; lowest unset bit via the
        # trailing-ones identity bit_count(xor(b, b+1)) - 1
        "pcsa_distinct": """
            WITH h AS (SELECT ('0x' || substr(md5(
                                 CAST(user_id AS VARCHAR)), 1, 16))
                                ::UBIGINT AS h, user_id
                       FROM events),
            b AS (SELECT (h % 64)::BIGINT AS idx,
                         CASE WHEN h // 64 = 0 THEN 58
                              ELSE 58 - length(bin(h // 64)) END AS rho
                  FROM h),
            regs AS (SELECT g.i AS idx,
                            COALESCE(bit_or(1::UBIGINT << r.rho::INT),
                                     0::UBIGINT) AS reg
                     FROM generate_series(0, 63) g(i)
                     LEFT JOIN b r ON r.idx = g.i GROUP BY g.i),
            low AS (SELECT idx,
                           bit_count(xor(reg, reg + 1::UBIGINT))::BIGINT
                             - 1 AS lu
                    FROM regs)
            SELECT sum(lu)::BIGINT AS sum_low_unset,
                   round(64.0 / 0.77351
                         * pow(2.0, sum(lu) / 64.0), 3) AS est_r3,
                   (SELECT count(DISTINCT user_id)
                    FROM events)::BIGINT AS n_exact
            FROM low""",
        # 16 exact integer AMS projections; est = sum(Z^2) // 16
        "ams_f2": """
            WITH h AS (SELECT ('0x' || substr(md5(
                                 CAST(user_id AS VARCHAR)), 1, 16))
                                ::UBIGINT AS h, user_id
                       FROM events),
            z AS (SELECT g.k,
                         sum(CASE WHEN ((h >> g.k::INT) & 1::UBIGINT)
                                       = 1::UBIGINT
                                  THEN -1 ELSE 1 END)::BIGINT AS z
                  FROM h CROSS JOIN generate_series(0, 15) g(k)
                  GROUP BY g.k),
            ex AS (SELECT sum(c * c)::BIGINT AS f2 FROM (
                     SELECT count(*)::BIGINT AS c FROM events
                     GROUP BY user_id))
            SELECT (sum(z.z * z.z) // 16)::BIGINT AS f2_est,
                   (SELECT f2 FROM ex) AS f2_exact
            FROM z""",

        "ann_ivfpq": _ivfpq_oracle(),
        # 64 md5-bit sign patterns over per-user before/after cent
        # deltas; the whole test is integer so it replays exactly
        "sign_flip_test": """
            WITH v AS (
                SELECT user_id,
                       floor(value * 100 + 0.5)::BIGINT AS v,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts),
                                                   event_id) AS r,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events),
            d AS (SELECT user_id,
                         sum(CASE WHEN r > (n + 1) // 2 THEN v
                                  ELSE -v END)::BIGINT AS d
                  FROM v GROUP BY user_id),
            hb AS (SELECT user_id, d,
                          ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                          1, 16))::UBIGINT AS h
                   FROM d),
            t AS (SELECT g.k,
                         sum(CASE WHEN ((h >> g.k::INT) & 1::UBIGINT)
                                       = 1::UBIGINT
                                  THEN -d ELSE d END)::BIGINT AS t_k
                  FROM hb CROSS JOIN generate_series(0, 63) g(k)
                  GROUP BY g.k),
            obs AS (SELECT sum(d)::BIGINT AS t_obs,
                           count(*)::BIGINT AS n_keys FROM d)
            SELECT o.n_keys, o.t_obs,
                   (SELECT count(*) FROM t
                    WHERE abs(t.t_k) >= abs(o.t_obs))::BIGINT
                     AS n_flips_ge,
                   1000 * (SELECT count(*) FROM t
                           WHERE abs(t.t_k) >= abs(o.t_obs)) // 64
                     AS p_milli
            FROM obs o""",

        # the timestamped-HLL replay: global max stamp per (idx, rho)
        # pair, window test per end, max live rho per register, the
        # shared 2^51-scaled estimator with the linear-counting branch
        "hll_sliding": """
            WITH span AS (SELECT epoch_us(min(ts))::BIGINT AS t0,
                                 epoch_us(max(ts))::BIGINT AS t1
                          FROM events),
            wins AS (SELECT t0 + (t1 - t0) // 2 AS end_us FROM span
                     UNION ALL
                     SELECT t0 + 3 * ((t1 - t0) // 4) FROM span
                     UNION ALL SELECT t1 FROM span),
            b AS (SELECT (h // 1125899906842624)::BIGINT AS idx,
                         CASE WHEN (h % 1125899906842624) = 0 THEN 51
                              ELSE 50 - length(bin(h % 1125899906842624))
                                   + 1 END AS rho,
                         ts_us
                  FROM (SELECT ('0x' || substr(md5(
                                  CAST(user_id AS VARCHAR)), 1, 16))
                                 ::UBIGINT AS h,
                               epoch_us(ts)::BIGINT AS ts_us
                        FROM events)),
            pairs AS (SELECT DISTINCT idx, rho, ts_us FROM b),
            r AS (SELECT w.end_us, p.idx, max(p.rho) AS rho
                  FROM pairs p, wins w, span s
                  WHERE p.ts_us >= w.end_us - (s.t1 - s.t0) // 4
                    AND p.ts_us <= w.end_us
                  GROUP BY 1, 2),
            agg AS (SELECT end_us,
                           SUM(1::BIGINT << (51 - rho))::HUGEINT AS s_live,
                           count(*)::BIGINT AS n_live
                    FROM r GROUP BY end_us),
            est AS (SELECT w.end_us,
                           (0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0
                           * 16384.0 * 2251799813685248.0
                           / CAST(COALESCE(a.s_live, 0::HUGEINT)
                                  + (16384 - COALESCE(a.n_live, 0))
                                    ::HUGEINT * 2251799813685248
                                  AS DOUBLE) AS raw,
                           16384 - COALESCE(a.n_live, 0) AS v0
                    FROM wins w LEFT JOIN agg a USING (end_us)),
            ex AS (SELECT w.end_us,
                          (SELECT count(DISTINCT e.user_id)
                           FROM events e, span s
                           WHERE epoch_us(e.ts) >= w.end_us
                                   - (s.t1 - s.t0) // 4
                             AND epoch_us(e.ts) <= w.end_us) AS n_exact
                   FROM wins w)
            SELECT est.end_us,
                   CAST(FLOOR(CASE WHEN raw <= 2.5 * 16384.0 AND v0 > 0
                                   THEN 16384.0 * ln(16384.0 / v0)
                                   ELSE raw END) AS BIGINT)
                     AS est_distinct,
                   ex.n_exact::BIGINT AS n_exact
            FROM est JOIN ex USING (end_us) ORDER BY est.end_us""",

        # truncated RBO@50, p=0.9, identical term formula both sides;
        # overlap@d = docs in BOTH prefixes
        "rbo_rankings": """
            WITH ra AS (SELECT source, doc_id, row_number() OVER (
                          PARTITION BY source
                          ORDER BY n_chars DESC, doc_id) AS r
                        FROM documents),
            rb AS (SELECT source, doc_id, row_number() OVER (
                     PARTITION BY source ORDER BY doc_id) AS r
                   FROM documents),
            j AS (SELECT ra.source, ra.r AS r_a, rb.r AS r_b
                  FROM ra JOIN rb ON rb.source = ra.source
                                 AND rb.doc_id = ra.doc_id
                  WHERE ra.r <= 50 AND rb.r <= 50),
            ov AS (SELECT s.source, g.d,
                          (SELECT count(*) FROM j
                           WHERE j.source = s.source
                             AND j.r_a <= g.d AND j.r_b <= g.d) AS o
                   FROM (SELECT DISTINCT source FROM documents) s
                   CROSS JOIN generate_series(1, 50) g(d))
            SELECT source,
                   round(0.1 * sum(pow(0.9, d - 1) * o / d), 6) AS rbo
            FROM ov GROUP BY source ORDER BY source""",
        "seed_normalize": f"SELECT doc_id, {_CANON_URL_SQL} AS url FROM documents",
        "url_fingerprint": f"SELECT doc_id, md5({_CANON_URL_SQL}) AS fp_md5 FROM documents",
        "host_partition": f"""
            SELECT partition_id, count(*) AS n_urls FROM (
              SELECT ('0x' || substr(md5({_HOST_SQL}), 1, 8))::BIGINT % 8 AS partition_id
              FROM documents)
            GROUP BY partition_id ORDER BY partition_id""",
        "score_depth": """
            SELECT doc_id, depth::BIGINT AS depth,
                   round(1.0 - depth/(depth+1.0), 6) AS score_bfs,
                   round(depth/(depth+1.0), 6) AS score_dfs,
                   round(1.0/(depth+1.0), 6) AS score_dfs_test,
                   round(depth/10.0, 6) AS score_bfs_test
            FROM (SELECT doc_id, (doc_id % 10)::DOUBLE AS depth FROM documents)""",
        "score_buckets": """
            SELECT bucket, count(*) AS n FROM (
              SELECT least(floor(least(greatest(value/100.0, 0.0), 1.0)*100), 99)::BIGINT AS bucket
              FROM events)
            GROUP BY bucket ORDER BY bucket""",
        "per_host_cap": """
            SELECT user_id, event_id, value FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rn
              FROM events) WHERE rn <= 5""",
        "priority_topk": """
            SELECT event_id, value FROM events
            ORDER BY value DESC, event_id LIMIT 100""",
        "crawl_visibility": """
            SELECT event_type, count(*) AS n FROM events
            WHERE ts <= TIMESTAMP '2024-01-03'
            GROUP BY event_type ORDER BY event_type""",
        "host_agg": """
            SELECT user_id % 32 AS host_bucket, count(*) AS n,
                   round(sum(value) * 100)::BIGINT AS sum_cents
            FROM events GROUP BY 1 ORDER BY 1""",
        "batch_dedup": """
            SELECT user_id, min(event_id) AS first_event FROM events
            GROUP BY user_id ORDER BY user_id""",
        "token_count": r"""
            SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
            FROM documents""",
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+'))::BIGINT AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))::BIGINT
                     AS n_bpe_tokens
            FROM documents""",
        "winnow_fp": _WINNOW_SEL_CTE + r"""
            SELECT doc_id,
                   CASE WHEN mh > 9223372036854775807
                        THEN (mh::HUGEINT - 18446744073709551616)::BIGINT
                        ELSE mh::BIGINT END AS fp
            FROM sel ORDER BY doc_id, fp""",
        "winnow_dup": _WINNOW_SEL_CTE + r"""
            , p AS (SELECT x.doc_id AS a, y.doc_id AS b,
                           count(*) AS shared
                    FROM sel x JOIN sel y
                      ON x.mh = y.mh AND x.doc_id < y.doc_id
                    GROUP BY 1, 2)
            SELECT a, b, shared FROM p WHERE shared >= 2
            ORDER BY a, b""",
        "quality": r"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   n_tokens::BIGINT AS n_tokens,
                   n_punct::BIGINT AS n_punct,
                   n_upper::BIGINT AS n_upper,
                   round(0.4*least(1.0, n_tokens/100.0)
                       + 0.3*(1.0 - n_upper/greatest(length(text),1)::DOUBLE)
                       + 0.3*least(1.0, 20.0*n_punct/greatest(length(text),1)::DOUBLE),
                       4) AS quality_score
            FROM (
              SELECT doc_id, text,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     len(regexp_extract_all(text, '[.!,;:?]')) AS n_punct,
                     len(regexp_extract_all(text, '[A-Z]')) AS n_upper
              FROM documents)""",
        "langid": _LANGID_PRED_SQL,
        "lang_confusion": f"""
            WITH p AS ({_LANGID_PRED_SQL})
            SELECT d.lang AS lang_true, p.lang_pred,
                   count(*)::BIGINT AS n
            FROM documents d JOIN p USING (doc_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "class_f1": f"""
            WITH p AS ({_LANGID_PRED_SQL}),
            cells AS (SELECT d.lang AS lt, p.lang_pred AS lp,
                             count(*)::BIGINT AS n
                      FROM documents d JOIN p USING (doc_id)
                      GROUP BY 1, 2),
            cls AS (SELECT DISTINCT lt AS lang FROM cells
                    UNION SELECT DISTINCT lp FROM cells),
            m AS (SELECT cls.lang,
                         coalesce(sum(CASE WHEN c.lt = cls.lang
                                            AND c.lp = cls.lang
                                           THEN c.n END), 0)::BIGINT AS tp,
                         coalesce(sum(CASE WHEN c.lp = cls.lang
                                           THEN c.n END), 0)::BIGINT
                           AS pred_n,
                         coalesce(sum(CASE WHEN c.lt = cls.lang
                                           THEN c.n END), 0)::BIGINT
                           AS true_n
                  FROM cls CROSS JOIN cells c GROUP BY cls.lang)
            SELECT lang, tp, pred_n, true_n,
                   CASE WHEN pred_n > 0 THEN 1000000 * tp // pred_n
                        ELSE 0 END::BIGINT AS precision_ppm,
                   CASE WHEN true_n > 0 THEN 1000000 * tp // true_n
                        ELSE 0 END::BIGINT AS recall_ppm,
                   CASE WHEN pred_n + true_n > 0
                        THEN 2000000 * tp // (pred_n + true_n)
                        ELSE 0 END::BIGINT AS f1_ppm
            FROM m ORDER BY lang""",
        "cohen_kappa": f"""
            WITH p AS ({_LANGID_PRED_SQL}),
            c AS (SELECT d.lang AS t, p.lang_pred AS g
                  FROM documents d JOIN p USING (doc_id)),
            tot AS (SELECT count(*)::BIGINT AS n FROM c),
            ag AS (SELECT count(*)::BIGINT AS n FROM c WHERE t = g),
            r AS (SELECT t AS lbl, count(*)::BIGINT AS n FROM c
                  GROUP BY 1),
            co AS (SELECT g AS lbl, count(*)::BIGINT AS n FROM c
                   GROUP BY 1),
            s AS (SELECT sum(r.n * co.n)::BIGINT AS v
                  FROM r JOIN co USING (lbl))
            SELECT tot.n AS total, ag.n AS agree,
                   CAST(round(((ag.n::DOUBLE / tot.n)
                         - (s.v::DOUBLE / (tot.n::DOUBLE * tot.n)))
                        / (1 - (s.v::DOUBLE / (tot.n::DOUBLE * tot.n)))
                        * 1000000) AS BIGINT) AS kappa_micro
            FROM tot CROSS JOIN ag CROSS JOIN s""",
        "exact_dedup": """
            SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1 ORDER BY 1""",
        "exact_keepers": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text))
                     AS keeper_doc_id
            FROM documents ORDER BY doc_id""",
        "ann_topk": """
            SELECT query_id, vec_id, rank::INTEGER AS rank, round(sim, 4) AS sim FROM (
              SELECT q.vec_id AS query_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                             q.embedding::DOUBLE[]), 9) DESC,
                                e.vec_id) AS rank
              FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 10) q)
            WHERE rank <= 10""",
        "cosine_neardup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS sim
            FROM embeddings a, embeddings b
            WHERE a.vec_id < 300 AND b.vec_id < 300 AND a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.6""",
        "priority_revenue": """
            SELECT o_orderpriority,
                   count(*) AS n_items,
                   sum(round(l_extendedprice * 100)::BIGINT
                       * round((1.0 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_c4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1 ORDER BY 1""",
        "revenue_nation": """
            SELECT c_nationkey,
                   count(*) AS n_items,
                   sum(round(l_extendedprice * 100)::BIGINT
                       * round((1.0 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_c4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY 1""",
        "region_suppliers": """
            SELECT r_name, count(*) AS n_suppliers,
                   round(sum(s_acctbal) * 100)::BIGINT AS acctbal_cents
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1 ORDER BY 1""",
        "part_types": """
            SELECT p_brand, p_type, count(*) AS n_parts,
                   round(sum(p_retailprice) * 100)::BIGINT AS retail_cents
            FROM part GROUP BY 1, 2 ORDER BY 1, 2""",
        "token_df": r"""
            SELECT token, df FROM (
              SELECT token, count(DISTINCT doc_id)::BIGINT AS df
              FROM (SELECT doc_id, unnest(list_distinct(
                       regexp_extract_all(text, '\S+'))) AS token
                    FROM documents)
              GROUP BY token)
            ORDER BY df DESC, token LIMIT 20""",
        "tfidf": r"""
            WITH tf AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
                    FROM documents)
              GROUP BY doc_id, token),
            df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
            scored AS (
              SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     CAST(round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / df.df)
                                * 1000000) AS BIGINT) AS score_micro
              FROM tf JOIN df USING (token)),
            ranked AS (SELECT *, row_number() OVER (
                         PARTITION BY doc_id
                         ORDER BY score_micro DESC, token) AS r
                       FROM scored)
            SELECT doc_id, token, tf, df, score_micro
            FROM ranked WHERE r <= 3
            ORDER BY doc_id, score_micro DESC, token""",
        "hopping_window": """
            SELECT (epoch_us(ts) // 900000000::BIGINT - i) * 900 AS window_start,
                   event_type, count(*)::BIGINT AS n
            FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "postings": r"""
            WITH tok AS (SELECT DISTINCT doc_id, unnest(
                           regexp_extract_all(text, '\S+')) AS token
                         FROM documents),
            d AS (SELECT token, count(*)::BIGINT AS df FROM tok
                  GROUP BY 1),
            r AS (SELECT token, doc_id,
                         row_number() OVER (PARTITION BY token
                                            ORDER BY doc_id) AS rn
                  FROM tok),
            p AS (SELECT token,
                         string_agg(doc_id::VARCHAR, ','
                                    ORDER BY doc_id) AS postings
                  FROM r WHERE rn <= 10 GROUP BY token)
            SELECT d.token, d.df, p.postings
            FROM d JOIN p USING (token)
            WHERE d.df >= 20 ORDER BY d.token""",
        "k_anon_violations": """
            SELECT lang, source, (n_chars // 100)::BIGINT AS size_bucket,
                   count(*)::BIGINT AS n
            FROM documents
            GROUP BY 1, 2, 3 HAVING count(*) < 5
            ORDER BY lang, source, size_bucket""",
        "peak_rate": """
            WITH w AS (
              SELECT user_id,
                     (epoch_us(ts) // 900000000::BIGINT - i) * 900
                       AS window_start,
                     count(*)::BIGINT AS n
              FROM events CROSS JOIN
                   (SELECT unnest(generate_series(0, 3)) AS i) g
              GROUP BY 1, 2),
            r AS (SELECT user_id, window_start AS peak_window,
                         n AS peak_n,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, window_start) AS rn
                  FROM w)
            SELECT user_id, peak_window, peak_n FROM r WHERE rn = 1
            ORDER BY user_id""",
        "doc_sample": f"""
            SELECT doc_id, lang, n_chars FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT <
                  CASE lang
                    WHEN 'en' THEN {int(_SAMPLE_RATES['en'] * 2**32)}
                    WHEN 'de' THEN {int(_SAMPLE_RATES['de'] * 2**32)}
                    ELSE {int(_SAMPLE_DEFAULT * 2**32)} END
            ORDER BY doc_id""",
        "curate": f"""
            WITH {_CURATE_FEATS_CTE},
            kept AS (SELECT * FROM feats
                     WHERE quality_score >= 0.5 AND lang_pred IN ('en', 'de'))
            SELECT doc_id, lang_pred, n_tokens, quality_score FROM (
              SELECT *, min(doc_id) OVER (PARTITION BY text_md5) AS keeper
              FROM kept)
            WHERE doc_id = keeper ORDER BY doc_id""",
        "gate_attrition": f"""
            WITH {_CURATE_FEATS_CTE},
            g AS (SELECT doc_id, quality_score, lang_pred, text_md5,
                         (doc_id % 97 <> 0) AS g1,
                         (doc_id % 97 <> 0
                          AND quality_score >= 0.5) AS g2,
                         (doc_id % 97 <> 0 AND quality_score >= 0.5
                          AND lang_pred IN ('en', 'de')) AS g3
                  FROM feats),
            keepers AS (SELECT count(DISTINCT text_md5)::BIGINT AS n
                        FROM g WHERE g3)
            SELECT 'input' AS gate, count(*)::BIGINT AS n_pass FROM g
            UNION ALL
            SELECT 'eval_excluded', sum(CASE WHEN g1 THEN 1 ELSE 0
                                        END)::BIGINT FROM g
            UNION ALL
            SELECT 'quality', sum(CASE WHEN g2 THEN 1 ELSE 0
                                  END)::BIGINT FROM g
            UNION ALL
            SELECT 'language', sum(CASE WHEN g3 THEN 1 ELSE 0
                                   END)::BIGINT FROM g
            UNION ALL
            SELECT 'exact_dedup', n FROM keepers""",
        "corpus_card": f"""
            WITH {_CURATE_FEATS_CTE},
            lc AS (SELECT lang_pred, count(*)::BIGINT AS n FROM feats
                   GROUP BY lang_pred ORDER BY n DESC, lang_pred
                   LIMIT 1),
            tok AS (SELECT unnest(regexp_extract_all(text, '\\S+'))
                      AS token FROM documents)
            SELECT (SELECT count(*)::BIGINT FROM feats) AS n_docs,
                   (SELECT sum(n_tokens)::BIGINT FROM feats) AS n_tokens,
                   (SELECT count(DISTINCT token)::BIGINT FROM tok)
                     AS vocab,
                   (SELECT count(*)::BIGINT FROM feats)
                     - (SELECT count(DISTINCT text_md5)::BIGINT
                        FROM feats) AS n_dup_docs,
                   (SELECT lang_pred FROM lc) AS top_lang,
                   CAST(round((SELECT n FROM lc)::DOUBLE
                              / (SELECT count(*) FROM feats) * 1000000)
                        AS BIGINT) AS top_lang_ppm""",
        # the full prep chain composed from the SAME shared CTE pieces:
        # eval exclusion + curate gates -> exact-dup keeper ->
        # decontamination NOT EXISTS -> split ladder -> corpus card
        "prep_pipeline": f"""
            WITH {_CURATE_FEATS_CTE},
            gated AS (SELECT * FROM feats
                      WHERE doc_id % 97 <> 0 AND quality_score >= 0.5
                        AND lang_pred IN ('en', 'de')),
            keep AS (SELECT * FROM (
                       SELECT *, min(doc_id) OVER (PARTITION BY text_md5)
                                   AS keeper
                       FROM gated) WHERE doc_id = keeper),
            t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS arr
                  FROM documents),
            eg AS (SELECT DISTINCT arr[i] || ' ' || arr[i+1] || ' '
                          || arr[i+2] || ' ' || arr[i+3] AS gram
                   FROM t, UNNEST(range(1, len(arr) - 2)) AS r(i)
                   WHERE doc_id % 97 = 0),
            tg AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' '
                          || arr[i+2] || ' ' || arr[i+3] AS gram
                   FROM t, UNNEST(range(1, len(arr) - 2)) AS r(i)
                   WHERE doc_id % 97 <> 0),
            clean AS (SELECT k.* FROM keep k
                      WHERE NOT EXISTS (
                          SELECT 1 FROM tg JOIN eg ON tg.gram = eg.gram
                          WHERE tg.doc_id = k.doc_id)),
            sp AS (SELECT lang_pred, n_tokens, {_split_case_sql()} AS split
                   FROM (SELECT *, ('0x' || substr(md5(CAST(doc_id AS
                                VARCHAR)), 1, 8))::BIGINT AS h
                         FROM clean))
            SELECT split, lang_pred, count(*)::BIGINT AS n_docs,
                   sum(n_tokens)::BIGINT AS tokens
            FROM sp GROUP BY 1, 2 ORDER BY 1, 2""",
        "quantity_quantiles": """
            SELECT l_returnflag,
                   CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
                        AS BIGINT) AS q50_scaled,
                   CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)
                        AS BIGINT) AS q90_scaled
            FROM lineitem GROUP BY 1 ORDER BY 1""",
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY 1 ORDER BY 1""",
        "window_counts": """
            SELECT (epoch_us(ts) // 3600000000::BIGINT) * 3600 AS window_start,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "asof_join": """
            SELECT l.user_id, l.event_id,
                   coalesce(r.value, -1.0) AS asof_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.user_id, l.event_id""",
        "range_join": """
            SELECT c.user_id AS user_id,
                   c.event_id AS click_id,
                   p.event_id AS purchase_id
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id
             AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 6 HOUR
            ORDER BY user_id, click_id, purchase_id""",
        "sessionize": """
            SELECT user_id, count(*) FILTER (WHERE new_session)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM (
              SELECT user_id,
                     coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts), 9e18) > 30*60*1000000 AS new_session
              FROM events)
            GROUP BY user_id ORDER BY user_id""",
        "agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity))::BIGINT AS sum_qty,
                   round(sum(l_extendedprice) * 100)::BIGINT AS sum_price_cents,
                   round(sum(l_discount) * 100)::BIGINT AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
        "nation_orders": """
            SELECT c_nationkey, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY 1""",
        "home_page": """
            SELECT doc_id,
                   (query = '' AND (path = '' OR path = '/')) AS is_home
            FROM (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0 THEN ''
                          WHEN doc_id % 4 = 1 THEN '/'
                          WHEN doc_id % 4 = 2 THEN '/p/' || doc_id
                          ELSE '/' END AS path,
                     CASE WHEN doc_id % 4 = 3 THEN 'q=' || doc_id
                          ELSE '' END AS query
              FROM documents)""",
        "blacklist": """
            SELECT count(*) AS n_kept FROM (
              SELECT 'host-' || (doc_id % 20) || '.test' AS host FROM documents)
            WHERE host NOT IN ('host-0.test','host-5.test','host-10.test',
                               'host-15.test')""",
        "same_domain": """
            SELECT doc_id,
                   regexp_extract(host, '([^.]+[.][^.]+)$', 1) = 'site.com'
                     AS same_domain
            FROM (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'www.site.com'
                          WHEN doc_id % 3 = 1 THEN 'blog.site.com'
                          ELSE 'other-' || (doc_id % 7) || '.com' END AS host
              FROM documents)""",
        "canonical_solver": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'http://src.test/orig/' || doc_id
                        ELSE 'http://t.test/final/' || doc_id
                   END AS canonical_url
            FROM documents""",
        "sitemap_parse": """
            SELECT doc_id, 'http://s.test/' || doc_id || '/a' AS url,
                   false AS is_sub_sitemap
            FROM documents
            UNION ALL
            SELECT doc_id, 'http://s.test/' || doc_id || '/sub.xml', true
            FROM documents""",
        "seed_reader": """
            SELECT * FROM (VALUES ('http://www.a.test/1'),
                                  ('http://b.test/2'),
                                  ('http://c.test/3')) AS t(url)""",
        "ngram_jaccard": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                       FROM documents WHERE doc_id < 100),
            g AS (SELECT DISTINCT doc_id,
                         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS gram
                  FROM t, UNNEST(range(1, len(arr) - 1)) AS r(i)),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
                             count(*) AS inter_size
                      FROM g x JOIN g y
                        ON x.gram = y.gram AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, inter_size,
                   (sa.n + sb.n - inter_size) AS union_size
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE 100 * inter_size >= 50 * (sa.n + sb.n - inter_size)
            ORDER BY a, b""",
        "cosine_neardup_lsh": _cosine_lsh_oracle(),
        "knn_join": _knn_join_oracle(),
        "ann_lsh": _ann_lsh_oracle(),
        "simhash": _simhash_oracle(),
        "simhash_neardup": _simhash_neardup_oracle(),
        "minhash_neardup": _minhash_oracle(),
        "dedup_keepers": _dedup_keepers_oracle(),
        "dedup_keepers_cc": _dedup_keepers_oracle(),
        "dup_cluster_sizes": _dup_cluster_sizes_oracle(),
        "incremental_dedup": """
            SELECT d.doc_id, md5(d.text) AS text_md5
            FROM documents d
            WHERE d.doc_id % 2 = 1
              AND NOT EXISTS (SELECT 1 FROM documents s
                              WHERE s.doc_id % 2 = 0
                                AND md5(s.text) = md5(d.text))
            ORDER BY d.doc_id""",
        "active_customers": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey""",
        "hash_split": _hash_split_oracle(),
        "pii_redact": r"""
            SELECT event_id,
                   regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
                   len(regexp_extract_all(props, '[0-9]+')) AS n_matched
            FROM events""",
        "decontaminate": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                       FROM documents),
            eg AS (SELECT DISTINCT arr[i] || ' ' || arr[i+1] || ' '
                          || arr[i+2] || ' ' || arr[i+3] AS gram
                   FROM t, UNNEST(range(1, len(arr) - 2)) AS r(i)
                   WHERE doc_id % 97 = 0),
            tg AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' '
                          || arr[i+2] || ' ' || arr[i+3] AS gram
                   FROM t, UNNEST(range(1, len(arr) - 2)) AS r(i)
                   WHERE doc_id % 97 <> 0)
            SELECT d.doc_id,
                   CAST(CASE WHEN EXISTS (
                       SELECT 1 FROM tg JOIN eg ON tg.gram = eg.gram
                       WHERE tg.doc_id = d.doc_id)
                   THEN 1 ELSE 0 END AS INTEGER) AS contaminated
            FROM documents d WHERE d.doc_id % 97 <> 0""",
        "repetition": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                       FROM documents),
            tok AS (SELECT doc_id, count(*) AS n_tokens,
                           count(DISTINCT tok) AS n_distinct_tokens
                    FROM (SELECT doc_id, UNNEST(arr) AS tok FROM t)
                    GROUP BY doc_id),
            g AS (SELECT doc_id, count(*) AS n_grams,
                         count(DISTINCT gram) AS n_distinct_grams
                  FROM (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' '
                               || arr[i+2] AS gram
                        FROM t, UNNEST(range(1, len(arr) - 1)) AS r(i))
                  GROUP BY doc_id)
            SELECT t.doc_id,
                   COALESCE(tok.n_tokens, 0) AS n_tokens,
                   COALESCE(tok.n_distinct_tokens, 0) AS n_distinct_tokens,
                   COALESCE(g.n_grams, 0) AS n_grams,
                   COALESCE(g.n_distinct_grams, 0) AS n_distinct_grams
            FROM t LEFT JOIN tok USING (doc_id) LEFT JOIN g USING (doc_id)""",
        # SQL twin of the HyperLogLog sketch itself: md5-top-8-byte
        # hash, bucket = top 14 bits, rho via bin() string length
        # (exact), register sum as HUGEINT of power-of-two terms, the
        # SAME IEEE estimator expression as sketches.hll_estimate.
        "hll_distinct": """
            WITH k AS (SELECT CAST(l_orderkey AS VARCHAR) || '|'
                              || CAST(l_partkey AS VARCHAR) AS v
                       FROM lineitem),
            b AS (SELECT (h // 1125899906842624)::BIGINT AS idx,
                         (h % 1125899906842624)::BIGINT AS w
                  FROM (SELECT ('0x' || substr(md5(v), 1, 16))::UBIGINT
                               AS h FROM k)),
            r AS (SELECT idx,
                         MAX(CASE WHEN w = 0 THEN 51
                                  ELSE 50 - length(bin(w)) + 1 END) AS rho
                  FROM b GROUP BY idx),
            agg AS (SELECT SUM(1::BIGINT << (51 - rho))::HUGEINT AS s_live,
                           count(*)::BIGINT AS n_live FROM r),
            est AS (SELECT (0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0
                           * 16384.0 * 2251799813685248.0
                           / CAST(s_live + (16384 - n_live)::HUGEINT
                                  * 2251799813685248 AS DOUBLE) AS raw,
                           16384 - n_live AS v0
                    FROM agg)
            SELECT CAST(FLOOR(CASE WHEN raw <= 2.5 * 16384.0 AND v0 > 0
                                   THEN 16384.0 * ln(16384.0 / v0)
                                   ELSE raw END) AS BIGINT)
                     AS est_distinct,
                   (SELECT count(DISTINCT v) FROM k)::BIGINT AS n_exact
            FROM est""",
        "percent_rank": """
            SELECT event_id, event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(floor(percent_rank() OVER (
                          PARTITION BY event_type
                          ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT))
                        * 1000000 + 0.5) AS BIGINT) AS pr_micro
            FROM events ORDER BY event_id""",
        "urgent_low_intersect": """
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
            ORDER BY o_custkey""",
        "urgent_only_except": """
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
            ORDER BY o_custkey""",
        "urgent_low_intersect_all": """
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
            ORDER BY o_custkey""",
        "urgent_only_except_all": """
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
            ORDER BY o_custkey""",
        "order_gaps": """
            SELECT o_orderkey, o_custkey, gap_us FROM (
              SELECT o_orderkey, o_custkey,
                     epoch_us(o_orderdate) - lag(epoch_us(o_orderdate))
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS gap_us
              FROM orders)
            WHERE gap_us IS NOT NULL ORDER BY o_orderkey""",
        "event_transitions": """
            WITH t AS (SELECT user_id, event_type,
                              lag(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT prev AS from_val, event_type AS to_val,
                   count(*)::BIGINT AS n
            FROM t WHERE prev IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "group_skew": """
            WITH q AS (SELECT l_returnflag,
                              CAST(l_quantity AS HUGEINT) AS x
                       FROM lineitem),
                 s AS (SELECT l_returnflag, count(*)::HUGEINT AS n,
                              sum(x) AS s1, sum(x*x) AS s2,
                              sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
                       FROM q GROUP BY l_returnflag),
                 f AS (SELECT l_returnflag, n,
                              n*s2 - s1*s1 AS b,
                              n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS a,
                              n*n*n*s4 - 4*n*n*s1*s3
                                + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS c
                       FROM s)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   CASE WHEN b = 0 THEN 0
                        ELSE CAST(floor(CAST(a AS DOUBLE)
                               / (CAST(b AS DOUBLE)
                                  * sqrt(CAST(b AS DOUBLE)))
                               * 1e6 + 0.5) AS BIGINT) END AS skew_micro,
                   CASE WHEN b = 0 THEN 0
                        ELSE CAST(floor((CAST(c AS DOUBLE)
                               / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
                               - 3.0) * 1e6 + 0.5) AS BIGINT)
                        END AS kurt_micro
            FROM f ORDER BY l_returnflag""",
        "grouping_sets": """
            SELECT COALESCE(r_name, '<all>') AS r_name,
                   COALESCE(n_name, '<all>') AS n_name,
                   count(*)::BIGINT AS n_orders,
                   sum(round(o_totalprice * 100)::BIGINT)::BIGINT
                     AS revenue_cents
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY GROUPING SETS ((r_name, n_name), (n_name), ())
            ORDER BY 1, 2""",
        "cube_revenue": """
            SELECT COALESCE(r_name, '<all>') AS r_name,
                   COALESCE(n_name, '<all>') AS n_name,
                   count(*)::BIGINT AS n_orders,
                   sum(round(o_totalprice * 100)::BIGINT)::BIGINT
                     AS revenue_cents
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY CUBE(r_name, n_name)
            ORDER BY 1, 2""",
        "first_last_order": """
            WITH s AS (SELECT o_custkey,
                              round(o_totalprice * 100)::BIGINT AS cents,
                              row_number() OVER (
                                PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn_a,
                              row_number() OVER (
                                PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC,
                                         o_orderkey DESC) AS rn_d
                       FROM orders)
            SELECT o_custkey,
                   max(CASE WHEN rn_a = 1 THEN cents END)::BIGINT
                     AS first_cents,
                   max(CASE WHEN rn_d = 1 THEN cents END)::BIGINT
                     AS last_cents
            FROM s GROUP BY 1 ORDER BY 1""",
        "lang_top_tokens": r"""
            WITH toks AS (SELECT lang,
                                 unnest(regexp_extract_all(text, '\S+'))
                                   AS token
                          FROM documents),
            cnt AS (SELECT lang, token, count(*)::BIGINT AS cnt
                    FROM toks GROUP BY 1, 2),
            tot AS (SELECT lang, sum(cnt)::BIGINT AS n
                    FROM cnt GROUP BY 1)
            SELECT c.lang, c.token, c.cnt
            FROM cnt c JOIN tot t ON t.lang = c.lang
            WHERE c.cnt * 1000 >= 35 * t.n
            ORDER BY c.lang, c.token""",
        "validity_intervals": """
            SELECT user_id, event_id,
                   epoch_us(ts)::BIGINT AS valid_from,
                   coalesce(
                     LEAD(epoch_us(ts)::BIGINT) OVER (
                       PARTITION BY user_id ORDER BY ts),
                     -1)::BIGINT AS valid_to
            FROM events ORDER BY event_id""",
        "props_extract": """
            SELECT event_type,
                   sum(coalesce(
                     json_extract_string(props, '$.k')::BIGINT,
                     0))::BIGINT AS sum_k,
                   count(json_extract_string(props, '$.k'))::BIGINT
                     AS n_found,
                   count(*)::BIGINT AS n_rows
            FROM events GROUP BY 1 ORDER BY 1""",
        "window_users": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
                   count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events
            GROUP BY 1 ORDER BY 1""",
        "urgent_low_union": """
            SELECT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
            UNION
            SELECT o_custkey FROM orders
            WHERE o_orderpriority = '5-LOW'
            ORDER BY o_custkey""",
        "group_mad": """
            WITH v AS (SELECT l_returnflag AS k,
                              round(l_quantity)::BIGINT AS x
                       FROM lineitem),
            med AS (SELECT k, quantile_disc(x, 0.5)::BIGINT AS med
                    FROM v GROUP BY 1)
            SELECT m.k AS l_returnflag,
                   m.med AS med_scaled,
                   quantile_disc(abs(v.x - m.med), 0.5)::BIGINT
                     AS mad_scaled
            FROM v JOIN med m ON m.k = v.k
            GROUP BY 1, 2 ORDER BY 1""",
        "label_prop": _LABEL_PROP_SQL,
        "label_prop_join": _LABEL_PROP_SQL,
        "cc_converged": _CC_CONVERGED_SQL,
        "sssp_hops": _SSSP_HOPS_SQL,
        "ktruss": _ktruss_oracle(),
        "rate_limit": """
            WITH v AS (SELECT event_id, user_id,
                              (epoch_us(ts) // 86400000000)::BIGINT AS win,
                              ts
                       FROM events),
            r AS (SELECT event_id, user_id, win,
                         row_number() OVER (PARTITION BY user_id, win
                                            ORDER BY ts, event_id) AS rn
                  FROM v)
            SELECT event_id, user_id, win FROM r WHERE rn <= 3
            ORDER BY event_id""",
        "assign_ids": """
            WITH s AS (SELECT doc_id,
                              ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                                ::BIGINT AS skey
                       FROM documents)
            SELECT doc_id,
                   (row_number() OVER (ORDER BY skey) - 1)::BIGINT
                     AS row_id
            FROM s ORDER BY doc_id""",
        "snapshot_diff": """
            WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
            v2 AS (SELECT doc_id,
                          md5(text || CASE WHEN doc_id % 10 = 0
                                           THEN '!' ELSE '' END) AS h
                   FROM documents WHERE doc_id % 17 != 0
                   UNION ALL
                   SELECT doc_id + 1000000, md5('new-' || doc_id)
                   FROM documents WHERE doc_id % 13 = 0),
            d AS (SELECT CASE WHEN v2.doc_id IS NULL THEN 'removed'
                              WHEN v1.doc_id IS NULL THEN 'added'
                              WHEN v1.h != v2.h THEN 'changed'
                         END AS status
                  FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id)
            SELECT status, count(*)::BIGINT AS n FROM d
            WHERE status IS NOT NULL
            GROUP BY status ORDER BY status""",
        "crawl_budget": """
            WITH w AS (SELECT doc_id % 20 AS host,
                              sum(n_chars)::BIGINT AS wt
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(wt)::BIGINT AS tot FROM w),
            f AS (SELECT host, wt, (10000 * wt) // tot AS base,
                         (10000 * wt) % tot AS rem
                  FROM w CROSS JOIN t),
            s AS (SELECT sum(base)::BIGINT AS fsum FROM f),
            rk AS (SELECT host, wt, base,
                          row_number() OVER (ORDER BY rem DESC, host)
                            AS rn
                   FROM f)
            SELECT host, wt AS weight,
                   (base + CASE WHEN rn <= 10000 - s.fsum
                                THEN 1 ELSE 0 END)::BIGINT AS alloc
            FROM rk CROSS JOIN s ORDER BY host""",
        "zorder_cells": f"""
            WITH v AS (SELECT user_id % 65536 AS x,
                              (round(value * 100)::BIGINT) % 65536 AS y
                       FROM events),
            z AS (SELECT x, y, ({_ZORDER_X_SQL} + {_ZORDER_Y_SQL}) AS zval
                  FROM v)
            SELECT (zval >> 20)::BIGINT AS cell, count(*)::BIGINT AS n,
                   min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
                   min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
            FROM z GROUP BY 1 ORDER BY 1""",
        "compaction_plan": """
            WITH c AS (SELECT doc_id, n_chars,
                              sum(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev
                       FROM documents)
            SELECT (coalesce(prev, 0) // 10000)::BIGINT AS file_id,
                   count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS bytes
            FROM c GROUP BY 1 ORDER BY 1""",
        "copurchase": """
            WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
            n AS (SELECT count(DISTINCT o) AS total FROM po),
            ic AS (SELECT p, count(*)::BIGINT AS cnt FROM po GROUP BY p),
            pr AS (SELECT x.p AS a, y.p AS b, count(*)::BIGINT AS pair_n
                   FROM po x JOIN po y ON x.o = y.o AND x.p < y.p
                   GROUP BY 1, 2)
            SELECT a, b, pair_n,
                   (pair_n * 1000000 // total)::BIGINT AS support_ppm,
                   (pair_n * total * 1000000
                      // (ca.cnt * cb.cnt))::BIGINT AS lift_ppm
            FROM pr CROSS JOIN n
            JOIN ic ca ON ca.p = pr.a
            JOIN ic cb ON cb.p = pr.b
            WHERE pair_n >= 2
            ORDER BY a, b""",
        "graph_bfs": """
            WITH RECURSIVE e AS (SELECT DISTINCT x.l_suppkey AS u,
                                        y.l_suppkey AS v
                       FROM lineitem x
                       JOIN lineitem y
                         ON x.l_orderkey = y.l_orderkey
                        AND x.l_suppkey < y.l_suppkey
                       WHERE x.l_quantity >= 48
                         AND y.l_quantity >= 48),
            und AS (SELECT u AS a, v AS b FROM e
                    UNION ALL SELECT v, u FROM e),
            reach(node, lvl) AS (
                SELECT s_suppkey AS node, 0 AS lvl
                FROM supplier WHERE s_suppkey % 5 = 1
              UNION
                SELECT und.b, reach.lvl + 1
                FROM reach JOIN und ON und.a = reach.node
                WHERE reach.lvl < 4)
            SELECT node, min(lvl)::BIGINT AS lvl
            FROM reach GROUP BY node ORDER BY node""",
        "clustering": """
            WITH e AS (SELECT DISTINCT x.l_suppkey AS u,
                                       y.l_suppkey AS v
                       FROM lineitem x
                       JOIN lineitem y
                         ON x.l_orderkey = y.l_orderkey
                        AND x.l_suppkey < y.l_suppkey
                       WHERE x.l_quantity >= 48
                         AND y.l_quantity >= 48),
            und AS (SELECT u AS a FROM e UNION ALL SELECT v FROM e),
            deg AS (SELECT a AS node, count(*)::BIGINT AS deg
                    FROM und GROUP BY 1),
            tt AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                   FROM e e1
                   JOIN e e2 ON e2.u = e1.v
                   JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
            corners AS (SELECT x AS node FROM tt
                        UNION ALL SELECT y FROM tt
                        UNION ALL SELECT z FROM tt),
            tri AS (SELECT node, count(*)::BIGINT AS tri
                    FROM corners GROUP BY 1)
            SELECT d.node, d.deg,
                   coalesce(t.tri, 0)::BIGINT AS tri,
                   ((2 * coalesce(t.tri, 0) * 1000000)
                      // (d.deg * (d.deg - 1)))::BIGINT AS lcc_ppm
            FROM deg d LEFT JOIN tri t ON t.node = d.node
            WHERE d.deg >= 2
            ORDER BY d.node""",
        "weighted_sample": """
            SELECT doc_id, n_chars
            FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT * 1000
                  < least(n_chars, 1000)::BIGINT * 4294967296
            ORDER BY doc_id""",
        "group_corr": """
            WITH v AS (SELECT l_returnflag,
                              round(l_quantity)::BIGINT AS qty,
                              round(l_discount * 100)::BIGINT AS disc_pct
                       FROM lineitem)
            SELECT l_returnflag, count(*)::BIGINT AS n_rows,
                   CAST(round(corr(qty, disc_pct) * 1000000) AS BIGINT)
                     AS corr_micro
            FROM v GROUP BY l_returnflag ORDER BY l_returnflag""",
        "user_entropy": """
            WITH c AS (SELECT user_id, event_type,
                              count(*)::DOUBLE AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id,
                   CAST(round((ln(sum(n)) - sum(n * ln(n)) / sum(n))
                              * 1000000) AS BIGINT) AS entropy_micro,
                   CAST(sum(n) AS BIGINT) AS n_events
            FROM c GROUP BY user_id ORDER BY user_id""",
        "hist2d": """
            SELECT least(greatest(floor((l_quantity - 0.0) / 5.0),
                                  -1), 10)::BIGINT AS x_bin,
                   least(greatest(floor((l_extendedprice - 0.0)
                                        / 10000.0), -1), 10)::BIGINT
                     AS y_bin,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
        # same double op order as the Ray finalize: p=(n+1)/d, q
        # likewise, (p-q)*ln(p/q)*1e6 rounded PER BIN (order-free)
        "psi_drift": """
            WITH b AS (SELECT least(greatest(floor((value - 0.0) / 25.0),
                                             -1), 20)::BIGINT AS bin,
                              event_id % 2 AS side
                       FROM events),
            cnt AS (SELECT bin,
                           sum(CASE WHEN side = 0 THEN 1 ELSE 0
                               END)::BIGINT AS n_ref,
                           sum(CASE WHEN side = 1 THEN 1 ELSE 0
                               END)::BIGINT AS n_cur
                    FROM b GROUP BY bin),
            tot AS (SELECT sum(n_ref)::DOUBLE + 22 AS dr,
                           sum(n_cur)::DOUBLE + 22 AS dc
                    FROM cnt)
            SELECT bin, n_ref, n_cur,
                   CAST(round(((n_ref + 1) / dr - (n_cur + 1) / dc)
                              * ln(((n_ref + 1) / dr)
                                   / ((n_cur + 1) / dc))
                              * 1000000) AS BIGINT) AS psi_micro
            FROM cnt, tot ORDER BY bin""",
        "value_histogram": """
            SELECT bin, bin * 25.0 AS bin_lo, count(*) AS n FROM (
              SELECT least(greatest(floor(value / 25.0), -1), 20)::BIGINT
                       AS bin
              FROM events)
            GROUP BY bin ORDER BY bin""",
        "stratified_sample": """
            SELECT lang, doc_id, h FROM (
              SELECT lang, doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT AS h,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS
                         VARCHAR)), 1, 8))::BIGINT, doc_id) AS rn
              FROM documents)
            WHERE rn <= 30 ORDER BY lang, doc_id""",
        "column_profile": """
            SELECT 'o_custkey' AS col, count(*)::BIGINT AS n_rows,
                   (count(*) - count(o_custkey))::BIGINT AS n_null,
                   min(o_custkey)::DOUBLE AS min_v,
                   max(o_custkey)::DOUBLE AS max_v FROM orders
            UNION ALL SELECT 'o_orderdate', count(*),
                   count(*) - count(o_orderdate),
                   min(floor(epoch(o_orderdate))),
                   max(floor(epoch(o_orderdate))) FROM orders
            UNION ALL SELECT 'o_orderkey', count(*),
                   count(*) - count(o_orderkey),
                   min(o_orderkey), max(o_orderkey) FROM orders
            UNION ALL SELECT 'o_orderpriority', count(*),
                   count(*) - count(o_orderpriority),
                   min(length(o_orderpriority)),
                   max(length(o_orderpriority)) FROM orders
            UNION ALL SELECT 'o_orderstatus', count(*),
                   count(*) - count(o_orderstatus),
                   min(length(o_orderstatus)),
                   max(length(o_orderstatus)) FROM orders
            UNION ALL SELECT 'o_totalprice', count(*),
                   count(*) - count(o_totalprice),
                   min(o_totalprice), max(o_totalprice) FROM orders
            ORDER BY col""",
        "range_window_sum": """
            SELECT user_id, event_id,
                   sum(cents) OVER (
                     PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING
                     AND CURRENT ROW) AS range_sum
            FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            ORDER BY user_id, event_id""",
        "bm25_topk": _BM25_SC_CTE + """
            SELECT doc_id, score_micro FROM sc WHERE score_micro > 0
            ORDER BY score_micro DESC, doc_id LIMIT 20""",
        "rrf_fusion": _BM25_SC_CTE + r""",
            l1 AS (SELECT doc_id, row_number() OVER (
                     ORDER BY score_micro DESC, doc_id) AS r
                   FROM sc WHERE score_micro > 0),
            l1k AS (SELECT doc_id, r FROM l1 WHERE r <= 50),
            qf AS (SELECT doc_id,
                          round(0.4*least(1.0, n_tokens/100.0)
                              + 0.3*(1.0 - n_upper
                                     / greatest(length(text),1)::DOUBLE)
                              + 0.3*least(1.0, 20.0*n_punct
                                     / greatest(length(text),1)::DOUBLE),
                              4) AS qs
                   FROM (SELECT doc_id, text,
                           len(regexp_extract_all(text, '\S+'))
                             AS n_tokens,
                           len(regexp_extract_all(text, '[.!,;:?]'))
                             AS n_punct,
                           len(regexp_extract_all(text, '[A-Z]'))
                             AS n_upper
                         FROM documents)),
            l2 AS (SELECT doc_id, row_number() OVER (
                     ORDER BY qs DESC, doc_id) AS r FROM qf),
            l2k AS (SELECT doc_id, r FROM l2 WHERE r <= 50),
            f AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                         coalesce(1000000 // (60 + a.r), 0)
                       + coalesce(1000000 // (60 + b.r), 0) AS rrf_micro
                  FROM l1k a FULL JOIN l2k b ON a.doc_id = b.doc_id)
            SELECT doc_id, rrf_micro::BIGINT AS rrf_micro FROM f
            ORDER BY rrf_micro DESC, doc_id LIMIT 20""",
        "orders_unpivot": """
            SELECT o_orderkey, 'o_custkey' AS name,
                   o_custkey::DOUBLE AS value FROM orders
            UNION ALL
            SELECT o_orderkey, 'o_totalprice', o_totalprice FROM orders
            ORDER BY o_orderkey, name""",
        "cdc_merge": """
            SELECT user_id, event_id, ts_us, event_type FROM (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts) DESC,
                                                 event_id) AS rn
              FROM events)
            WHERE rn = 1 AND event_type <> 'error'
            ORDER BY user_id""",
        "interval_join": """
            WITH e AS (SELECT event_id, event_type,
                              CAST(floor(epoch(ts)) AS BIGINT) AS lo,
                              CAST(floor(epoch(ts)) AS BIGINT)
                                + CAST(floor(value) AS BIGINT) AS hi
                       FROM events)
            SELECT l.event_id AS a, r.event_id AS b
            FROM e l JOIN e r
              ON l.event_type = 'click' AND r.event_type = 'view'
             AND l.lo <= r.hi AND r.lo <= l.hi
            ORDER BY a, b""",
        "edit_join": """
            WITH p AS (SELECT doc_id, substr(text, 1, 24) AS s
                       FROM documents)
            SELECT x.doc_id AS a, y.doc_id AS b,
                   levenshtein(x.s, y.s)::BIGINT AS dist
            FROM p x JOIN p y
              ON x.doc_id < y.doc_id AND levenshtein(x.s, y.s) <= 1
            ORDER BY a, b""",
        "jaccard_join": r"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '\S+') AS arr
                       FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                           || ' ' || arr[i+3] || ' ' || arr[i+4] AS gram
                  FROM t, UNNEST(range(1, len(arr) - 3)) AS r(i)),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
                             count(*) AS inter_size
                      FROM g x JOIN g y
                        ON x.gram = y.gram AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, inter_size,
                   (sa.n + sb.n - inter_size) AS union_size
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE 2 * inter_size >= (sa.n + sb.n - inter_size)
            ORDER BY a, b""",
        "triangles": """
            WITH e AS (SELECT DISTINCT x.l_suppkey AS u,
                                       y.l_suppkey AS v
                       FROM lineitem x
                       JOIN lineitem y
                         ON x.l_orderkey = y.l_orderkey
                        AND x.l_suppkey < y.l_suppkey
                       WHERE x.l_quantity >= 48
                         AND y.l_quantity >= 48)
            SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
                   (SELECT count(*)
                    FROM e e1
                    JOIN e e2 ON e2.u = e1.v
                    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)::BIGINT
                     AS n_triangles""",
        "dense_rank": """
            SELECT event_id, event_type,
                   round(value * 100)::BIGINT AS cents,
                   DENSE_RANK() OVER (
                     PARTITION BY event_type
                     ORDER BY round(value * 100)::BIGINT DESC)::BIGINT
                     AS drank
            FROM events ORDER BY event_id""",
        "group_stats": """
            WITH b AS (SELECT l_returnflag,
                              round(l_quantity)::HUGEINT AS x,
                              round(l_discount * 100)::HUGEINT AS y
                       FROM lineitem),
            s AS (SELECT l_returnflag, count(*)::HUGEINT AS n,
                         sum(x) AS sx, sum(x * x) AS sxx,
                         sum(y) AS sy, sum(y * y) AS syy,
                         sum(x * y) AS sxy
                  FROM b GROUP BY 1)
            SELECT l_returnflag, n::BIGINT AS n_rows, sx::BIGINT AS sum_x,
                   (n * sxx - sx * sx)::BIGINT AS var_x_num,
                   (n * syy - sy * sy)::BIGINT AS var_y_num,
                   (n * sxy - sx * sy)::BIGINT AS cov_xy_num,
                   ((n * sxx - sx * sx) * 1000000
                      // (n * (n - 1)))::BIGINT AS var_x_ppm
            FROM s ORDER BY l_returnflag""",
        "source_share": """
            SELECT doc_id, source, n_chars,
                   (n_chars * 1000000)
                     // sum(n_chars) OVER (PARTITION BY source)
                     AS share_ppm
            FROM documents ORDER BY doc_id""",
        "cume_dist": """
            SELECT event_id, event_type,
                   round(value * 100)::BIGINT AS cents,
                   CAST(floor(cume_dist() OVER (
                          PARTITION BY event_type
                          ORDER BY round(value * 100)::BIGINT)
                        * 1000000 + 0.5) AS BIGINT) AS cd_micro
            FROM events ORDER BY event_id""",
        "event_seq": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts) AS text
            FROM events GROUP BY user_id ORDER BY user_id""",
        "moving_sum": """
            SELECT event_id, user_id,
                   round(value * 100)::BIGINT AS cents,
                   sum(round(value * 100)::BIGINT) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::BIGINT
                     AS win_sum
            FROM events ORDER BY event_id""",
        "minmax_norm": """
            SELECT event_id, event_type, cents,
                   CASE WHEN mx = mn THEN 0
                        ELSE ((cents - mn) * 1000000) // (mx - mn)
                   END::BIGINT AS norm_ppm
            FROM (SELECT event_id, event_type,
                         round(value * 100)::BIGINT AS cents,
                         min(round(value * 100)::BIGINT)
                           OVER (PARTITION BY event_type) AS mn,
                         max(round(value * 100)::BIGINT)
                           OVER (PARTITION BY event_type) AS mx
                  FROM events)
            ORDER BY event_id""",
        "chunk_docs": """
            WITH d AS (SELECT doc_id, text, length(text) AS n
                       FROM documents),
                 c AS (SELECT doc_id, text,
                              CASE WHEN n <= 256 THEN 1
                                   ELSE 1 + CAST(ceil((n - 256) / 192.0)
                                               AS BIGINT)
                              END AS k FROM d)
            SELECT doc_id, i AS chunk_id,
                   substr(text, (i * 192)::BIGINT + 1, 256) AS chunk
            FROM c, LATERAL (SELECT unnest(generate_series(0, k - 1))
                             AS i) t
            ORDER BY doc_id, chunk_id""",
        "span_dedup": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
                 tot AS (SELECT doc_id,
                                CAST(ceil(len(toks) / 10.0) AS BIGINT)
                                  AS n_spans FROM d),
                 s AS (SELECT doc_id, i.i AS span_no,
                              array_to_string(
                                toks[i.i * 10 + 1 : i.i * 10 + 10], ' ')
                                AS span
                       FROM d, LATERAL (SELECT unnest(generate_series(
                              0, CAST(ceil(len(toks) / 10.0) AS BIGINT)
                                 - 1)) AS i) i),
                 hot AS (SELECT span FROM s GROUP BY span
                         HAVING count(DISTINCT doc_id) > 1),
                 k AS (SELECT doc_id,
                              string_agg(span, ' ' ORDER BY span_no)
                                AS text_clean,
                              count(*)::BIGINT AS n_kept
                       FROM s WHERE span NOT IN (SELECT span FROM hot)
                       GROUP BY doc_id)
            SELECT k.doc_id, k.text_clean, k.n_kept,
                   tot.n_spans - k.n_kept AS n_dropped
            FROM k JOIN tot USING (doc_id)
            ORDER BY doc_id""",
        "skew_join_revenue": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
                   sum(round(l_extendedprice * 100)::BIGINT)::BIGINT
                     AS revenue_cents
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1 ORDER BY 1""",
        "hash_sample": """
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT AS h
            FROM documents ORDER BY h, doc_id LIMIT 100""",
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                     AS norm_text,
                   length(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                              ' ', 'g')))::BIGINT
                     AS n_norm_chars
            FROM documents ORDER BY doc_id""",
        "order_ntile": """
            SELECT o_orderkey, o_orderpriority,
                   round(o_totalprice * 100)::BIGINT AS price_cents,
                   ntile(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY round(o_totalprice*100)::BIGINT,
                                           o_orderkey)::BIGINT AS tile
            FROM orders ORDER BY o_orderkey""",
        "event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')::BIGINT
                     AS n_click,
                   count(*) FILTER (event_type = 'error')::BIGINT
                     AS n_error,
                   count(*) FILTER (event_type = 'purchase')::BIGINT
                     AS n_purchase,
                   count(*) FILTER (event_type = 'signup')::BIGINT
                     AS n_signup,
                   count(*) FILTER (event_type = 'view')::BIGINT
                     AS n_view
            FROM events GROUP BY user_id ORDER BY user_id""",
        "hll_grouped": """
            WITH b AS (SELECT event_type,
                              (h // 1125899906842624)::BIGINT AS idx,
                              (h % 1125899906842624)::BIGINT AS w
                       FROM (SELECT event_type,
                                    ('0x' || substr(md5(
                                       CAST(user_id AS VARCHAR)), 1, 16)
                                    )::UBIGINT AS h
                             FROM events)),
            r AS (SELECT event_type, idx,
                         MAX(CASE WHEN w = 0 THEN 51
                                  ELSE 50 - length(bin(w)) + 1 END) AS rho
                  FROM b GROUP BY event_type, idx),
            agg AS (SELECT event_type,
                           SUM(1::BIGINT << (51 - rho))::HUGEINT AS s_live,
                           count(*)::BIGINT AS n_live
                    FROM r GROUP BY event_type),
            est AS (SELECT event_type,
                           (0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0
                           * 16384.0 * 2251799813685248.0
                           / CAST(s_live + (16384 - n_live)::HUGEINT
                                  * 2251799813685248 AS DOUBLE) AS raw,
                           16384 - n_live AS v0
                    FROM agg),
            ex AS (SELECT event_type,
                          count(DISTINCT user_id)::BIGINT AS n_distinct
                   FROM events GROUP BY event_type)
            SELECT e.event_type,
                   CAST(FLOOR(CASE WHEN raw <= 2.5 * 16384.0 AND v0 > 0
                                   THEN 16384.0 * ln(16384.0 / v0)
                                   ELSE raw END) AS BIGINT)
                     AS est_distinct,
                   ex.n_distinct
            FROM est e JOIN ex USING (event_type)
            ORDER BY e.event_type""",
        "bloom_semi_join": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem l
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey
                            AND o.o_totalprice > 480000)
            ORDER BY l_orderkey, l_linenumber""",
        "bloom_anti_join": """
            SELECT count(*)::BIGINT AS n_rows,
                   CAST(round(SUM(l_quantity)) AS BIGINT) AS sum_qty
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey
                                AND o.o_totalprice > 480000)""",
        "unigram_logprob": r"""
            WITH tf AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(text, '\S+')) AS token
                    FROM documents)
              GROUP BY doc_id, token),
            cnt AS (SELECT token, SUM(tf)::BIGINT AS c FROM tf
                    GROUP BY token),
            lp AS (SELECT token,
                          CAST(round(ln(c / (SELECT SUM(c)::DOUBLE FROM cnt))
                                     * 1000000) AS BIGINT) AS lp_micro
                   FROM cnt)
            SELECT tf.doc_id,
                   SUM(tf.tf)::BIGINT AS n_tokens,
                   SUM(tf.tf * lp.lp_micro)::BIGINT AS logprob_micro,
                   SUM(tf.tf * lp.lp_micro)
                     >= SUM(tf.tf) * -3405000 AS keep
            FROM tf JOIN lp USING (token)
            GROUP BY tf.doc_id ORDER BY tf.doc_id""",
        # the same LM expression tree as the Ray kernel: one division
        # (n+1)/(c(w1)+V), ln, round(x*1e6) — the doc score is an
        # integer sum so grouping order cannot change the hash
        "bigram_logprob": r"""
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(text, '\S+') AS l
                          FROM documents),
            uni AS (SELECT unnest(l) AS w FROM toks),
            ucnt AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY w),
            v AS (SELECT count(*)::BIGINT AS v FROM ucnt),
            bi AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
                   FROM toks,
                        LATERAL unnest(generate_series(1, len(l)-1))
                          AS t(i)),
            bcnt AS (SELECT w1, w2, count(*)::BIGINT AS n FROM bi
                     GROUP BY w1, w2),
            lp AS (SELECT w1, w2,
                          CAST(round(ln((bcnt.n + 1)::DOUBLE
                                        / (u.c + v.v)::DOUBLE)
                                     * 1000000) AS BIGINT) AS lp
                   FROM bcnt JOIN ucnt u ON u.w = bcnt.w1, v)
            SELECT doc_id,
                   count(*)::BIGINT AS n_bigrams,
                   sum(lp.lp)::BIGINT AS logprob_micro,
                   sum(lp.lp) >= count(*) * -3420000 AS keep
            FROM bi JOIN lp USING (w1, w2)
            GROUP BY doc_id ORDER BY doc_id""",
        "corr_matrix": """
            WITH v AS (SELECT round(l_quantity)::BIGINT AS qty,
                              round(l_discount * 100)::BIGINT AS disc_pct,
                              round(l_tax * 100)::BIGINT AS tax_pct
                       FROM lineitem)
            SELECT 'qty' AS col_x, 'disc_pct' AS col_y,
                   count(*)::BIGINT AS n_rows,
                   CAST(round(corr(qty, disc_pct) * 1000000) AS BIGINT)
                     AS corr_micro FROM v
            UNION ALL
            SELECT 'qty', 'tax_pct', count(*)::BIGINT,
                   CAST(round(corr(qty, tax_pct) * 1000000) AS BIGINT)
            FROM v
            UNION ALL
            SELECT 'disc_pct', 'tax_pct', count(*)::BIGINT,
                   CAST(round(corr(disc_pct, tax_pct) * 1000000) AS BIGINT)
            FROM v
            ORDER BY col_x, col_y""",
        "bpe_merges": _bpe_oracle(),
        "bpe_encode": _bpe_encode_oracle(),
        "gram_novelty": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                       FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         ('0x' || substr(md5(arr[i] || ' ' || arr[i+1]
                              || ' ' || arr[i+2] || ' ' || arr[i+3]),
                              1, 16))::UBIGINT AS gram
                  FROM t, UNNEST(range(1, len(arr) - 2)) AS r(i)),
            df AS (SELECT gram, count(*)::BIGINT AS df FROM g
                   GROUP BY gram)
            SELECT doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_novel
            FROM g JOIN df USING (gram)
            GROUP BY doc_id ORDER BY doc_id""",
        "tokenize_ids": r"""
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(text, '\S+') AS l
                          FROM documents),
            tok AS (SELECT doc_id, unnest(l) AS token,
                           unnest(generate_series(0, len(l) - 1)) AS pos
                    FROM toks),
            cnt AS (SELECT token, count(*)::BIGINT AS c FROM tok
                    GROUP BY token),
            vocab AS (SELECT token,
                             row_number() OVER (ORDER BY c DESC, token)
                               - 1 AS tid
                      FROM cnt)
            SELECT t.doc_id, t.pos, v.tid AS token_id
            FROM tok t JOIN vocab v USING (token)
            ORDER BY doc_id, pos""",
        "retention_cohorts": """
            WITH e AS (SELECT user_id,
                              CAST(floor(epoch(ts) / 604800) AS BIGINT)
                                AS p
                       FROM events),
            up AS (SELECT DISTINCT user_id, p FROM e),
            c AS (SELECT user_id, min(p) AS cohort FROM up
                  GROUP BY user_id)
            SELECT c.cohort AS cohort_period,
                   (up.p - c.cohort)::BIGINT AS periods_since,
                   count(*)::BIGINT AS n_active
            FROM up JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "running_distinct": """
            WITH e AS (SELECT user_id, event_id, event_type,
                              epoch_us(ts) AS tus
                       FROM events),
            f AS (SELECT *, CASE WHEN row_number() OVER (
                              PARTITION BY user_id, event_type
                              ORDER BY tus, event_id) = 1
                            THEN 1 ELSE 0 END AS fst
                  FROM e)
            SELECT user_id, event_id,
                   sum(fst) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING)::BIGINT
                     AS n_distinct
            FROM f ORDER BY user_id, event_id""",
        "target_encode": """
            WITH v AS (SELECT o_orderkey, o_orderpriority,
                              round(o_totalprice * 100)::BIGINT AS cents
                       FROM orders),
            agg AS (SELECT o_orderpriority, sum(cents)::BIGINT AS s,
                           count(*)::BIGINT AS n
                    FROM v GROUP BY o_orderpriority)
            SELECT v.o_orderkey, v.o_orderpriority,
                   (agg.s - v.cents)::BIGINT AS loo_num,
                   (agg.n - 1)::BIGINT AS loo_den
            FROM v JOIN agg USING (o_orderpriority)
            ORDER BY v.o_orderkey""",
        "interval_merge": """
            WITH iv AS (SELECT user_id AS k, event_id AS id,
                               epoch_us(ts) AS lo,
                               epoch_us(ts) + round(value * 100)::BIGINT
                                 * 10000000 AS hi
                        FROM events),
            m AS (SELECT k, id, lo, hi,
                         max(hi) OVER (PARTITION BY k ORDER BY lo, id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS pm
                  FROM iv),
            g AS (SELECT *, CASE WHEN pm IS NULL OR lo > pm THEN 1
                                 ELSE 0 END AS f
                  FROM m),
            gg AS (SELECT *, sum(f) OVER (PARTITION BY k
                                          ORDER BY lo, id
                                          ROWS UNBOUNDED PRECEDING)
                                AS gid
                   FROM g),
            mg AS (SELECT k, gid, min(lo) AS glo, max(hi) AS ghi
                   FROM gg GROUP BY k, gid),
            cnt AS (SELECT k, count(*)::BIGINT AS n_intervals FROM iv
                    GROUP BY k)
            SELECT cnt.k AS user_id, cnt.n_intervals,
                   count(*)::BIGINT AS n_merged,
                   sum(mg.ghi - mg.glo)::BIGINT AS covered
            FROM mg JOIN cnt ON cnt.k = mg.k
            GROUP BY cnt.k, cnt.n_intervals ORDER BY 1""",
        "twap": """
            WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                              round(value * 100)::BIGINT AS cents
                       FROM events),
            w AS (SELECT user_id, cents, tus,
                         lead(tus) OVER (PARTITION BY user_id
                                         ORDER BY tus, event_id) AS nxt
                  FROM e)
            SELECT user_id, count(*)::BIGINT AS n_gaps,
                   sum(cents * ((nxt - tus) // 1000))::BIGINT AS wsum,
                   sum((nxt - tus) // 1000)::BIGINT AS dur
            FROM w WHERE nxt IS NOT NULL
            GROUP BY user_id ORDER BY user_id""",
        "vocab_drift": r"""
            WITH tok AS (SELECT doc_id % 2 AS side,
                                unnest(regexp_extract_all(text, '\S+'))
                                  AS token
                         FROM documents),
            cnt AS (SELECT side, token, count(*)::BIGINT AS cnt
                    FROM tok GROUP BY 1, 2),
            rk AS (SELECT side, token, cnt,
                          row_number() OVER (PARTITION BY side
                                             ORDER BY cnt DESC, token)
                            AS rank
                   FROM cnt)
            SELECT side, rank, token, cnt FROM rk
            WHERE rank <= 20 ORDER BY side, rank""",
        "chi_square": """
            WITH c AS (SELECT event_type,
                              ((epoch_us(ts) // 86400000000) + 4) % 7
                                AS dow,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n)::DOUBLE AS total FROM c),
            rt AS (SELECT event_type, sum(n)::DOUBLE AS r FROM c
                   GROUP BY 1),
            ct AS (SELECT dow, sum(n)::DOUBLE AS cl FROM c GROUP BY 1)
            SELECT c.event_type, c.dow, c.n,
                   CAST(round((c.n - rt.r * ct.cl / t.total)
                              * (c.n - rt.r * ct.cl / t.total)
                              / (rt.r * ct.cl / t.total)
                              * 1000000) AS BIGINT) AS chi2_micro
            FROM c JOIN rt USING (event_type) JOIN ct USING (dow), t
            ORDER BY c.event_type, c.dow""",
        "hll_intersect": _hll_intersect_oracle(),
        "band_join": """
            SELECT u.o_orderkey AS a, l.o_orderkey AS b
            FROM orders u JOIN orders l
              ON u.o_orderpriority = '1-URGENT'
             AND l.o_orderpriority = '5-LOW'
             AND abs(round(u.o_totalprice * 100)
                     - round(l.o_totalprice * 100)) <= 2000
            ORDER BY a, b""",
        "host_entropy": f"""
            WITH c AS (SELECT {_HOST_SQL} AS host,
                              count(*)::DOUBLE AS n
                       FROM documents GROUP BY 1)
            SELECT CAST(round((ln(sum(n)) - sum(n * ln(n)) / sum(n))
                              * 1000000) AS BIGINT) AS entropy_micro,
                   CAST(sum(n) AS BIGINT) AS n_events
            FROM c""",
        "count_gini": """
            WITH c AS (SELECT l_suppkey, count(*)::BIGINT AS c
                       FROM lineitem GROUP BY 1),
            r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM c),
            t AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
                         sum(i * c)::BIGINT AS ic
                  FROM r)
            SELECT n AS n_keys, s AS total,
                   CAST(round((2.0 * ic - (n + 1) * s)
                              / (n * s) * 1000000) AS BIGINT) AS gini_ppm
            FROM t""",
        "session_durations": """
            WITH f AS (
              SELECT user_id, epoch_us(ts) AS tus,
                     coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts), 9e18)
                       > 86400 * 1000000::BIGINT AS new_session
              FROM events),
            s AS (SELECT user_id, tus,
                         sum(CASE WHEN new_session THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY tus
                                 ROWS UNBOUNDED PRECEDING) AS sid
                  FROM f),
            d AS (SELECT (max(tus) - min(tus))::BIGINT AS dur_us
                  FROM s GROUP BY user_id, sid)
            SELECT count(*)::BIGINT AS n_sessions,
                   quantile_disc(dur_us, 0.5)::BIGINT AS p50_us,
                   quantile_disc(dur_us, 0.9)::BIGINT AS p90_us
            FROM d""",
        "winsorize": """
            WITH c AS (SELECT quantile_disc(o_totalprice, 0.01) AS lo,
                              quantile_disc(o_totalprice, 0.99) AS hi
                       FROM orders)
            SELECT o_orderkey,
                   round(least(greatest(o_totalprice, lo), hi)
                         * 100)::BIGINT AS clamped_cents
            FROM orders, c ORDER BY o_orderkey""",
        "decile_bins": """
            WITH c AS (SELECT quantile_disc(o_totalprice, 0.1) AS c1,
                              quantile_disc(o_totalprice, 0.2) AS c2,
                              quantile_disc(o_totalprice, 0.3) AS c3,
                              quantile_disc(o_totalprice, 0.4) AS c4,
                              quantile_disc(o_totalprice, 0.5) AS c5,
                              quantile_disc(o_totalprice, 0.6) AS c6,
                              quantile_disc(o_totalprice, 0.7) AS c7,
                              quantile_disc(o_totalprice, 0.8) AS c8,
                              quantile_disc(o_totalprice, 0.9) AS c9
                       FROM orders)
            SELECT ((o_totalprice >= c1)::INT + (o_totalprice >= c2)::INT
                    + (o_totalprice >= c3)::INT + (o_totalprice >= c4)::INT
                    + (o_totalprice >= c5)::INT + (o_totalprice >= c6)::INT
                    + (o_totalprice >= c7)::INT + (o_totalprice >= c8)::INT
                    + (o_totalprice >= c9)::INT)::BIGINT AS bin,
                   count(*)::BIGINT AS n,
                   min(round(o_totalprice * 100)::BIGINT) AS lo_cents,
                   max(round(o_totalprice * 100)::BIGINT) AS hi_cents
            FROM orders, c GROUP BY bin ORDER BY bin""",
        "windowed_dedup": """
            WITH e AS (SELECT user_id, event_type, event_id,
                              epoch_us(ts) AS tus
                       FROM events)
            SELECT event_id FROM e
            WHERE NOT EXISTS (
                SELECT 1 FROM e p
                WHERE p.user_id = e.user_id
                  AND p.event_type = e.event_type
                  AND (p.tus < e.tus
                       OR (p.tus = e.tus AND p.event_id < e.event_id))
                  AND e.tus - p.tus <= 600 * 1000000)
            ORDER BY event_id""",
        "locf_fill": """
            WITH e AS (SELECT user_id, event_id, ts,
                              CASE WHEN event_type = 'purchase'
                                   THEN round(value * 100)::BIGINT
                              END AS v
                       FROM events)
            SELECT user_id, event_id,
                   COALESCE(last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     -1) AS filled_cents
            FROM e ORDER BY user_id, event_id""",
        "gap_fill": """
            WITH e AS (SELECT user_id,
                              CAST(floor(epoch(ts) / 21600) AS BIGINT) AS w
                       FROM events),
            span AS (SELECT user_id, min(w) AS mn, max(w) AS mx FROM e
                     GROUP BY user_id),
            grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS w
                     FROM span),
            cnt AS (SELECT user_id, w, count(*)::BIGINT AS n FROM e
                    GROUP BY user_id, w)
            SELECT g.user_id, g.w * 21600 AS window_start,
                   COALESCE(c.n, 0)::BIGINT AS n
            FROM grid g LEFT JOIN cnt c USING (user_id, w)
            ORDER BY 1, 2""",
        "price_quantiles": """
            SELECT quantile_disc(o_totalprice, 0.25) AS p25,
                   quantile_disc(o_totalprice, 0.50) AS p50,
                   quantile_disc(o_totalprice, 0.90) AS p90,
                   quantile_disc(o_totalprice, 0.99) AS p99
            FROM orders""",
        "percentile_cont": """
            WITH v AS (SELECT value,
                              row_number() OVER (ORDER BY value) AS rn
                       FROM events WHERE value IS NOT NULL),
                 n AS (SELECT count(*)::BIGINT AS n FROM v),
                 pos AS (SELECT CAST(q AS DOUBLE) AS q,
                                CAST(q AS DOUBLE) * (n.n - 1) AS p
                         FROM (VALUES (0.25), (0.5), (0.9), (0.99))
                              qs(q), n),
                 os AS (SELECT pos.q, lo.value AS v_lo, hi.value AS v_hi,
                               pos.p - floor(pos.p) AS frac
                        FROM pos
                        JOIN v lo ON lo.rn
                             = CAST(floor(pos.p) AS BIGINT) + 1
                        JOIN v hi ON hi.rn
                             = CAST(ceil(pos.p) AS BIGINT) + 1)
            SELECT q, CAST(floor((v_lo + (v_hi - v_lo) * frac) * 1e6
                                 + 0.5) AS BIGINT) AS value_micro
            FROM os ORDER BY q""",
        "heavy_hitters": r"""
            WITH tok AS (SELECT UNNEST(regexp_extract_all(text, '\S+'))
                                AS token FROM documents),
            tot AS (SELECT count(*) AS n FROM tok)
            SELECT token, count(*) AS cnt
            FROM tok, tot
            GROUP BY token, n
            HAVING count(*) * 10000 >= 330 * n
            ORDER BY token""",
        "orders_left_join": """
            SELECT o.o_orderkey, o.o_orderpriority,
                   COALESCE(CAST(l.l_quantity AS BIGINT), -1) AS l_qty
            FROM orders o
            LEFT JOIN (SELECT l_orderkey, l_quantity FROM lineitem
                       WHERE l_quantity >= 48) l
              ON l.l_orderkey = o.o_orderkey
            ORDER BY o.o_orderkey, l_qty""",
        "customers_full_join": """
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
                   COALESCE(round(c.c_acctbal * 100)::BIGINT, -1)
                     AS acctbal_cents,
                   COALESCE(o.o_orderkey, -1) AS o_orderkey,
                   COALESCE(round(o.o_totalprice * 100)::BIGINT, -1)
                     AS price_cents
            FROM (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_mktsegment = 'BUILDING') c
            FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
            ORDER BY 1, 3""",
        "rollup_revenue": """
            SELECT COALESCE(r_name, '<all>') AS r_name,
                   COALESCE(n_name, '<all>') AS n_name,
                   count(*)::BIGINT AS n_orders,
                   sum(round(o_totalprice * 100)::BIGINT)::BIGINT
                     AS revenue_cents
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY ROLLUP(r_name, n_name)
            ORDER BY 1, 2""",
        "order_rank": """
            SELECT o_custkey, o_orderkey, price_cents, rn FROM (
              SELECT o_custkey, o_orderkey,
                     round(o_totalprice * 100)::BIGINT AS price_cents,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY round(o_totalprice*100)::BIGINT DESC,
                                                 o_orderkey) AS rn
              FROM orders)
            WHERE rn <= 2 ORDER BY o_custkey, rn""",
        "latest_events": """
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id) = 1
            ORDER BY user_id""",
        # the Lloyd recurrence unrolled: c0 seeds -> assign (round-1e-9
        # d2, ties to smaller cluster) -> re-center (round 1e-9, empty
        # clusters keep previous centroid via COALESCE) x2 -> final
        # stats; inertia summed as exact nano-unit BIGINTs
        "kmeans": """
            WITH c0 AS (
              SELECT vec_id::BIGINT AS cl, i AS dim,
                     embedding[i+1]::DOUBLE AS c
              FROM embeddings, generate_series(0, 63) AS g(i)
              WHERE vec_id < 8),
            d1 AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1),
            m1 AS (
              SELECT a.cl, g.i AS dim,
                     round(sum(e.embedding[g.i+1]::DOUBLE) / count(*), 9)
                       AS c
              FROM embeddings e JOIN a1 a USING (vec_id),
                   generate_series(0, 63) AS g(i)
              GROUP BY a.cl, g.i),
            c1 AS (SELECT c0.cl, c0.dim, COALESCE(m1.c, c0.c) AS c
                   FROM c0 LEFT JOIN m1
                     ON m1.cl = c0.cl AND m1.dim = c0.dim),
            d2_ AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c1 c GROUP BY e.vec_id, c.cl),
            a2 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM d2_) WHERE rn = 1),
            m2 AS (
              SELECT a.cl, g.i AS dim,
                     round(sum(e.embedding[g.i+1]::DOUBLE) / count(*), 9)
                       AS c
              FROM embeddings e JOIN a2 a USING (vec_id),
                   generate_series(0, 63) AS g(i)
              GROUP BY a.cl, g.i),
            c2 AS (SELECT c1.cl, c1.dim, COALESCE(m2.c, c1.c) AS c
                   FROM c1 LEFT JOIN m2
                     ON m2.cl = c1.cl AND m2.dim = c1.dim),
            df AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c2 c GROUP BY e.vec_id, c.cl),
            af AS (
              SELECT vec_id, cl, d2 FROM (
                SELECT vec_id, cl, d2, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM df) WHERE rn = 1)
            SELECT cl AS cluster, count(*)::BIGINT AS n,
                   sum(CAST(round(d2 * 1000000000) AS BIGINT))::BIGINT
                     AS inertia_nano
            FROM af GROUP BY cl ORDER BY cluster""",
        # the kmeans recurrence at iters=1 + per-cluster rank cutoff:
        # keep = rank-by-(d2, id) <= floor(0.8 * cluster size)
        "proto_prune": """
            WITH c0 AS (
              SELECT vec_id::BIGINT AS cl, i AS dim,
                     embedding[i+1]::DOUBLE AS c
              FROM embeddings, generate_series(0, 63) AS g(i)
              WHERE vec_id < 8),
            d1 AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1),
            m1 AS (
              SELECT a.cl, g.i AS dim,
                     round(sum(e.embedding[g.i+1]::DOUBLE) / count(*), 9)
                       AS c
              FROM embeddings e JOIN a1 a USING (vec_id),
                   generate_series(0, 63) AS g(i)
              GROUP BY a.cl, g.i),
            c1 AS (SELECT c0.cl, c0.dim, COALESCE(m1.c, c0.c) AS c
                   FROM c0 LEFT JOIN m1
                     ON m1.cl = c0.cl AND m1.dim = c0.dim),
            df AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c1 c GROUP BY e.vec_id, c.cl),
            af AS (
              SELECT vec_id, cl, d2 FROM (
                SELECT vec_id, cl, d2, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM df) WHERE rn = 1),
            rk AS (
              SELECT vec_id, cl AS cluster,
                     row_number() OVER (PARTITION BY cl
                                        ORDER BY d2, vec_id) AS rnk,
                     CAST(round(d2 * 1000000000) AS BIGINT) AS d2_nano,
                     count(*) OVER (PARTITION BY cl) AS csize
              FROM af)
            SELECT vec_id, cluster, rnk, d2_nano,
                   rnk <= CAST(floor(0.8 * csize) AS BIGINT) AS keep
            FROM rk ORDER BY vec_id""",
        "doc_entropy": r"""
            WITH tf AS (
              SELECT doc_id, token, count(*)::DOUBLE AS tf
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(text, '\S+')) AS token
                    FROM documents)
              GROUP BY doc_id, token)
            SELECT doc_id,
                   CAST(sum(tf) AS BIGINT) AS n_tokens,
                   CAST(round((ln(sum(tf)) - sum(tf * ln(tf)) / sum(tf))
                              * 1000000) AS BIGINT) AS entropy_micro
            FROM tf GROUP BY doc_id ORDER BY doc_id""",
        "hash_features": r"""
            WITH tf AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(text, '\S+')) AS token
                    FROM documents)
              GROUP BY doc_id, token),
            hx AS (SELECT doc_id, tf, md5(token) AS h FROM tf),
            cell AS (
              SELECT doc_id,
                     (('0x' || substr(h, 1, 8))::UBIGINT % 64)::BIGINT
                       AS dim,
                     sum((2 * (('0x' || substr(h, 9, 1))::UBIGINT % 2)
                          ::BIGINT - 1) * tf)::BIGINT AS weight
              FROM hx GROUP BY 1, 2)
            SELECT doc_id, dim, weight FROM cell
            WHERE weight <> 0 ORDER BY doc_id, dim""",
        # the kmeans recurrence at iters=1 (c0 -> a1 -> c1) builds the
        # inverted lists; each query (vec_id < 5) probes its 3 nearest
        # lists (rounded d2 asc, ties to smaller list); candidates =
        # vectors assigned to a probed list; exact cosine top-10 with
        # the ann_topk rank convention (round(sim,9) desc, vec_id)
        "ann_ivf": """
            WITH c0 AS (
              SELECT vec_id::BIGINT AS cl, i AS dim,
                     embedding[i+1]::DOUBLE AS c
              FROM embeddings, generate_series(0, 63) AS g(i)
              WHERE vec_id < 8),
            d1 AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1),
            m1 AS (
              SELECT a.cl, g.i AS dim,
                     round(sum(e.embedding[g.i+1]::DOUBLE) / count(*), 9)
                       AS c
              FROM embeddings e JOIN a1 a USING (vec_id),
                   generate_series(0, 63) AS g(i)
              GROUP BY a.cl, g.i),
            c1 AS (SELECT c0.cl, c0.dim, COALESCE(m1.c, c0.c) AS c
                   FROM c0 LEFT JOIN m1
                     ON m1.cl = c0.cl AND m1.dim = c0.dim),
            df AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c1 c GROUP BY e.vec_id, c.cl),
            af AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM df) WHERE rn = 1),
            probe AS (
              SELECT vec_id AS qid, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM df WHERE vec_id < 5) WHERE rn <= 3),
            cand AS (
              SELECT p.qid, a.vec_id FROM af a JOIN probe p ON a.cl = p.cl),
            sims AS (
              SELECT c.qid AS query_id, c.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]) AS sim
              FROM cand c
              JOIN embeddings e ON e.vec_id = c.vec_id
              JOIN embeddings q ON q.vec_id = c.qid)
            SELECT query_id, vec_id, rank::INTEGER AS rank,
                   round(sim, 4) AS sim FROM (
              SELECT query_id, vec_id, sim, row_number() OVER (
                PARTITION BY query_id
                ORDER BY round(sim, 9) DESC, vec_id) AS rank
              FROM sims)
            WHERE rank <= 10""",
        # the kmeans recurrence at iters=1 (c0 -> a1 -> c1), then a
        # same-cluster self-join at the cosine threshold — the SemDeDup
        # shape: candidate pairs exist ONLY within a cluster
        "semantic_dedup": """
            WITH c0 AS (
              SELECT vec_id::BIGINT AS cl, i AS dim,
                     embedding[i+1]::DOUBLE AS c
              FROM embeddings, generate_series(0, 63) AS g(i)
              WHERE vec_id < 8),
            d1 AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1),
            m1 AS (
              SELECT a.cl, g.i AS dim,
                     round(sum(e.embedding[g.i+1]::DOUBLE) / count(*), 9)
                       AS c
              FROM embeddings e JOIN a1 a USING (vec_id),
                   generate_series(0, 63) AS g(i)
              GROUP BY a.cl, g.i),
            c1 AS (SELECT c0.cl, c0.dim, COALESCE(m1.c, c0.c) AS c
                   FROM c0 LEFT JOIN m1
                     ON m1.cl = c0.cl AND m1.dim = c0.dim),
            df AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c1 c GROUP BY e.vec_id, c.cl),
            af AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM df) WHERE rn = 1)
            SELECT af1.cl AS cluster, e1.vec_id AS a, e2.vec_id AS b,
                   round(list_cosine_similarity(e1.embedding::DOUBLE[],
                                                e2.embedding::DOUBLE[]), 4)
                     AS sim
            FROM af af1
            JOIN af af2 ON af2.cl = af1.cl AND af1.vec_id < af2.vec_id
            JOIN embeddings e1 ON e1.vec_id = af1.vec_id
            JOIN embeddings e2 ON e2.vec_id = af2.vec_id
            WHERE list_cosine_similarity(e1.embedding::DOUBLE[],
                                         e2.embedding::DOUBLE[]) >= 0.4
            ORDER BY a, b""",
        # pmi expression mirrors the Ray kernel exactly: all-DOUBLE
        # left-assoc products, one division, floor(ln(x)*1e6 + 0.5)
        "bigram_pmi": r"""
            WITH toks AS (SELECT regexp_extract_all(text, '\S+') AS l
                          FROM documents),
            uni AS (SELECT unnest(l) AS w FROM toks),
            ucnt AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY w),
            nuni AS (SELECT count(*)::BIGINT AS n FROM uni),
            bi AS (SELECT l[i] AS w1, l[i+1] AS w2
                   FROM toks, LATERAL unnest(generate_series(1, len(l)-1))
                        AS t(i)),
            bcnt AS (SELECT w1, w2, count(*)::BIGINT AS n FROM bi
                     GROUP BY w1, w2)
            SELECT w1, w2, bcnt.n,
                   CAST(floor(ln((bcnt.n::DOUBLE
                                  * (SELECT n FROM nuni)::DOUBLE
                                  * (SELECT n FROM nuni)::DOUBLE)
                                 / ((SELECT count(*)::BIGINT FROM bi)::DOUBLE
                                    * u1.c::DOUBLE * u2.c::DOUBLE))
                              * 1000000 + 0.5) AS BIGINT) AS pmi_micro
            FROM bcnt JOIN ucnt u1 ON u1.w = bcnt.w1
                      JOIN ucnt u2 ON u2.w = bcnt.w2
            WHERE bcnt.n >= 5
            ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""",
        "pack_sequences": r"""
            WITH RECURSIVE rows_ AS (
                SELECT doc_id // 64 AS bucket,
                       row_number() OVER (PARTITION BY doc_id // 64
                                          ORDER BY doc_id) AS rn,
                       doc_id,
                       len(regexp_extract_all(text, '\S+')) AS w
                FROM documents),
            rec AS (
                SELECT bucket, rn, doc_id, w, w AS acc, CAST(0 AS BIGINT) AS pack
                FROM rows_ WHERE rn = 1
                UNION ALL
                SELECT r.bucket, r.rn, r.doc_id, r.w,
                       CASE WHEN p.acc > 0 AND p.acc + r.w > 128
                            THEN r.w ELSE p.acc + r.w END,
                       CASE WHEN p.acc > 0 AND p.acc + r.w > 128
                            THEN p.pack + 1 ELSE p.pack END
                FROM rec p JOIN rows_ r
                  ON r.bucket = p.bucket AND r.rn = p.rn + 1)
            SELECT bucket * 1048576 + pack AS pack_id, doc_id,
                   w AS n_tokens
            FROM rec ORDER BY doc_id""",
        # per-row cents = floor(v*100 + 0.5): the same IEEE double
        # expression the Ray kernel evaluates, so the running sums are
        # integer-exact on both sides
        "running_total": """
            WITH e AS (SELECT user_id, event_id, ts,
                              CAST(floor(value * 100 + 0.5) AS BIGINT)
                                AS cents
                       FROM events)
            SELECT user_id, event_id,
                   count(*) OVER w AS run_n,
                   sum(cents) OVER w AS run_cents,
                   coalesce(date_diff('microsecond',
                            lag(ts) OVER w, ts), -1) AS gap_us
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
            ORDER BY user_id, event_id""",
        "pagerank": _pagerank_oracle(),
        "pagerank_join": _pagerank_oracle(),
        "pagerank_weighted": _pagerank_weighted_oracle(),
        # list indexing is 1-based in DuckDB; embedding floats widen to
        # DOUBLE exactly, so sum/count matches the numpy combine to the
        # rounding guard
        "label_centroids": """
            SELECT label::BIGINT AS label, i AS dim,
                   round(sum(embedding[i + 1]::DOUBLE)
                         / count(*), 9) AS c
            FROM embeddings, generate_series(0, 63) AS g(i)
            GROUP BY label, i
            ORDER BY label, dim""",
        "length_outliers": """
            WITH q AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
                              quantile_disc(n_chars, 0.95) AS hi
                       FROM documents)
            SELECT doc_id, n_chars,
                   CASE WHEN n_chars < lo THEN 'low' ELSE 'high' END
                     AS side
            FROM documents, q
            WHERE n_chars < lo OR n_chars > hi
            ORDER BY doc_id""",
        # SQL twin of the CMS registers themselves: bucket_j(token) =
        # hex chars [1+8j, 8] of md5 as UBIGINT mod 4096 (bytes 4j..4j+4
        # of the digest — the Python side carves the same four 32-bit
        # words from one md5); register content = total count mapping
        # to that bucket; estimate = min over the 4 rows
        "cms_counts": r"""
            WITH tok AS (SELECT UNNEST(regexp_extract_all(text, '\S+'))
                                AS token FROM documents),
            tot AS (SELECT count(*) AS n FROM tok),
            cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
            hh AS (SELECT token, c AS cnt FROM cnt, tot
                   WHERE c * 10000 >= 330 * n),
            bkt AS (SELECT token, j,
                           (('0x' || substr(md5(token), 1 + 8 * j, 8))
                            ::UBIGINT % 4096)::BIGINT AS b
                    FROM cnt, generate_series(0, 3) AS g(j)),
            regs AS (SELECT bkt.j, bkt.b, sum(cnt.c)::BIGINT AS v
                     FROM cnt JOIN bkt USING (token)
                     GROUP BY bkt.j, bkt.b)
            SELECT hh.token, hh.cnt, min(regs.v) AS est
            FROM hh JOIN bkt ON bkt.token = hh.token
                    JOIN regs ON regs.j = bkt.j AND regs.b = bkt.b
            GROUP BY hh.token, hh.cnt
            ORDER BY hh.token""",
        "join_size_est": """
            WITH c AS (SELECT CAST(user_id AS VARCHAR) AS k,
                              count(*)::BIGINT AS c
                       FROM events GROUP BY user_id),
            bkt AS (SELECT k, j,
                           (('0x' || substr(md5(k), 1 + 8 * j, 8))
                            ::UBIGINT % 4096)::BIGINT AS b
                    FROM c, generate_series(0, 3) AS g(j)),
            regs AS (SELECT bkt.j, bkt.b, sum(c.c)::BIGINT AS v
                     FROM c JOIN bkt USING (k) GROUP BY 1, 2),
            f2 AS (SELECT j, sum(v * v)::BIGINT AS s FROM regs
                   GROUP BY j)
            SELECT (SELECT min(s) FROM f2) AS est,
                   (SELECT sum(c * c)::BIGINT FROM c) AS exact""",
        "top_event_type": """
            SELECT user_id, top_type, n FROM (
              SELECT user_id, event_type AS top_type,
                     count(*) AS n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC,
                                                 event_type) AS rn
              FROM events GROUP BY user_id, event_type)
            WHERE rn = 1 ORDER BY user_id""",
        # centroids are the round-9 label_centroids values on BOTH
        # sides; per-element squared differences sum in different
        # orders, so d2 is rounded (1e-9) before the argmin and ties
        # break toward the smaller label
        "centroid_assign": """
            WITH cent AS (
              SELECT label::BIGINT AS clabel, i AS dim,
                     round(sum(embedding[i + 1]::DOUBLE)
                           / count(*), 9) AS c
              FROM embeddings, generate_series(0, 63) AS g(i)
              GROUP BY label, i),
            d AS (
              SELECT e.vec_id, e.label::BIGINT AS true_label, c.clabel,
                     round(sum((e.embedding[c.dim + 1]::DOUBLE - c.c)
                               * (e.embedding[c.dim + 1]::DOUBLE - c.c)),
                           9) AS d2
              FROM embeddings e, cent c
              GROUP BY e.vec_id, e.label, c.clabel),
            a AS (
              SELECT vec_id, true_label, clabel,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d2, clabel) AS rn
              FROM d)
            SELECT true_label, clabel AS assigned, count(*)::BIGINT AS n
            FROM a WHERE rn = 1
            GROUP BY true_label, clabel
            ORDER BY true_label, assigned""",
        # strictly-after funnel semantics: each CTE takes the first
        # qualifying event AFTER the previous step's timestamp
        "funnel_depth": """
            WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t2
                  FROM events e JOIN v USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts > v.t1
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t3
                  FROM events e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts > c.t2
                  GROUP BY e.user_id)
            SELECT u.user_id,
                   (CASE WHEN p.user_id IS NOT NULL THEN 3
                         WHEN c.user_id IS NOT NULL THEN 2
                         WHEN v.user_id IS NOT NULL THEN 1
                         ELSE 0 END)::BIGINT AS depth
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN v USING (user_id)
            LEFT JOIN c USING (user_id)
            LEFT JOIN p USING (user_id)
            ORDER BY u.user_id""",
        # the same three-way split the Ray side synthesizes (ASCII
        # corpus: char == byte offsets), reassembled by string_agg in
        # idx order — round-trip must reproduce the original text
        "reassemble_chunks": """
            WITH chunks AS (
              SELECT doc_id, 0 AS idx,
                     substr(text, 1, length(text) // 3) AS part
              FROM documents
              UNION ALL
              SELECT doc_id, 1,
                     substr(text, length(text) // 3 + 1,
                            length(text) // 3)
              FROM documents
              UNION ALL
              SELECT doc_id, 2,
                     substr(text, 2 * (length(text) // 3) + 1)
              FROM documents)
            SELECT doc_id,
                   length(string_agg(part, '' ORDER BY idx))::BIGINT
                     AS n_chars2,
                   md5(string_agg(part, '' ORDER BY idx)) AS text_md5
            FROM chunks GROUP BY doc_id ORDER BY doc_id""",
        "hits": _hits_oracle(),
        "hits_join": _hits_oracle(),
        "degree_dist": f"""
            WITH e AS (SELECT DISTINCT doc_id % {_PR_NODES} AS src,
                              (doc_id * {_PR_MIX}) % {_PR_NODES} AS dst
                       FROM documents),
            o AS (SELECT src AS v, count(*)::BIGINT AS deg
                  FROM e GROUP BY 1),
            i AS (SELECT dst AS v, count(*)::BIGINT AS deg
                  FROM e GROUP BY 1)
            SELECT 'out' AS side, deg, count(*)::BIGINT AS n_nodes
            FROM o GROUP BY deg
            UNION ALL
            SELECT 'in' AS side, deg, count(*)::BIGINT AS n_nodes
            FROM i GROUP BY deg
            ORDER BY side, deg""",
        "kmv_source_sim": _kmv_source_sim_oracle(),
        "quality_keepers": _quality_keepers_oracle(),
        "ks_drift": """
            WITH c AS (SELECT floor(value * 100 + 0.5)::BIGINT AS v,
                              count(*) FILTER (WHERE user_id % 2 = 0)
                                ::BIGINT AS a,
                              count(*) FILTER (WHERE user_id % 2 = 1)
                                ::BIGINT AS b
                       FROM events GROUP BY 1),
            w AS (SELECT v, sum(a) OVER (ORDER BY v) AS ca,
                         sum(b) OVER (ORDER BY v) AS cb
                  FROM c),
            t AS (SELECT sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb
                  FROM c)
            SELECT t.na AS n_a, t.nb AS n_b,
                   max(abs(w.ca * t.nb - w.cb * t.na))::BIGINT AS ks_num,
                   (t.na * t.nb)::BIGINT AS ks_den,
                   ((1000000 * max(abs(w.ca * t.nb - w.cb * t.na)))
                     // (t.na * t.nb))::BIGINT AS ks_micro
            FROM w, t GROUP BY t.na, t.nb""",
        "containment_join": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr
                       FROM documents WHERE doc_id < 200),
            gh AS (SELECT DISTINCT doc_id,
                          ('0x' || substr(md5(arr[i] || ' ' || arr[i+1] || ' '
                                              || arr[i+2]), 1, 16))::UBIGINT AS h
                   FROM t, UNNEST(range(1, len(arr) - 1)) AS r(i)),
            sizes AS (SELECT doc_id, count(*)::BIGINT AS n
                      FROM gh GROUP BY 1),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
                             count(*)::BIGINT AS inter_size
                      FROM gh x JOIN gh y ON y.h = x.h
                                         AND y.doc_id <> x.doc_id
                      GROUP BY 1, 2)
            SELECT i.a, i.b, i.inter_size, s.n AS a_size
            FROM inter i JOIN sizes s ON s.doc_id = i.a
            WHERE 100 * i.inter_size >= 60 * s.n
            ORDER BY a, b""",
        "hill_tail": """
            WITH c AS (SELECT user_id, count(*)::BIGINT AS n
                       FROM events GROUP BY 1),
            r AS (SELECT user_id, n, row_number() OVER (
                      ORDER BY n DESC, user_id) AS rn FROM c),
            thr AS (SELECT n::DOUBLE AS t FROM r WHERE rn = 11)
            SELECT 10::BIGINT AS k,
                   (SELECT n FROM r WHERE rn = 11)::BIGINT AS x_thr,
                   floor(1000000 * avg(ln(n::DOUBLE / (SELECT t FROM thr)))
                         + 0.5)::BIGINT AS hill_micro
            FROM r WHERE rn <= 10""",
        "recrawl_schedule": """
            SELECT user_id,
                   count(*)::BIGINT AS n_obs,
                   count(*) FILTER (WHERE event_type = 'click')::BIGINT
                     AS n_changed,
                   least(604800, greatest(3600,
                     (86400 * count(*))
                       // greatest(count(*) FILTER (
                            WHERE event_type = 'click'), 1)))::BIGINT
                     AS interval_s
            FROM events GROUP BY user_id ORDER BY user_id""",
        "mix_epochs": """
            WITH RECURSIVE
            t AS (SELECT source, sum(n_chars)::BIGINT AS tok
                  FROM documents GROUP BY 1),
            cnt AS (SELECT count(*)::BIGINT AS n,
                           ((4 * sum(tok)) // 3)::BIGINT AS budget
                    FROM t),
            ord AS (SELECT source, tok, row_number() OVER (
                        ORDER BY tok, source) AS rn FROM t),
            walk AS (
              SELECT 0::BIGINT AS rn,
                     (SELECT budget FROM cnt) AS remaining,
                     0::BIGINT AS alloc,
                     CAST(NULL AS VARCHAR) AS source, 0::BIGINT AS tok
              UNION ALL
              SELECT o.rn,
                     w.remaining - least(
                       w.remaining // ((SELECT n FROM cnt) - o.rn + 1),
                       2 * o.tok),
                     least(
                       w.remaining // ((SELECT n FROM cnt) - o.rn + 1),
                       2 * o.tok),
                     o.source, o.tok
              FROM walk w JOIN ord o ON o.rn = w.rn + 1)
            SELECT source, tok AS tokens, alloc,
                   ((1000000 * alloc) // tok)::BIGINT AS epochs_ppm
            FROM walk WHERE rn > 0 ORDER BY source""",
        "lsh_bucket_stats": _lsh_bucket_stats_oracle(),
        "zipf_fit": r"""
            WITH tc AS (
              SELECT token, count(*)::BIGINT AS c
              FROM (SELECT unnest(regexp_extract_all(text, '\S+'))
                      AS token FROM documents)
              GROUP BY token),
            top AS (SELECT c, rn FROM (
                      SELECT c, row_number() OVER (
                          ORDER BY c DESC, token) AS rn
                      FROM tc) WHERE rn <= 100),
            s AS (SELECT count(*)::DOUBLE AS n,
                         sum(ln(rn::DOUBLE)) AS sx,
                         sum(ln(c::DOUBLE)) AS sy,
                         sum(ln(rn::DOUBLE) * ln(c::DOUBLE)) AS sxy,
                         sum(ln(rn::DOUBLE) * ln(rn::DOUBLE)) AS sxx
                  FROM top)
            SELECT n::BIGINT AS k,
                   floor(1000000 * (n*sxy - sx*sy) / (n*sxx - sx*sx)
                         + 0.5)::BIGINT AS slope_micro
            FROM s""",
        "dedup_inflation": f"""
            WITH RECURSIVE {_minhash_pairs_ctes()},
            edges AS (SELECT a, b FROM mh_pairs
                      UNION ALL SELECT b AS a, a AS b FROM mh_pairs),
            reach AS (
                SELECT doc_id AS id, doc_id AS comp FROM documents
                UNION
                SELECT e.b AS id, r.comp
                FROM reach r JOIN edges e ON e.a = r.id),
            keep AS (SELECT id, min(comp) AS keeper FROM reach GROUP BY id),
            tok AS (SELECT doc_id,
                           len(regexp_extract_all(text, '\\S+'))::BIGINT
                             AS nt
                    FROM documents)
            SELECT count(*)::BIGINT AS total_docs,
                   count(*) FILTER (WHERE k.keeper <> k.id)::BIGINT
                     AS dup_docs,
                   sum(t.nt)::BIGINT AS total_tokens,
                   coalesce(sum(t.nt) FILTER (WHERE k.keeper <> k.id),
                            0)::BIGINT AS dup_tokens,
                   ((1000000 * coalesce(sum(t.nt) FILTER (
                        WHERE k.keeper <> k.id), 0))
                     // sum(t.nt))::BIGINT AS savings_ppm
            FROM keep k JOIN tok t ON t.doc_id = k.id""",
        "weighted_quantile": """
            WITH c AS (SELECT floor(l_extendedprice * 100 + 0.5)::BIGINT
                              AS v,
                              sum(floor(l_quantity + 0.5)::BIGINT)::BIGINT
                              AS w
                       FROM lineitem GROUP BY 1),
            cw AS (SELECT v, sum(w) OVER (ORDER BY v) AS cumw FROM c),
            t AS (SELECT sum(w)::BIGINT AS tot FROM c)
            SELECT q.q_ppt::BIGINT AS q_ppt,
                   (SELECT min(v) FROM cw, t
                    WHERE 1000 * cumw >= q.q_ppt * tot)::BIGINT AS value
            FROM (VALUES (250), (500), (750), (950)) q(q_ppt)
            ORDER BY q_ppt""",
        "kcore": _kcore_oracle(),
        "lsh_eval": _lsh_eval_oracle(),
        "assortativity": """
            WITH e AS MATERIALIZED (
                SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey
                 AND x.l_suppkey < y.l_suppkey
                WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
            du AS MATERIALIZED (
                SELECT a AS v, count(*)::BIGINT AS deg FROM (
                  SELECT u AS a FROM e UNION ALL SELECT v FROM e)
                GROUP BY 1),
            p AS (SELECT du1.deg AS x, du2.deg AS y FROM (
                    SELECT u AS a, v AS b FROM e
                    UNION ALL SELECT v, u FROM e) d
                  JOIN du du1 ON du1.v = d.a
                  JOIN du du2 ON du2.v = d.b)
            SELECT count(*)::BIGINT AS m_pairs,
                   sum(x)::BIGINT AS s1,
                   sum(x * x)::BIGINT AS sxx,
                   sum(x * y)::BIGINT AS sxy
            FROM p""",
        "watermark_late": """
            WITH e AS (SELECT event_id, epoch_us(ts)::BIGINT AS ts_us
                       FROM events),
            w AS (SELECT ts_us,
                         max(ts_us) OVER (ORDER BY event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS wm
                  FROM e),
            d AS (SELECT ts_us // 86400000000 AS day,
                         (wm IS NOT NULL
                          AND ts_us < wm - 1800000000)::INT AS late
                  FROM w)
            SELECT day, count(*)::BIGINT AS n_total,
                   sum(late)::BIGINT AS n_late,
                   ((1000000 * sum(late)) // count(*))::BIGINT AS late_ppm
            FROM d GROUP BY day ORDER BY day""",
        "posting_bytes": r"""
            WITH d AS (SELECT DISTINCT doc_id, unnest(list_distinct(
                           regexp_extract_all(text, '\S+'))) AS token
                       FROM documents),
            g AS (SELECT token, doc_id,
                         doc_id - lag(doc_id) OVER (
                             PARTITION BY token ORDER BY doc_id) AS lg
                  FROM d),
            b AS (SELECT token, coalesce(lg, doc_id + 1) AS gap FROM g),
            s AS (SELECT token, count(*)::BIGINT AS df,
                         sum(CASE WHEN gap < 128 THEN 1
                                  WHEN gap < 16384 THEN 2
                                  WHEN gap < 2097152 THEN 3
                                  WHEN gap < 268435456 THEN 4
                                  ELSE 5 END)::BIGINT AS bytes
                  FROM b GROUP BY token)
            SELECT token, df, bytes FROM s
            WHERE df >= 10 ORDER BY token""",
        "group_trend": """
            WITH e AS (SELECT user_id,
                              epoch_us(ts) // 3600000000 AS t,
                              floor(value * 100 + 0.5)::BIGINT AS y
                       FROM events)
            SELECT user_id, count(*)::BIGINT AS n,
                   (count(*) * sum(t * y)
                     - sum(t) * sum(y))::BIGINT AS trend_num,
                   (count(*) * sum(t * t)
                     - sum(t) * sum(t))::BIGINT AS trend_den
            FROM e GROUP BY user_id ORDER BY user_id""",
        "neg_samples": """
            WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
            j AS (SELECT doc_id, j FROM documents,
                  UNNEST([1, 2, 3]) AS t(j)),
            h AS (SELECT doc_id, j,
                         ('0x' || substr(md5(doc_id || ':' || j),
                                         1, 8))::BIGINT
                           % (SELECT c FROM n) AS neg
                  FROM j)
            SELECT doc_id, j::BIGINT AS j,
                   (CASE WHEN neg = doc_id
                         THEN (neg + 1) % (SELECT c FROM n)
                         ELSE neg END)::BIGINT AS neg_id
            FROM h ORDER BY doc_id, j""",
        "interleave": """
            WITH r AS (SELECT doc_id, source,
                              row_number() OVER (PARTITION BY source
                                                 ORDER BY doc_id) AS r
                       FROM documents)
            SELECT doc_id,
                   (row_number() OVER (ORDER BY r, source) - 1)::BIGINT
                     AS pos
            FROM r ORDER BY doc_id""",
        "coverage_curve": r"""
            WITH tc AS (SELECT token, count(*)::BIGINT AS c
                        FROM (SELECT unnest(regexp_extract_all(
                                  text, '\S+')) AS token
                              FROM documents)
                        GROUP BY token),
            tot AS (SELECT sum(c)::BIGINT AS s FROM tc),
            r AS (SELECT c, row_number() OVER (
                      ORDER BY c DESC, token) AS rn FROM tc)
            SELECT t.k::BIGINT AS k,
                   ((1000000 * (SELECT sum(c) FROM r WHERE rn <= t.k))
                     // (SELECT s FROM tot))::BIGINT AS covered_ppm
            FROM (VALUES (10), (50), (100)) t(k) ORDER BY k""",
        "seq_3grams": """
            WITH o AS (SELECT user_id, event_type,
                              lead(event_type, 1) OVER w AS e2,
                              lead(event_type, 2) OVER w AS e3
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT event_type || '>' || e2 || '>' || e3 AS pat,
                   count(*)::BIGINT AS n
            FROM o WHERE e3 IS NOT NULL
            GROUP BY 1 ORDER BY 1""",
        "politeness_audit": """
            WITH g AS (SELECT user_id,
                              epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id)
                                AS gap
                       FROM events)
            SELECT user_id,
                   min(gap)::BIGINT AS min_gap_us,
                   count(*) FILTER (WHERE gap < 300000000)::BIGINT
                     AS n_violations,
                   count(gap)::BIGINT AS n_gaps
            FROM g WHERE gap IS NOT NULL
            GROUP BY user_id ORDER BY user_id""",
        "dedup_by_source": f"""
            WITH RECURSIVE {_minhash_pairs_ctes()},
            edges AS (SELECT a, b FROM mh_pairs
                      UNION ALL SELECT b AS a, a AS b FROM mh_pairs),
            reach AS (
                SELECT doc_id AS id, doc_id AS comp FROM documents
                UNION
                SELECT e.b AS id, r.comp
                FROM reach r JOIN edges e ON e.a = r.id),
            keep AS (SELECT id, min(comp) AS keeper FROM reach GROUP BY id)
            SELECT d.source,
                   count(*)::BIGINT AS n_docs,
                   count(*) FILTER (WHERE k.keeper <> k.id)::BIGINT
                     AS n_dups,
                   ((1000000 * count(*) FILTER (WHERE k.keeper <> k.id))
                     // count(*))::BIGINT AS dup_ppm
            FROM keep k JOIN documents d ON d.doc_id = k.id
            GROUP BY d.source ORDER BY d.source""",
        "rfm_features": """
            WITH e AS (SELECT user_id, epoch_us(ts)::BIGINT AS ts_us,
                              floor(value * 100 + 0.5)::BIGINT AS cents
                       FROM events),
            m AS (SELECT max(ts_us) AS now FROM e)
            SELECT user_id,
                   ((SELECT now FROM m) - max(ts_us))::BIGINT
                     AS recency_us,
                   count(*)::BIGINT AS frequency,
                   sum(cents)::BIGINT AS monetary_cents
            FROM e GROUP BY user_id ORDER BY user_id""",
        "split_leakage": f"""
            WITH {_minhash_pairs_ctes()},
            sides AS (SELECT p.a, p.b,
                             (('0x' || substr(md5('split' || p.a),
                                              1, 8))::BIGINT
                              >= 3865470566)::BIGINT AS side_a,
                             (('0x' || substr(md5('split' || p.b),
                                              1, 8))::BIGINT
                              >= 3865470566)::BIGINT AS side_b
                      FROM mh_pairs p)
            SELECT a, b, side_a, side_b FROM sides
            WHERE side_a <> side_b ORDER BY a, b""",
        "wow_change": """
            WITH w AS (SELECT user_id,
                              epoch_us(ts) // 604800000000 AS week,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            l AS (SELECT user_id, week, n,
                         lag(week) OVER pw AS pw_week,
                         lag(n) OVER pw AS prev_n
                  FROM w
                  WINDOW pw AS (PARTITION BY user_id ORDER BY week))
            SELECT user_id, week, n, prev_n,
                   ((1000000 * (n - prev_n)) // prev_n)::BIGINT
                     AS change_ppm
            FROM l WHERE pw_week = week - 1
            ORDER BY user_id, week""",
        "fd_audit": """
            SELECT (c_custkey % 100)::BIGINT AS key,
                   count(DISTINCT c_mktsegment)::BIGINT AS n_distinct
            FROM customer
            GROUP BY 1 HAVING count(DISTINCT c_mktsegment) > 1
            ORDER BY key""",
        "ri_audit": """
            SELECT (SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey)
                   )::BIGINT AS orphan_lineitems,
                   (SELECT count(*) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                      WHERE l.l_orderkey = o.o_orderkey)
                   )::BIGINT AS childless_orders""",
        "quota_sample": """
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id, row_number() OVER (
                  PARTITION BY lang
                  ORDER BY ('0x' || substr(md5('q' || doc_id),
                                           1, 8))::BIGINT, doc_id) AS rn
              FROM documents)
            WHERE rn <= 10 ORDER BY lang, doc_id""",
        "diverse_sample": """
            WITH c0 AS (
              SELECT vec_id::BIGINT AS cl, i AS dim,
                     embedding[i+1]::DOUBLE AS c
              FROM embeddings, generate_series(0, 63) AS g(i)
              WHERE vec_id < 8),
            d1 AS (
              SELECT e.vec_id, c.cl,
                     round(sum((e.embedding[c.dim+1]::DOUBLE - c.c)
                               * (e.embedding[c.dim+1]::DOUBLE - c.c)), 9)
                       AS d2
              FROM embeddings e, c0 c GROUP BY e.vec_id, c.cl),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1)
            SELECT cl AS cluster, vec_id FROM (
              SELECT cl, vec_id, row_number() OVER (
                  PARTITION BY cl
                  ORDER BY ('0x' || substr(md5('div' || vec_id),
                                           1, 8))::BIGINT, vec_id) AS rn
              FROM a1)
            WHERE rn <= 5 ORDER BY cluster, vec_id""",
        "markov_probs": """
            WITH t AS (SELECT user_id, event_type,
                              lag(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
                       FROM events),
            c AS (SELECT prev AS from_val, event_type AS to_val,
                         count(*)::BIGINT AS n
                  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2)
            SELECT from_val, to_val, n,
                   ((1000000 * n) // sum(n) OVER (
                       PARTITION BY from_val))::BIGINT AS p_ppm
            FROM c ORDER BY from_val, to_val""",
        "langid_margin": r"""
            WITH c AS (
              SELECT doc_id,
                len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b'))::BIGINT AS c_en,
                len(regexp_extract_all(lower(text), '\b(der|und|die|das|ein)\b'))::BIGINT AS c_de,
                len(regexp_extract_all(lower(text), '\b(le|la|les|des|une)\b'))::BIGINT AS c_fr,
                len(regexp_extract_all(lower(text), '\b(el|los|las|una|que)\b'))::BIGINT AS c_es,
                len(regexp_extract_all(lower(text), '\b(de|le|shi|bu|zai)\b'))::BIGINT AS c_zh
              FROM documents),
            u AS (SELECT doc_id, unnest([c_en, c_de, c_fr, c_es, c_zh])
                    AS cnt FROM c),
            r AS (SELECT doc_id, cnt, row_number() OVER (
                      PARTITION BY doc_id ORDER BY cnt DESC) AS rn
                  FROM u)
            SELECT doc_id,
                   max(CASE WHEN rn = 1 THEN cnt END)::BIGINT AS c_top1,
                   max(CASE WHEN rn = 2 THEN cnt END)::BIGINT AS c_top2,
                   (max(CASE WHEN rn = 1 THEN cnt END)
                    - max(CASE WHEN rn = 2 THEN cnt END))::BIGINT
                     AS margin
            FROM r GROUP BY doc_id ORDER BY doc_id""",
        "diameter_est": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey
                 AND x.l_suppkey < y.l_suppkey
                WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
            und AS (SELECT u AS a, v AS b FROM e
                    UNION ALL SELECT v, u FROM e),
            lo AS (SELECT min(a) AS s FROM und),
            r1(node, lvl) AS (
                SELECT (SELECT s FROM lo) AS node, 0 AS lvl
              UNION
                SELECT und.b, r1.lvl + 1
                FROM r1 JOIN und ON und.a = r1.node
                WHERE r1.lvl < 32),
            m1 AS (SELECT node, min(lvl) AS lvl FROM r1 GROUP BY node),
            far1 AS (SELECT node FROM m1 ORDER BY lvl DESC, node
                     LIMIT 1),
            r2(node, lvl) AS (
                SELECT (SELECT node FROM far1) AS node, 0 AS lvl
              UNION
                SELECT und.b, r2.lvl + 1
                FROM r2 JOIN und ON und.a = r2.node
                WHERE r2.lvl < 32),
            m2 AS (SELECT node, min(lvl) AS lvl FROM r2 GROUP BY node),
            far2 AS (SELECT node, lvl FROM m2 ORDER BY lvl DESC, node
                     LIMIT 1)
            SELECT (SELECT s FROM lo)::BIGINT AS start,
                   (SELECT node FROM far1)::BIGINT AS far_node,
                   (SELECT lvl FROM far2)::BIGINT AS ecc,
                   (SELECT node FROM far2)::BIGINT AS far_node2""",
        "lsh_s_curve": f"""
            WITH {_minhash_sigs_ctes("WHERE doc_id < 200")},
            cand AS (SELECT x.doc_id AS a, y.doc_id AS b
                     FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
                     WHERE {_band_match_clauses()}),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
                             count(*) AS i
                      FROM gh x JOIN gh y ON y.h = x.h
                                         AND y.doc_id > x.doc_id
                      GROUP BY 1, 2),
            jb AS (SELECT i.a, i.b,
                          least(9, (10 * i.i)
                                // (sa.n + sb.n - i.i))::BIGINT
                            AS bucket,
                          (c.a IS NOT NULL)::INT AS is_cand
                   FROM inter i
                   JOIN sizes sa ON sa.doc_id = i.a
                   JOIN sizes sb ON sb.doc_id = i.b
                   LEFT JOIN cand c ON c.a = i.a AND c.b = i.b)
            SELECT bucket, count(*)::BIGINT AS n_pairs,
                   sum(is_cand)::BIGINT AS n_cand,
                   ((1000000 * sum(is_cand)) // count(*))::BIGINT
                     AS cand_ppm
            FROM jb GROUP BY bucket ORDER BY bucket""",
        "auc_roc": """
            WITH p AS (SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS s,
                              (event_type = 'purchase')::BIGINT AS lab
                       FROM events),
            c AS (SELECT s, sum(lab)::BIGINT AS p,
                         sum(1 - lab)::BIGINT AS n
                  FROM p GROUP BY 1),
            cum AS (SELECT s, p, n,
                           coalesce(sum(n) OVER (
                               ORDER BY s ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0) AS cn
                    FROM c)
            SELECT sum(p)::BIGINT AS n_pos, sum(n)::BIGINT AS n_neg,
                   sum(p * (2*cn + n))::BIGINT AS auc_num2,
                   (2 * sum(p) * sum(n))::BIGINT AS auc_den2,
                   ((1000000 * sum(p * (2*cn + n)))
                    // (2 * sum(p) * sum(n)))::BIGINT AS auc_ppm
            FROM cum""",
        "calibration_bins": """
            WITH p AS (SELECT least((CAST(floor(value*100 + 0.5)
                                          AS BIGINT) + 250) // 500,
                                    100) AS cc,
                              (event_type = 'purchase')::BIGINT AS lab
                       FROM events),
            b AS (SELECT least(cc // 10, 9) AS bin,
                         count(*)::BIGINT AS n,
                         sum(lab)::BIGINT AS n_pos,
                         sum(cc)::BIGINT AS conf_sum_c
                  FROM p GROUP BY 1)
            SELECT bin, n, n_pos, conf_sum_c,
                   ((1000000 * n_pos) // n)::BIGINT AS acc_ppm,
                   ((1000000 * conf_sum_c) // (100 * n))::BIGINT
                     AS conf_ppm
            FROM b ORDER BY bin""",
        "ece": """
            WITH p AS (SELECT least((CAST(floor(value*100 + 0.5)
                                          AS BIGINT) + 250) // 500,
                                    100) AS cc,
                              (event_type = 'purchase')::BIGINT AS lab
                       FROM events),
            b AS (SELECT least(cc // 10, 9) AS bin,
                         count(*)::BIGINT AS n,
                         sum(lab)::BIGINT AS n_pos,
                         sum(cc)::BIGINT AS conf_sum_c
                  FROM p GROUP BY 1)
            SELECT sum(n)::BIGINT AS n_total,
                   sum(abs(100*n_pos - conf_sum_c))::BIGINT AS ece_num,
                   (100 * sum(n))::BIGINT AS ece_den,
                   ((1000000 * sum(abs(100*n_pos - conf_sum_c)))
                    // (100 * sum(n)))::BIGINT AS ece_micro
            FROM b""",
        "cusum_change": """
            WITH x AS (SELECT user_id, ts, event_id,
                              CAST(floor(value*100 + 0.5) AS BIGINT) AS v
                       FROM events),
            w AS (SELECT user_id,
                         sum(v) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS c,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS i
                  FROM x),
            t AS (SELECT user_id, count(*)::BIGINT AS n,
                         sum(v)::BIGINT AS total
                  FROM x GROUP BY 1)
            SELECT w.user_id, t.n, t.total,
                   max(abs(t.n * w.c - w.i * t.total))::BIGINT
                     AS cusum_max
            FROM w JOIN t USING (user_id)
            GROUP BY 1, 2, 3 ORDER BY 1""",
        "ndcg10": f"""
            WITH f AS (SELECT doc_id, lang, n_chars,
                              len(regexp_extract_all(text, '[.!,;:?]'))
                                AS n_punct
                       FROM documents),
            g AS (SELECT lang, doc_id,
                         CASE WHEN n_chars >= 450 THEN 2
                              WHEN n_chars >= 300 THEN 1
                              ELSE 0 END AS rel,
                         n_punct
                  FROM f),
            r AS (SELECT lang, rel,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY n_punct DESC,
                                                     doc_id) AS rk
                  FROM g),
            dc AS (SELECT lang,
                          sum(rel * ({_NDCG_DISC_SQL}))::BIGINT
                            AS dcg_micro
                   FROM r WHERE rk <= 10 GROUP BY 1),
            ir AS (SELECT lang, rel,
                          row_number() OVER (PARTITION BY lang
                                             ORDER BY rel DESC) AS rk
                   FROM g),
            idc AS (SELECT lang,
                           sum(rel * ({_NDCG_DISC_SQL}))::BIGINT
                             AS idcg_micro
                    FROM ir WHERE rk <= 10 GROUP BY 1)
            SELECT dc.lang, dc.dcg_micro, idc.idcg_micro,
                   CASE WHEN idc.idcg_micro > 0
                        THEN (1000000 * dc.dcg_micro) // idc.idcg_micro
                        ELSE 0 END::BIGINT AS ndcg_ppm
            FROM dc JOIN idc USING (lang) ORDER BY lang""",
        "mrr": """
            WITH f AS (SELECT doc_id, lang, n_chars,
                              len(regexp_extract_all(text, '[.!,;:?]'))
                                AS n_punct
                       FROM documents),
            r AS (SELECT lang, n_chars,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY n_punct DESC,
                                                     doc_id) AS rk
                  FROM f)
            SELECT lang, min(rk)::BIGINT AS first_rank,
                   (1000000 // min(rk))::BIGINT AS rr_micro
            FROM r WHERE n_chars >= 450
            GROUP BY lang ORDER BY lang""",
        "link_predict": """
            WITH e AS MATERIALIZED (
                SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey
                 AND x.l_suppkey < y.l_suppkey
                WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
            d AS MATERIALIZED (
                SELECT u AS a, v AS b FROM e
                UNION ALL SELECT v, u FROM e),
            deg AS MATERIALIZED (
                SELECT a, count(*)::BIGINT AS dg FROM d GROUP BY 1),
            cn AS (SELECT e.u, e.v, d1.b AS z
                   FROM e
                   JOIN d d1 ON d1.a = e.u
                   JOIN d d2 ON d2.a = e.v AND d2.b = d1.b),
            agg AS (SELECT u, v, count(*)::BIGINT AS cn,
                           sum(1000000 // dz.dg)::BIGINT AS ra_micro
                    FROM cn JOIN deg dz ON dz.a = cn.z
                    GROUP BY 1, 2)
            SELECT e.u, e.v,
                   coalesce(a.cn, 0)::BIGINT AS cn,
                   coalesce(a.ra_micro, 0)::BIGINT AS ra_micro,
                   ((1000000 * coalesce(a.cn, 0))
                    // (du.dg + dv.dg - coalesce(a.cn, 0)))::BIGINT
                     AS jac_ppm
            FROM e
            LEFT JOIN agg a ON a.u = e.u AND a.v = e.v
            JOIN deg du ON du.a = e.u
            JOIN deg dv ON dv.a = e.v
            ORDER BY e.u, e.v""",
        "bloom_sizing": """
            WITH s AS (SELECT source, count(*)::BIGINT AS n
                       FROM documents GROUP BY 1),
            m AS (SELECT source, n,
                         (n * 95851 + 9999) // 10000 AS m_bits
                  FROM s)
            SELECT source, n, m_bits,
                   greatest(1, (m_bits * 693147 + n * 500000)
                               // (n * 1000000))::BIGINT AS k_hashes,
                   ((m_bits + 7) // 8)::BIGINT AS n_bytes
            FROM m ORDER BY source""",
        "shard_plan": """
            WITH h AS (SELECT user_id,
                              ('0x' || substr(md5(user_id::VARCHAR),
                                              1, 8))::BIGINT % 16
                                AS shard
                       FROM events),
            s AS (SELECT shard, count(*)::BIGINT AS n_rows,
                         count(DISTINCT user_id)::BIGINT AS n_keys
                  FROM h GROUP BY 1),
            t AS (SELECT sum(n_rows)::BIGINT AS tot FROM s)
            SELECT shard, n_rows, n_keys,
                   ((1000000 * n_rows * 16) // tot)::BIGINT AS load_ppm
            FROM s, t ORDER BY shard""",
        "two_hop_reach": """
            WITH e AS MATERIALIZED (
                SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey
                 AND x.l_suppkey < y.l_suppkey
                WHERE x.l_quantity >= 48 AND y.l_quantity >= 48),
            d AS MATERIALIZED (
                SELECT u AS a, v AS b FROM e
                UNION ALL SELECT v, u FROM e),
            deg AS (SELECT a, count(*)::BIGINT AS dg FROM d GROUP BY 1),
            r AS (SELECT d1.a AS v, d2.b AS w
                  FROM d d1 JOIN d d2 ON d2.a = d1.b
                  WHERE d2.b != d1.a
                  UNION
                  SELECT a, b FROM d)
            SELECT r.v AS node, deg.dg AS deg,
                   count(*)::BIGINT AS reach2
            FROM r JOIN deg ON deg.a = r.v
            GROUP BY 1, 2 ORDER BY 1""",
        "l_diversity": """
            SELECT lang || '|' || (n_chars // 100)::VARCHAR AS qi,
                   count(*)::BIGINT AS n,
                   count(DISTINCT source)::BIGINT AS n_sensitive
            FROM documents
            GROUP BY 1 HAVING count(DISTINCT source) < 3
            ORDER BY qi""",
        "ab_ztest": """
            WITH c AS (SELECT user_id % 2 AS side,
                              count(*)::BIGINT AS n,
                              sum((event_type = 'purchase')::INT)::BIGINT
                                AS x
                       FROM events GROUP BY 1),
            f AS (SELECT max(CASE WHEN side = 0 THEN n END) AS n_a,
                         max(CASE WHEN side = 0 THEN x END) AS x_a,
                         max(CASE WHEN side = 1 THEN n END) AS n_b,
                         max(CASE WHEN side = 1 THEN x END) AS x_b
                  FROM c)
            SELECT n_a::BIGINT AS n_a, x_a::BIGINT AS x_a,
                   n_b::BIGINT AS n_b, x_b::BIGINT AS x_b,
                   ((1000000::HUGEINT
                     * (x_a::HUGEINT*n_b - x_b::HUGEINT*n_a)
                     * (x_a::HUGEINT*n_b - x_b::HUGEINT*n_a)
                     * (n_a + n_b))
                    // (n_a::HUGEINT * n_b * (x_a + x_b)
                        * (n_a + n_b - x_a - x_b)))::BIGINT AS z2_ppm
            FROM f""",
        "simpson_diversity": """
            WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
                       FROM documents GROUP BY 1, 2),
            s AS (SELECT source, sum(n)::BIGINT AS n,
                         sum(n * (n - 1))::BIGINT AS num
                  FROM c GROUP BY 1)
            SELECT source, n,
                   CASE WHEN n > 1
                        THEN (1000000 * num) // (n * (n - 1))
                        ELSE 0 END::BIGINT AS simpson_ppm
            FROM s ORDER BY source""",
        "fano_factor": """
            WITH g AS (SELECT user_id,
                              (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id)) // 1000000
                                AS gap
                       FROM events),
            r AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
                         sum(gap)::BIGINT AS sg,
                         sum(gap * gap)::BIGINT AS sgg
                  FROM g WHERE gap IS NOT NULL GROUP BY 1)
            SELECT user_id, n_gaps,
                   (n_gaps * sgg - sg * sg)::BIGINT AS fano_num,
                   (n_gaps * sg)::BIGINT AS fano_den
            FROM r ORDER BY user_id""",
        "event_autocorr": """
            WITH c0 AS (SELECT event_type,
                               epoch_us(ts) // 3600000000 AS hour,
                               count(*)::BIGINT AS n
                        FROM events GROUP BY 1, 2),
            spans AS (SELECT event_type, min(hour) AS lo,
                             max(hour) AS hi
                      FROM c0 GROUP BY 1),
            grid AS (SELECT event_type,
                            unnest(generate_series(lo, hi)) AS hour
                     FROM spans),
            c AS (SELECT grid.event_type, grid.hour,
                         coalesce(c0.n, 0)::BIGINT AS n
                  FROM grid LEFT JOIN c0 USING (event_type, hour)),
            lagd AS (SELECT event_type, hour, n,
                            lag(n) OVER (PARTITION BY event_type
                                         ORDER BY hour) AS pn
                     FROM c),
            agg AS (SELECT event_type,
                           count(*)::BIGINT AS n_hours,
                           sum(n)::BIGINT AS s,
                           sum(n * n)::BIGINT AS sq,
                           sum(CASE WHEN pn IS NOT NULL
                                    THEN pn * n ELSE 0 END)::BIGINT AS a,
                           min(hour) AS lo, max(hour) AS hi
                    FROM lagd GROUP BY 1),
            ends AS (SELECT a1.event_type,
                            c1.n AS c_first, c2.n AS c_last
                     FROM agg a1
                     JOIN c c1 ON c1.event_type = a1.event_type
                               AND c1.hour = a1.lo
                     JOIN c c2 ON c2.event_type = a1.event_type
                               AND c2.hour = a1.hi)
            SELECT agg.event_type, agg.n_hours,
                   (agg.n_hours * agg.n_hours * agg.a
                    - agg.n_hours * agg.s
                      * (2 * agg.s - ends.c_first - ends.c_last)
                    + (agg.n_hours - 1) * agg.s * agg.s)::BIGINT
                     AS r1_num,
                   (agg.n_hours * agg.n_hours * agg.sq
                    - agg.n_hours * agg.s * agg.s)::BIGINT AS r1_den
            FROM agg JOIN ends USING (event_type)
            ORDER BY event_type""",
        "markov_entropy": """
            WITH t AS (SELECT user_id, event_type,
                              lag(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
                       FROM events),
            cij AS (SELECT prev AS from_val, event_type AS to_val,
                           count(*)::BIGINT AS n
                    FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
            ci AS (SELECT from_val, sum(n)::BIGINT AS c_i
                   FROM cij GROUP BY 1)
            SELECT cij.from_val, ci.c_i,
                   sum(cij.n * CAST(floor(1000000 * ln(
                       ci.c_i::DOUBLE / cij.n) + 0.5) AS BIGINT)
                       )::BIGINT AS h_micro
            FROM cij JOIN ci USING (from_val)
            GROUP BY 1, 2 ORDER BY 1""",
        "seasonality_chi2": """
            WITH c0 AS (SELECT event_type,
                               (epoch_us(ts) // 3600000000) % 24 AS hod,
                               count(*)::BIGINT AS n
                        FROM events GROUP BY 1, 2),
            grid AS (SELECT t.event_type, g.hod
                     FROM (SELECT DISTINCT event_type FROM events) t,
                          (SELECT unnest(generate_series(0, 23))
                             AS hod) g),
            c AS (SELECT grid.event_type, grid.hod,
                         coalesce(c0.n, 0)::BIGINT AS n
                  FROM grid LEFT JOIN c0 USING (event_type, hod)),
            tot AS (SELECT event_type, sum(n)::BIGINT AS nn
                    FROM c GROUP BY 1),
            agg AS (SELECT c.event_type, t.nn AS n,
                           sum((24 * c.n - t.nn)
                               * (24 * c.n - t.nn))::BIGINT AS num
                    FROM c JOIN tot t USING (event_type)
                    GROUP BY 1, 2)
            SELECT event_type, n, num AS chi2_num,
                   (24 * n)::BIGINT AS chi2_den,
                   ((1000000 * num) // (24 * n))::BIGINT AS chi2_ppm
            FROM agg ORDER BY event_type""",
        "ttr": r"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '\S+'))
                                AS token
                       FROM documents)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   count(DISTINCT token)::BIGINT AS n_types,
                   ((1000000 * count(DISTINCT token))
                    // count(*))::BIGINT AS ttr_ppm
            FROM t GROUP BY doc_id ORDER BY doc_id""",
        "readability": r"""
            WITH c AS (SELECT doc_id,
                              len(regexp_extract_all(text, '\S+'))
                                ::BIGINT AS w,
                              len(regexp_extract_all(text, '[.!?]+'))
                                ::BIGINT AS s,
                              len(regexp_extract_all(
                                  text, '[aeiouyAEIOUY]+'))::BIGINT AS v
                       FROM documents)
            SELECT doc_id, w AS n_words, s AS n_sents, v AS n_syll,
                   (206835 - (1015 * w) // greatest(s, 1)
                           - (84600 * v) // greatest(w, 1))::BIGINT
                     AS flesch_milli
            FROM c ORDER BY doc_id""",
        "image_meta": r"""
            WITH d AS (SELECT ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt
                  FROM d)
            SELECT fmt, w, h, count(*)::BIGINT AS n,
                   sum(w * h * 3)::BIGINT AS px_total
            FROM m GROUP BY fmt, w, h ORDER BY fmt, w, h""",
        "image_aspect_card": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::DOUBLE AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::DOUBLE AS h
                  FROM d),
            b(bucket_ppm) AS (VALUES (500000), (750000), (1000000),
                                     (1333333), (2000000)),
            scored AS (SELECT doc_id, bucket_ppm, w / h AS a,
                              bucket_ppm / 1e6 AS c,
                              row_number() OVER (PARTITION BY doc_id
                                  ORDER BY abs(ln(w / h)
                                      - ln(bucket_ppm / 1e6)),
                                      bucket_ppm) AS rn
                       FROM m CROSS JOIN b),
            pick AS (SELECT bucket_ppm,
                            round((1.0 - least(a, c) / greatest(a, c))
                                  * 1e6)::BIGINT AS waste_ppm
                     FROM scored WHERE rn = 1)
            SELECT bucket_ppm::BIGINT AS bucket_ppm,
                   count(*)::BIGINT AS n,
                   sum(waste_ppm)::BIGINT AS waste_ppm_sum
            FROM pick GROUP BY bucket_ppm ORDER BY bucket_ppm""",
        "phash_keeper_best": r"""
            WITH RECURSIVE p AS (
                SELECT CAST(doc_id AS VARCHAR) AS image_id,
                       xor(('0x'||substr(md5('ph:'||
                             CAST(doc_id // 4 AS VARCHAR)),1,16))
                             ::UBIGINT,
                           (CASE doc_id % 4 WHEN 1 THEN 32
                                 WHEN 2 THEN 32 WHEN 3 THEN 524288
                                 ELSE 0 END)::UBIGINT) AS ph,
                       ('0x'||substr(md5('img:'||
                          CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                FROM documents),
            m AS (SELECT image_id, ph,
                         (CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                               WHEN 2 THEN 64 WHEN 3 THEN 40
                               WHEN 4 THEN 56 ELSE 80 END
                          * CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                                WHEN 2 THEN 48 WHEN 3 THEN 40
                                WHEN 4 THEN 42 ELSE 60 END)::BIGINT AS area
                  FROM p),
            s AS (SELECT DISTINCT ph FROM m),
            se AS (SELECT a.ph AS pa, b.ph AS pb
                   FROM s a JOIN s b ON a.ph < b.ph
                   WHERE bit_count(xor(a.ph, b.ph)) <= 2),
            edges AS (SELECT pa AS a, pb AS b FROM se
                      UNION ALL SELECT pb, pa FROM se),
            reach AS (SELECT ph AS id, ph AS comp FROM s
                      UNION
                      SELECT e.b AS id, r.comp
                      FROM reach r JOIN edges e ON e.a = r.id),
            compm AS (SELECT id AS ph, min(comp) AS comp
                      FROM reach GROUP BY id),
            mem AS (SELECT m.image_id, m.ph, m.area, c.comp
                    FROM m JOIN compm c ON c.ph = m.ph),
            best AS (SELECT comp, image_id AS keeper FROM (
                       SELECT comp, image_id,
                              row_number() OVER (PARTITION BY comp
                                ORDER BY area DESC, image_id ASC) AS rn
                       FROM mem) WHERE rn = 1)
            SELECT mem.image_id, best.keeper AS keeper_image_id,
                   (mem.image_id = best.keeper) AS keep
            FROM mem JOIN best USING (comp)
            ORDER BY mem.image_id""",
        "phash_pairs": r"""
            WITH p AS (SELECT doc_id,
                              xor(('0x'||substr(md5('ph:'||
                                    CAST(doc_id // 4 AS VARCHAR)),1,16))
                                    ::UBIGINT,
                                  (CASE doc_id % 4 WHEN 1 THEN 32
                                        WHEN 2 THEN 32 WHEN 3 THEN 524288
                                        ELSE 0 END)::UBIGINT) AS ph
                       FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   bit_count(xor(a.ph, b.ph))::INT AS hamming
            FROM p a JOIN p b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.ph, b.ph)) <= 2
            ORDER BY a, b""",
        "image_decode_parity": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id, u,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt,
                         (1 + u % 5) AS s5, (1 + (u >> 4) % 7) AS s7,
                         (u & 4294967295::UBIGINT) AS s32,
                         (u % 256) AS s256
                  FROM d),
            px AS (SELECT m.doc_id, m.w, m.h, m.fmt, m.s5, m.s7, m.s256,
                          gx.x::UBIGINT AS x, gy.y::UBIGINT AS y,
                          ((xor(xor((gx.x::UBIGINT * 2654435761::UBIGINT)
                                      % 4294967296::UBIGINT,
                                    gy.y::UBIGINT * 40503::UBIGINT),
                                gc.c::UBIGINT * 69069::UBIGINT)
                            + m.s32) % 4294967296::UBIGINT) AS n1
                   FROM m, generate_series(0, 79) gx(x),
                        generate_series(0, 59) gy(y),
                        generate_series(0, 2) gc(c)
                   WHERE gx.x < m.w AND gy.y < m.h),
            v AS (SELECT doc_id, w, h, fmt,
                         ((xor(n1, n1 >> 13) & 63::UBIGINT)
                          + x * s5 + y * s7 + s256) % 256::UBIGINT AS val
                  FROM px)
            SELECT doc_id, w, h, fmt,
                   sum(CASE WHEN fmt = 'qimg' THEN (val // 8) * 8 + 4
                            ELSE val END)::BIGINT AS px_sum
            FROM v GROUP BY doc_id, w, h, fmt ORDER BY doc_id""",
        "thumb_parity": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id, u,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt,
                         (1 + u % 5) AS s5, (1 + (u >> 4) % 7) AS s7,
                         (u & 4294967295::UBIGINT) AS s32,
                         (u % 256) AS s256
                  FROM d),
            sm AS (SELECT m.doc_id, m.fmt, m.s5, m.s7, m.s32, m.s256,
                          ((gy.ty * m.h) // 12)::UBIGINT AS y,
                          ((gx.tx * m.w) // 16)::UBIGINT AS x
                   FROM m, generate_series(0, 15) gx(tx),
                        generate_series(0, 11) gy(ty)),
            px AS (SELECT doc_id, fmt, s5, s7, s256, x, y,
                          ((xor(xor((x * 2654435761::UBIGINT)
                                      % 4294967296::UBIGINT,
                                    y * 40503::UBIGINT),
                                gc.c::UBIGINT * 69069::UBIGINT)
                            + s32) % 4294967296::UBIGINT) AS n1
                   FROM sm, generate_series(0, 2) gc(c)),
            v AS (SELECT doc_id, fmt,
                         ((xor(n1, n1 >> 13) & 63::UBIGINT)
                          + x * s5 + y * s7 + s256) % 256::UBIGINT AS val
                  FROM px)
            SELECT doc_id, fmt,
                   sum(CASE WHEN fmt = 'qimg' THEN (val // 8) * 8 + 4
                            ELSE val END)::BIGINT AS thumb_sum
            FROM v GROUP BY doc_id, fmt ORDER BY doc_id""",
        "image_gate": r"""
            WITH d AS (SELECT doc_id, text,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt,
                         len(regexp_extract_all(substr(text, 1, 64),
                             '\S+'))::BIGINT AS cap_tokens
                  FROM d)
            SELECT doc_id, w, h, fmt, cap_tokens,
                   (least(w, h) >= 32
                    AND greatest(w * 100 // h, h * 100 // w) <= 140
                    AND cap_tokens >= 5) AS keep,
                   CASE WHEN least(w, h) < 32 THEN 'small'
                        WHEN greatest(w * 100 // h, h * 100 // w) > 140
                          THEN 'aspect'
                        WHEN cap_tokens < 5 THEN 'caption'
                        ELSE 'ok' END AS reason
            FROM m ORDER BY doc_id""",
        "slot_load_audit": r"""
            SELECT 'host-' || (user_id % 20) AS host,
                   count(*)::BIGINT AS dispatched,
                   sum(CASE WHEN event_id % 3 = 0 THEN 1
                            ELSE 0 END)::BIGINT AS completed,
                   (count(*) - sum(CASE WHEN event_id % 3 = 0 THEN 1
                                        ELSE 0 END))::BIGINT AS active,
                   ((count(*) - sum(CASE WHEN event_id % 3 = 0 THEN 1
                                         ELSE 0 END)) / 2.0 > 5.0)
                     AS overused
            FROM events GROUP BY host ORDER BY host""",
        "robots_gate_audit": r"""
            SELECT doc_id,
                   NOT starts_with(CAST(doc_id AS VARCHAR),
                                   CAST(doc_id % 10 AS VARCHAR))
                     AS allowed,
                   (('0x'||substr(md5('img:'||CAST(doc_id AS VARCHAR)),
                       1,16))::UBIGINT % 5)::BIGINT AS crawl_delay
            FROM documents ORDER BY doc_id""",
        "channel_histogram": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id, u,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt,
                         (1 + u % 5) AS s5, (1 + (u >> 4) % 7) AS s7,
                         (u & 4294967295::UBIGINT) AS s32,
                         (u % 256) AS s256
                  FROM d),
            px AS (SELECT m.fmt, m.s5, m.s7, m.s256,
                          gx.x::UBIGINT AS x, gy.y::UBIGINT AS y,
                          gc.c::BIGINT AS channel,
                          ((xor(xor((gx.x::UBIGINT * 2654435761::UBIGINT)
                                      % 4294967296::UBIGINT,
                                    gy.y::UBIGINT * 40503::UBIGINT),
                                gc.c::UBIGINT * 69069::UBIGINT)
                            + m.s32) % 4294967296::UBIGINT) AS n1
                   FROM m, generate_series(0, 79) gx(x),
                        generate_series(0, 59) gy(y),
                        generate_series(0, 2) gc(c)
                   WHERE gx.x < m.w AND gy.y < m.h),
            v AS (SELECT channel,
                         (CASE WHEN fmt = 'qimg'
                               THEN ((((xor(n1, n1 >> 13) & 63::UBIGINT)
                                       + x * s5 + y * s7 + s256)
                                      % 256::UBIGINT) // 8) * 8 + 4
                               ELSE ((xor(n1, n1 >> 13) & 63::UBIGINT)
                                     + x * s5 + y * s7 + s256)
                                    % 256::UBIGINT END)::BIGINT AS val
                  FROM px)
            SELECT channel, (val // 16)::BIGINT AS bin,
                   count(*)::BIGINT AS n_px
            FROM v GROUP BY channel, bin ORDER BY channel, bin""",
        "image_sharpness": _image_sharpness_oracle(),
        "image_luma": _image_luma_oracle(),
        "image_color_cast": _image_color_cast_oracle(),
        "image_grad_orientation": _image_grad_orientation_oracle(),
        "image_clipping": _image_clipping_oracle(),
        "image_blockiness": _image_blockiness_oracle(),
        "image_border_energy": _image_border_energy_oracle(),
        "image_palette": _image_palette_oracle(),
        "caption_alignment": _caption_alignment_oracle(),
        "audio_features": _audio_features_oracle(),
        "video_motion": _video_motion_oracle(),
        "audio_silence": _audio_silence_oracle(),
        "video_flicker": _video_flicker_oracle(),
        "audio_clipping": _audio_clipping_oracle(),
        "image_channel_corr": _image_channel_corr_oracle(),
        "video_scene_cuts": _video_scene_cuts_oracle(),
        "line_length_stats": r"""
            WITH l AS (SELECT doc_id,
                              unnest(string_split(text, chr(10))) AS ln
                       FROM documents)
            SELECT doc_id, count(*)::BIGINT AS n_lines,
                   sum(len(ln))::BIGINT AS total_len,
                   max(len(ln))::BIGINT AS max_line_len,
                   (sum(len(ln)) // count(*))::BIGINT AS mean_line_len,
                   (max(len(ln)) >= 120) AS long_line
            FROM l GROUP BY doc_id ORDER BY doc_id""",
        "char_class_profile": r"""
            WITH p AS (SELECT doc_id, len(text)::BIGINT AS n_chars,
                   len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT
                     AS n_alpha,
                   len(regexp_extract_all(text, '[0-9]'))::BIGINT
                     AS n_digit,
                   len(regexp_extract_all(text, '\s'))::BIGINT AS n_space
            FROM documents)
            SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
                   (n_chars - n_alpha - n_digit - n_space)::BIGINT
                     AS n_other,
                   CASE WHEN n_chars > 0
                        THEN 1000000 * n_alpha // greatest(n_chars, 1)
                        ELSE 0 END::BIGINT AS alpha_ppm,
                   (CASE WHEN n_chars > 0
                         THEN 1000000 * n_alpha // greatest(n_chars, 1)
                         ELSE 0 END >= 500000) AS natural
            FROM p ORDER BY doc_id""",
        "gopher_rules": r"""
            WITH l AS (SELECT doc_id,
                              unnest(string_split(text, chr(10))) AS ln
                       FROM documents),
            agg AS (SELECT doc_id, count(*)::BIGINT AS n_lines,
                           sum(CASE WHEN starts_with(ln, '- ')
                                      OR starts_with(ln, '* ')
                                      OR starts_with(ln, '• ')
                                    THEN 1 ELSE 0 END)::BIGINT AS n_bullet,
                           sum(CASE WHEN ends_with(ln, '...')
                                    THEN 1 ELSE 0 END)::BIGINT AS n_ell
                    FROM l GROUP BY doc_id),
            w AS (SELECT doc_id,
                         len(regexp_extract_all(text, '\S+'))::BIGINT
                           AS n_words,
                         (len(regexp_extract_all(text, '#'))
                          + len(regexp_extract_all(text, '\.\.\.')))
                           ::BIGINT AS n_sym
                  FROM documents),
            j AS (SELECT a.doc_id, a.n_lines,
                         (1000000 * a.n_bullet // a.n_lines)::BIGINT
                           AS bullet_ppm,
                         (1000000 * a.n_ell // a.n_lines)::BIGINT
                           AS ellipsis_ppm,
                         CASE WHEN w.n_words > 0
                              THEN 1000000 * w.n_sym
                                   // greatest(w.n_words, 1)
                              ELSE 0 END::BIGINT AS symbol_ppm
                  FROM agg a JOIN w ON w.doc_id = a.doc_id)
            SELECT doc_id, n_lines, bullet_ppm, ellipsis_ppm, symbol_ppm,
                   (bullet_ppm > 900000 OR ellipsis_ppm > 300000
                    OR symbol_ppm > 100000) AS flagged
            FROM j ORDER BY doc_id""",
        "control_char_gate": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[\x00-\x08\x0b\x0c\x0e-\x1f]'))::BIGINT AS n_ctrl,
                   (len(regexp_extract_all(text,
                       '[\x00-\x08\x0b\x0c\x0e-\x1f]')) = 0) AS clean
            FROM documents ORDER BY doc_id""",
        "line_dedup": r"""
            WITH l AS (SELECT doc_id, source,
                              unnest(string_split(text, chr(10))) AS ln
                       FROM documents),
            nz AS (SELECT doc_id, source, ln FROM l WHERE len(ln) > 0),
            boiler AS (SELECT source, ln
                       FROM (SELECT DISTINCT doc_id, source, ln FROM nz)
                       GROUP BY source, ln HAVING count(*) >= 3),
            agg AS (SELECT nz.doc_id,
                           count(*)::BIGINT AS n_lines,
                           sum(CASE WHEN b.ln IS NOT NULL
                                    THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
                           sum(CASE WHEN b.ln IS NULL
                                    THEN len(nz.ln) ELSE 0 END)::BIGINT
                             AS kept_chars
                    FROM nz LEFT JOIN boiler b
                      ON b.source = nz.source AND b.ln = nz.ln
                    GROUP BY nz.doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_lines, 0)::BIGINT AS n_lines,
                   coalesce(a.n_boiler, 0)::BIGINT AS n_boiler,
                   coalesce(a.kept_chars, 0)::BIGINT AS kept_chars,
                   CASE WHEN coalesce(a.n_lines, 0) > 0
                        THEN 1000000 * a.n_boiler // a.n_lines
                        ELSE 0 END::BIGINT AS boiler_ppm,
                   (CASE WHEN coalesce(a.n_lines, 0) > 0
                         THEN 1000000 * a.n_boiler // a.n_lines
                         ELSE 0 END > 300000) AS flagged
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id""",
        "embedding_dim_census": r"""
            WITH e AS (SELECT embedding AS l FROM embeddings),
            c AS (SELECT i - 1 AS dim,
                         floor(l[i]::DOUBLE * 1048576)::BIGINT AS q
                  FROM e, LATERAL unnest(generate_series(1, len(l)))
                    AS t(i))
            SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n,
                   sum(q)::BIGINT AS sum_q,
                   sum(q * q)::BIGINT AS sum_q2,
                   sum(CASE WHEN q = 0 THEN 1 ELSE 0 END)::BIGINT
                     AS n_zero
            FROM c GROUP BY dim ORDER BY dim""",
        "cluster_separation": r"""
            WITH f AS (SELECT label::BIGINT AS label, i - 1 AS dim,
                              floor(embedding[i]::DOUBLE
                                    * 1048576)::BIGINT AS q
                       FROM embeddings, LATERAL unnest(
                           generate_series(1, len(embedding))) AS t(i)),
            nn AS (SELECT label::BIGINT AS label, count(*)::HUGEINT AS n
                   FROM embeddings GROUP BY 1),
            ssq AS (SELECT label, sum(q::HUGEINT * q)::HUGEINT AS ss
                    FROM f GROUP BY label),
            sd AS (SELECT label, dim, sum(q)::HUGEINT AS s
                   FROM f GROUP BY label, dim),
            hs AS (SELECT label, sum(s * s)::HUGEINT AS h
                   FROM sd GROUP BY label),
            w AS (SELECT nn.label, nn.n, (nn.n * ssq.ss - hs.h) AS w
                  FROM nn JOIN ssq USING (label) JOIN hs USING (label)),
            pd AS (SELECT sa.label AS la, sb.label AS lb,
                          sum((nb.n * sa.s - na.n * sb.s)
                              * (nb.n * sa.s - na.n * sb.s)) AS d2
                   FROM sd sa
                   JOIN sd sb ON sa.dim = sb.dim AND sa.label < sb.label
                   JOIN nn na ON na.label = sa.label
                   JOIN nn nb ON nb.label = sb.label
                   GROUP BY sa.label, sb.label)
            SELECT pd.la::BIGINT AS label_a, pd.lb::BIGINT AS label_b,
                   wa.n::BIGINT AS n_a, wb.n::BIGINT AS n_b,
                   CASE WHEN (wa.w * wb.n * wb.n + wb.w * wa.n * wa.n) > 0
                        THEN ((1000000 * pd.d2)
                              // (wa.w * wb.n * wb.n
                                  + wb.w * wa.n * wa.n))::BIGINT
                        ELSE -1 END AS sep_ppm
            FROM pd JOIN w wa ON wa.label = pd.la
                    JOIN w wb ON wb.label = pd.lb
            ORDER BY label_a, label_b""",
        "embedding_norm_census": r"""
            WITH q AS (SELECT label::BIGINT AS label,
                              list_sum(list_transform(embedding,
                                  y -> (floor(y::DOUBLE * 1048576)::BIGINT
                                        * floor(y::DOUBLE
                                                * 1048576)::BIGINT)))
                                ::BIGINT AS norm2
                       FROM embeddings)
            SELECT label, count(*)::BIGINT AS n_vecs,
                   sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END)::BIGINT
                     AS n_zero,
                   min(norm2)::BIGINT AS min_norm2,
                   max(norm2)::BIGINT AS max_norm2,
                   (sum(norm2) // count(*))::BIGINT AS mean_norm2
            FROM q GROUP BY label ORDER BY label""",
        "url_depth_census": r"""
            WITH u AS (SELECT 'http://h' || (doc_id % 64) || '.test'
                              || repeat('/seg', (1 + doc_id % 6)::INT)
                              || '/p' || doc_id AS url
                       FROM documents),
            p AS (SELECT string_split(url, '/')[3] AS host,
                         (len(string_split(url, '/')) - 3)::BIGINT
                           AS depth
                  FROM u)
            SELECT host, count(*)::BIGINT AS n_urls,
                   max(depth)::BIGINT AS max_depth,
                   (sum(depth) // count(*))::BIGINT AS mean_depth,
                   (1000000 * sum(CASE WHEN depth >= 6 THEN 1 ELSE 0 END)
                    // count(*))::BIGINT AS deep_ppm
            FROM p GROUP BY host ORDER BY host""",
        "source_lang_mi": """
            WITH c AS (SELECT source, lang, count(*)::BIGINT AS n_sl
                       FROM documents GROUP BY source, lang),
            m AS (SELECT c.source, c.lang, c.n_sl,
                         sum(c.n_sl) OVER (PARTITION BY c.source)
                           ::BIGINT AS n_source,
                         sum(c.n_sl) OVER (PARTITION BY c.lang)
                           ::BIGINT AS n_lang,
                         sum(c.n_sl) OVER ()::BIGINT AS n
                  FROM c)
            SELECT source, lang, n_sl, n_source, n_lang,
                   CAST(floor(1000000.0
                              * (n_sl::DOUBLE / n::DOUBLE)
                              * ln(n_sl::DOUBLE * n::DOUBLE
                                   / (n_source::DOUBLE
                                      * n_lang::DOUBLE))
                              + 0.5) AS BIGINT) AS mi_term_micro
            FROM m ORDER BY source, lang""",
        "brier_score": """
            WITH p AS (SELECT least((CAST(floor(value*100 + 0.5)
                                          AS BIGINT) + 250) // 500,
                                    100) AS cc,
                              (event_type = 'purchase')::BIGINT AS lab
                       FROM events)
            SELECT count(*)::BIGINT AS n,
                   sum(lab)::BIGINT AS n_pos,
                   sum((cc - 100*lab)*(cc - 100*lab))::BIGINT AS sum_se,
                   (100 * sum((cc - 100*lab)*(cc - 100*lab))
                    // count(*))::BIGINT AS brier_micro
            FROM p""",
        "gopher_word_rules": r"""
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(text, '\S+') AS l
                          FROM documents),
            w AS (SELECT doc_id, unnest(l) AS tok FROM toks),
            agg AS (SELECT doc_id, count(*)::BIGINT AS n_words,
                           (1000 * sum(len(tok)) // count(*))::BIGINT
                             AS mean_word_len_milli,
                           sum(CASE WHEN tok IN ('the','of','and','to',
                                'in','a','be','that','have','it')
                               THEN 1 ELSE 0 END)::BIGINT AS n_stop
                    FROM w GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_words, 0)::BIGINT AS n_words,
                   coalesce(a.mean_word_len_milli, 0)::BIGINT
                     AS mean_word_len_milli,
                   coalesce(a.n_stop, 0)::BIGINT AS n_stop,
                   (coalesce(a.n_words, 0) BETWEEN 50 AND 100000)
                     AS word_gate,
                   (coalesce(a.mean_word_len_milli, 0)
                      BETWEEN 3000 AND 10000) AS len_gate,
                   (coalesce(a.n_stop, 0) >= 2) AS stop_gate,
                   ((coalesce(a.n_words, 0) BETWEEN 50 AND 100000)
                    AND (coalesce(a.mean_word_len_milli, 0)
                         BETWEEN 3000 AND 10000)
                    AND coalesce(a.n_stop, 0) >= 2) AS passes
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id""",
        "prefix_dup": r"""
            SELECT substring(text, 1, 64) AS prefix,
                   count(*)::BIGINT AS n_docs,
                   min(doc_id)::BIGINT AS keeper
            FROM documents
            GROUP BY prefix HAVING count(*) >= 2
            ORDER BY prefix""",
        "template_3gram": r"""
            WITH toks AS (SELECT source,
                                 regexp_extract_all(text, '\S+') AS l
                          FROM documents),
            tri AS (SELECT source,
                           l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
                    FROM toks,
                         LATERAL unnest(generate_series(1, len(l)-2))
                           AS t(i)),
            cnt AS (SELECT source, g, count(*)::BIGINT AS cnt
                    FROM tri GROUP BY source, g),
            tot AS (SELECT source, count(*)::BIGINT AS n_grams
                    FROM tri GROUP BY source),
            top AS (SELECT source, g AS top_gram, cnt,
                           row_number() OVER (PARTITION BY source
                               ORDER BY cnt DESC, g) AS rn
                    FROM cnt)
            SELECT t.source, t.top_gram, t.cnt, o.n_grams,
                   (1000000 * t.cnt // o.n_grams)::BIGINT AS share_ppm
            FROM top t JOIN tot o USING (source)
            WHERE rn = 1 ORDER BY t.source""",
        "knn_classify": """
            WITH nn AS (
              SELECT query_id, e_label FROM (
                SELECT q.vec_id AS query_id, e.label AS e_label,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY round(list_cosine_similarity(
                             e.embedding::DOUBLE[],
                             q.embedding::DOUBLE[]), 9) DESC,
                           e.vec_id) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id >= 50) e,
                     (SELECT * FROM embeddings WHERE vec_id < 50) q)
              WHERE rank <= 5),
            votes AS (SELECT query_id, e_label, count(*)::BIGINT AS n,
                             row_number() OVER (PARTITION BY query_id
                               ORDER BY count(*) DESC, e_label) AS vr
                      FROM nn GROUP BY query_id, e_label),
            win AS (SELECT query_id, e_label, n FROM votes WHERE vr = 1)
            SELECT w.query_id::BIGINT AS query_id,
                   q.label::BIGINT AS true_label,
                   w.e_label::BIGINT AS pred_label,
                   w.n AS n_votes,
                   (q.label = w.e_label) AS correct
            FROM win w JOIN embeddings q ON q.vec_id = w.query_id
            ORDER BY query_id""",
        "anchor_text_census": r"""
            WITH w(i, word) AS (VALUES (0,'home'),(1,'next'),(2,'buy'),
                 (3,'photo'),(4,'read'),(5,'more'),(6,'login'),
                 (7,'download')),
            d AS (SELECT doc_id,
                         ('0x'||substr(md5('lnk:'||
                            CAST(doc_id AS VARCHAR)),1,16))::UBIGINT AS u
                  FROM documents),
            l1 AS (SELECT (u % 499)::BIGINT AS target,
                          wa.word || ' ' || wb.word AS anchor
                   FROM d JOIN w wa ON wa.i = ((u >> 8) % 8)::INT
                          JOIN w wb ON wb.i = ((u >> 16) % 8)::INT),
            l2 AS (SELECT ((u >> 24) % 499)::BIGINT AS target,
                          wc.word AS anchor
                   FROM d JOIN w wc ON wc.i = ((u >> 32) % 8)::INT),
            links AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2),
            tok AS (SELECT target,
                           unnest(string_split(anchor, ' ')) AS token
                    FROM links)
            SELECT target, token, count(*)::BIGINT AS n
            FROM tok GROUP BY 1, 2 ORDER BY target, token""",
        "group_p95": """
            SELECT event_type, count(*)::BIGINT AS n,
                   quantile_disc(value, 0.95) AS p95_value
            FROM events GROUP BY 1 ORDER BY event_type""",
        "top_user_share": """
            WITH m AS (SELECT user_id,
                              sum(CAST(round(value * 1000000) AS BIGINT))
                                ::BIGINT AS micro
                       FROM events GROUP BY 1),
            t AS (SELECT micro FROM m
                  ORDER BY micro DESC, user_id LIMIT 10),
            s AS (SELECT sum(micro)::BIGINT AS top_micro,
                         count(*)::BIGINT AS top_users FROM t),
            g AS (SELECT sum(CAST(round(value * 1000000) AS BIGINT))
                           ::BIGINT AS total_micro FROM events)
            SELECT s.top_users, s.top_micro, g.total_micro,
                   (1000000 * s.top_micro // g.total_micro)::BIGINT
                     AS share_ppm
            FROM s CROSS JOIN g""",
        "subnet_load_rollup": r"""
            WITH c AS (SELECT 'host-' || CAST(doc_id % 96 AS VARCHAR)
                              || '.test' AS host,
                              count(*)::BIGINT AS pages
                       FROM documents GROUP BY 1),
            m AS (SELECT host, pages,
                         ('0x'||substr(md5('ip:'||host),1,16))::UBIGINT
                           AS u
                  FROM c),
            s AS (SELECT '10.' || CAST(u % 16 AS VARCHAR) || '.'
                         || CAST((u >> 4) % 8 AS VARCHAR) || '.0/24'
                           AS subnet,
                         host, pages
                  FROM m)
            SELECT subnet, count(*)::BIGINT AS n_hosts,
                   sum(pages)::BIGINT AS pages,
                   max(pages)::BIGINT AS max_host_pages,
                   (1000000 * max(pages) // sum(pages))::BIGINT
                     AS hot_share_ppm
            FROM s GROUP BY 1 ORDER BY subnet""",
        "burst_rate": """
            WITH b AS (SELECT user_id,
                              count(*) OVER (PARTITION BY user_id
                                ORDER BY ts RANGE BETWEEN CURRENT ROW
                                AND INTERVAL 1 HOUR FOLLOWING) AS c
                       FROM events)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   max(c)::BIGINT AS burst
            FROM b GROUP BY 1 ORDER BY user_id""",
        "robots_precedence_audit": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('rp:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                % 10 AS rd
                       FROM documents)
            SELECT doc_id, rd::BIGINT AS rule_digit,
                   (NOT starts_with(CAST(doc_id AS VARCHAR),
                                    CAST(rd AS VARCHAR))
                    OR starts_with(CAST(doc_id AS VARCHAR),
                                   CAST(rd AS VARCHAR) || '1'))
                     AS allowed
            FROM d ORDER BY doc_id""",
        "crawl_eta_plan": r"""
            WITH c AS (SELECT 'host-' || CAST(doc_id % 20 AS VARCHAR)
                              || '.test' AS host,
                              count(*)::BIGINT AS pages
                       FROM documents GROUP BY 1),
            m AS (SELECT host, pages,
                         ('0x'||substr(md5('host:'||host),1,16))::UBIGINT
                           AS u
                  FROM c),
            p AS (SELECT host, pages,
                         (1 + u % 5)::BIGINT AS crawl_delay_s,
                         (1 + (u >> 3) % 4)::BIGINT AS slots
                  FROM m)
            SELECT host, pages, crawl_delay_s, slots,
                   greatest(pages * crawl_delay_s,
                            (pages + slots - 1) // slots)::BIGINT AS eta_s,
                   CASE WHEN pages * crawl_delay_s
                             >= (pages + slots - 1) // slots
                        THEN 'politeness' ELSE 'budget' END AS binding
            FROM p ORDER BY host""",
        "phash_dup_locality": r"""
            WITH p AS (SELECT doc_id,
                              xor(('0x'||substr(md5('ph:'||
                                    CAST(doc_id // 4 AS VARCHAR)),1,16))
                                    ::UBIGINT,
                                  (CASE doc_id % 4 WHEN 1 THEN 32
                                        WHEN 2 THEN 32 WHEN 3 THEN 524288
                                        ELSE 0 END)::UBIGINT) AS ph
                       FROM documents),
            pr AS (SELECT a.doc_id AS a, b.doc_id AS b
                   FROM p a JOIN p b ON a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.ph, b.ph)) <= 2),
            s AS (SELECT da.source AS sa, db.source AS sb
                  FROM pr JOIN documents da ON da.doc_id = pr.a
                          JOIN documents db ON db.doc_id = pr.b)
            SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
                   (sa = sb) AS same_source, count(*)::BIGINT AS n_pairs
            FROM s GROUP BY 1, 2, 3 ORDER BY src_a, src_b""",
        "url_extension_census": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('url:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                AS u
                       FROM documents),
            urls AS (SELECT 'http://h' || CAST(u % 64 AS VARCHAR)
                            || '.test/d' || CAST((u >> 6) % 16 AS VARCHAR)
                            || '/f' || CAST(doc_id AS VARCHAR) || '.'
                            || CASE ((u >> 8) % 8)::INT
                                 WHEN 0 THEN 'jpg' WHEN 1 THEN 'png'
                                 WHEN 2 THEN 'gif' WHEN 3 THEN 'webp'
                                 WHEN 4 THEN 'html' WHEN 5 THEN 'php'
                                 WHEN 6 THEN 'css' ELSE 'js' END AS url
                     FROM d),
            p AS (SELECT regexp_extract(url, 'http://([^/]+)/', 1) AS host,
                         regexp_extract(url, '\.([a-z0-9]+)$', 1) AS ext
                  FROM urls)
            SELECT host, count(*)::BIGINT AS n_urls,
                   sum(CASE WHEN ext IN ('jpg','png','gif','webp')
                            THEN 1 ELSE 0 END)::BIGINT AS n_image,
                   (1000000 * sum(CASE WHEN ext IN ('jpg','png','gif','webp')
                                       THEN 1 ELSE 0 END)
                    // count(*))::BIGINT AS image_share_ppm
            FROM p GROUP BY host ORDER BY host""",
        "redirect_resolve": r"""
            WITH RECURSIVE d AS (
                SELECT doc_id,
                       ('0x'||substr(md5('rd:'||CAST(doc_id AS VARCHAR)),
                          1,16))::UBIGINT AS u
                FROM documents),
            e AS (SELECT doc_id AS src,
                         CASE WHEN u % 3 = 0
                                   AND doc_id - 1 - (u % 7)::BIGINT >= 0
                              THEN doc_id - 1 - (u % 7)::BIGINT
                         END AS nxt
                  FROM d),
            walk(doc_id, cur, hops) AS (
                SELECT src, src, 0::BIGINT FROM e
                UNION ALL
                SELECT w.doc_id, e.nxt, w.hops + 1
                FROM walk w JOIN e ON e.src = w.cur
                WHERE e.nxt IS NOT NULL)
            SELECT doc_id, arg_max(cur, hops)::BIGINT AS final_id,
                   max(hops)::BIGINT AS hops
            FROM walk GROUP BY doc_id ORDER BY doc_id""",
        "mann_whitney": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val,
                              (event_type = 'purchase') AS g1
                       FROM events
                       WHERE event_type IN ('purchase', 'click')),
            c AS (SELECT val,
                         sum(CASE WHEN g1 THEN 1 ELSE 0 END)::HUGEINT AS c1,
                         sum(CASE WHEN g1 THEN 0 ELSE 1 END)::HUGEINT AS c2
                  FROM v GROUP BY val),
            w AS (SELECT val, c1, c2,
                         coalesce(sum(c2) OVER (ORDER BY val
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cum2
                  FROM c)
            SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
                   sum(c1 * (2 * cum2 + c2))::BIGINT AS u2,
                   sum((c1 + c2) * (c1 + c2) * (c1 + c2)
                       - (c1 + c2))::BIGINT AS tie_cubes
            FROM w""",
        "ppr": r"""
        WITH e AS (SELECT DISTINCT doc_id % 256 AS src,
                          (doc_id * 2654435761) % 256 AS dst
                   FROM documents),
        nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        ns AS (SELECT count(*)::DOUBLE AS n FROM nodes WHERE v < 8),
        deg AS (SELECT src, count(*)::DOUBLE AS outdeg
                FROM e GROUP BY src),
        r0 AS (SELECT v, CASE WHEN v < 8 THEN 1.0 / (SELECT n FROM ns)
                              ELSE 0.0 END AS r
               FROM nodes),
        it1 AS (
            SELECT n.v,
                   CASE WHEN n.v < 8 THEN (1.0 - 0.85)
                            * (1.0 / (SELECT n FROM ns)) ELSE 0.0 END
                   + 0.85 * coalesce(sum(r.r / d.outdeg), 0) AS r
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN deg d ON d.src = e.src
            LEFT JOIN r0 r ON r.v = e.src
            GROUP BY n.v),
        it2 AS (
            SELECT n.v,
                   CASE WHEN n.v < 8 THEN (1.0 - 0.85)
                            * (1.0 / (SELECT n FROM ns)) ELSE 0.0 END
                   + 0.85 * coalesce(sum(r.r / d.outdeg), 0) AS r
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN deg d ON d.src = e.src
            LEFT JOIN it1 r ON r.v = e.src
            GROUP BY n.v),
        it3 AS (
            SELECT n.v,
                   CASE WHEN n.v < 8 THEN (1.0 - 0.85)
                            * (1.0 / (SELECT n FROM ns)) ELSE 0.0 END
                   + 0.85 * coalesce(sum(r.r / d.outdeg), 0) AS r
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN deg d ON d.src = e.src
            LEFT JOIN it2 r ON r.v = e.src
            GROUP BY n.v),
        it4 AS (
            SELECT n.v,
                   CASE WHEN n.v < 8 THEN (1.0 - 0.85)
                            * (1.0 / (SELECT n FROM ns)) ELSE 0.0 END
                   + 0.85 * coalesce(sum(r.r / d.outdeg), 0) AS r
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN deg d ON d.src = e.src
            LEFT JOIN it3 r ON r.v = e.src
            GROUP BY n.v),
        it5 AS (
            SELECT n.v,
                   CASE WHEN n.v < 8 THEN (1.0 - 0.85)
                            * (1.0 / (SELECT n FROM ns)) ELSE 0.0 END
                   + 0.85 * coalesce(sum(r.r / d.outdeg), 0) AS r
            FROM nodes n
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN deg d ON d.src = e.src
            LEFT JOIN it4 r ON r.v = e.src
            GROUP BY n.v)
        SELECT v AS node, round(r, 9) AS rank
        FROM it5 ORDER BY node""",
        "url_param_census": r"""
            WITH u AS (SELECT CASE WHEN doc_id % 2 = 0 THEN
                           'http://h' || (doc_id % 64) || '.test/p/'
                           || doc_id || '?sid=s' || (doc_id % 4096)
                           || '&page=' || (doc_id % 5)
                           || '&lang=l' || (doc_id % 3)
                       ELSE
                           'http://h' || (doc_id % 64) || '.test/p/'
                           || doc_id || '?page=' || (doc_id % 5)
                       END AS url
                       FROM documents),
            kv AS (SELECT split_part(p, '=', 1) AS key,
                          split_part(p, '=', 2) AS val
                   FROM u, unnest(string_split(
                       split_part(url, '?', 2), '&')) AS t(p)),
            agg AS (SELECT key, count(*)::BIGINT AS n_urls,
                           count(DISTINCT val)::BIGINT AS n_values
                    FROM kv GROUP BY key)
            SELECT key, n_urls, n_values,
                   (n_values * 1000000 // n_urls)::BIGINT AS distinct_ppm,
                   CASE WHEN n_values * 1000000 // n_urls > 500000
                        THEN 1 ELSE 0 END::BIGINT AS strip
            FROM agg ORDER BY key""",
        "life_table": r"""
            WITH u AS (SELECT user_id, min(ts) AS t0,
                              min(CASE WHEN event_type = 'purchase'
                                  THEN ts END) AS tp,
                              max(ts) AS tmax
                       FROM events GROUP BY user_id),
            d AS (SELECT CASE WHEN tp IS NOT NULL THEN
                             (epoch_us(tp) - epoch_us(t0)) // 86400000000
                         ELSE
                             (epoch_us(tmax) - epoch_us(t0)) // 86400000000
                         END AS t,
                         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
                  FROM u),
            c AS (SELECT t, sum(ev)::BIGINT AS n_events,
                         sum(1 - ev)::BIGINT AS n_censored,
                         count(*)::BIGINT AS n
                  FROM d GROUP BY t)
            SELECT t::BIGINT AS t_days, n_events, n_censored,
                   sum(n) OVER (ORDER BY t DESC)::BIGINT AS n_risk
            FROM c ORDER BY t_days""",
        "diff_in_diff": r"""
            WITH v AS (SELECT (user_id % 2)::BIGINT AS treat,
                              (epoch_us(ts) >= 1705363200000000)::INT
                                  ::BIGINT AS post,
                              floor(value * 100 + 0.5)::BIGINT AS cents
                       FROM events WHERE event_type = 'purchase')
            SELECT treat, post, count(*)::BIGINT AS n,
                   sum(cents)::BIGINT AS sum_cents
            FROM v GROUP BY treat, post ORDER BY treat, post""",
        "fisher_2x2": r"""
            WITH v AS (SELECT (event_type = 'purchase')::INT AS pur,
                              (((epoch_us(ts) // 86400000000) + 4) % 7
                               >= 5)::INT AS wknd
                       FROM events
                       WHERE event_type IN ('purchase', 'click')),
            c AS (SELECT coalesce(sum(CASE WHEN pur = 1 AND wknd = 1
                                      THEN 1 END), 0)::BIGINT AS n11,
                         coalesce(sum(CASE WHEN pur = 1 AND wknd = 0
                                      THEN 1 END), 0)::BIGINT AS n10,
                         coalesce(sum(CASE WHEN pur = 0 AND wknd = 1
                                      THEN 1 END), 0)::BIGINT AS n01,
                         coalesce(sum(CASE WHEN pur = 0 AND wknd = 0
                                      THEN 1 END), 0)::BIGINT AS n00
                  FROM v)
            SELECT n11, n10, n01, n00,
                   (n11 * n00)::BIGINT AS odds_num,
                   (n10 * n01)::BIGINT AS odds_den
            FROM c""",
        "page_hinkley": r"""
            WITH d AS (SELECT (epoch_us(o_orderdate)
                                   // 86400000000)::BIGINT AS day,
                              round(o_totalprice * 100)::BIGINT AS cents
                       FROM orders),
            g AS (SELECT day, sum(cents)::BIGINT AS cents
                  FROM d GROUP BY day),
            p AS (SELECT (sum(cents) // count(*))::BIGINT AS mu,
                         count(*)::BIGINT AS n FROM g),
            s AS (SELECT day,
                         sum(cents - (SELECT mu + mu // 100 FROM p))
                             OVER (ORDER BY day) AS ph
                  FROM g),
            m AS (SELECT day, ph,
                         least(0, min(ph) OVER (ORDER BY day)) AS mn
                  FROM s),
            e AS (SELECT day, ph - mn AS exc FROM m)
            SELECT (SELECT n FROM p) AS n_days,
                   sum(CASE WHEN exc > (SELECT mu // 2 FROM p)
                       THEN 1 ELSE 0 END)::BIGINT AS n_alarms,
                   coalesce(min(CASE WHEN exc > (SELECT mu // 2 FROM p)
                                THEN day END), -1)::BIGINT
                       AS first_alarm_day,
                   max(exc)::BIGINT AS max_excursion
            FROM e""",
        "kruskal_wallis": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val,
                              event_type
                       FROM events),
            c AS (SELECT val, event_type, count(*)::HUGEINT AS n
                  FROM v GROUP BY val, event_type),
            m AS (SELECT val, sum(n) AS nt FROM c GROUP BY val),
            r AS (SELECT val, nt,
                         2 * coalesce(sum(nt) OVER (ORDER BY val
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) + nt + 1 AS r2
                  FROM m),
            t AS (SELECT sum(nt * nt * nt - nt)::BIGINT AS tie_cubes
                  FROM m)
            SELECT c.event_type, sum(c.n)::BIGINT AS n,
                   sum(c.n * r.r2)::BIGINT AS rank_sum2,
                   (SELECT tie_cubes FROM t) AS tie_cubes
            FROM c JOIN r USING (val)
            GROUP BY c.event_type ORDER BY c.event_type""",
        "brown_forsythe": r"""
            WITH v AS (SELECT l_returnflag AS flag,
                              round(l_quantity)::BIGINT AS q
                       FROM lineitem),
            c AS (SELECT flag, q, count(*)::HUGEINT AS n
                  FROM v GROUP BY flag, q),
            w AS (SELECT flag, q, n,
                         sum(n) OVER (PARTITION BY flag ORDER BY q) AS cum,
                         sum(n) OVER (PARTITION BY flag) AS ntot
                  FROM c),
            med AS (SELECT flag,
                           min(CASE WHEN cum >= (ntot + 1) // 2
                               THEN q END)
                           + min(CASE WHEN cum >= ntot // 2 + 1
                                 THEN q END) AS med2
                    FROM w GROUP BY flag)
            SELECT c.flag, sum(c.n)::BIGINT AS n,
                   sum(c.n * abs(2 * c.q - med2))::BIGINT AS sum_z,
                   sum(c.n * abs(2 * c.q - med2)
                           * abs(2 * c.q - med2))::BIGINT AS sum_z2
            FROM c JOIN med USING (flag)
            GROUP BY c.flag ORDER BY c.flag""",
        "cochran_armitage": r"""
            WITH v AS (SELECT round(l_discount * 100)::BIGINT AS d,
                              CASE WHEN l_returnflag = 'R'
                                   THEN 1 ELSE 0 END::BIGINT AS r
                       FROM lineitem),
            c AS (SELECT d, r, count(*)::HUGEINT AS n
                  FROM v GROUP BY d, r)
            SELECT sum(n)::BIGINT AS n,
                   sum(CASE WHEN r = 1 THEN n ELSE 0 END)::BIGINT AS r,
                   sum(n * d)::BIGINT AS sum_nd,
                   sum(n * d * d)::BIGINT AS sum_nd2,
                   sum(CASE WHEN r = 1 THEN n * d ELSE 0 END)::BIGINT
                       AS sum_rd
            FROM c""",
        "gini_split": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val,
                              (event_type = 'purchase') AS lab
                       FROM events),
            c AS (SELECT val,
                         sum(CASE WHEN lab THEN 1 ELSE 0 END)::HUGEINT
                           AS pos,
                         count(*)::HUGEINT AS cnt
                  FROM v GROUP BY val),
            cum AS (SELECT val,
                           sum(cnt) OVER (ORDER BY val) AS c0,
                           sum(pos) OVER (ORDER BY val) AS x0,
                           row_number() OVER (ORDER BY val DESC) AS rvn
                    FROM c),
            tot AS (SELECT sum(cnt) AS n, sum(pos) AS x FROM c),
            sc AS (SELECT val, c0, x0,
                          ((x0 * (c0 - x0) * ((SELECT n FROM tot) - c0)
                            + ((SELECT x FROM tot) - x0)
                              * (((SELECT n FROM tot) - c0)
                                 - ((SELECT x FROM tot) - x0)) * c0)
                           // (c0 * ((SELECT n FROM tot) - c0)))
                            AS score
                   FROM cum WHERE rvn > 1)
            SELECT val::BIGINT AS thr_cents, c0::BIGINT AS c0,
                   x0::BIGINT AS x0, score::BIGINT AS score_floor
            FROM sc ORDER BY score ASC, val ASC LIMIT 1""",
        "url_lcp_compression": r"""
            WITH u AS (SELECT 'http://host-' || (doc_id % 20)
                              || '.test/p/' || doc_id || '?a=1&b=2'
                                AS url
                       FROM documents),
            s AS (SELECT url, lag(url) OVER (ORDER BY url) AS prev
                  FROM u),
            l AS (SELECT s.url, min(len(s.url))::BIGINT AS blen,
                         coalesce(max(g.k), 0)::BIGINT AS lcp
                  FROM s LEFT JOIN generate_series(1, 64) g(k)
                    ON g.k <= least(len(s.url), len(s.prev))
                   AND substr(s.url, 1, g.k::INT)
                       = substr(s.prev, 1, g.k::INT)
                  GROUP BY s.url)
            SELECT count(*)::BIGINT AS n_urls,
                   sum(blen)::BIGINT AS total_bytes,
                   sum(lcp)::BIGINT AS lcp_bytes,
                   ((1000000 * sum(lcp)) // sum(blen))::BIGINT
                     AS savings_ppm
            FROM l""",
        "tile_variance": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id, u,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt,
                         (1 + u % 5) AS s5, (1 + (u >> 4) % 7) AS s7,
                         (u & 4294967295::UBIGINT) AS s32,
                         (u % 256) AS s256
                  FROM d),
            px AS (SELECT m.doc_id, m.fmt, m.s5, m.s7, m.s256,
                          gx.x::UBIGINT AS x, gy.y::UBIGINT AS y,
                          (CASE WHEN gx.x < m.w // 2 THEN 0 ELSE 1 END
                           + CASE WHEN gy.y < m.h // 2 THEN 0
                                  ELSE 2 END)::BIGINT AS quad,
                          ((xor(xor((gx.x::UBIGINT * 2654435761::UBIGINT)
                                      % 4294967296::UBIGINT,
                                    gy.y::UBIGINT * 40503::UBIGINT),
                                gc.c::UBIGINT * 69069::UBIGINT)
                            + m.s32) % 4294967296::UBIGINT) AS n1
                   FROM m, generate_series(0, 79) gx(x),
                        generate_series(0, 59) gy(y),
                        generate_series(0, 2) gc(c)
                   WHERE gx.x < m.w AND gy.y < m.h),
            v AS (SELECT doc_id, quad,
                         (CASE WHEN fmt = 'qimg'
                               THEN ((((xor(n1, n1 >> 13) & 63::UBIGINT)
                                       + x * s5 + y * s7 + s256)
                                      % 256::UBIGINT) // 8) * 8 + 4
                               ELSE ((xor(n1, n1 >> 13) & 63::UBIGINT)
                                     + x * s5 + y * s7 + s256)
                                    % 256::UBIGINT END)::BIGINT AS val
                  FROM px),
            qs AS (SELECT doc_id,
                          sum(CASE WHEN quad = 0 THEN val
                                   ELSE 0 END)::BIGINT AS q0,
                          sum(CASE WHEN quad = 1 THEN val
                                   ELSE 0 END)::BIGINT AS q1,
                          sum(CASE WHEN quad = 2 THEN val
                                   ELSE 0 END)::BIGINT AS q2,
                          sum(CASE WHEN quad = 3 THEN val
                                   ELSE 0 END)::BIGINT AS q3
                   FROM v GROUP BY doc_id)
            SELECT doc_id, q0, q1, q2, q3,
                   ((4*q0 - (q0+q1+q2+q3)) * (4*q0 - (q0+q1+q2+q3))
                    + (4*q1 - (q0+q1+q2+q3)) * (4*q1 - (q0+q1+q2+q3))
                    + (4*q2 - (q0+q1+q2+q3)) * (4*q2 - (q0+q1+q2+q3))
                    + (4*q3 - (q0+q1+q2+q3)) * (4*q3 - (q0+q1+q2+q3)))
                     ::BIGINT AS tile_var4
            FROM qs ORDER BY doc_id""",
        "reshard_move_cost": r"""
            WITH r8 AS (SELECT s.s AS shard,
                               ('0x'||substr(md5('ring:'||s.s||':'
                                  ||v.v),1,16))::UBIGINT AS pos
                        FROM generate_series(0, 7) s(s),
                             generate_series(0, 15) v(v)),
            r12 AS (SELECT s.s AS shard,
                           ('0x'||substr(md5('ring:'||s.s||':'
                              ||v.v),1,16))::UBIGINT AS pos
                    FROM generate_series(0, 11) s(s),
                         generate_series(0, 15) v(v)),
            kh AS (SELECT ('0x'||substr(md5('key:'||CAST(user_id
                             AS VARCHAR)),1,16))::UBIGINT AS h
                   FROM (SELECT DISTINCT user_id FROM events)),
            asg AS (SELECT h,
                           coalesce((SELECT r.shard FROM r8 r
                                     WHERE r.pos >= kh.h
                                     ORDER BY r.pos LIMIT 1),
                                    (SELECT r.shard FROM r8 r
                                     ORDER BY r.pos LIMIT 1)) AS a8,
                           coalesce((SELECT r.shard FROM r12 r
                                     WHERE r.pos >= kh.h
                                     ORDER BY r.pos LIMIT 1),
                                    (SELECT r.shard FROM r12 r
                                     ORDER BY r.pos LIMIT 1)) AS a12
                    FROM kh),
            m AS (SELECT 'mod' AS strategy,
                         count(*)::BIGINT AS n_keys,
                         sum(CASE WHEN (h % 8) <> (h % 12) THEN 1
                                  ELSE 0 END)::BIGINT AS moved
                  FROM kh
                  UNION ALL
                  SELECT 'ring', count(*)::BIGINT,
                         sum(CASE WHEN a8 <> a12 THEN 1
                                  ELSE 0 END)::BIGINT
                  FROM asg)
            SELECT strategy, n_keys, moved,
                   ((1000000 * moved) // n_keys)::BIGINT AS moved_ppm
            FROM m ORDER BY strategy""",
        "hapax_share": r"""
            WITH t AS (SELECT source,
                              unnest(regexp_extract_all(text, '\S+'))
                                AS token
                       FROM documents),
            tot AS (SELECT token, count(*)::BIGINT AS n FROM t
                    GROUP BY token),
            p AS (SELECT DISTINCT source, token FROM t)
            SELECT p.source, count(*)::BIGINT AS n_distinct,
                   sum(CASE WHEN tot.n = 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_hapax,
                   ((1000000 * sum(CASE WHEN tot.n = 1 THEN 1
                                        ELSE 0 END))
                    // count(*))::BIGINT AS hapax_ppm
            FROM p JOIN tot USING (token)
            GROUP BY p.source ORDER BY p.source""",
        "count_of_counts": r"""
            WITH t AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                                AS token
                       FROM documents),
            c AS (SELECT token, count(*)::BIGINT AS r FROM t
                  GROUP BY token)
            SELECT r, count(*)::BIGINT AS n_r FROM c
            GROUP BY r ORDER BY r""",
        "tukey_fences": r"""
            WITH v AS (SELECT event_type,
                              floor(value * 100 + 0.5)::BIGINT AS c
                       FROM events),
            q AS (SELECT event_type,
                         CAST(percentile_disc(0.25)
                              WITHIN GROUP (ORDER BY c) AS BIGINT)
                           AS q1,
                         CAST(percentile_disc(0.75)
                              WITHIN GROUP (ORDER BY c) AS BIGINT)
                           AS q3
                  FROM v GROUP BY event_type)
            SELECT v.event_type, count(*)::BIGINT AS n,
                   sum(CASE WHEN 2*v.c > 2*q.q3 + 3*(q.q3 - q.q1)
                            THEN 1 ELSE 0 END)::BIGINT AS n_out_hi,
                   sum(CASE WHEN 2*v.c < 2*q.q1 - 3*(q.q3 - q.q1)
                            THEN 1 ELSE 0 END)::BIGINT AS n_out_lo,
                   q.q1 AS q1_c, q.q3 AS q3_c,
                   ((1000000 * (sum(CASE WHEN 2*v.c > 2*q.q3
                                         + 3*(q.q3 - q.q1)
                                    THEN 1 ELSE 0 END)
                                + sum(CASE WHEN 2*v.c < 2*q.q1
                                           - 3*(q.q3 - q.q1)
                                      THEN 1 ELSE 0 END)))
                    // count(*))::BIGINT AS out_ppm
            FROM v JOIN q USING (event_type)
            GROUP BY v.event_type, q.q1, q.q3 ORDER BY v.event_type""",
        "ohlc_bars": r"""
            WITH v AS (SELECT event_type,
                              (epoch_us(ts) // 86400000000)::BIGINT
                                AS day,
                              floor(value * 100 + 0.5)::BIGINT AS c,
                              epoch_us(ts) AS tu, event_id
                       FROM events),
            sel AS (SELECT event_type, day, c,
                           row_number() OVER (
                               PARTITION BY event_type, day
                               ORDER BY tu, event_id) AS rn_a,
                           row_number() OVER (
                               PARTITION BY event_type, day
                               ORDER BY tu DESC, event_id DESC) AS rn_d
                    FROM v)
            SELECT event_type, day,
                   max(CASE WHEN rn_a = 1 THEN c END)::BIGINT AS open_c,
                   max(c)::BIGINT AS high_c, min(c)::BIGINT AS low_c,
                   max(CASE WHEN rn_d = 1 THEN c END)::BIGINT
                     AS close_c,
                   count(*)::BIGINT AS n
            FROM sel GROUP BY event_type, day
            ORDER BY event_type, day""",
        "pr_curve": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val,
                              (event_type = 'purchase') AS lab
                       FROM events),
            c AS (SELECT val,
                         sum(CASE WHEN lab THEN 1 ELSE 0 END)::BIGINT
                           AS pos,
                         sum(CASE WHEN lab THEN 0 ELSE 1 END)::BIGINT
                           AS neg
                  FROM v GROUP BY val),
            cum AS (SELECT val,
                           sum(pos) OVER (ORDER BY val DESC)::BIGINT
                             AS tp,
                           sum(neg) OVER (ORDER BY val DESC)::BIGINT
                             AS fp
                    FROM c),
            t AS (SELECT sum(pos)::BIGINT AS p_tot FROM c)
            SELECT val AS thr_cents, tp, fp,
                   ((SELECT p_tot FROM t) - tp)::BIGINT AS fn,
                   ((1000000 * tp) // greatest(tp + fp, 1))::BIGINT
                     AS prec_ppm,
                   ((1000000 * tp)
                    // greatest((SELECT p_tot FROM t), 1))::BIGINT
                     AS rec_ppm
            FROM cum ORDER BY thr_cents""",
        "simpson_paradox": r"""
            WITH g AS (SELECT event_type,
                              sum(CASE WHEN user_id % 2 = 0 THEN 1
                                       ELSE 0 END)::BIGINT AS n_a,
                              sum(CASE WHEN user_id % 2 = 0
                                       AND value > 50 THEN 1
                                       ELSE 0 END)::BIGINT AS x_a,
                              sum(CASE WHEN user_id % 2 = 1 THEN 1
                                       ELSE 0 END)::BIGINT AS n_b,
                              sum(CASE WHEN user_id % 2 = 1
                                       AND value > 50 THEN 1
                                       ELSE 0 END)::BIGINT AS x_b
                       FROM events GROUP BY event_type),
            p AS (SELECT sign(sum(x_a) * sum(n_b)
                              - sum(x_b) * sum(n_a))::BIGINT AS ps
                  FROM g)
            SELECT event_type, n_a, x_a, n_b, x_b,
                   sign(x_a * n_b - x_b * n_a)::BIGINT AS d_sign,
                   (sign(x_a * n_b - x_b * n_a) <> 0
                    AND (SELECT ps FROM p) <> 0
                    AND sign(x_a * n_b - x_b * n_a)
                        <> (SELECT ps FROM p)) AS paradox
            FROM g ORDER BY event_type""",
        "benford_audit": r"""
            WITH c AS (SELECT round(o_totalprice * 100)::BIGINT AS cents
                       FROM orders),
            d AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1)::BIGINT
                           AS digit
                  FROM c WHERE cents > 0),
            g AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d
                  GROUP BY digit),
            t AS (SELECT sum(n_obs)::BIGINT AS total FROM g)
            SELECT digit, n_obs,
                   ((1000000 * n_obs) // (SELECT total FROM t))::BIGINT
                     AS obs_ppm,
                   (CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                        WHEN 3 THEN 124939 WHEN 4 THEN 96910
                        WHEN 5 THEN 79181 WHEN 6 THEN 66947
                        WHEN 7 THEN 57992 WHEN 8 THEN 51153
                        ELSE 45757 END)::BIGINT AS exp_ppm,
                   abs(((1000000 * n_obs) // (SELECT total FROM t))
                       - CASE digit WHEN 1 THEN 301030
                             WHEN 2 THEN 176091 WHEN 3 THEN 124939
                             WHEN 4 THEN 96910 WHEN 5 THEN 79181
                             WHEN 6 THEN 66947 WHEN 7 THEN 57992
                             WHEN 8 THEN 51153 ELSE 45757 END)::BIGINT
                     AS dev_ppm
            FROM g ORDER BY digit""",
        "sigma_breach": r"""
            WITH v AS (SELECT event_type,
                              floor(value * 100 + 0.5)::BIGINT AS x
                       FROM events),
            g AS (SELECT event_type, count(*)::HUGEINT AS n,
                         sum(x)::HUGEINT AS s,
                         sum(x * x)::HUGEINT AS ss
                  FROM v GROUP BY event_type)
            SELECT v.event_type, g.n::BIGINT AS n,
                   sum(CASE WHEN g.n > 1 AND
                            (g.n * v.x - g.s) * (g.n * v.x - g.s)
                              * (g.n - 1)
                            > 4 * g.n * (g.n * g.ss - g.s * g.s)
                            THEN 1 ELSE 0 END)::BIGINT AS breaches,
                   ((1000000 * sum(CASE WHEN g.n > 1 AND
                            (g.n * v.x - g.s) * (g.n * v.x - g.s)
                              * (g.n - 1)
                            > 4 * g.n * (g.n * g.ss - g.s * g.s)
                            THEN 1 ELSE 0 END)) // g.n)::BIGINT
                     AS breach_ppm
            FROM v JOIN g USING (event_type)
            GROUP BY v.event_type, g.n ORDER BY v.event_type""",
        "otsu_threshold": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val
                       FROM events),
            c AS (SELECT val, count(*)::HUGEINT AS cnt FROM v
                  GROUP BY val),
            tot AS (SELECT sum(cnt)::HUGEINT AS n,
                           sum(val * cnt)::HUGEINT AS s FROM c),
            cum AS (SELECT val,
                           sum(cnt) OVER (ORDER BY val)::HUGEINT AS c0,
                           sum(val * cnt) OVER (ORDER BY val)::HUGEINT
                             AS s0,
                           row_number() OVER (ORDER BY val DESC) AS rvn
                    FROM c),
            sc AS (SELECT val, c0,
                          ((SELECT n FROM tot) - c0) AS c1,
                          ((s0 * ((SELECT n FROM tot) - c0)
                            - ((SELECT s FROM tot) - s0) * c0)
                           * (s0 * ((SELECT n FROM tot) - c0)
                              - ((SELECT s FROM tot) - s0) * c0))
                          // (c0 * ((SELECT n FROM tot) - c0)) AS score
                   FROM cum WHERE rvn > 1)
            SELECT val::BIGINT AS t_cents, c0::BIGINT AS c0,
                   c1::BIGINT AS c1
            FROM sc ORDER BY score DESC, val ASC LIMIT 1""",
        "wilson_lb": r"""
            WITH g AS (SELECT event_type, count(*)::BIGINT AS n,
                              sum(CASE WHEN value > 50 THEN 1
                                       ELSE 0 END)::BIGINT AS x
                       FROM events GROUP BY event_type),
            r AS (SELECT event_type, n, x,
                         ((x * (n - x) * 1000000)
                          // greatest(n, 1) + 1000000)::BIGINT AS rad
                  FROM g),
            s0 AS (SELECT *, floor(sqrt(rad::DOUBLE))::BIGINT AS s
                   FROM r),
            s1 AS (SELECT *, (s - CASE WHEN s * s > rad THEN 1
                                       ELSE 0 END) AS s1 FROM s0),
            sq AS (SELECT event_type, n, x, rad,
                          (s1 + CASE WHEN (s1+1)*(s1+1) <= rad THEN 1
                                     ELSE 0 END)::BIGINT AS t
                   FROM s1)
            SELECT event_type, n, x,
                   ((1000000 * x) // greatest(n, 1))::BIGINT AS rate_ppm,
                   ((1000 * greatest(1000 * x + 2000 - 2 * t, 0))
                    // (n + 4))::BIGINT AS wilson_lb_ppm
            FROM sq ORDER BY event_type""",
        "runs_test": r"""
            WITH v AS (SELECT event_type,
                              floor(value * 100 + 0.5)::BIGINT AS c,
                              epoch_us(ts)::BIGINT AS t, event_id
                       FROM events),
            med AS (SELECT event_type,
                           CAST(percentile_disc(0.5)
                                WITHIN GROUP (ORDER BY c) AS BIGINT)
                             AS m
                    FROM v GROUP BY event_type),
            f AS (SELECT v.event_type, (v.c > med.m)::INT AS side,
                         v.t, v.event_id
                  FROM v JOIN med USING (event_type)
                  WHERE v.c != med.m),
            s AS (SELECT event_type, side,
                         CASE WHEN lag(side) OVER (
                                  PARTITION BY event_type
                                  ORDER BY t, event_id)
                              IS DISTINCT FROM side
                              THEN 1 ELSE 0 END AS chg
                  FROM f),
            a AS (SELECT event_type,
                         sum(side)::BIGINT AS n_above,
                         sum(1 - side)::BIGINT AS n_below,
                         sum(chg)::BIGINT AS n_runs
                  FROM s GROUP BY event_type)
            SELECT event_type, n_above, n_below, n_runs,
                   CASE WHEN n_above > 0 AND n_below > 0
                             AND 2 * n_above * n_below
                                 > n_above + n_below
                        THEN floor(1000.0 * (n_runs
                                 - (2.0 * n_above * n_below
                                    / (n_above + n_below) + 1.0))
                             / sqrt(2.0 * n_above * n_below
                                    * (2.0 * n_above * n_below
                                       - n_above - n_below)
                                    / ((n_above + n_below)::DOUBLE
                                       * (n_above + n_below)::DOUBLE
                                       * ((n_above + n_below)::DOUBLE
                                          - 1.0)))
                             + 0.5)::BIGINT
                        ELSE 0 END AS z_milli
            FROM a ORDER BY event_type""",
        "stump_split": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS c
                       FROM events),
            cen AS (SELECT val, sum(c)::BIGINT AS n1,
                           sum(1 - c)::BIGINT AS n0
                    FROM v GROUP BY val),
            cum AS (SELECT val,
                           sum(n0) OVER (ORDER BY val)::BIGINT AS l0,
                           sum(n1) OVER (ORDER BY val)::BIGINT AS l1,
                           (SELECT sum(n0) FROM cen)::BIGINT AS t0,
                           (SELECT sum(n1) FROM cen)::BIGINT AS t1
                    FROM cen),
            sc AS (SELECT val AS threshold,
                          (l0 + l1)::BIGINT AS n_left,
                          (t0 - l0 + t1 - l1)::BIGINT AS n_right,
                          ((1000000000000::HUGEINT
                            * ((l0 * l0 + l1 * l1)::HUGEINT
                                 * (t0 - l0 + t1 - l1)
                               + ((t0 - l0) * (t0 - l0)
                                  + (t1 - l1) * (t1 - l1))::HUGEINT
                                 * (l0 + l1)))
                           // ((l0 + l1)::HUGEINT
                               * (t0 - l0 + t1 - l1)))::BIGINT
                            AS score_pico
                   FROM cum WHERE (t0 - l0 + t1 - l1) > 0)
            SELECT threshold, n_left, n_right, score_pico
            FROM sc ORDER BY score_pico DESC, threshold ASC LIMIT 1""",
        "embedding_mmd": r"""
            WITH f AS (SELECT (vec_id % 2)::BIGINT AS side, i - 1 AS dim,
                              floor(embedding[i]::DOUBLE
                                    * 1048576)::BIGINT AS q
                       FROM embeddings, LATERAL unnest(
                           generate_series(1, len(embedding))) AS t(i)),
            nn AS (SELECT (vec_id % 2)::BIGINT AS side,
                          count(*)::HUGEINT AS n
                   FROM embeddings GROUP BY 1),
            sd AS (SELECT side, dim, sum(q)::HUGEINT AS s
                   FROM f GROUP BY side, dim),
            d AS (SELECT sum((nb.n * sa.s - na.n * sb.s)
                             * (nb.n * sa.s - na.n * sb.s)) AS d2
                  FROM sd sa JOIN sd sb
                       ON sa.dim = sb.dim AND sa.side = 0
                          AND sb.side = 1
                  JOIN nn na ON na.side = 0
                  JOIN nn nb ON nb.side = 1)
            SELECT (SELECT n FROM nn WHERE side = 0)::BIGINT AS n_a,
                   (SELECT n FROM nn WHERE side = 1)::BIGINT AS n_b,
                   ((1000000::HUGEINT * (SELECT d2 FROM d))
                    // (((SELECT n FROM nn WHERE side = 0)
                         * (SELECT n FROM nn WHERE side = 1))
                        * ((SELECT n FROM nn WHERE side = 0)
                           * (SELECT n FROM nn WHERE side = 1))
                        * 1099511627776::HUGEINT))::BIGINT
                     AS mmd2_micro""",
        "cramers_v": r"""
            WITH e AS (SELECT event_type,
                              ((epoch_us(ts) // 86400000000 + 4) % 7)
                                ::BIGINT AS dow
                       FROM events),
            cell AS (SELECT event_type, dow, count(*)::BIGINT AS n
                     FROM e GROUP BY event_type, dow),
            m AS (SELECT event_type, dow, n,
                         sum(n) OVER (PARTITION BY event_type)::DOUBLE
                           AS rt,
                         sum(n) OVER (PARTITION BY dow)::DOUBLE AS ct,
                         sum(n) OVER ()::DOUBLE AS tot
                  FROM cell),
            chi AS (SELECT CAST(round((n - rt * ct / tot)
                                      * (n - rt * ct / tot)
                                      / (rt * ct / tot) * 1e6)
                                AS BIGINT) AS cm
                    FROM m),
            agg AS (SELECT (SELECT sum(cm) FROM chi)::BIGINT AS chim,
                           (SELECT count(DISTINCT event_type)
                            FROM cell)::BIGINT AS r,
                           (SELECT count(DISTINCT dow)
                            FROM cell)::BIGINT AS c,
                           (SELECT sum(n) FROM cell)::BIGINT AS N)
            SELECT N AS n, r AS n_rows, c AS n_cols,
                   chim AS chi2_micro_total,
                   floor(1000.0 * sqrt((chim::DOUBLE / 1000000.0)
                                       / (N * least(r - 1, c - 1)))
                         + 0.5)::BIGINT AS v_milli
            FROM agg""",
        "url_template_census": r"""
            WITH u AS (SELECT 'http://h' || (doc_id % 64) || '.test'
                              || repeat('/seg', (1 + doc_id % 6)::INT)
                              || '/p' || doc_id AS url
                       FROM documents),
            s AS (SELECT string_split(url, '/')[3] AS host,
                         (i - 3)::BIGINT AS pos,
                         string_split(url, '/')[i] AS seg
                  FROM u, LATERAL unnest(generate_series(
                      4, len(string_split(url, '/')))) AS t(i)),
            c AS (SELECT host, pos, seg, count(*)::BIGINT AS n
                  FROM s GROUP BY host, pos, seg),
            rk AS (SELECT *, row_number() OVER (
                              PARTITION BY host, pos
                              ORDER BY n DESC, seg ASC) AS rr
                   FROM c),
            a AS (SELECT host, pos, sum(n)::BIGINT AS n_urls,
                         count(*)::BIGINT AS n_distinct
                  FROM c GROUP BY host, pos)
            SELECT a.host, a.pos, a.n_urls, a.n_distinct,
                   rk.seg AS top_seg,
                   ((1000000 * rk.n) // a.n_urls)::BIGINT
                     AS top_share_ppm,
                   a.n_distinct = 1 AS templated
            FROM a JOIN rk ON rk.host = a.host AND rk.pos = a.pos
                          AND rk.rr = 1
            ORDER BY a.host, a.pos""",
        "ewma_residuals": r"""
            WITH RECURSIVE v AS (
                SELECT user_id,
                       floor(value * 100 + 0.5)::BIGINT AS v,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts),
                                                   event_id) AS r
                FROM events),
            s AS (
                SELECT user_id, r, v AS e, 0::BIGINT AS mx
                FROM v WHERE r = 1
                UNION ALL
                SELECT v.user_id, v.r, (s.e + v.v) // 2 AS e,
                       greatest(s.mx, abs(v.v - s.e)) AS mx
                FROM s JOIN v ON v.user_id = s.user_id
                            AND v.r = s.r + 1),
            f AS (SELECT user_id, r, e, mx,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY r DESC) AS rr
                  FROM s)
            SELECT user_id, r::BIGINT AS n, e::BIGINT AS ewma_final,
                   mx::BIGINT AS max_abs_resid
            FROM f WHERE rr = 1 ORDER BY user_id""",
        "backoff_plan": r"""
            WITH e AS (SELECT user_id,
                              CASE WHEN event_type = 'error' THEN 1
                                   ELSE 0 END AS err,
                              row_number() OVER (
                                  PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS r
                       FROM events),
            g AS (SELECT *, r - row_number() OVER (
                                PARTITION BY user_id, err
                                ORDER BY r) AS island
                  FROM e),
            p AS (SELECT user_id,
                         row_number() OVER (
                             PARTITION BY user_id, island
                             ORDER BY r) - 1 AS pos
                  FROM g WHERE err = 1)
            SELECT user_id, count(*)::BIGINT AS n_err,
                   sum(CASE WHEN pos = 0 THEN 1 ELSE 0 END)::BIGINT
                     AS n_err_runs,
                   sum(1 << least(pos, 6)::INT)::BIGINT
                     AS backoff_total_s,
                   max(pos + 1)::BIGINT AS max_run
            FROM p GROUP BY user_id ORDER BY user_id""",
        "quantile_normalize": r"""
            WITH r AS (SELECT doc_id, source, n_chars,
                              row_number() OVER (
                                  PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rk,
                              count(*) OVER (PARTITION BY source) AS n
                       FROM documents),
            b AS (SELECT doc_id, source, n_chars,
                         (((2 * rk - 1) * 10) // (2 * n))::BIGINT
                           AS bucket
                  FROM r),
            m AS (SELECT bucket,
                         ((1000 * sum(n_chars)) // count(*))::BIGINT
                           AS qn_milli
                  FROM b GROUP BY bucket)
            SELECT b.doc_id, b.source, b.bucket, m.qn_milli
            FROM b JOIN m USING (bucket) ORDER BY b.doc_id""",
        "t_closeness": r"""
            WITH v AS (SELECT event_type AS g,
                              floor(value * 100 + 0.5)::BIGINT AS val
                       FROM events),
            gv AS (SELECT g, val, count(*)::BIGINT AS c FROM v
                   GROUP BY g, val),
            vals AS (SELECT DISTINCT val FROM v),
            tot AS (SELECT val, sum(c)::BIGINT AS c FROM gv
                    GROUP BY val),
            grp AS (SELECT g, sum(c)::BIGINT AS n FROM gv GROUP BY g),
            grid AS (SELECT grp.g, vals.val FROM grp, vals),
            dens AS (SELECT grid.g, grid.val,
                            coalesce(gv.c, 0)::BIGINT AS cg,
                            tot.c AS call
                     FROM grid
                     LEFT JOIN gv ON gv.g = grid.g
                                 AND gv.val = grid.val
                     JOIN tot ON tot.val = grid.val),
            cum AS (SELECT g, val,
                           sum(cg) OVER (PARTITION BY g
                                         ORDER BY val)::HUGEINT AS cgc,
                           sum(call) OVER (PARTITION BY g
                                           ORDER BY val)::HUGEINT AS cac,
                           lead(val) OVER (PARTITION BY g
                                           ORDER BY val) AS nxt
                    FROM dens),
            nn AS (SELECT sum(c)::HUGEINT AS N FROM tot),
            w AS (SELECT cum.g, grp.n,
                         sum(abs(cgc * (SELECT N FROM nn)
                                 - cac * grp.n)
                             * (nxt - val)) AS num
                  FROM cum JOIN grp ON grp.g = cum.g
                  WHERE nxt IS NOT NULL GROUP BY cum.g, grp.n),
            m AS (SELECT g AS event_type, n,
                         ((1000000 * num)
                          // (n * (SELECT N FROM nn)))::BIGINT
                           AS t_w1_micro
                  FROM w)
            SELECT event_type, n, t_w1_micro,
                   t_w1_micro = max(t_w1_micro) OVER () AS is_worst
            FROM m ORDER BY event_type""",
        "watermark_plan": r"""
            WITH e AS (SELECT event_id, epoch_us(ts)::BIGINT AS ts_us
                       FROM events),
            w AS (SELECT ts_us,
                         max(ts_us) OVER (ORDER BY event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS wm
                  FROM e),
            o AS (SELECT (CASE WHEN wm IS NULL THEN 0
                               ELSE greatest(wm - ts_us, 0) END
                          // 1000)::BIGINT AS ooo
                  FROM w)
            SELECT count(*)::BIGINT AS n,
                   CAST(percentile_disc(0.50)
                        WITHIN GROUP (ORDER BY ooo) AS BIGINT) AS p50,
                   CAST(percentile_disc(0.95)
                        WITHIN GROUP (ORDER BY ooo) AS BIGINT) AS p95,
                   CAST(percentile_disc(0.99)
                        WITHIN GROUP (ORDER BY ooo) AS BIGINT) AS p99,
                   max(ooo)::BIGINT AS max_ooo
            FROM o""",
        "wasserstein1": r"""
            WITH v AS (SELECT floor(value * 100 + 0.5)::BIGINT AS val,
                              (user_id % 2)::BIGINT AS side
                       FROM events),
            c AS (SELECT val,
                         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                           ::BIGINT AS a,
                         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                           ::BIGINT AS b
                  FROM v GROUP BY val),
            cum AS (SELECT val,
                           sum(a) OVER (ORDER BY val)::HUGEINT AS ca,
                           sum(b) OVER (ORDER BY val)::HUGEINT AS cb,
                           lead(val) OVER (ORDER BY val) AS nxt
                    FROM c),
            tot AS (SELECT sum(a)::HUGEINT AS na, sum(b)::HUGEINT AS nb
                    FROM c)
            SELECT (SELECT na FROM tot)::BIGINT AS n_a,
                   (SELECT nb FROM tot)::BIGINT AS n_b,
                   ((SELECT na FROM tot)
                    * (SELECT nb FROM tot))::BIGINT AS w1_den,
                   (1000000 * sum(abs(ca * (SELECT nb FROM tot)
                                     - cb * (SELECT na FROM tot))
                                  * (nxt - val))
                    // ((SELECT na FROM tot)
                        * (SELECT nb FROM tot)))::BIGINT AS w1_micro
            FROM cum WHERE nxt IS NOT NULL""",
        "temperature_mix": r"""
            WITH t AS (SELECT source, count(*)::BIGINT AS n
                       FROM documents GROUP BY source),
            s0 AS (SELECT source, n, (n * 1000000)::BIGINT AS x,
                          floor(sqrt((n * 1000000)::DOUBLE))::BIGINT
                            AS s
                   FROM t),
            s1 AS (SELECT source, n, x,
                          (s - CASE WHEN s * s > x THEN 1 ELSE 0 END)
                            AS s
                   FROM s0),
            w AS (SELECT source, n,
                         (s + CASE WHEN (s+1)*(s+1) <= x THEN 1
                                   ELSE 0 END)::BIGINT AS w
                  FROM s1),
            tot AS (SELECT sum(w)::BIGINT AS tw FROM w),
            base AS (SELECT source, n, w,
                            ((10000 * w) // (SELECT tw FROM tot))
                              ::BIGINT AS base,
                            ((10000 * w) % (SELECT tw FROM tot))
                              ::BIGINT AS rem
                     FROM w),
            lo AS (SELECT (10000 - sum(base))::BIGINT AS l FROM base),
            rk AS (SELECT *, row_number() OVER (
                       ORDER BY rem DESC, source ASC) AS rk
                   FROM base)
            SELECT source, n AS n_docs, w,
                   (base + CASE WHEN rk <= (SELECT l FROM lo) THEN 1
                                ELSE 0 END)::BIGINT AS alloc
            FROM rk ORDER BY source""",
        "jain_fairness": r"""
            WITH c AS (SELECT user_id, count(*)::HUGEINT AS x
                       FROM events GROUP BY user_id)
            SELECT count(*)::BIGINT AS n_keys,
                   sum(x)::BIGINT AS sum_x,
                   sum(x * x)::BIGINT AS ss_x,
                   (CASE WHEN count(*) * sum(x * x) = 0 THEN 0
                         ELSE (1000000 * sum(x) * sum(x))
                              // (count(*) * sum(x * x)) END)::BIGINT
                     AS jain_ppm
            FROM c""",
        "spearman_corr": r"""
            WITH v AS (SELECT round(l_quantity)::BIGINT AS q,
                              round(l_discount * 100)::BIGINT AS d
                       FROM lineitem),
            c AS (SELECT q, d, count(*)::HUGEINT AS n
                  FROM v GROUP BY q, d),
            mq AS (SELECT q, sum(n) AS nq FROM c GROUP BY q),
            rq AS (SELECT q,
                          2 * coalesce(sum(nq) OVER (ORDER BY q
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) + nq + 1 AS rx
                   FROM mq),
            md AS (SELECT d, sum(n) AS nd FROM c GROUP BY d),
            rd AS (SELECT d,
                          2 * coalesce(sum(nd) OVER (ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) + nd + 1 AS ry
                   FROM md)
            SELECT sum(c.n)::BIGINT AS n,
                   sum(c.n * rx)::BIGINT AS sum_rx,
                   sum(c.n * ry)::BIGINT AS sum_ry,
                   sum(c.n * rx * rx)::BIGINT AS sum_rx2,
                   sum(c.n * ry * ry)::BIGINT AS sum_ry2,
                   sum(c.n * rx * ry)::BIGINT AS sum_rxy
            FROM c JOIN rq USING (q) JOIN rd USING (d)""",
        "kendall_tau": r"""
            WITH v AS (SELECT round(l_quantity)::BIGINT AS q,
                              round(l_discount * 100)::BIGINT AS d
                       FROM lineitem),
            c AS (SELECT q, d, count(*)::HUGEINT AS n
                  FROM v GROUP BY q, d)
            SELECT (SELECT sum(n) FROM c)::BIGINT AS n,
                   coalesce((SELECT sum(a.n * b.n) FROM c a, c b
                             WHERE a.q < b.q AND a.d < b.d), 0)::BIGINT
                       AS concordant,
                   coalesce((SELECT sum(a.n * b.n) FROM c a, c b
                             WHERE a.q < b.q AND a.d > b.d), 0)::BIGINT
                       AS discordant,
                   coalesce((SELECT sum(nq * (nq - 1) / 2) FROM
                             (SELECT sum(n) AS nq FROM c GROUP BY q)),
                            0)::BIGINT AS tie_x_pairs,
                   coalesce((SELECT sum(nd * (nd - 1) / 2) FROM
                             (SELECT sum(n) AS nd FROM c GROUP BY d)),
                            0)::BIGINT AS tie_y_pairs""",
        "decayed_counts": r"""
            WITH w AS (SELECT user_id,
                              (1::BIGINT << (8 - least(
                                  (1706745600000000 - epoch_us(ts))
                                      // 604800000000, 8)))::BIGINT AS wt
                       FROM events)
            SELECT user_id, sum(wt)::BIGINT AS decayed_w
            FROM w GROUP BY user_id
            ORDER BY decayed_w DESC, user_id LIMIT 20""",
        "welch_t": r"""
            WITH r AS (SELECT l_returnflag AS flag,
                              round(l_quantity)::BIGINT AS q
                       FROM lineitem WHERE l_returnflag IN ('A', 'R')),
            g AS (SELECT flag, count(*)::HUGEINT AS n,
                         sum(q)::HUGEINT AS s, sum(q*q)::HUGEINT AS ss
                  FROM r GROUP BY flag),
            a AS (SELECT n AS n1, s AS s1, ss AS ss1 FROM g
                  WHERE flag = 'A'),
            b AS (SELECT n AS n2, s AS s2, ss AS ss2 FROM g
                  WHERE flag = 'R')
            SELECT n1::BIGINT AS n_a, s1::BIGINT AS sum_a,
                   ss1::BIGINT AS ss_a, n2::BIGINT AS n_b,
                   s2::BIGINT AS sum_b, ss2::BIGINT AS ss_b,
                   (CASE WHEN ((n1*ss1 - s1*s1)*n2*n2*(n2-1)
                               + (n2*ss2 - s2*s2)*n1*n1*(n1-1)) = 0
                         THEN 0
                         ELSE (1000000 * (s1*n2 - s2*n1)
                                       * (s1*n2 - s2*n1)
                                       * (n1-1) * (n2-1))
                              // ((n1*ss1 - s1*s1)*n2*n2*(n2-1)
                                  + (n2*ss2 - s2*s2)*n1*n1*(n1-1))
                    END)::BIGINT AS t2_ppm
            FROM a, b""",
        "hash_ring_plan": r"""
            WITH ring AS (SELECT s.s AS shard,
                                 ('0x'||substr(md5('ring:'||s.s||':'
                                    ||v.v),1,16))::UBIGINT AS pos
                          FROM generate_series(0, 7) s(s),
                               generate_series(0, 15) v(v)),
            kh AS (SELECT user_id,
                          ('0x'||substr(md5('key:'||CAST(user_id
                             AS VARCHAR)),1,16))::UBIGINT AS h
                   FROM (SELECT DISTINCT user_id FROM events)),
            asg AS (SELECT k.user_id,
                           coalesce(
                             (SELECT r.shard FROM ring r
                              WHERE r.pos >= k.h
                              ORDER BY r.pos LIMIT 1),
                             (SELECT r.shard FROM ring r
                              ORDER BY r.pos LIMIT 1)) AS shard
                    FROM kh k)
            SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_keys
            FROM asg GROUP BY shard ORDER BY shard""",
        "bloom_fp_audit": r"""
            WITH fp AS (SELECT doc_id,
                               ('0x'||substr(md5('http://host-'
                                  || (doc_id % 20) || '.test/p/' || doc_id
                                  || '?a=1&b=2'),1,16))::UBIGINT AS f
                        FROM documents),
            sa0 AS (SELECT doc_id, ((f::HUGEINT
                        + 11400714819323198485::HUGEINT)
                        % 18446744073709551616::HUGEINT)::UBIGINT AS x
                    FROM fp),
            sa1 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM sa0),
            sa2 AS (SELECT doc_id,
                      ((((x % 4294967296::UBIGINT)
                           * 484763065::UBIGINT)::HUGEINT
                        + ((((x % 4294967296::UBIGINT)
                               * 3210233709::UBIGINT)::HUGEINT
                            + ((x >> 32) * 484763065::UBIGINT)::HUGEINT)
                           % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                       % 18446744073709551616::HUGEINT)::UBIGINT AS x
                    FROM sa1),
            sa3 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM sa2),
            sa4 AS (SELECT doc_id,
                      ((((x % 4294967296::UBIGINT)
                           * 321982955::UBIGINT)::HUGEINT
                        + ((((x % 4294967296::UBIGINT)
                               * 2496678331::UBIGINT)::HUGEINT
                            + ((x >> 32) * 321982955::UBIGINT)::HUGEINT)
                           % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                       % 18446744073709551616::HUGEINT)::UBIGINT AS x
                    FROM sa3),
            h1t AS (SELECT doc_id, xor(x, x >> 31) AS h1 FROM sa4),
            sb0 AS (SELECT doc_id, h1, ((h1::HUGEINT
                        + 11400714819323198485::HUGEINT)
                        % 18446744073709551616::HUGEINT)::UBIGINT AS x
                    FROM h1t),
            sb1 AS (SELECT doc_id, h1, xor(x, x >> 30) AS x FROM sb0),
            sb2 AS (SELECT doc_id, h1,
                      ((((x % 4294967296::UBIGINT)
                           * 484763065::UBIGINT)::HUGEINT
                        + ((((x % 4294967296::UBIGINT)
                               * 3210233709::UBIGINT)::HUGEINT
                            + ((x >> 32) * 484763065::UBIGINT)::HUGEINT)
                           % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                       % 18446744073709551616::HUGEINT)::UBIGINT AS x
                    FROM sb1),
            sb3 AS (SELECT doc_id, h1, xor(x, x >> 27) AS x FROM sb2),
            sb4 AS (SELECT doc_id, h1,
                      ((((x % 4294967296::UBIGINT)
                           * 321982955::UBIGINT)::HUGEINT
                        + ((((x % 4294967296::UBIGINT)
                               * 2496678331::UBIGINT)::HUGEINT
                            + ((x >> 32) * 321982955::UBIGINT)::HUGEINT)
                           % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                       % 18446744073709551616::HUGEINT)::UBIGINT AS x
                    FROM sb3),
            hh AS (SELECT doc_id, h1,
                          (xor(x, x >> 31) | 1::UBIGINT) AS h2
                   FROM sb4),
            pos AS (SELECT doc_id,
                           ((h1::HUGEINT + g.i::HUGEINT * h2::HUGEINT)
                            % 1024)::BIGINT AS p
                    FROM hh, generate_series(0, 6) g(i)),
            build_pos AS (SELECT DISTINCT p FROM pos
                          WHERE doc_id % 2 = 0)
            SELECT pos.doc_id,
                   bool_and(b.p IS NOT NULL) AS bloom_pass
            FROM pos LEFT JOIN build_pos b ON pos.p = b.p
            WHERE pos.doc_id % 2 = 1
            GROUP BY pos.doc_id ORDER BY pos.doc_id""",
        "bootstrap_ci": r"""
            WITH r AS (SELECT (('0x'||substr(md5(CAST(o_orderkey
                                 AS VARCHAR)),1,16))::UBIGINT
                               & 4294967295::UBIGINT) AS u32,
                              round(o_totalprice * 100)::BIGINT AS cents
                       FROM orders),
            m1 AS (SELECT gb.b AS b, cents,
                          xor(u32, (gb.b::UBIGINT * 2654435761::UBIGINT)
                                   % 4294967296::UBIGINT) AS v1
                   FROM r, generate_series(0, 31) gb(b)),
            m2 AS (SELECT b, cents,
                          ((v1 * 69069::UBIGINT) % 4294967296::UBIGINT)
                            AS v2
                   FROM m1),
            m3 AS (SELECT b, cents, xor(v2, v2 >> 16) AS v3 FROM m2),
            m4 AS (SELECT b, cents,
                          ((v3 * 40503::UBIGINT) % 4294967296::UBIGINT)
                            AS v4
                   FROM m3),
            m5 AS (SELECT b, cents,
                          (xor(v4, v4 >> 13) % 1000000::UBIGINT)::BIGINT
                            AS ppm
                   FROM m4),
            w AS (SELECT b, cents,
                         CASE WHEN ppm < 367879 THEN 0
                              WHEN ppm < 735758 THEN 1
                              WHEN ppm < 919698 THEN 2
                              WHEN ppm < 981011 THEN 3
                              WHEN ppm < 996339 THEN 4
                              WHEN ppm < 999405 THEN 5
                              WHEN ppm < 999916 THEN 6
                              WHEN ppm < 999989 THEN 7
                              WHEN ppm < 999998 THEN 8
                              WHEN ppm < 999999 THEN 9
                              ELSE 10 END::BIGINT AS wt
                  FROM m5)
            SELECT b::BIGINT AS b, sum(wt)::BIGINT AS n_w,
                   sum(wt * cents)::BIGINT AS sum_w,
                   (sum(wt * cents) // greatest(sum(wt), 1))::BIGINT
                     AS mean_val
            FROM w GROUP BY b ORDER BY b""",
        "pareto_docs": r"""
            WITH tt AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                               ((1000000 * count(DISTINCT token))
                                // count(*))::BIGINT AS ttr_ppm
                        FROM (SELECT doc_id,
                                     unnest(regexp_extract_all(
                                         text, '\S+')) AS token
                              FROM documents)
                        GROUP BY doc_id)
            SELECT doc_id, ttr_ppm, n_tokens FROM tt p
            WHERE NOT EXISTS (
                SELECT 1 FROM tt o
                WHERE o.ttr_ppm >= p.ttr_ppm
                  AND o.n_tokens >= p.n_tokens
                  AND (o.ttr_ppm > p.ttr_ppm OR o.n_tokens > p.n_tokens))
            ORDER BY doc_id""",
        "fertility": r"""
            WITH c AS (SELECT lang,
                              len(regexp_extract_all(text, '\S+'))::BIGINT
                                AS w,
                              len(regexp_extract_all(text,
                                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
                                ::BIGINT AS b
                       FROM documents)
            SELECT lang, sum(w)::BIGINT AS words, sum(b)::BIGINT AS bpe,
                   ((1000000 * sum(b)) // sum(w))::BIGINT AS fertility_ppm
            FROM c GROUP BY lang ORDER BY lang""",
        "psnr_gate": r"""
            WITH d AS (SELECT doc_id,
                              ('0x'||substr(md5('img:'||
                                 CAST(doc_id AS VARCHAR)),1,16))::UBIGINT
                                 AS u
                       FROM documents),
            m AS (SELECT doc_id, u,
                         CASE (u % 6)::INT WHEN 0 THEN 32 WHEN 1 THEN 48
                              WHEN 2 THEN 64 WHEN 3 THEN 40 WHEN 4 THEN 56
                              ELSE 80 END::BIGINT AS w,
                         CASE (u % 6)::INT WHEN 0 THEN 24 WHEN 1 THEN 32
                              WHEN 2 THEN 48 WHEN 3 THEN 40 WHEN 4 THEN 42
                              ELSE 60 END::BIGINT AS h,
                         CASE WHEN ((u >> 3) % 2) = 0 THEN 'png'
                              ELSE 'qimg' END AS fmt,
                         (1 + u % 5) AS s5, (1 + (u >> 4) % 7) AS s7,
                         (u & 4294967295::UBIGINT) AS s32,
                         (u % 256) AS s256
                  FROM d),
            px AS (SELECT m.doc_id, m.fmt, m.w, m.h, m.s5, m.s7, m.s256,
                          gx.x::UBIGINT AS x, gy.y::UBIGINT AS y,
                          ((xor(xor((gx.x::UBIGINT * 2654435761::UBIGINT)
                                      % 4294967296::UBIGINT,
                                    gy.y::UBIGINT * 40503::UBIGINT),
                                gc.c::UBIGINT * 69069::UBIGINT)
                            + m.s32) % 4294967296::UBIGINT) AS n1
                   FROM m, generate_series(0, 79) gx(x),
                        generate_series(0, 59) gy(y),
                        generate_series(0, 2) gc(c)
                   WHERE gx.x < m.w AND gy.y < m.h AND m.fmt = 'qimg'),
            e AS (SELECT doc_id,
                         ((((xor(n1, n1 >> 13) & 63::UBIGINT)
                            + x * s5 + y * s7 + s256) % 256::UBIGINT)
                          % 8)::BIGINT - 4 AS err
                  FROM px),
            sq AS (SELECT doc_id, sum(err * err)::BIGINT AS sq_err_sum
                   FROM e GROUP BY doc_id)
            SELECT m.doc_id, m.fmt, (m.w * m.h * 3)::BIGINT AS n_px,
                   coalesce(sq.sq_err_sum, 0)::BIGINT AS sq_err_sum,
                   (65025 * m.w * m.h * 3
                    >= 10000 * coalesce(sq.sq_err_sum, 0)) AS pass_40db
            FROM m LEFT JOIN sq ON m.doc_id = sq.doc_id
            ORDER BY m.doc_id""",
        "phash_bit_balance": r"""
            WITH p AS (SELECT doc_id,
                              xor(('0x'||substr(md5('ph:'||
                                    CAST(doc_id // 4 AS VARCHAR)),1,16))
                                    ::UBIGINT,
                                  (CASE doc_id % 4 WHEN 1 THEN 32
                                        WHEN 2 THEN 32 WHEN 3 THEN 524288
                                        ELSE 0 END)::UBIGINT) AS ph
                       FROM documents),
            b AS (SELECT g.bit AS bit,
                         sum(((ph >> g.bit::INT) & 1::UBIGINT))::BIGINT
                           AS ones,
                         count(*)::BIGINT AS n
                  FROM p, generate_series(0, 63) g(bit) GROUP BY g.bit)
            SELECT bit, ones, n, (1000000 * ones // n)::BIGINT
                     AS balance_ppm
            FROM b ORDER BY bit""",
        "promo_revenue": """
            WITH r AS (
              SELECT l.l_partkey,
                     round(l.l_extendedprice*100)::BIGINT
                       * round((1.0-l.l_discount)*100)::BIGINT AS rev,
                     p.p_type
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
                AND l.l_shipdate < TIMESTAMP '1996-10-01'),
            s AS (SELECT coalesce(sum(CASE WHEN p_type LIKE 'PROMO%'
                                      THEN rev END), 0)::BIGINT AS promo_c4,
                         coalesce(sum(rev), 0)::BIGINT AS total_c4
                  FROM r)
            SELECT promo_c4, total_c4,
                   (1000000 * promo_c4 // greatest(total_c4, 1))::BIGINT
                     AS promo_ppm
            FROM s""",
        "returned_revenue": """
            SELECT c.c_custkey, c.c_name,
                   sum(round(l.l_extendedprice*100)::BIGINT
                       * round((1.0-l.l_discount)*100)::BIGINT)::BIGINT
                     AS revenue_c4
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2
            ORDER BY revenue_c4 DESC, c.c_custkey LIMIT 20""",
        "large_orders": """
            WITH g AS (
              SELECT l_orderkey AS o_orderkey,
                     sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty
              FROM lineitem GROUP BY 1 HAVING sum_qty > 200)
            SELECT g.o_orderkey, c.c_name,
                   round(o.o_totalprice*100)::BIGINT AS o_total_cents,
                   g.sum_qty
            FROM g JOIN orders o USING (o_orderkey)
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY g.sum_qty DESC, g.o_orderkey LIMIT 100""",
        "supplier_share": """
            WITH g AS (
              SELECT l_suppkey AS s_suppkey,
                     sum(round(l_extendedprice*100)::BIGINT
                         * round((1.0-l_discount)*100)::BIGINT)::BIGINT
                       AS total_rev_c4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY 1)
            SELECT g.s_suppkey, s.s_name, g.total_rev_c4
            FROM g JOIN supplier s USING (s_suppkey)
            WHERE g.total_rev_c4 = (SELECT max(total_rev_c4) FROM g)
            ORDER BY g.s_suppkey""",
        "avg_yearly": """
            WITH a AS (
              SELECT l_partkey, sum(round(l_quantity)::BIGINT) AS s,
                     count(*)::BIGINT AS c
              FROM lineitem GROUP BY 1)
            SELECT coalesce(sum(round(l.l_extendedprice*100)::BIGINT),
                            0)::BIGINT AS total_cents,
                   count(*)::BIGINT AS n_items
            FROM lineitem l JOIN a USING (l_partkey)
            WHERE 5 * round(l.l_quantity)::BIGINT * a.c < a.s""",
        "phash_caption_conflict": r"""
            WITH p AS (SELECT doc_id, substr(text, 1, 64) AS caption,
                              xor(('0x'||substr(md5('ph:'||
                                    CAST(doc_id // 4 AS VARCHAR)),1,16))
                                    ::UBIGINT,
                                  (CASE doc_id % 4 WHEN 1 THEN 32
                                        WHEN 2 THEN 32 WHEN 3 THEN 524288
                                        ELSE 0 END)::UBIGINT) AS ph
                       FROM documents),
            g AS (SELECT ph, count(*)::BIGINT AS n_images,
                         count(DISTINCT caption)::BIGINT AS n_captions,
                         min(doc_id)::BIGINT AS keeper_doc_id
                  FROM p GROUP BY ph HAVING count(DISTINCT caption) > 1)
            SELECT CASE WHEN ph > 9223372036854775807::UBIGINT
                        THEN (ph::HUGEINT - 18446744073709551616)::BIGINT
                        ELSE ph::BIGINT END AS phash,
                   n_images, n_captions, keeper_doc_id
            FROM g ORDER BY phash""",
        "stopword_ratio": r"""
            SELECT doc_id, n_tokens, n_stop,
                   (1000000 * n_stop // greatest(n_tokens, 1))::BIGINT
                     AS stop_ppm
            FROM (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '\S+'))::BIGINT
                       AS n_tokens,
                     len(list_filter(regexp_extract_all(lower(text), '\S+'),
                         x -> list_contains(['the','a','and','of','to',
                                             'in','is','it','for','on'], x)
                         ))::BIGINT AS n_stop
              FROM documents)
            ORDER BY doc_id""",
        "drawdown": """
            WITH w AS (SELECT user_id, event_id, ts,
                              floor(value*100 + 0.5)::BIGINT AS cents
                       FROM events),
            p AS (SELECT user_id, cents,
                         max(cents) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS peak
                  FROM w)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   max(cents)::BIGINT AS peak_cents,
                   max(peak - cents)::BIGINT AS max_drawdown_cents
            FROM p GROUP BY 1 ORDER BY 1""",
        "langid_stability": f"""
            WITH f AS ({_langid_counts_sql('text')}),
            p AS ({_langid_counts_sql('substr(text, 1, 64)')})
            SELECT f.doc_id, f.lang_pred AS lang_full,
                   p.lang_pred AS lang_prefix,
                   (f.lang_pred = p.lang_pred)::BIGINT AS stable
            FROM f JOIN p USING (doc_id) ORDER BY f.doc_id""",
        "mcnemar_langid": f"""
            WITH f AS ({_langid_counts_sql('text')}),
            p AS ({_langid_counts_sql('substr(text, 1, 64)')}),
            j AS (SELECT (f.lang_pred = d.lang) AS a_ok,
                         (p.lang_pred = d.lang) AS b_ok
                  FROM documents d JOIN f USING (doc_id)
                  JOIN p USING (doc_id)),
            s AS (SELECT sum((a_ok AND b_ok)::INT)::BIGINT AS both_ok,
                         sum((a_ok AND NOT b_ok)::INT)::BIGINT AS only_full,
                         sum((NOT a_ok AND b_ok)::INT)::BIGINT AS only_prefix,
                         sum((NOT a_ok AND NOT b_ok)::INT)::BIGINT
                           AS both_wrong
                  FROM j)
            SELECT both_ok, only_full, only_prefix, both_wrong,
                   CASE WHEN only_full + only_prefix = 0 THEN 0
                        ELSE 1000000 * (abs(only_full - only_prefix) - 1)
                             * (abs(only_full - only_prefix) - 1)
                             // (only_full + only_prefix)
                   END::BIGINT AS mcnemar_micro
            FROM s""",
        "caption_dup_images": r"""
            WITH p AS (SELECT doc_id, substr(text, 1, 16) AS caption,
                              xor(('0x'||substr(md5('ph:'||
                                    CAST(doc_id // 4 AS VARCHAR)),1,16))
                                    ::UBIGINT,
                                  (CASE doc_id % 4 WHEN 1 THEN 32
                                        WHEN 2 THEN 32 WHEN 3 THEN 524288
                                        ELSE 0 END)::UBIGINT) AS ph
                       FROM documents)
            SELECT caption, count(*)::BIGINT AS n_images,
                   count(DISTINCT ph)::BIGINT AS n_phashes,
                   min(doc_id)::BIGINT AS keeper_doc_id
            FROM p GROUP BY caption
            HAVING count(DISTINCT ph) > 1
            ORDER BY caption""",
        "trap_urls": """
            WITH u AS (SELECT doc_id,
                              CASE WHEN doc_id % 37 = 0
                                   THEN 'cat/' || repeat('page/',
                                        (2 + doc_id % 3)::INT)
                                        || doc_id
                                   ELSE 'p/' || doc_id END AS path
                       FROM documents),
            s AS (SELECT doc_id, unnest(string_split(path, '/')) AS seg
                  FROM u),
            c AS (SELECT doc_id, seg, count(*)::BIGINT AS k
                  FROM s GROUP BY 1, 2),
            a AS (SELECT doc_id, sum(k)::BIGINT AS n_segments,
                         max(k)::BIGINT AS max_seg_repeat
                  FROM c GROUP BY 1)
            SELECT doc_id, n_segments, max_seg_repeat,
                   (max_seg_repeat >= 3)::BIGINT AS is_trap
            FROM a ORDER BY doc_id""",
        "modularity": f"""
            WITH e AS (SELECT DISTINCT doc_id % {_PR_NODES} AS src,
                              (doc_id * {_PR_MIX}) % {_PR_NODES} AS dst
                       FROM documents),
            m AS (SELECT count(*)::BIGINT AS m FROM e),
            comm AS (SELECT g.c AS community FROM generate_series(0, 7) g(c)),
            st AS (SELECT comm.community,
                          coalesce(sum(CASE WHEN e.src % 8 = comm.community
                                        AND e.dst % 8 = comm.community
                                       THEN 1 END), 0)::BIGINT AS e_within,
                          coalesce(sum(CASE WHEN e.src % 8 = comm.community
                                       THEN 1 END), 0)::BIGINT AS dout,
                          coalesce(sum(CASE WHEN e.dst % 8 = comm.community
                                       THEN 1 END), 0)::BIGINT AS din
                   FROM comm LEFT JOIN e ON TRUE
                   GROUP BY comm.community)
            SELECT st.community, st.e_within, st.dout, st.din,
                   1000000 * (m.m * st.e_within - st.dout * st.din)
                     AS q_num_micro,
                   m.m AS m_edges
            FROM st CROSS JOIN m ORDER BY st.community""",
        "balanced_downsample": """
            WITH d AS (SELECT doc_id, lang, source,
                              ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),
                                            1,16))::UBIGINT AS h
                       FROM documents),
            k AS (SELECT min(cnt)::BIGINT AS k FROM (
                    SELECT count(*) AS cnt FROM d GROUP BY lang, source)),
            r AS (SELECT doc_id, lang, source,
                         row_number() OVER (PARTITION BY lang, source
                                            ORDER BY h, doc_id) AS rn
                  FROM d)
            SELECT lang, source, doc_id FROM r CROSS JOIN k
            WHERE rn <= k.k ORDER BY lang, source, doc_id""",
    }
    # join-path twins replay the SAME SQL as their dense siblings
    sql["graph_bfs_join"] = sql["graph_bfs"]
    sql["ppr_join"] = sql["ppr"]
    return sql
