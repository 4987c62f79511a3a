"""Crawl job entrypoint (``ray job submit``-style).

Runs (or resumes) a checkpointed crawl of a deterministic synthetic web:

    python run_crawl_job.py --out /tmp/crawl --hosts 64 [--resume] \
        [--max-rounds N] [--checkpoint-every K] [--strategy depth_bfs]

On a cluster this is the script handed to ``ray job submit``; locally it
owns its own ray.init (guarded). A killed run restarts with ``--resume``
and continues from the latest complete checkpoint, rewriting only the
in-flight round (pages are a pure function of the URL, so re-run
fragments are identical).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-class", type=int, default=None)
    # None default = "not given": with --settings, only explicit flags
    # override the settings module; without it the fallbacks below apply
    ap.add_argument("--strategy", default=None)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--batch-per-shard", type=int, default=None)
    ap.add_argument("--checkpoint-every", type=int, default=None)
    ap.add_argument("--max-rounds", type=int, default=1_000_000)
    ap.add_argument("--pipeline-depth", type=int, default=1,
                    help="overlapped rounds (>1); composes with "
                         "--checkpoint-every via the drain barrier")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--address", default=None,
                    help="connect to an existing Ray cluster (e.g. "
                         "127.0.0.1:6379 from `ray start --head`) "
                         "instead of starting a local session")
    ap.add_argument("--spread-actors", action="store_true",
                    help="SPREAD shard actors across cluster nodes")
    ap.add_argument("--sink-fs", default=None,
                    help="pyarrow filesystem URI for the page sink "
                         "(e.g. s3://bucket/prefix) — REQUIRED on a "
                         "multi-node cluster unless --out is a shared "
                         "mount")
    ap.add_argument("--state-fs", default=None,
                    help="pyarrow filesystem URI for frontier-state "
                         "checkpoints (versioned rename-free protocol;"
                         " REQUIRED multi-node, same reasoning)")
    ap.add_argument("--settings", default=None,
                    help="settings module path (frontera-style); CLI "
                         "flags given explicitly still win")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if args.address:  # existing cluster (ray start / ray job submit)
            ray.init(address=args.address, log_to_driver=False)
        else:
            kwargs = dict(address="local", include_dashboard=False,
                          log_to_driver=False)
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
            ray.init(**kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from frontera_ray.graphs import SyntheticWeb
    from frontera_ray.pipelines.crawl import RayCrawler

    web = SyntheticWeb(args.hosts, seed=args.seed, max_class=args.max_class)
    if args.settings:
        from frontera_ray.settings import Settings, ray_crawler_from_settings

        overrides = {k: v for k, v in dict(
            strategy=args.strategy, num_state_shards=args.shards,
            num_queue_shards=args.shards,
            batch_per_shard=args.batch_per_shard,
            checkpoint_every=args.checkpoint_every).items() if v is not None}
        crawler = ray_crawler_from_settings(
            web, args.out, Settings(args.settings), **overrides)
    else:
        shards = args.shards if args.shards is not None else 4
        crawler = RayCrawler(
            web, args.out,
            strategy=args.strategy or "depth_bfs",
            num_state_shards=shards, num_queue_shards=shards,
            batch_per_shard=args.batch_per_shard or 512,
            checkpoint_every=(args.checkpoint_every
                              if args.checkpoint_every is not None else 2),
            actor_placement="spread" if args.spread_actors else None,
            sink_fs=args.sink_fs, state_fs=args.state_fs,
        )
    if args.resume:
        meta = crawler.restore()
        print(f"resumed from round {meta['round']}", flush=True)
    else:
        crawler.add_seeds(web.seeds())

    summary = crawler.run(max_rounds=args.max_rounds,
                          pipeline_depth=args.pipeline_depth)
    crawler.checkpoint()
    crawler.export_stats(f"{args.out}/stats.json")
    placement = {
        "nodes": len([n for n in ray.nodes() if n.get("Alive")]),
        "actor_nodes": sorted({
            ray.get(a.node_id.remote())[:12]
            for a in (*crawler.state_actors, *crawler.queue_actors)}),
    }
    print(json.dumps({**summary, "expected_pages": web.total_pages(),
                      "placement": placement}), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
