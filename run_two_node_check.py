"""Two-node execution evidence (round-3 VERDICT ask #3).

Starts a REAL two-node Ray cluster on this machine (`ray start --head`
+ a second `ray start` worker process — two raylets, two object stores,
two plasma domains; the only thing shared is the box), SPREADs the
frontier shard actors across both nodes, runs the same crawl job on
(a) the 2-node cluster and (b) a plain single-node session with the
same total CPUs, and verifies the sink output is BYTE-IDENTICAL
(full-row md5 over image_id/bytes/w/h/fmt/caption/phash, sorted by
image_id). Prints one JSON line with both wall times, the placement
evidence (actor node ids), and the identical-output verdict.

    python run_two_node_check.py [--hosts 256] [--cpus-per-node 4]

The sink directory doubles as the "shared storage" (same box ==
shared mount); on a real multi-node cluster pass sink_fs/S3 — see
fetch_and_sink's docstring.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
JOB = str(REPO / "run_crawl_job.py")


def _pages_hash(out_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    frags = sorted(pathlib.Path(out_dir).glob("round=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in frags])
    t = t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))
    h = hashlib.md5()
    for col in ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]:
        for v in t[col].to_pylist():
            h.update(repr(v).encode())
    return len(t), h.hexdigest()


def _run_job(args, extra):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, JOB, *extra,
         "--hosts", str(args.hosts), "--seed", "42",
         "--max-class", "4", "--shards", "4",
         "--batch-per-shard", "512", "--checkpoint-every", "0",
         "--pipeline-depth", "3"],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    summary["wall_sec"] = round(time.time() - t0, 1)
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=256)
    ap.add_argument("--cpus-per-node", type=int, default=4)
    ap.add_argument("--port", type=int, default=6391)
    ap.add_argument("--workdir", default="/tmp/frontera_ray_two_node")
    args = ap.parse_args(argv)

    wd = pathlib.Path(args.workdir)
    shutil.rmtree(wd, ignore_errors=True)
    wd.mkdir(parents=True)
    addr = f"127.0.0.1:{args.port}"
    try:
        subprocess.run(["ray", "start", "--head", f"--port={args.port}",
                        f"--num-cpus={args.cpus_per_node}",
                        "--include-dashboard=false"],
                       check=True, capture_output=True, timeout=120)
        subprocess.run(["ray", "start", f"--address={addr}",
                        f"--num-cpus={args.cpus_per_node}"],
                       check=True, capture_output=True, timeout=120)
        two = _run_job(args, ["--address", addr, "--spread-actors",
                              "--out", str(wd / "two")])
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True,
                       timeout=120)
    one = _run_job(args, ["--num-cpus", str(2 * args.cpus_per_node),
                          "--out", str(wd / "one")])

    n2, h2 = _pages_hash(str(wd / "two"))
    n1, h1 = _pages_hash(str(wd / "one"))
    verdict = {
        "two_node": {"pages": n2, "wall_sec": two["wall_sec"],
                     "placement": two.get("placement")},
        "single_node": {"pages": n1, "wall_sec": one["wall_sec"]},
        "byte_identical": h1 == h2,
        "cross_node_actors": len((two.get("placement") or {})
                                 .get("actor_nodes", [])) >= 2,
    }
    print(json.dumps(verdict), flush=True)
    ok = verdict["byte_identical"] and verdict["cross_node_actors"]
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
