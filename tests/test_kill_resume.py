"""Hard-kill resumability: SIGKILL a crawl job mid-run, resume it in a
fresh process, and verify the final output equals an uninterrupted run
(the north rule's 'killed run resumes exactly' criterion, with a real
kill — not a graceful stop)."""

import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "run_crawl_job.py")
ARGS = ["--hosts", "24", "--seed", "7", "--max-class", "3",
        "--shards", "2", "--batch-per-shard", "48", "--checkpoint-every", "2",
        "--num-cpus", "4"]


def _pages(out):
    frags = sorted(__import__("pathlib").Path(out).glob("round=*/*.parquet"))
    urls = []
    for f in frags:
        urls.extend(pq.read_table(f, columns=["image_id"])["image_id"].to_pylist())
    return urls


@pytest.mark.parametrize("depth", [1, 3])
def test_sigkill_and_resume(tmp_path, depth):
    ref_out = str(tmp_path / "ref")
    kill_out = str(tmp_path / "killed")
    ARGS = [*globals()["ARGS"], "--pipeline-depth", str(depth)]

    # uninterrupted reference run
    ref = subprocess.run([sys.executable, JOB, "--out", ref_out, *ARGS],
                         capture_output=True, text=True, timeout=300, cwd=REPO)
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_urls = sorted(_pages(ref_out))
    assert ref_urls

    # killed run: SIGKILL once the first checkpoint exists
    proc = subprocess.Popen([sys.executable, JOB, "--out", kill_out, *ARGS],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            cwd=REPO)
    ckpt = os.path.join(kill_out, "checkpoint", "meta.json")
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(ckpt):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    if not os.path.exists(ckpt):
        pytest.skip("job finished before first checkpoint; nothing to kill")

    # resume in a fresh process
    res = subprocess.run([sys.executable, JOB, "--out", kill_out, "--resume",
                          *ARGS], capture_output=True, text=True, timeout=300,
                         cwd=REPO)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "resumed from round" in res.stdout

    got_urls = sorted(_pages(kill_out))
    assert got_urls == ref_urls  # identical pages, no dups, no gaps
