"""Two-node execution evidence: a real `ray start` head + worker pair
on this box, shard actors SPREAD across both nodes, and the sink output
byte-identical to a single-node run (round-3 VERDICT ask #3). Heavier
than most tests (~40 s: two cluster daemons + three subprocesses) but
fully hermetic. Runs the same script a cluster operator would:
run_two_node_check.py."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_node_byte_identical(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_two_node_check.py"),
         "--hosts", "32", "--cpus-per-node", "2", "--port", "6393",
         "--workdir", str(tmp_path / "wd")],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    v = json.loads(proc.stdout.strip().splitlines()[-1])
    assert v["byte_identical"]
    assert v["cross_node_actors"]
    assert v["two_node"]["pages"] == v["single_node"]["pages"] > 0
