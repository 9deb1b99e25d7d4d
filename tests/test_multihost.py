"""Two-process multi-host training test (VERDICT round-1 item 4).

Simulates the reference's torch.distributed.launch + DistributedSampler
contract (train.py:296-301,377-384) without a cluster: two CPU processes
rendezvous via jax.distributed, build a cross-process (data=2) mesh, load
DISJOINT dataset shards, and train one epoch of a tiny model. The parent
asserts the shards were disjoint and the replicated parameters ended
identical on both processes.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_child.py")
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), coordinator, str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"out_{pid}.json") as f:
            results.append(json.load(f))

    # Disjoint data shards covering the dataset (DistributedSampler contract).
    i0, i1 = set(results[0]["indices"]), set(results[1]["indices"])
    assert i0.isdisjoint(i1), (i0, i1)
    assert len(i0) == len(i1) == 2

    # Replicated state stayed consistent: same step count, same params.
    assert results[0]["step"] == results[1]["step"] == 2
    assert results[0]["param_sum"] == pytest.approx(
        results[1]["param_sum"], rel=1e-6
    )
    for r in results:
        assert r["loss"] == r["loss"], "loss is NaN"  # not NaN
