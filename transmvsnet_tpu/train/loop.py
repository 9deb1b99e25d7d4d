"""Training loop: epochs over a sharded loader with eval + checkpointing.

The runtime shape of reference train.py:52-118 rebuilt functionally: one
jitted train step, per-epoch eval, rank-0 logging and checkpointing, epoch
resume. Scalars are averaged with a DictMeter (the DictAverageMeter
analog, reference utils.py:119-138).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


class DictMeter:
    """Running sums of scalar outputs.

    Accumulates device arrays lazily (an on-device add per step) so the
    loop never blocks on a per-step device→host fetch; values are only
    materialized at ``mean()``.
    """

    def __init__(self):
        self.data: dict[str, Any] = {}
        self.count = 0

    def update(self, scalars: dict[str, Any]) -> None:
        self.count += 1
        for k, v in scalars.items():
            self.data[k] = self.data.get(k, 0.0) + v

    def mean(self) -> dict[str, float]:
        return {k: float(v) / max(self.count, 1) for k, v in self.data.items()}


class MetricsLogger:
    """JSONL metrics log + optional TensorBoard (if torch's TB is present)."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled and jax.process_index() == 0
        self.logdir = logdir
        self._tb = None
        if self.enabled:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def log(self, mode: str, scalars: dict[str, float], step: int) -> None:
        if not self.enabled:
            return
        rec = {"mode": mode, "step": step, **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{mode}/{k}", float(v), step)


def to_device_batch(batch: dict[str, Any], mesh=None) -> dict[str, Any]:
    """Host batch -> device arrays (sharded over 'data' if a mesh is given)."""
    arrays = {
        k: v
        for k, v in batch.items()
        if not isinstance(v, list)  # drop filename-style metadata
    }
    tree = jax.tree_util.tree_map(jnp.asarray, arrays)
    if mesh is not None:
        from transmvsnet_tpu.parallel.sharding import shard_batch

        tree = shard_batch(tree, mesh)
    return tree


def run_epoch(
    step_fn: Callable,
    state,
    loader: Iterable,
    mesh=None,
    train: bool = True,
    logger: MetricsLogger | None = None,
    mode: str = "train",
    log_freq: int = 50,
    epoch: int = 0,
):
    """One pass over the loader. Returns (state, epoch-mean scalars)."""
    meter = DictMeter()
    t_last = time.time()
    i_last = -1
    for i, raw in enumerate(loader):
        batch = to_device_batch(
            {
                k: raw[k]
                for k in (
                    "imgs",
                    "proj_matrices",
                    "depth_values",
                    "depth",
                    "mask",
                    "depth_interval",
                )
                if k in raw
            },
            mesh,
        )
        if train:
            state, scalars = step_fn(state, batch)
        else:
            scalars = step_fn(state, batch)
        # "_"-prefixed outputs are image-sized tensors for summaries; they
        # are only fetched (device sync) at log_freq boundaries.
        images = {k: scalars.pop(k) for k in list(scalars) if k.startswith("_")}
        meter.update(scalars)
        if logger and (i % log_freq == 0):
            now = time.time()
            step_no = int(state.step) if train else epoch
            logger.log(
                mode,
                {
                    **{k: float(v) for k, v in scalars.items()},
                    "sec_per_iter": (now - t_last) / max(i - i_last, 1),
                },
                step_no,
            )
            t_last = time.time()
            i_last = i
            if images:
                from transmvsnet_tpu.utils_vis import log_depth_images

                outputs = {
                    "stage3": {
                        "depth": images["_depth_est"],
                        "photo_confidence": images["_confidence"],
                    }
                }
                log_depth_images(logger, mode, outputs, batch, step_no)
    return state, meter.mean()
