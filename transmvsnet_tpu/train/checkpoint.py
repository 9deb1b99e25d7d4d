"""Orbax checkpointing with the reference's save/resume contract.

Rank-0-gated epoch checkpoints with resume-from-latest
(reference train.py:84-90,332-347): ``save`` writes
{params, batch_stats, opt_state, step}; ``restore_latest`` picks the
highest step; ``load_weights`` restores weights only (the --loadckpt path).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from transmvsnet_tpu.train.step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, step: int | None = None) -> None:
        step = int(state.step) if step is None else step
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.tree_util.tree_map(lambda x: x, state))
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, template: TrainState) -> tuple[TrainState, int] | None:
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return restored, step


def load_weights(path: str, template_variables: dict[str, Any]) -> dict[str, Any]:
    """Restore {'params', 'batch_stats'} only from a checkpoint directory
    (weights-only load, the reference's --loadckpt)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": template_variables["params"],
        "batch_stats": template_variables["batch_stats"],
    }
    return ckptr.restore(os.path.abspath(path), template)


def save_weights(path: str, variables: dict[str, Any]) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
    )
    ckptr.wait_until_finished()
