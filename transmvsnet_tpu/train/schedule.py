"""Optimizer and LR schedule matching the reference training recipe.

``warmup_multistep``: linear warmup from lr/3 over 500 iterations, then
step decay at iteration milestones (reference utils.py:224-268; milestones
are epochs × steps-per-epoch, reference train.py:55-56).

``make_optimizer``: Adam with torch-style additive L2 weight decay applied
before the Adam moments (torch.optim.Adam(weight_decay=...) semantics,
reference train.py:329) — not AdamW.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    warmup_iters: int = 500,
    warmup_factor: float = 1.0 / 3.0,
) -> optax.Schedule:
    milestones = jnp.asarray(sorted(milestones), dtype=jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        wf = jnp.where(
            step < warmup_iters, warmup_factor * (1.0 - alpha) + alpha, 1.0
        )
        n_passed = jnp.sum(step >= milestones.astype(jnp.float32))
        return base_lr * wf * gamma**n_passed

    return schedule


def make_optimizer(
    schedule: optax.Schedule,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(schedule),
    )
