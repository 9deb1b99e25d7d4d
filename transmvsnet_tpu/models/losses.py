"""Training losses: masked cross-entropy over depth bins, per-stage weighting.

Re-implements the reference losses (reference models/module.py:495-592):
``entropy_loss`` builds the ground-truth depth-bin index (nearest hypothesis),
masks invalid pixels, and averages -log p[gt-bin] per valid pixel;
``cascade_loss`` (reference ``trans_mvsnet_loss``) applies it per stage with
entropy weight 2.0 and per-stage dlossw weights. The BlendedMVS finetune
variant (reference ``focal_loss_bld``, models/module.py:561-592) shares the
same CE core; its extra EPE / <1px / <3px metrics live in
``train/step.py:_bld_metrics`` next to the step that logs them.

All functions are jit-friendly: boolean-mask indexing is replaced by
where/sum reductions.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp


def _masked_mean(values: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    m = mask.astype(values.dtype)
    return jnp.sum(values * m, axis=axis) / (jnp.sum(m, axis=axis) + 1e-10)


def smooth_l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise smooth-L1 (beta=1), torch's F.smooth_l1_loss core."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def entropy_loss(
    prob_volume: jax.Array,
    depth_gt: jax.Array,
    mask: jax.Array,
    depth_values: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Masked CE against the nearest-hypothesis one-hot + WTA depth.

    Args:
      prob_volume: [B, D, H, W] softmaxed probabilities.
      depth_gt: [B, H, W].
      mask: [B, H, W] boolean validity.
      depth_values: [B, D] or [B, D, H, W].

    Returns: (scalar loss, wta_depth [B, H, W]).
    """
    B, D = prob_volume.shape[:2]
    if depth_values.ndim < 3:
        dv_mat = depth_values[:, :, None, None]
        dv_full = jnp.broadcast_to(dv_mat, prob_volume.shape)
    else:
        dv_full = depth_values

    valid_count = jnp.sum(mask.astype(jnp.float32), axis=(1, 2)) + 1e-6  # [B]

    gt_index = jnp.argmin(
        jnp.abs(dv_full - depth_gt[:, None]), axis=1
    )  # [B, H, W]
    gt_index = jnp.where(mask, gt_index, 0)

    log_p = jnp.log(prob_volume + 1e-6)
    ce = -jnp.take_along_axis(log_p, gt_index[:, None], axis=1)[:, 0]  # [B, H, W]
    masked_ce = jnp.sum(ce * mask.astype(ce.dtype), axis=(1, 2)) / valid_count
    loss = jnp.mean(masked_ce)

    idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    wta_depth = jnp.take_along_axis(dv_full, idx, axis=1)[:, 0]
    return loss, wta_depth


def cascade_loss(
    outputs: Mapping[str, Any],
    depth_gt_ms: Mapping[str, jax.Array],
    mask_ms: Mapping[str, jax.Array],
    dlossw: Sequence[float] | None = (1.0, 1.0, 1.0),
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, dict[str, jax.Array]]:
    """Per-stage weighted entropy loss (reference models/module.py:534-558).

    Returns (total_loss, depth_loss, total_entropy, last_stage_wta_depth,
    per_stage_scalars). ``depth_loss`` is the LAST stage's smooth-L1 —
    faithful to the reference, which overwrites it per stage; the per-stage
    values are in ``per_stage_scalars`` (the reference logs these via
    scalar_outputs, train.py:152-160).
    """
    total_loss = 0.0
    total_entropy = 0.0
    depth_loss = 0.0
    wta = None
    per_stage: dict[str, jax.Array] = {}
    stage_keys = sorted(k for k in outputs.keys() if k.startswith("stage"))
    for key in stage_keys:
        stage = outputs[key]
        mask = mask_ms[key] > 0.5
        gt = depth_gt_ms[key]
        entro, wta = entropy_loss(stage["prob_volume"], gt, mask, stage["depth_values"])
        entro = entro * 2.0
        depth_loss = _masked_mean(smooth_l1(wta, gt), mask)
        total_entropy = total_entropy + entro
        per_stage[f"entropy_{key}"] = entro
        per_stage[f"depth_loss_{key}"] = depth_loss
        if dlossw is not None:
            idx = int(key.replace("stage", "")) - 1
            total_loss = total_loss + dlossw[idx] * entro
        else:
            total_loss = total_loss + entro
    return total_loss, depth_loss, total_entropy, wta, per_stage


