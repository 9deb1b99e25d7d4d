"""Validation metrics, jit-friendly re-implementations of reference utils.py.

``thres_metric``: fraction of valid pixels with |err| > τ mm, computed
per-image then averaged over the batch (reference utils.py:155-162).
``abs_depth_error``: mean absolute error over valid pixels, optionally
restricted to an error band (reference utils.py:166-175).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_image_masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over masked pixels per image, then mean over the batch."""
    m = mask.astype(values.dtype)
    per_image = jnp.sum(values * m, axis=(1, 2)) / jnp.maximum(
        jnp.sum(m, axis=(1, 2)), 1e-10
    )
    return jnp.mean(per_image)


def thres_metric(
    depth_est: jax.Array, depth_gt: jax.Array, mask: jax.Array, thres: float
) -> jax.Array:
    """Fraction of valid pixels whose |error| exceeds ``thres``. [B,H,W] -> scalar."""
    err = jnp.abs(depth_est - depth_gt)
    return _per_image_masked_mean((err > thres).astype(jnp.float32), mask)


def abs_depth_error(
    depth_est: jax.Array,
    depth_gt: jax.Array,
    mask: jax.Array,
    band: tuple[float, float] | None = None,
) -> jax.Array:
    """Mean |error| over valid pixels (optionally within an error band)."""
    err = jnp.abs(depth_est - depth_gt)
    m = mask
    if band is not None:
        m = m & (err >= band[0]) & (err <= band[1])
    return _per_image_masked_mean(err, m)


def standard_eval_metrics(
    depth_est: jax.Array, depth_gt: jax.Array, mask: jax.Array
) -> dict[str, jax.Array]:
    """The reference's TensorBoard metric set (reference train.py:170-187)."""
    mask = mask > 0.5
    out = {"abs_depth_error": abs_depth_error(depth_est, depth_gt, mask)}
    for t in (2, 4, 8, 14, 20):
        out[f"thres{t}mm_error"] = thres_metric(depth_est, depth_gt, mask, float(t))
    return out
