"""Homography warping and warp-correlation — the MVS hot path.

``homo_warp`` reproduces the reference's differentiable plane-sweep warp
(reference models/module.py:284-322): gradients flow to the source features
but not to the sample grid (the grid is built under no-grad there; here we
stop-gradient the coordinates explicitly).

``warp_correlate`` fuses the warp with the pair-wise correlation
``mean_C(warped ⊙ ref)`` (reference models/TransMVSNet.py:79-80) so the
[B, D, H, W, C] warped volume never has to be materialized by callers; a
Pallas kernel can replace the body without changing the interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transmvsnet_tpu.ops.sampling import bilinear_sample
from transmvsnet_tpu.ops.geometry import warp_coords


def homo_warp(
    src_fea: jax.Array,
    src_proj: jax.Array,
    ref_proj: jax.Array,
    depth_values: jax.Array,
) -> jax.Array:
    """Warp source features over depth hypotheses.

    Args:
      src_fea: [B, H, W, C] source-view features.
      src_proj, ref_proj: [B, 4, 4] fused projection matrices.
      depth_values: [B, D, H, W].

    Returns: [B, D, H, W, C] warped source features (zeros out of frame).
    """
    x, y = warp_coords(src_proj, ref_proj, depth_values)
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    return bilinear_sample(src_fea, x, y)


def warp_correlate(
    src_fea: jax.Array,
    ref_fea: jax.Array,
    src_proj: jax.Array,
    ref_proj: jax.Array,
    depth_values: jax.Array,
) -> jax.Array:
    """Warped-source × reference correlation volume.

    Args:
      src_fea, ref_fea: [B, H, W, C].
      src_proj, ref_proj: [B, 4, 4] fused projections.
      depth_values: [B, D, H, W].

    Returns: [B, D, H, W] similarity = mean over C of (warped_src * ref).
    """
    warped = homo_warp(src_fea, src_proj, ref_proj, depth_values)
    prod = warped * ref_fea[:, None, :, :, :]
    # Accumulate the channel mean in f32 (matters under bf16 compute).
    return jnp.mean(prod, axis=-1, dtype=jnp.float32).astype(src_fea.dtype)
