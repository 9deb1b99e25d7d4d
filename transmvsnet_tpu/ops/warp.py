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

from transmvsnet_tpu.ops.sampling import bilinear_gather_cf, bilinear_sample
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
    """Warped-source × reference correlation volume, fused channels-first.

    The warped [B, D, H, W, C] volume is never materialized channel-last:
    gathers run in a [B, C, N] layout (no 128-lane padding of small C —
    the difference between fitting in HBM and a 4-16x blowup at DTU
    resolution) and each bilinear tap is immediately contracted against the
    reference features.

    Args:
      src_fea, ref_fea: [B, H, W, C].
      src_proj, ref_proj: [B, 4, 4] fused projections.
      depth_values: [B, D, H, W].

    Returns: [B, D, H, W] similarity = mean over C of (warped_src * ref).
    """
    B, H, W, C = src_fea.shape
    D = depth_values.shape[1]
    x, y = warp_coords(src_proj, ref_proj, depth_values)
    x = jax.lax.stop_gradient(x)  # [B, D, H, W]
    y = jax.lax.stop_gradient(y)

    src_cf = src_fea.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    ref_cf = ref_fea.transpose(0, 3, 1, 2).reshape(B, C, H * W)

    # XLA's TPU gather pads the gathered C-row to the 128-lane tile, so the
    # transient for a whole [D, H, W] sweep would be D·H·W·128 floats
    # regardless of C. Chunk over depth planes: peak transient is one
    # plane's worth and the per-plane gathers stay large enough to saturate.
    def one_plane(coords):
        px, py = coords  # [B, H, W]
        g = bilinear_gather_cf(
            src_cf, (H, W), px.reshape(B, H * W), py.reshape(B, H * W)
        )  # [B, C, H*W]
        sim = jnp.mean(g * ref_cf, axis=1, dtype=jnp.float32)
        return sim.astype(src_fea.dtype).reshape(B, H, W)

    sim = jax.lax.map(one_plane, (x.transpose(1, 0, 2, 3), y.transpose(1, 0, 2, 3)))
    return sim.transpose(1, 0, 2, 3)  # [B, D, H, W]
