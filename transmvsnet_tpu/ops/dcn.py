"""Modulated deformable convolution (DCNv2) as gather + matmul.

TPU-native formulation of the reference's ``torchvision.ops.deform_conv2d``
use (reference models/dcn.py:66-80): there is no deform-conv XLA op, so we
build the deformable im2col explicitly with bilinear gathers (zeros padding,
like torchvision) and contract the (tap × channel) axis with the weight on
the MXU. Offsets are interleaved (Δy, Δx) per kernel tap, matching
torchvision's channel layout so converted weights are drop-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transmvsnet_tpu.ops.sampling import bilinear_sample


def deform_conv2d(
    x: jax.Array,
    offset_y: jax.Array,
    offset_x: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Modulated deformable 2D convolution.

    Args:
      x: [B, H, W, C_in].
      offset_y, offset_x: [B, H_out, W_out, K] learned per-tap offsets, where
        K = kh*kw taps in row-major order.
      mask: [B, H_out, W_out, K] modulation in [0, 1] (already sigmoided).
      weight: [K, C_in, C_out] conv weight, tap-major.
      bias: [C_out] or None.

    Returns: [B, H_out, W_out, C_out].
    """
    B, H, W, C = x.shape
    K = offset_y.shape[-1]
    kh = kw = int(round(K**0.5))
    assert kh * kw == K, "square kernels only"
    Ho, Wo = offset_y.shape[1], offset_y.shape[2]

    ys = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    xs = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    gy = jnp.broadcast_to(ys[:, None], (Ho, Wo))
    gx = jnp.broadcast_to(xs[None, :], (Ho, Wo))

    ki = jnp.arange(K) // kw
    kj = jnp.arange(K) % kw
    # Sample positions per tap: [B, Ho, Wo, K]
    py = gy[None, :, :, None] + (ki * dilation).astype(jnp.float32) + offset_y
    px = gx[None, :, :, None] + (kj * dilation).astype(jnp.float32) + offset_x

    sampled = bilinear_sample(x, px, py)  # [B, Ho, Wo, K, C]
    sampled = sampled * mask[..., None]

    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        sampled,
        weight.astype(sampled.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
