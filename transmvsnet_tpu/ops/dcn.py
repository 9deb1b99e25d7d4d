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

from transmvsnet_tpu.ops.sampling import bilinear_gather_cf, bilinear_sample


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

    # Loop over taps, accumulating output: avoids materializing the
    # [B, Ho, Wo, K, C] deformable-im2col tensor, whose K=9 dimension picks
    # up a ~7x TPU tile-padding blowup. Gathers run channels-first
    # ([B, C, N]: no 128-lane padding of small C); each tap is one
    # [B, N, C_in] x [C_in, C_out] MXU contraction.
    x_cf = x.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    M = Ho * Wo
    O = weight.shape[-1]

    def tap_contribution(k, px, py, m, xs_cf):
        """One tap for one batch slice: gather + MXU contraction.
        px/py/m: [b, M]; xs_cf: [b, C, H*W]. Returns [b, M, O] f32."""
        sampled = bilinear_gather_cf(xs_cf, (H, W), px, py)
        sampled = sampled * m[:, None, :]
        return jnp.einsum(
            "bcm,co->bmo",
            sampled,
            weight[k].astype(sampled.dtype),
            preferred_element_type=jnp.float32,
        )

    # XLA pads the gathered row to 128 lanes; bound the per-tap transient by
    # mapping over batch when the padded size would be large (> ~512 MB).
    chunk_batch = B * M * 128 * 4 > 512 * 1024 * 1024 and B > 1

    out = jnp.zeros((B, M, O), jnp.float32)
    for k in range(K):
        i, j = k // kw, k % kw
        py = (gy[None] + i * dilation + offset_y[..., k]).reshape(B, M)
        px = (gx[None] + j * dilation + offset_x[..., k]).reshape(B, M)
        m = mask[..., k].reshape(B, M)
        if chunk_batch:
            contrib = jax.lax.map(
                lambda args, kk=k: tap_contribution(
                    kk, args[0][None], args[1][None], args[2][None], args[3][None]
                )[0],
                (px, py, m, x_cf),
            )
        else:
            contrib = tap_contribution(k, px, py, m, x_cf)
        out = out + contrib
    out = out.reshape(B, Ho, Wo, O).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
