"""Projective geometry for plane-sweep multi-view stereo.

Math follows the reference behavior (reference models/TransMVSNet.py:75-78,
models/module.py:284-322,606-634) re-derived for channel-last JAX:

- A camera is described by a pair (extrinsics 4x4, intrinsics-in-homogeneous
  4x4) stacked as ``proj[..., 2, 4, 4]`` — the per-stage "proj_matrix" data
  contract of the reference datasets (reference datasets/dtu_yao.py:153-184).
- ``fuse_projection`` composes them into a single 4x4 P = [[K @ E[:3,:4]], e4].
- ``warp_coords`` produces the source-view pixel coordinates of every
  (ref pixel, depth hypothesis) pair; points behind the source camera are
  pushed far out of range so a zeros-padded sampler drops them (the
  reference marks them with normalized coordinate -99).
- ``stage_depth_samples`` reproduces the cascade hypothesis schedule
  (reference models/module.py:606-634 + the trilinear stage resize at
  models/TransMVSNet.py:202-204). The resize composition is algebraically
  collapsed: depth samples are affine in the center depth with per-slice
  constant offsets, and bilinear resizing commutes with affine maps, so we
  resize the center-depth map instead of a [B, D, H, W] volume. The D-axis
  trilinear resize is the identity (same size, half-pixel centers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transmvsnet_tpu.ops.sampling import resize_bilinear

_INVALID_COORD = -1.0e6


def fuse_projection(proj: jax.Array) -> jax.Array:
    """Compose [..., 2, 4, 4] (extrinsics, intrinsics) into one 4x4 projection."""
    ext = proj[..., 0, :, :]
    intr = proj[..., 1, :3, :3]
    top = intr @ ext[..., :3, :]  # [..., 3, 4]
    bottom = ext[..., 3:4, :]  # [..., 1, 4] — (0, 0, 0, 1)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_fused_projection(proj: jax.Array) -> jax.Array:
    """Closed-form inverse of a fused projection [[M, p], [0, 1]].

    M = K·R is invertible 3x3; the block inverse [[M⁻¹, -M⁻¹p], [0, 1]]
    via the adjugate avoids an LU decomposition inside the hot path.
    """
    M = proj[..., :3, :3]
    p = proj[..., :3, 3:4]
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    Minv = adj * inv_det[..., None, None]
    top = jnp.concatenate([Minv, -(Minv @ p)], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], proj.dtype), (*proj.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def relative_projection(src_proj: jax.Array, ref_proj: jax.Array) -> jax.Array:
    """P_src @ P_ref^-1 for fused 4x4 projections. [..., 4, 4]."""
    return src_proj @ invert_fused_projection(ref_proj)


def warp_coords(
    src_proj: jax.Array,
    ref_proj: jax.Array,
    depth_values: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Source-view sample coordinates for every ref pixel × depth hypothesis.

    Args:
      src_proj, ref_proj: [B, 4, 4] fused projections (``fuse_projection``).
      depth_values: [B, D, H, W] per-pixel depth hypotheses.

    Returns:
      (x, y): each [B, D, H, W], pixel coordinates into the source view.
      Invalid points (z < 1e-6 in the source frame) map to a far out-of-range
      coordinate so zeros-padding samplers return 0 for them.
    """
    B, D, H, W = depth_values.shape
    proj = relative_projection(src_proj, ref_proj)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    ones = jnp.ones_like(gx)
    pix = jnp.stack([gx, gy, ones], axis=0).reshape(3, H * W)  # [3, N]

    base = rot @ pix  # [B, 3, N]
    depth = depth_values.reshape(B, 1, D, H * W)
    xyz = base[:, :, None, :] * depth + trans[:, :, None, None]  # [B, 3, D, N]
    z = xyz[:, 2]
    invalid = z < 1e-6
    safe_z = jnp.where(invalid, 1.0, z)
    x = jnp.where(invalid, _INVALID_COORD, xyz[:, 0] / safe_z)
    y = jnp.where(invalid, _INVALID_COORD, xyz[:, 1] / safe_z)
    return x.reshape(B, D, H, W), y.reshape(B, D, H, W)


def initial_depth_samples(
    depth_hypotheses: jax.Array, ndepth: int, stage_hw: tuple[int, int]
) -> jax.Array:
    """Stage-1 samples: per-batch linspace over [d_min, d_max], constant per pixel.

    Args:
      depth_hypotheses: [B, Dh] the dataset-level hypothesis list.
      ndepth: number of stage-1 hypotheses.
      stage_hw: stage spatial resolution.

    Returns: [B, ndepth, h, w].
    """
    h, w = stage_hw
    dmin = depth_hypotheses[:, 0]
    dmax = depth_hypotheses[:, -1]
    step = (dmax - dmin) / (ndepth - 1)
    d = jnp.arange(ndepth, dtype=depth_hypotheses.dtype)
    samples = dmin[:, None] + d[None, :] * step[:, None]  # [B, ndepth]
    return jnp.broadcast_to(samples[:, :, None, None], (samples.shape[0], ndepth, h, w))


def refine_depth_samples(
    prev_depth: jax.Array,
    ndepth: int,
    interval: jax.Array | float,
    stage_hw: tuple[int, int],
    full_hw: tuple[int, int],
) -> jax.Array:
    """Stage-2/3 samples: window around the upsampled previous-stage depth.

    Replicates: upsample prev depth bilinearly to full image resolution, build
    the ±ndepth/2·interval window re-linspaced over ndepth bins, trilinearly
    resize to stage resolution — collapsed via linearity to two bilinear
    resizes of the center-depth map plus constant per-slice offsets.

    Args:
      prev_depth: [B, h_prev, w_prev] previous-stage depth (stop-gradient is
        the caller's responsibility, matching the reference .detach()).
      interval: scalar hypothesis spacing for this stage
        (depth_interval * stage interval ratio).

    Returns: [B, ndepth, h, w].
    """
    h, w = stage_hw
    cur = resize_bilinear(prev_depth[..., None], full_hw)
    cur = resize_bilinear(cur, (h, w))[..., 0]  # [B, h, w]
    d = jnp.arange(ndepth, dtype=cur.dtype)
    base = d * (ndepth / (ndepth - 1)) - ndepth / 2  # [D]
    interval = jnp.asarray(interval, cur.dtype)
    offsets = jnp.expand_dims(interval, -1) * base  # [D] or [B, D]
    return cur[:, None, :, :] + offsets[..., :, None, None]


def stage_depth_samples(
    prev_depth: jax.Array | None,
    depth_hypotheses: jax.Array,
    ndepth: int,
    interval: jax.Array | float,
    stage_hw: tuple[int, int],
    full_hw: tuple[int, int],
) -> jax.Array:
    """Dispatch between the initial sweep and the refinement window."""
    if prev_depth is None:
        return initial_depth_samples(depth_hypotheses, ndepth, stage_hw)
    return refine_depth_samples(prev_depth, ndepth, interval, stage_hw, full_hw)
