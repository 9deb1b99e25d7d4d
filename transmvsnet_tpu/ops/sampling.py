"""Differentiable image sampling primitives (channel-last, TPU-friendly).

Semantics match the reference implementation's PyTorch ops exactly so that
converted weights reproduce reference numerics:

- ``bilinear_sample`` / ``grid_sample``: ``F.grid_sample(mode='bilinear',
  padding_mode='zeros', align_corners=True)`` (reference models/module.py:318-319)
  expressed directly in *pixel* coordinates. Out-of-bounds taps contribute zero.
- ``resize_bilinear``: ``F.interpolate(mode='bilinear', align_corners=False)``
  (reference models/TransMVSNet.py:176-178, models/FMT.py:209) — half-pixel
  centers, no antialiasing, border clamping.
- ``upsample_nearest_2x``: ``F.interpolate(scale_factor=2, mode='nearest')``
  (reference models/module.py:414,418; models/TransMVSNet.py:194).

All functions take/return channel-last arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_gather_cf(
    src_cf: jax.Array, hw: tuple[int, int], x: jax.Array, y: jax.Array
) -> jax.Array:
    """Bilinear sampling with a channels-first gather layout.

    TPU-critical: gathering rows of a [N, C] array pads C up to the 128-lane
    tile (4-16x memory/bandwidth blowup for C=8..32). Gathering along the
    *minor* dimension of [B, C, N] instead keeps tensors unpadded.

    Args:
      src_cf: [B, C, H*W] channels-first flattened source.
      hw: (H, W) of the source grid.
      x, y: [B, M] pixel coordinates; out-of-bounds taps contribute zero.

    Returns: [B, C, M] sampled values.
    """
    H, W = hw
    B = src_cf.shape[0]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    dtype = src_cf.dtype

    def in_range(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(dtype)

    def take(yi, xi):
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # [B, M]
        return jnp.take_along_axis(src_cf, idx[:, None, :], axis=2)  # [B, C, M]

    wx = wx.astype(dtype)[:, None, :]
    wy = wy.astype(dtype)[:, None, :]
    one = jnp.ones((), dtype)

    return (
        take(y0i, x0i) * ((one - wx) * (one - wy) * in_range(x0i, y0i)[:, None])
        + take(y0i, x1i) * (wx * (one - wy) * in_range(x1i, y0i)[:, None])
        + take(y1i, x0i) * ((one - wx) * wy * in_range(x0i, y1i)[:, None])
        + take(y1i, x1i) * (wx * wy * in_range(x1i, y1i)[:, None])
    )


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinearly sample ``img`` at pixel coordinates ``(x, y)``.

    Args:
      img: [B, H, W, C] source image/feature map.
      x, y: [B, ...] sample locations in pixel coordinates (0 .. W-1 / H-1).
        Out-of-range taps contribute zero ("zeros" padding).

    Returns:
      [B, ..., C] sampled values. Gradients flow to ``img`` and to ``x``/``y``.
    """
    B, H, W, C = img.shape
    out_shape = x.shape[1:]

    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def in_range(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(
            img.dtype
        )

    v00 = in_range(x0i, y0i)
    v01 = in_range(x1i, y0i)
    v10 = in_range(x0i, y1i)
    v11 = in_range(x1i, y1i)

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    flat = img.reshape(B, H * W, C)

    def take(yi, xi):
        idx = yi * W + xi  # [B, N]
        return jnp.take_along_axis(flat, idx[:, :, None], axis=1)  # [B, N, C]

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    one = jnp.ones((), img.dtype)

    out = (
        take(y0c, x0c) * ((one - wx) * (one - wy) * v00[..., None])
        + take(y0c, x1c) * (wx * (one - wy) * v01[..., None])
        + take(y1c, x0c) * ((one - wx) * wy * v10[..., None])
        + take(y1c, x1c) * (wx * wy * v11[..., None])
    )
    return out.reshape(B, *out_shape, C)


def grid_sample(
    img: jax.Array, grid: jax.Array, align_corners: bool = True
) -> jax.Array:
    """``F.grid_sample`` with normalized [-1, 1] coordinates, zeros padding.

    Args:
      img: [B, H, W, C].
      grid: [B, ..., 2] with (x, y) in [-1, 1].
    """
    B, H, W, C = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return bilinear_sample(img, x, y)


def _source_coords_half_pixel(out_size: int, in_size: int, dtype) -> jax.Array:
    """Half-pixel-center source coords, clamped at 0 like torch interpolate."""
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=dtype)
    src = (dst + 0.5) * scale - 0.5
    return jnp.maximum(src, 0.0)


def _linear_weights(src: jax.Array, in_size: int):
    i0 = jnp.floor(src).astype(jnp.int32)
    w1 = src - i0.astype(src.dtype)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    return i0, i1, w1


def _linear_resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense [out, in] bilinear-interpolation matrix (≤2 nonzeros per row).

    Gathers with static indices are hostile to the TPU (serial row gathers);
    a resize expressed as a small matmul runs on the MXU instead. The
    weights replicate torch interpolate's half-pixel, clamped-at-0,
    align_corners=False rule exactly.
    """
    scale = in_size / out_size
    src = np.maximum((np.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    R = np.zeros((out_size, in_size), np.float32)
    np.add.at(R, (np.arange(out_size), i0), 1.0 - w1)
    np.add.at(R, (np.arange(out_size), i1), w1)
    return R


def _apply_resize_matrices(
    x: jax.Array, Ry: np.ndarray | None, Rx: np.ndarray | None
) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if Ry is not None:
        xf = jnp.einsum(
            "oh,bhwc->bowc", jnp.asarray(Ry), xf,
            preferred_element_type=jnp.float32,
        )
    if Rx is not None:
        xf = jnp.einsum(
            "ow,bhwc->bhoc", jnp.asarray(Rx), xf,
            preferred_element_type=jnp.float32,
        )
    return xf.astype(dtype)


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], via: str = "auto"
) -> jax.Array:
    """Bilinear resize, align_corners=False semantics, no antialias.

    Args:
      x: [B, H, W, C].
      out_hw: (H_out, W_out).
      via: "auto" (matmul on TPU, gather elsewhere), "matmul", or "gather".
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    if via == "matmul" or (via == "auto" and jax.default_backend() == "tpu"):
        Ry = _linear_resize_matrix(Ho, H) if Ho != H else None
        Rx = _linear_resize_matrix(Wo, W) if Wo != W else None
        return _apply_resize_matrices(x, Ry, Rx)
    dtype = x.dtype
    sy = _source_coords_half_pixel(Ho, H, jnp.float32)
    sx = _source_coords_half_pixel(Wo, W, jnp.float32)
    y0, y1, wy = _linear_weights(sy, H)
    x0, x1, wx = _linear_weights(sx, W)
    wy = wy.astype(dtype)
    wx = wx.astype(dtype)
    # Interpolate rows then columns (separable).
    top = jnp.take(x, y0, axis=1)
    bot = jnp.take(x, y1, axis=1)
    v = top * (1.0 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    left = jnp.take(v, x0, axis=2)
    right = jnp.take(v, x1, axis=2)
    return left * (1.0 - wx)[None, None, :, None] + right * wx[None, None, :, None]


def _nearest_resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense 0/1 [out, in] selection matrix for torch 'nearest' indexing."""
    idx = np.clip(
        np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64),
        0,
        in_size - 1,
    )
    R = np.zeros((out_size, in_size), np.float32)
    R[np.arange(out_size), idx] = 1.0
    return R


def resize_nearest(
    x: jax.Array, out_hw: tuple[int, int], via: str = "auto"
) -> jax.Array:
    """Nearest resize with torch's ``mode='nearest'`` index rule.

    src = floor(dst * in/out). Args: x [B, H, W, C].
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    if via == "matmul" or (via == "auto" and jax.default_backend() == "tpu"):
        Ry = _nearest_resize_matrix(Ho, H) if Ho != H else None
        Rx = _nearest_resize_matrix(Wo, W) if Wo != W else None
        return _apply_resize_matrices(x, Ry, Rx)
    iy = jnp.floor(jnp.arange(Ho, dtype=jnp.float32) * (H / Ho)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(Wo, dtype=jnp.float32) * (W / Wo)).astype(jnp.int32)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    return jnp.take(jnp.take(x, iy, axis=1), ix, axis=2)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """2x nearest upsample: out[i, j] = in[i // 2, j // 2]. x: [B, H, W, C]."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
