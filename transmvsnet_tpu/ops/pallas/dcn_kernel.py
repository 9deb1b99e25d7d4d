"""Pallas TPU kernel: modulated deformable convolution (DCNv2).

Same machinery as warp_kernel.py — lane-packed pixels × channels, a
dynamic source-row band DMA, and Mosaic's same-shape sublane gather — with
the gather rows packing the 3×3 learned-offset taps instead of depth
planes: rows (k, t) cover K_pad tap groups × T_blk pixel groups with
K_pad·T_blk = S = BAND·W, so every gather row is useful (taps are padded
with zero-weight dummies when S isn't divisible by 9). Each tap group then
contracts against its weight slice with one [T_blk,128]x[128,P·C_out] MXU
matmul (reference semantics: models/dcn.py via torchvision deform_conv2d;
stride=dilation=1, pad=1 — the only configuration the reference uses).

XLA's gather made one such layer cost 0.1-0.5+ s and crash the TPU worker
at full DTU resolution (microbench.py). Offsets are near-zero-initialized
and stay within a few pixels, far inside the BAND window; out-of-band
samples are dropped (zero) like the warp kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TARGET_S = 4608


def plan_dcn(H: int, W: int, C: int, K: int = 9):
    """(C_eff, P, BAND, K_pad, T_blk) for the tap-packed gather."""
    BAND = max(1, min(H, _TARGET_S // W))
    S = BAND * W
    c_eff = C
    while 128 % c_eff != 0:
        c_eff *= 2
    P = 128 // c_eff
    k_pad = K
    while S % k_pad != 0:
        k_pad += 1
    T_blk = S // k_pad
    return c_eff, P, BAND, k_pad, T_blk


def _kernel(
    dy_ref,  # VMEM [K_pad, T_blk, P]
    dx_ref,
    mask_ref,
    wexp_ref,  # VMEM [K_pad, 128, PO]
    x_hbm,  # ANY [H*W, C_eff]
    out_ref,  # VMEM [T_blk, PO]
    band_vmem,  # scratch [S, C_eff]
    sem,
    *,
    H: int,
    W: int,
    C: int,
    P: int,
    T_blk: int,
    K_pad: int,
    PO: int,
    BAND: int,
):
    g_idx = pl.program_id(0)
    S = BAND * W
    kw = 3

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    k_row = row_iota // T_blk
    t_row = row_iota % T_blk
    p_lane = lane_iota // C

    lin = (g_idx * T_blk + t_row) * P + p_lane
    xo = (lin % W).astype(jnp.float32)
    yo = (lin // W).astype(jnp.float32)

    # Static tap geometry per row group (dummy groups clamp to tap 8).
    k_safe = jnp.minimum(k_row, 8)
    ky = (k_safe // kw - 1).astype(jnp.float32)
    kx = (k_safe % kw - 1).astype(jnp.float32)

    # [S, P] -> [S, 128] lane replication via a 0/1 matmul (jnp.repeat's
    # reshape is not lowerable by Mosaic).
    r_p = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
    r_l = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
    rep = (r_l // C == r_p).astype(jnp.float32)

    def lane_rep(v):
        return jnp.dot(
            v.reshape(S, P), rep, preferred_element_type=jnp.float32
        )

    dy = lane_rep(dy_ref[...])
    dx = lane_rep(dx_ref[...])
    m = lane_rep(mask_ref[...])

    py = yo + ky + dy
    px = xo + kx + dx

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = px - x0f
    fy = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    y_ok = (y0 >= -1) & (y0 <= H - 1)
    band_start = jnp.clip(
        jnp.min(jnp.where(y_ok, y0, H - 1)), 0, max(H - BAND, 0)
    )

    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(band_start * W, S), :], band_vmem, sem
    )
    copy.start()

    e_c = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    e_l = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    expand = (e_l % C == e_c).astype(jnp.float32)

    copy.wait()
    tiled = jnp.dot(band_vmem[...], expand, preferred_element_type=jnp.float32)

    def tap(xi, yi, weight):
        y_loc = yi - band_start
        in_img = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        in_band = (y_loc >= 0) & (y_loc <= BAND - 1)
        idx = jnp.clip(y_loc * W + xi, 0, S - 1)
        g = jnp.take_along_axis(tiled, idx, axis=0)
        return g * (weight * (in_img & in_band).astype(jnp.float32))

    sampled = tap(x0, y0, (1.0 - fx) * (1.0 - fy))
    sampled += tap(x0 + 1, y0, fx * (1.0 - fy))
    sampled += tap(x0, y0 + 1, (1.0 - fx) * fy)
    sampled += tap(x0 + 1, y0 + 1, fx * fy)
    sampled = sampled * m

    sampled = sampled.reshape(K_pad, T_blk, 128)
    acc = jnp.zeros((T_blk, PO), jnp.float32)
    for k in range(K_pad):
        acc += jnp.dot(
            sampled[k], wexp_ref[k], preferred_element_type=jnp.float32
        )
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dcn_pallas_single(
    x: jax.Array,  # [H, W, C]
    dy: jax.Array,  # [H, W, K]
    dx: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    interpret: bool = False,
) -> jax.Array:
    H, W, C_in = x.shape
    K = dy.shape[-1]
    C_out = weight.shape[-1]
    C, P, BAND, K_pad, T_blk = plan_dcn(H, W, C_in, K)
    S = BAND * W
    PO = P * C_out

    if C != C_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, C - C_in)))
        weight = jnp.pad(weight, ((0, 0), (0, C - C_in), (0, 0)))

    npix = H * W
    block_pix = T_blk * P
    nb = -(-npix // block_pix)
    padn = nb * block_pix - npix

    def rearrange(o):  # [H, W, K] -> [K_pad, nb*T_blk, P]
        flat = o.reshape(npix, K)
        if padn:
            flat = jnp.pad(flat, ((0, padn), (0, 0)))
        flat = flat.T  # [K, npix+pad]
        if K_pad != K:
            flat = jnp.pad(flat, ((0, K_pad - K), (0, 0)))
        return flat.reshape(K_pad, nb * T_blk, P)

    dy_re, dx_re, m_re = rearrange(dy), rearrange(dx), rearrange(mask)

    eye = jnp.eye(P, dtype=jnp.float32)
    w_exp = jnp.einsum(
        "kco,pq->kpcqo", weight.astype(jnp.float32), eye
    ).reshape(K, 128, PO)
    if K_pad != K:
        w_exp = jnp.pad(w_exp, ((0, K_pad - K), (0, 0), (0, 0)))

    kernel = functools.partial(
        _kernel,
        H=H, W=W, C=C, P=P, T_blk=T_blk, K_pad=K_pad, PO=PO, BAND=BAND,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((K_pad, T_blk, P), lambda g: (0, g, 0)),
            pl.BlockSpec((K_pad, T_blk, P), lambda g: (0, g, 0)),
            pl.BlockSpec((K_pad, T_blk, P), lambda g: (0, g, 0)),
            pl.BlockSpec((K_pad, 128, PO), lambda g: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T_blk, PO), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * T_blk, PO), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(dy_re, dx_re, m_re, w_exp, x.reshape(npix, C))

    out = out.reshape(nb * block_pix, C_out)
    if padn:
        out = out[:npix]
    return out.reshape(H, W, C_out)


def deform_conv2d_pallas(
    x: jax.Array,  # [B, H, W, C]
    offset_y: jax.Array,  # [B, H, W, K]
    offset_x: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Batched DCNv2 on the Pallas TPU kernel (stride/dilation 1, pad 1 —
    the only configuration the reference uses). Inference path (no VJP)."""
    assert stride == 1 and padding == 1 and dilation == 1
    fn = functools.partial(_dcn_pallas_single, interpret=interpret)
    out = jax.vmap(fn, in_axes=(0, 0, 0, 0, None))(
        x.astype(jnp.float32),
        offset_y.astype(jnp.float32),
        offset_x.astype(jnp.float32),
        mask.astype(jnp.float32),
        weight.astype(jnp.float32),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
