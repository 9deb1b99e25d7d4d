"""Pallas TPU kernel: modulated deformable conv (DCNv2) by row sweep.

Shares the row-sweep machinery of warp_rowsweep.py (pre-transposed
[H, C, W] layout, WIN-row window DMA, 128-aligned x-window, [C, 128]
lane-gathers) applied to the reference ARF heads' 3×3 learned-offset taps
(reference models/dcn.py; stride=dilation=1, pad=1 — the only
configuration used). Each tap k resolves its bilinear sample per output
row with DR candidate window rows × 2 x-taps × x-window halves, is
modulated by its mask, and contracts against the tap's [C, C_out] weight
slice on the MXU. XLA's gather emitter needed 0.1-0.5+ s per layer and
crashed the worker at full DTU resolution.

Same window-approximation contract as the warp kernel; learned DCN offsets
are near-zero-initialized and stay within a few pixels in practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
WIN = 16
DR = 3  # candidate rows per (output row, tap): offset drift <=1 + y1 tap
XW = 256  # x-window (offsets are small; 2 aligned halves suffice)
K = 9


def _kernel(
    dy_ref,  # VMEM [1, K, ROWS, W]
    dx_ref,  # VMEM [1, K, ROWS, W]
    mask_ref,  # VMEM [1, K, ROWS, W]
    w_ref,  # VMEM [C_out, K*C] weights (tap-major columns)
    x_hbm,  # ANY [B, H, C, W]
    out_ref,  # VMEM [1, ROWS, C_out, W]
    bigwin,  # scratch [WIN, C, W]
    xwin,  # scratch [WIN, C, XW]
    sem0,
    sem1,
    *,
    H: int,
    W: int,
    W_img: int,
    C: int,
    C_out: int,
    XW_: int,
):
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    n_chunks = W // 128
    n_halves = XW_ // 128
    kw = 3

    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    y_base = (strip * ROWS + row_i).astype(jnp.float32)
    x_base = col_i.astype(jnp.float32)

    # Tap sample positions (per tap k): [K][ROWS, W]
    pys = [y_base + (k // kw - 1) + dy_ref[0, k] for k in range(K)]
    pxs = [x_base + (k % kw - 1) + dx_ref[0, k] for k in range(K)]

    y_min = jnp.full((ROWS, W), H - 1, jnp.int32)
    for k in range(K):
        y0k = jnp.floor(pys[k]).astype(jnp.int32)
        ok = (y0k >= -1) & (y0k <= H - 1)
        y_min = jnp.minimum(y_min, jnp.where(ok, y0k, H - 1))
    win_start = jnp.clip(jnp.min(y_min), 0, max(H - WIN, 0))

    copy = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(win_start, WIN), :, :], bigwin, sem0
    )
    copy.start()
    copy.wait()

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        # x-window base over all taps in this chunk.
        xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
        for k in range(K):
            x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
            okx = (x0k >= -1) & (x0k <= W_img - 1)
            xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
        xmin = jnp.clip((jnp.min(xmin_v) // 128) * 128, 0, max(W - XW_, 0))
        xmin = pl.multiple_of(xmin, 128)

        if XW_ == W:
            # window spans the whole (padded) width: xmin is always 0 and
            # the VMEM->VMEM copy would duplicate bigwin — read it directly.
            win_ref = bigwin
        else:
            xcopy = pltpu.make_async_copy(
                bigwin.at[:, :, pl.ds(xmin, XW_)], xwin, sem1
            )
            xcopy.start()
            xcopy.wait()
            win_ref = xwin

        for i in range(ROWS):
            acc = jnp.zeros((C_out, 128), jnp.float32)
            for k in range(K):
                py_i = pys[k][i : i + 1, sl]  # [1, 128]
                px_i = pxs[k][i : i + 1, sl]
                m_i = mask_ref[0, k, i : i + 1, sl]

                y0f = jnp.floor(py_i)
                x0f = jnp.floor(px_i)
                fy = (py_i - y0f).astype(jnp.float32)
                fx = (px_i - x0f).astype(jnp.float32)
                y0 = y0f.astype(jnp.int32)
                x0 = x0f.astype(jnp.int32)

                y_loc = y0 - win_start
                ok_i = (y0 >= -1) & (y0 <= H - 1)
                r0 = jnp.clip(
                    jnp.min(jnp.where(ok_i, y_loc, WIN - 1)), 0, WIN - DR
                )

                samp = jnp.zeros((C, 128), jnp.float32)
                for dr in range(DR):
                    wr_idx = r0 + dr
                    row_y = win_start + wr_idx
                    w_y = jnp.where(y0 == row_y, 1.0 - fy, 0.0) + jnp.where(
                        y0 + 1 == row_y, fy, 0.0
                    )
                    row_in = (row_y >= 0) & (row_y <= H - 1)
                    w_y = w_y * row_in.astype(jnp.float32)

                    slabs = win_ref[pl.ds(wr_idx, 1), :, :][0]  # [C, XW]

                    for xt, w_x in ((x0, 1.0 - fx), (x0 + 1, fx)):
                        x_in = (xt >= 0) & (xt <= W_img - 1)
                        xloc = xt - xmin
                        in_win = (xloc >= 0) & (xloc < XW_)
                        g = jnp.zeros((C, 128), jnp.float32)
                        for h in range(n_halves):
                            use_h = (xloc >= h * 128) & (xloc < (h + 1) * 128)
                            idx = jnp.clip(xloc - h * 128, 0, 127)
                            gh = jnp.take_along_axis(
                                slabs[:, h * 128 : (h + 1) * 128],
                                jnp.broadcast_to(idx, (C, 128)),
                                axis=1,
                            )
                            g = jnp.where(
                                jnp.broadcast_to(use_h, (C, 128)), gh, g
                            )
                        wgt = w_y * w_x * (x_in & in_win).astype(jnp.float32)
                        samp = samp + g * jnp.broadcast_to(wgt, (C, 128))

                samp = samp * jnp.broadcast_to(m_i, (C, 128))
                acc = acc + jnp.dot(
                    w_ref[:, k * C : (k + 1) * C],
                    samp,
                    preferred_element_type=jnp.float32,
                )

            out_ref[0, i, :, sl] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dcn_rowsweep_batched(
    x: jax.Array,  # [B, H, W, C]
    dy: jax.Array,  # [B, H, W, K]
    dx: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    interpret: bool = False,
) -> jax.Array:
    B, H, W_img, C = x.shape
    C_out = weight.shape[-1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    XW_ = min(XW, W)
    if W != W_img:
        pad_off = ((0, 0), (0, 0), (0, W - W_img), (0, 0))
        x = jnp.pad(x, pad_off)
        dy = jnp.pad(dy, pad_off)
        dx = jnp.pad(dx, pad_off)
        mask = jnp.pad(mask, pad_off)

    x_t = x.transpose(0, 1, 3, 2)  # [B, H, C, W]
    dy_t = dy.transpose(0, 3, 1, 2)  # [B, K, H, W]
    dx_t = dx.transpose(0, 3, 1, 2)
    m_t = mask.transpose(0, 3, 1, 2)
    # [C_out, K*C], tap-major columns to match the stacked im2col rows.
    w_flat = weight.transpose(2, 0, 1).reshape(C_out, K * C)

    kernel = functools.partial(
        _kernel, H=H, W=W, W_img=W_img, C=C, C_out=C_out, XW_=XW_
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // ROWS),
        in_specs=[
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((C_out, K * C), lambda b, s: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ROWS, C_out, W), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, C_out, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.float32),
            pltpu.VMEM((WIN, C, XW_), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(dy_t, dx_t, m_t, w_flat.astype(jnp.float32), x_t)
    return out.transpose(0, 1, 3, 2)[:, :, :W_img, :]  # [B, H, W_img, C_out]


def deform_conv2d_rowsweep(
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
    """Batched DCNv2, row-sweep kernel (inference path)."""
    assert stride == 1 and padding == 1 and dilation == 1
    out = _dcn_rowsweep_batched(
        x.astype(jnp.float32),
        offset_y.astype(jnp.float32),
        offset_x.astype(jnp.float32),
        mask.astype(jnp.float32),
        weight.astype(jnp.float32),
        interpret=interpret,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
