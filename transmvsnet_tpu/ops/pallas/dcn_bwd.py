"""Pallas TPU backward kernel for the one-hot DCNv2 (modulated deform conv).

Native VJP for ``dcn_onehot.deform_conv2d_onehot``: all five gradients —
input, Δy/Δx offsets, modulation mask, weight — from one sampling
recompute, each expressed as an MXU contraction (the XLA-linearization
backward's serial gathers/scatters are why the recompute-VJP train step
measured 9 s; see PERFORMANCE.md "Training performance").

With q = Wᵀ·g routed per tap k (one [K·C, C_out]@[C_out, 128] matmul):

  d_mask_k   = Σ_c q_k ⊙ samp_k                 (samp recomputed as forward)
  d_weight_k = (mask_k·samp_k) @ gᵀ             (A·Bᵀ, accumulated in VMEM)
  d_dx_k     = mask_k · Σ_c q_k ⊙ (win @ dEw)   dEw[j] = 1[j=x0+1] − 1[j=x0]
  d_dy_k     = mask_k · Σ_c q_k ⊙ Σ_r dwy(r)·(win[r] @ Ew)
  d_x[r]    += (q_k·mask_k·w_y(r)) @ Ewᵀ        (window RMW, like warp_bwd)

The offset gradients use the floor-based two-tap convention
(v_hi − v_lo), NOT the hat derivative: the hat's derivative is zero at
integer coordinates, and the offset conv is zero-initialized (reference
models/dcn.py:62-64) — with a hat-derivative convention offsets would
receive exactly zero gradient at step 0 and never train. The floor
convention matches torchvision's deform_conv2d backward
(reference models/dcn.py:66-80) and the XLA path's autodiff
(ops/sampling.bilinear_gather_cf linearizes to v_hi − v_lo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmvsnet_tpu.ops.pallas.dcn_onehot import DR, K, ROWS, WIN


def _bwd_kernel(
    dy_ref,  # VMEM [1, K, ROWS, W] f32
    dx_ref,  # VMEM [1, K, ROWS, W] f32
    mask_ref,  # VMEM [1, K, ROWS, W] f32
    wcol_ref,  # VMEM [K*C, C_out] bf16 (tap-major rows)
    g_ref,  # VMEM [1, ROWS, C_out, W] f32 cotangent (x-in-lanes layout)
    x_hbm,  # ANY [B, H, C, W] bf16
    dxin_in,  # ANY [B, H, C, W] f32 (zeros, aliased to dxin_out)
    dxin_out,  # ANY [B, H, C, W] f32 (accumulated via window RMW)
    ddy_ref,  # VMEM [1, K, ROWS, W] f32
    ddx_ref,  # VMEM [1, K, ROWS, W] f32
    dm_ref,  # VMEM [1, K, ROWS, W] f32
    dw_ref,  # VMEM [K*C, C_out] f32, accumulated over the whole grid
    bigwin,  # scratch VMEM [WIN, C, W] bf16
    accwin,  # scratch VMEM [WIN, C, W] f32
    sem0,
    sem1,
    *,
    H: int,
    W: int,
    W_img: int,
    C: int,
    C_out: int,
):
    del dxin_in  # same buffer as dxin_out; declared for the alias only
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    n_chunks = W // 128
    kw = 3

    @pl.when((b_idx == 0) & (strip == 0))
    def _init_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    y_base = (strip * ROWS + row_i).astype(jnp.float32)
    x_base = col_i.astype(jnp.float32)

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
    rmw_read = pltpu.make_async_copy(
        dxin_out.at[b_idx, pl.ds(win_start, WIN), :, :], accwin, sem1
    )
    rmw_read.start()
    copy.wait()
    rmw_read.wait()

    j_iota_i = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
    j_iota = j_iota_i.astype(jnp.float32)

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        for i in range(ROWS):
            g_row = g_ref[0, i, :, sl]  # [C_out, 128] f32
            g_bf = g_row.astype(jnp.bfloat16)
            # Route the cotangent through the weight: q[k·C+c, l].
            q_full = jnp.dot(
                wcol_ref[...], g_bf, preferred_element_type=jnp.float32
            )  # [K·C, 128]

            for k in range(K):
                q_k = q_full[k * C : (k + 1) * C]  # [C, 128]
                py_i = pys[k][i : i + 1, sl]
                px_i = pxs[k][i : i + 1, sl]
                m_i = mask_ref[0, k, i : i + 1, sl]

                ew = jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - px_i)).astype(
                    jnp.bfloat16
                )  # [W, 128]
                x0 = jnp.floor(px_i).astype(jnp.int32)
                dew = (
                    (j_iota_i == x0 + 1).astype(jnp.float32)
                    - (j_iota_i == x0).astype(jnp.float32)
                ).astype(jnp.bfloat16)  # [W, 128]

                y0 = jnp.floor(py_i).astype(jnp.int32)
                y_loc = y0 - win_start
                ok_i = (y0 >= -1) & (y0 <= H - 1)
                r0 = jnp.clip(
                    jnp.min(jnp.where(ok_i, y_loc, WIN - 1)), 0, WIN - DR
                )

                samp = jnp.zeros((C, 128), jnp.float32)
                dsampy = jnp.zeros((C, 128), jnp.float32)
                dsampx = jnp.zeros((C, 128), jnp.float32)
                for dr in range(DR):
                    wr = r0 + dr
                    row_yi = win_start + wr
                    row_y = row_yi.astype(jnp.float32)
                    row_in = ((row_y >= 0.0) & (row_y <= float(H - 1))).astype(
                        jnp.float32
                    )
                    w_y = (
                        jnp.maximum(0.0, 1.0 - jnp.abs(py_i - row_y)) * row_in
                    )  # [1, 128]
                    # Floor-convention y-derivative: +1 at y0+1, −1 at y0.
                    wyd = (
                        (row_yi == y0 + 1).astype(jnp.float32)
                        - (row_yi == y0).astype(jnp.float32)
                    ) * row_in

                    slab = bigwin[pl.ds(wr, 1), :, :][0]  # [C, W] bf16
                    m = jnp.dot(slab, ew, preferred_element_type=jnp.float32)
                    xd = jnp.dot(slab, dew, preferred_element_type=jnp.float32)
                    samp = samp + m * w_y
                    dsampy = dsampy + m * wyd
                    dsampx = dsampx + xd * w_y

                    dwin = jax.lax.dot_general(
                        (q_k * (m_i * w_y)).astype(jnp.bfloat16),
                        ew,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C, W]
                    accwin[pl.ds(wr, 1), :, :] = (
                        accwin[pl.ds(wr, 1), :, :] + dwin[None]
                    )

                dm_ref[0, k, i : i + 1, sl] = jnp.sum(
                    q_k * samp, axis=0, keepdims=True
                )
                ddy_ref[0, k, i : i + 1, sl] = m_i * jnp.sum(
                    q_k * dsampy, axis=0, keepdims=True
                )
                ddx_ref[0, k, i : i + 1, sl] = m_i * jnp.sum(
                    q_k * dsampx, axis=0, keepdims=True
                )
                dwk = jax.lax.dot_general(
                    (samp * m_i).astype(jnp.bfloat16),
                    g_bf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [C, C_out]
                dw_ref[k * C : (k + 1) * C, :] = (
                    dw_ref[k * C : (k + 1) * C, :] + dwk
                )

    rmw_write = pltpu.make_async_copy(
        accwin, dxin_out.at[b_idx, pl.ds(win_start, WIN), :, :], sem1
    )
    rmw_write.start()
    rmw_write.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dcn_bwd_batched(
    x: jax.Array,  # [B, H, W, C] bf16
    dy: jax.Array,  # [B, H, W, K] f32
    dx: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    g: jax.Array,  # [B, H, W, C_out] f32 cotangent
    interpret: bool = False,
):
    B, H, W_img, C = x.shape
    C_out = weight.shape[-1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    if W != W_img:
        pad = ((0, 0), (0, 0), (0, W - W_img), (0, 0))
        x = jnp.pad(x, pad)
        dy = jnp.pad(dy, pad)
        dx = jnp.pad(dx, pad)
        mask = jnp.pad(mask, pad)
        g = jnp.pad(g, pad)

    x_t = x.transpose(0, 1, 3, 2)  # [B, H, C, W]
    g_t = g.transpose(0, 1, 3, 2)  # [B, H, C_out, W]
    dy_t = dy.transpose(0, 3, 1, 2)  # [B, K, H, W]
    dx_t = dx.transpose(0, 3, 1, 2)
    m_t = mask.transpose(0, 3, 1, 2)
    w_col = weight.reshape(K * C, C_out)  # tap-major rows
    dxin0 = jnp.zeros((B, H, C, W), jnp.float32)

    kernel = functools.partial(
        _bwd_kernel, H=H, W=W, W_img=W_img, C=C, C_out=C_out
    )
    dxin, ddy, ddx, dm, dw = pl.pallas_call(
        kernel,
        grid=(B, H // ROWS),
        in_specs=[
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((K * C, C_out), lambda b, s: (0, 0)),
            pl.BlockSpec((1, ROWS, C_out, W), lambda b, s: (b, s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((1, K, ROWS, W), lambda b, s: (b, 0, s, 0)),
            pl.BlockSpec((K * C, C_out), lambda b, s: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, C, W), jnp.float32),
            jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
            jax.ShapeDtypeStruct((K * C, C_out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={6: 0},
        interpret=interpret,
    )(
        dy_t.astype(jnp.float32),
        dx_t.astype(jnp.float32),
        m_t.astype(jnp.float32),
        w_col.astype(jnp.bfloat16),
        g_t.astype(jnp.float32),
        x_t,
        dxin0,
    )
    dxin = dxin.transpose(0, 1, 3, 2)[:, :, :W_img]  # [B, H, W, C]
    ddy = ddy.transpose(0, 2, 3, 1)[:, :, :W_img]  # [B, H, W, K]
    ddx = ddx.transpose(0, 2, 3, 1)[:, :, :W_img]
    dm = dm.transpose(0, 2, 3, 1)[:, :, :W_img]
    return dxin, ddy, ddx, dm, dw.reshape(K, C, C_out)


def deform_conv2d_bwd(
    x: jax.Array,  # [B, H, W, C]
    offset_y: jax.Array,  # [B, H, W, K]
    offset_x: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    g: jax.Array,  # [B, H, W, C_out] cotangent
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    interpret: bool = False,
):
    """Gradients (dx, d_offset_y, d_offset_x, d_mask, d_weight), all f32.

    d_bias is a plain sum of the cotangent — callers compute it in XLA.
    """
    assert stride == 1 and padding == 1 and dilation == 1
    return _dcn_bwd_batched(
        x.astype(jnp.bfloat16),
        offset_y.astype(jnp.float32),
        offset_x.astype(jnp.float32),
        mask.astype(jnp.float32),
        weight,
        g.astype(jnp.float32),
        interpret=interpret,
    )
