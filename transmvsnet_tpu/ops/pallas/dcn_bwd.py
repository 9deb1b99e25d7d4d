"""Pallas TPU backward kernel for the one-hot DCNv2 (modulated deform conv).

Native VJP for ``dcn_onehot.deform_conv2d_onehot``: all five gradients —
input, Δy/Δx offsets, modulation mask, weight — from one sampling
recompute, each expressed as an MXU contraction (the XLA-linearization
backward's serial gathers/scatters are why the recompute-VJP train step
measured 9 s; see PERFORMANCE.md "Training performance").

Structure mirrors the forward's tap-grouped windowed sampler
(``dcn_onehot._kernel_tapgroup``): per (output row, 128-lane chunk,
kernel row) the 3 taps share one candidate-row stack and 128-aligned
x-window of width XW, so hat matrices are [XW, 3·128] instead of the
full-width [W, 128] of the first-cut backward (measured 53.9 ms/layer at
512x640 vs 12.0 fwd — the full-width ew/dew builds and matmuls were the
cost; see PERFORMANCE.md "Backward kernel tuning").

With q = Wᵀ·g routed per tap k (one [K·C, C_out]@[C_out, 128] matmul) and
mm = stack @ Ew3, mmx = stack @ dEw3 per kernel row:

  d_mask_k   = Σ_c q_k ⊙ samp_k            samp_k = Σ_g w_y(g)·mm_k(g)
  d_dy_k     = mask_k · Σ_c q_k ⊙ Σ_g dwy(g)·mm_k(g)   (mm reused)
  d_dx_k     = mask_k · Σ_c q_k ⊙ Σ_g w_y(g)·mmx_k(g)
  d_weight   = (mask·samp)_stacked9 @ gᵀ   (one A·Bᵀ per row)
  d_x window += qs3 @ Ew3ᵀ                 qs3[gC+c, t·128+l] = q·m·w_y
               (one [DRG·C, 3·128]@[3·128, XW] per kernel row,
                accumulated in an XW-wide f32 window of the RMW buffer)

The offset gradients use the floor-based two-tap convention
(v_hi − v_lo), NOT the hat derivative: the hat's derivative is zero at
integer coordinates, and the offset conv is zero-initialized (reference
models/dcn.py:62-64) — with a hat-derivative convention offsets would
receive exactly zero gradient at step 0 and never train. The floor
convention matches torchvision's deform_conv2d backward
(reference models/dcn.py:66-80) and the XLA path's autodiff
(ops/sampling.bilinear_gather_cf linearizes to v_hi − v_lo).

Window-truncation contract (mirrors the forward's lane-locally-smooth
offset contract): gradients follow the forward's 128-aligned x-window
truncation. When W > XW and a chunk's xmin snaps down, the +1-column tap
of the chunk's last lanes (x mod 128 ∈ {126, 127}) can fall outside
[xmin, xmin+XW); those taps contribute nothing to the forward output and
therefore nothing to d_x / d_offset / d_mask there — consistent with the
truncated forward, but deviating from the untruncated DCN gradients at
exactly those lanes (tests/test_pallas_bwd.py windowed cases pin the rest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmvsnet_tpu.ops.pallas.dcn_onehot import DRG, K, ROWS, WIN, XW


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
    xwin,  # scratch VMEM [WIN, C, XW_] bf16 (x-window of bigwin)
    accx,  # scratch VMEM [WIN, C, XW_] f32 (x-window of accwin)
    sem0,
    sem1,
    sem2,
    *,
    H: int,
    W: int,
    W_img: int,
    C: int,
    C_out: int,
    XW_: int,
):
    del dxin_in  # same buffer as dxin_out; declared for the alias only
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    n_chunks = W // 128
    kw = 3
    windowed = XW_ != W

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

    j_iota_i = jax.lax.broadcasted_iota(jnp.int32, (XW_, 128), 0)
    j_iota = j_iota_i.astype(jnp.float32)

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        # 128-aligned x-window shared by the chunk (as the forward).
        xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
        for k in range(K):
            x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
            okx = (x0k >= -1) & (x0k <= W_img - 1)
            xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
        xmin = jnp.clip((jnp.min(xmin_v) // 128) * 128, 0, max(W - XW_, 0))
        xmin = pl.multiple_of(xmin, 128)

        if windowed:
            xcopy = pltpu.make_async_copy(
                bigwin.at[:, :, pl.ds(xmin, XW_)], xwin, sem2
            )
            xcopy.start()
            acopy = pltpu.make_async_copy(
                accwin.at[:, :, pl.ds(xmin, XW_)], accx, sem1
            )
            acopy.start()
            xcopy.wait()
            acopy.wait()
            win_ref, acc_ref = xwin, accx
        else:
            win_ref, acc_ref = bigwin, accwin

        xminf = xmin.astype(jnp.float32)
        for i in range(ROWS):
            g_row = g_ref[0, i, :, sl]  # [C_out, 128] f32
            g_bf = g_row.astype(jnp.bfloat16)
            # Route the cotangent through the weight: q[k·C+c, l].
            q_full = jnp.dot(
                wcol_ref[...], g_bf, preferred_element_type=jnp.float32
            )  # [K·C, 128]

            msamps = []
            for kr in range(3):
                taps = (3 * kr, 3 * kr + 1, 3 * kr + 2)
                # Shared candidate rows across the kernel row's taps
                # (identical selection to the forward tap-grouped kernel).
                r_min = jnp.full((1, 128), WIN - 1, jnp.int32)
                y0s = []
                for t in taps:
                    y0t = jnp.floor(pys[t][i : i + 1, sl]).astype(jnp.int32)
                    y0s.append(y0t)
                    ok_t = (y0t >= -1) & (y0t <= H - 1)
                    r_min = jnp.minimum(
                        r_min, jnp.where(ok_t, y0t - win_start, WIN - 1)
                    )
                r0 = jnp.clip(jnp.min(r_min), 0, WIN - DRG)

                ews = []
                dews = []
                for t in taps:
                    pxw = pxs[t][i : i + 1, sl] - xminf  # [1, 128]
                    ews.append(
                        jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - pxw)).astype(
                            jnp.bfloat16
                        )
                    )
                    x0w = jnp.floor(pxw).astype(jnp.int32)
                    dews.append(
                        (
                            (j_iota_i == x0w + 1).astype(jnp.float32)
                            - (j_iota_i == x0w).astype(jnp.float32)
                        ).astype(jnp.bfloat16)
                    )
                ew3 = jnp.concatenate(ews, axis=1)  # [XW_, 3·128]
                dew3 = jnp.concatenate(dews, axis=1)

                stack = win_ref[pl.ds(r0, DRG), :, :].reshape(DRG * C, XW_)
                mm = jnp.dot(
                    stack, ew3, preferred_element_type=jnp.float32
                )  # [DRG·C, 3·128]
                mmx = jnp.dot(
                    stack, dew3, preferred_element_type=jnp.float32
                )

                qs_blocks = [None] * 3
                for tj, t in enumerate(taps):
                    py_t = pys[t][i : i + 1, sl]
                    y0_t = y0s[tj]
                    m_t = mask_ref[0, t, i : i + 1, sl]
                    q_t = q_full[t * C : (t + 1) * C]  # [C, 128]
                    qm = q_t * m_t

                    samp = jnp.zeros((C, 128), jnp.float32)
                    dsampy = jnp.zeros((C, 128), jnp.float32)
                    dsampx = jnp.zeros((C, 128), jnp.float32)
                    qs_g = []
                    for g in range(DRG):
                        row_yi = win_start + r0 + g
                        row_y = row_yi.astype(jnp.float32)
                        row_in = (
                            (row_y >= 0.0) & (row_y <= float(H - 1))
                        ).astype(jnp.float32)
                        w_y = (
                            jnp.maximum(0.0, 1.0 - jnp.abs(py_t - row_y))
                            * row_in
                        )  # [1, 128]
                        # Floor-convention y-derivative: +1 at y0+1, −1 at y0.
                        wyd = (
                            (row_yi == y0_t + 1).astype(jnp.float32)
                            - (row_yi == y0_t).astype(jnp.float32)
                        ) * row_in

                        blk = mm[g * C : (g + 1) * C, tj * 128 : (tj + 1) * 128]
                        samp = samp + blk * w_y
                        dsampy = dsampy + blk * wyd
                        dsampx = dsampx + (
                            mmx[g * C : (g + 1) * C, tj * 128 : (tj + 1) * 128]
                            * w_y
                        )
                        qs_g.append((qm * w_y).astype(jnp.bfloat16))

                    dm_ref[0, t, i : i + 1, sl] = jnp.sum(
                        q_t * samp, axis=0, keepdims=True
                    )
                    ddy_ref[0, t, i : i + 1, sl] = m_t * jnp.sum(
                        q_t * dsampy, axis=0, keepdims=True
                    )
                    ddx_ref[0, t, i : i + 1, sl] = m_t * jnp.sum(
                        q_t * dsampx, axis=0, keepdims=True
                    )
                    msamps.append((samp * m_t).astype(jnp.bfloat16))
                    qs_blocks[tj] = qs_g

                # Scatter the 3 taps' window gradients with one A·Bᵀ:
                # dwin[gC+c, j] = Σ_{t,l} qs3[gC+c, t·128+l] · ew3[j, t·128+l].
                qs3 = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [qs_blocks[tj][g] for tj in range(3)], axis=1
                        )
                        for g in range(DRG)
                    ],
                    axis=0,
                )  # [DRG·C, 3·128]
                dwin = jax.lax.dot_general(
                    qs3,
                    ew3,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [DRG·C, XW_]
                acc_ref[pl.ds(r0, DRG), :, :] = acc_ref[
                    pl.ds(r0, DRG), :, :
                ] + dwin.reshape(DRG, C, XW_)

            # One A·Bᵀ for all 9 taps' weight gradients.
            mstack = jnp.concatenate(msamps, axis=0)  # [K·C, 128] bf16
            dw_ref[...] = dw_ref[...] + jax.lax.dot_general(
                mstack,
                g_bf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if windowed:
            aw = pltpu.make_async_copy(
                accx, accwin.at[:, :, pl.ds(xmin, XW_)], sem1
            )
            aw.start()
            aw.wait()

    rmw_write = pltpu.make_async_copy(
        accwin, dxin_out.at[b_idx, pl.ds(win_start, WIN), :, :], sem1
    )
    rmw_write.start()
    rmw_write.wait()


@functools.partial(
    jax.jit, static_argnames=("interpret", "offsets_cf", "io_cf")
)
def _dcn_bwd_batched(
    x: jax.Array,  # [B, H, W, C] bf16 (io_cf: [B, H, C, W])
    dy: jax.Array,  # [B, H, W, K] f32 (offsets_cf: [B, K, H, W])
    dx: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    g: jax.Array,  # [B, H, W, C_out] f32 cotangent (io_cf: [B, H, C_out, W])
    interpret: bool = False,
    offsets_cf: bool = False,
    io_cf: bool = False,
):
    if io_cf:
        assert offsets_cf
        B, H, C, W_img = x.shape
    else:
        B, H, W_img, C = x.shape
    C_out = weight.shape[-1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    XW_ = min(XW, W)
    if W != W_img:
        pad = ((0, 0), (0, 0), (0, W - W_img), (0, 0))
        pad_cf = ((0, 0), (0, 0), (0, 0), (0, W - W_img))
        x = jnp.pad(x, pad_cf if io_cf else pad)
        g = jnp.pad(g, pad_cf if io_cf else pad)
        pad_off = pad_cf if offsets_cf else pad
        dy = jnp.pad(dy, pad_off)
        dx = jnp.pad(dx, pad_off)
        mask = jnp.pad(mask, pad_off)

    x_t = x if io_cf else x.transpose(0, 1, 3, 2)  # [B, H, C, W]
    g_t = g if io_cf else g.transpose(0, 1, 3, 2)  # [B, H, C_out, W]
    if offsets_cf:
        # Offsets already in the kernel's native [B, K, H, W] layout
        # (the channels-first offset-conv path, vjp._offset_conv_cf) —
        # no lane-axis relayout in or out.
        dy_t, dx_t, m_t = dy, dx, mask
    else:
        dy_t = dy.transpose(0, 3, 1, 2)  # [B, K, H, W]
        dx_t = dx.transpose(0, 3, 1, 2)
        m_t = mask.transpose(0, 3, 1, 2)
    w_col = weight.reshape(K * C, C_out)  # tap-major rows
    dxin0 = jnp.zeros((B, H, C, W), jnp.float32)

    kernel = functools.partial(
        _bwd_kernel, H=H, W=W, W_img=W_img, C=C, C_out=C_out, XW_=XW_
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
            pltpu.VMEM((WIN, C, XW_), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW_), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
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
    if io_cf:
        dxin = dxin[:, :, :, :W_img]  # [B, H, C, W_img]
    else:
        dxin = dxin.transpose(0, 1, 3, 2)[:, :, :W_img]  # [B, H, W, C]
    if offsets_cf:
        ddy = ddy[:, :, :, :W_img]  # [B, K, H, W]
        ddx = ddx[:, :, :, :W_img]
        dm = dm[:, :, :, :W_img]
    else:
        ddy = ddy.transpose(0, 2, 3, 1)[:, :, :W_img]  # [B, H, W, K]
        ddx = ddx.transpose(0, 2, 3, 1)[:, :, :W_img]
        dm = dm.transpose(0, 2, 3, 1)[:, :, :W_img]
    return dxin, ddy, ddx, dm, dw.reshape(K, C, C_out)


def deform_conv2d_bwd(
    x: jax.Array,  # [B, H, W, C] (io_cf: [B, H, C, W])
    offset_y: jax.Array,  # [B, H, W, K] (offsets_cf: [B, K, H, W])
    offset_x: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    g: jax.Array,  # [B, H, W, C_out] cotangent (io_cf: [B, H, C_out, W])
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    interpret: bool = False,
    offsets_cf: bool = False,
    io_cf: bool = False,
):
    """Gradients (dx, d_offset_y, d_offset_x, d_mask, d_weight), all f32.

    d_bias is a plain sum of the cotangent — callers compute it in XLA.
    With ``offsets_cf`` the offset/mask inputs AND their gradients use the
    kernel's native channels-first [B, K, H, W] layout (the fused-DCN
    backward path; skips four lane-axis transposes per layer). With
    ``io_cf`` (requires ``offsets_cf``) x, g, and dx additionally use the
    kernel's native [B, H, C, W] layout — the channels-first ARF-head
    trunk path, where no lane-axis relayout remains at all.
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
        offsets_cf=offsets_cf,
        io_cf=io_cf,
    )
