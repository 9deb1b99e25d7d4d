"""Pallas TPU kernel: modulated deformable conv (DCNv2), one-hot MXU variant.

Same row-sweep structure as dcn_rowsweep.py, but each tap's bilinear sample
is an MXU contraction against a "hat" weight matrix instead of lane-gathers
(see warp_onehot.py for the derivation and probe numbers). The feature /
weight data path is bf16 (the model's bf16 compute mode); dcn_rowsweep
remains the exact-f32 path.

Reference behavior spec: torchvision-style modulated deform_conv2d as used
by the ARF heads (reference models/dcn.py:66-80; stride=dilation=1, pad=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
WIN = 16
DR = 3  # candidate rows per (output row, tap)
XW = 256  # x-window tile width (lanes); probes pass overrides explicitly
K = 9
# Tap-grouped variant: candidate rows shared by the 3 taps of one kernel
# row (their sample rows differ only by the per-tap offsets, which are
# lane-locally smooth and small) — one extra row of margin over DR covers
# the inter-tap spread. DRG=4 is ~9 ms/layer faster at full res but costs
# 2.4% pixel agreement at sigma=0.5 offsets (PERFORMANCE.md "DCN forward");
# the env override exists for accuracy-gate A/B runs of that knob
# (dcn_bwd imports this value, so forward and backward stay consistent).
import os as _os

DRG = int(_os.environ.get("TMVS_DCN_DRG", "5"))


def _kernel(
    dy_ref,  # VMEM [1, K, ROWS, W] f32
    dx_ref,  # VMEM [1, K, ROWS, W] f32
    mask_ref,  # VMEM [1, K, ROWS, W] f32
    w_ref,  # VMEM [C_out, K*C] bf16 (tap-major columns)
    x_hbm,  # ANY [B, H, C, W] bf16
    out_ref,  # VMEM [1, ROWS, C_out, W] f32
    bigwin,  # scratch [WIN, C, W] bf16
    xwin,  # scratch [WIN, C, XW] bf16
    xwin2,  # scratch [WIN, C, XW] bf16 (unused; shared scratch list)
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
    del xwin2, sem2
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    n_chunks = W // 128
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

    j_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (XW_, 128), 0).astype(jnp.float32)
    )

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
        for k in range(K):
            x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
            okx = (x0k >= -1) & (x0k <= W_img - 1)
            xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
        xmin = jnp.clip((jnp.min(xmin_v) // 128) * 128, 0, max(W - XW_, 0))
        xmin = pl.multiple_of(xmin, 128)

        if XW_ == W:
            win_ref = bigwin
        else:
            xcopy = pltpu.make_async_copy(
                bigwin.at[:, :, pl.ds(xmin, XW_)], xwin, sem1
            )
            xcopy.start()
            xcopy.wait()
            win_ref = xwin

        xminf = xmin.astype(jnp.float32)
        for i in range(ROWS):
            acc = jnp.zeros((C_out, 128), jnp.float32)
            for k in range(K):
                py_i = pys[k][i : i + 1, sl]  # [1, 128]
                pxw = pxs[k][i : i + 1, sl] - xminf
                m_i = mask_ref[0, k, i : i + 1, sl]

                ew = jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - pxw)).astype(
                    jnp.bfloat16
                )  # [XW_, 128]

                y0 = jnp.floor(py_i).astype(jnp.int32)
                y_loc = y0 - win_start
                ok_i = (y0 >= -1) & (y0 <= H - 1)
                r0 = jnp.clip(
                    jnp.min(jnp.where(ok_i, y_loc, WIN - 1)), 0, WIN - DR
                )

                samp = jnp.zeros((C, 128), jnp.float32)
                for dr in range(DR):
                    wr_idx = r0 + dr
                    row_y = (win_start + wr_idx).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_i - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)

                    slab = win_ref[pl.ds(wr_idx, 1), :, :][0]  # [C, XW_] bf16
                    m = jnp.dot(slab, ew, preferred_element_type=jnp.float32)
                    samp = samp + m * w_y

                samp = (samp * m_i).astype(jnp.bfloat16)
                acc = acc + jnp.dot(
                    w_ref[:, k * C : (k + 1) * C],
                    samp,
                    preferred_element_type=jnp.float32,
                )

            out_ref[0, i, :, sl] = acc


def _kernel_tapgroup(
    dy_ref,  # VMEM [1, K, ROWS, W] f32
    dx_ref,  # VMEM [1, K, ROWS, W] f32
    mask_ref,  # VMEM [1, K, ROWS, W] f32
    w_ref,  # VMEM [C_out, K*C] bf16 (tap-major columns)
    x_hbm,  # ANY [B, H, C, W] bf16
    out_ref,  # VMEM [1, ROWS, C_out, W] f32
    bigwin,  # scratch [WIN, C, W] bf16
    xwin,  # scratch [WIN, C, XW] bf16
    xwin2,  # scratch [WIN, C, XW] bf16 (double-buffer partner)
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
    pipeline_hats: bool = False,
):
    """MXU-batched variant of ``_kernel``: the 3 taps of each kernel row
    share one candidate-row stack and one [DRG·C, XW]@[XW, 3·128] matmul
    (their hat matrices concatenated along lanes), and the 9 per-tap
    weight contractions collapse into a single [C_out, K·C]@[K·C, 128]
    matmul per output row. Same bilinear math; ~9x fewer MXU dispatches
    and ~2.4x fewer streamed stack rows than the per-tap kernel.
    """
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    n_chunks = W // 128
    kw = 3

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
    copy.wait()

    j_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (XW_, 128), 0).astype(jnp.float32)
    )

    def chunk_xmin(cx):
        sl = slice(cx * 128, cx * 128 + 128)
        xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
        for k in range(K):
            x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
            okx = (x0k >= -1) & (x0k <= W_img - 1)
            xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
        xmin = jnp.clip((jnp.min(xmin_v) // 128) * 128, 0, max(W - XW_, 0))
        return pl.multiple_of(xmin, 128)

    # Double-buffered x-window copies: issue chunk cx+1's window DMA
    # before computing chunk cx (window extents depend only on offsets,
    # already resident in VMEM).
    dbuf = XW_ != W
    bufs, sems = (xwin, xwin2), (sem1, sem2)
    xmins = [chunk_xmin(cx) for cx in range(n_chunks)] if dbuf else None

    def xw_copy(cx):
        return pltpu.make_async_copy(
            bigwin.at[:, :, pl.ds(xmins[cx], XW_)], bufs[cx % 2], sems[cx % 2]
        )

    if dbuf:
        xw_copy(0).start()

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        if dbuf:
            xmin = xmins[cx]
            xw_copy(cx).wait()
            if cx + 1 < n_chunks:
                xw_copy(cx + 1).start()
            win_ref = bufs[cx % 2]
        else:
            xmin = jnp.int32(0)
            win_ref = bigwin

        xminf = xmin.astype(jnp.float32)

        def build_ew3(i, kr):
            # VPU hat build for kernel row kr of output row i: the 3 taps'
            # hat matrices lane-concatenated, [XW_, 3*128] bf16.
            return jnp.concatenate(
                [
                    jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(j_iota - (pxs[t][i : i + 1, sl] - xminf)),
                    ).astype(jnp.bfloat16)
                    for t in (3 * kr, 3 * kr + 1, 3 * kr + 2)
                ],
                axis=1,
            )

        # Software pipeline (pipeline_hats): build iteration idx+1's hat
        # matrices BEFORE issuing iteration idx's MXU matmul, so the VPU
        # hat build (measured 17.6 of 40 ms/layer at full res, ~at VPU
        # peak) and the MXU contraction are adjacent independent work the
        # scheduler can overlap instead of a strict build->matmul chain.
        iters = [(i, kr) for i in range(ROWS) for kr in range(3)]
        if pipeline_hats:
            nxt = build_ew3(*iters[0])
        msamps = []
        for idx, (i, kr) in enumerate(iters):
            taps = (3 * kr, 3 * kr + 1, 3 * kr + 2)
            # Shared candidate rows across the kernel row's taps.
            r_min = jnp.full((1, 128), WIN - 1, jnp.int32)
            for t in taps:
                y0t = jnp.floor(pys[t][i : i + 1, sl]).astype(jnp.int32)
                ok_t = (y0t >= -1) & (y0t <= H - 1)
                r_min = jnp.minimum(
                    r_min, jnp.where(ok_t, y0t - win_start, WIN - 1)
                )
            r0 = jnp.clip(jnp.min(r_min), 0, WIN - DRG)

            if pipeline_hats:
                ew3 = nxt
                if idx + 1 < len(iters):
                    nxt = build_ew3(*iters[idx + 1])
            else:
                ew3 = build_ew3(i, kr)  # [XW_, 3*128]

            stack = win_ref[pl.ds(r0, DRG), :, :].reshape(DRG * C, XW_)
            mm = jnp.dot(
                stack, ew3, preferred_element_type=jnp.float32
            )  # [DRG*C, 3*128]

            for tj, t in enumerate(taps):
                py_t = pys[t][i : i + 1, sl]
                samp = jnp.zeros((C, 128), jnp.float32)
                for g in range(DRG):
                    row_y = (win_start + r0 + g).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_t - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)
                    samp = samp + (
                        mm[g * C : (g + 1) * C, tj * 128 : (tj + 1) * 128]
                        * w_y
                    )
                m_t = mask_ref[0, t, i : i + 1, sl]
                msamps.append((samp * m_t).astype(jnp.bfloat16))

            if kr == 2:
                mstack = jnp.concatenate(msamps, axis=0)  # [K*C, 128] bf16
                msamps = []
                out_ref[0, i, :, sl] = jnp.dot(
                    w_ref[...], mstack, preferred_element_type=jnp.float32
                )


def _kernel_fused(
    woff_ref,  # VMEM [3*K, K*C] bf16 — offset-conv weight, tap-major columns
    boff_ref,  # VMEM [3*K, 1] f32 — offset-conv bias
    w_ref,  # VMEM [C_out, K*C] bf16 (tap-major columns)
    x_hbm,  # ANY [B, H, C, W] bf16
    out_ref,  # VMEM [1, ROWS, C_out, W] f32
    halo,  # scratch [WIN, C, W] bf16 (offset-conv input rows)
    hplus,  # scratch [WIN, C, W] bf16 (lanes shifted: holds x[l+1])
    hminus,  # scratch [WIN, C, W] bf16 (holds x[l-1])
    bigwin,  # scratch [WIN, C, W] bf16 (sampling window)
    xwin,  # scratch [WIN, C, XW] bf16
    xwin2,  # scratch [WIN, C, XW] bf16 (double-buffer partner)
    off_s,  # scratch [3*K, ROWS, W] f32 (dy even, dx odd rows; mask 18..26 sigmoided)
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
    pipeline_hats: bool = False,
):
    """DCNv2 with the offset/mask conv FUSED into the kernel.

    XLA's channel-minor layout machinery makes the 27-channel offset
    prelude cost ~2x the 3x3 conv itself (measured 17.4 ms/layer at
    864x1152xV5 — probes/bench_offconv*.py), so phase A computes the conv
    here instead: a halo window of the same x the sampler streams, two
    lane-rolled copies for the +-1 column taps, and one
    [3K, K*C] @ [K*C, W] matmul per output row. Phase B is the
    tap-grouped sampler (see _kernel_tapgroup) reading offsets from
    VMEM scratch. Offsets never exist in HBM at all.
    """
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    n_chunks = W // 128
    base = strip * ROWS
    KK = 3 * K  # offset-conv output channels (dy, dx interleaved; mask)

    # --- Phase A: 3x3 offset conv over the strip (zero-padded borders) ---
    hs = jnp.clip(base - 1, 0, max(H - WIN, 0))
    cpA = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(hs, WIN), :, :], halo, sem0
    )
    cpA.start()
    cpA.wait()

    # Mosaic's lane rotate only supports 32-bit data — roll in f32.
    h0 = halo[...].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (WIN, C, W), 2)
    hplus[...] = jnp.where(
        col == W - 1, 0.0, pltpu.roll(h0, W - 1, axis=2)
    ).astype(jnp.bfloat16)
    hminus[...] = jnp.where(col == 0, 0.0, pltpu.roll(h0, 1, axis=2)).astype(
        jnp.bfloat16
    )

    for i in range(ROWS):
        slabs = []
        for dyk in (-1, 0, 1):
            abs_r = base + i + dyk
            rel = jnp.clip(abs_r - hs, 0, WIN - 1)
            okf = ((abs_r >= 0) & (abs_r <= H - 1)).astype(jnp.bfloat16)
            for src in (hminus, halo, hplus):  # dx = -1, 0, +1
                slabs.append(src[pl.ds(rel, 1), :, :][0] * okf)  # [C, W]
        im2col = jnp.concatenate(slabs, axis=0)  # [K*C, W] bf16
        off_i = (
            jnp.dot(
                woff_ref[...], im2col, preferred_element_type=jnp.float32
            )
            + boff_ref[...]
        )  # [3K, W]
        off_s[:, i, :] = jnp.concatenate(
            [off_i[0 : 2 * K], jax.nn.sigmoid(off_i[2 * K : KK])], axis=0
        )

    # --- Phase B: tap-grouped deformable sampling (as _kernel_tapgroup) ---
    kw = 3
    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    y_base = (base + row_i).astype(jnp.float32)
    x_base = col_i.astype(jnp.float32)

    # Interleaved torch layout: (dy_k, dx_k) = (off[2k], off[2k+1]),
    # mask_k = sigmoid(off[2K + k]) (reference models/dcn.py:67-70).
    pys = [y_base + (k // kw - 1) + off_s[2 * k] for k in range(K)]
    pxs = [x_base + (k % kw - 1) + off_s[2 * k + 1] for k in range(K)]

    y_min = jnp.full((ROWS, W), H - 1, jnp.int32)
    for k in range(K):
        y0k = jnp.floor(pys[k]).astype(jnp.int32)
        ok = (y0k >= -1) & (y0k <= H - 1)
        y_min = jnp.minimum(y_min, jnp.where(ok, y0k, H - 1))
    win_start = jnp.clip(jnp.min(y_min), 0, max(H - WIN, 0))

    cpB = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(win_start, WIN), :, :], bigwin, sem0
    )
    cpB.start()
    cpB.wait()

    j_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (XW_, 128), 0).astype(jnp.float32)
    )

    def chunk_xmin(cx):
        sl = slice(cx * 128, cx * 128 + 128)
        xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
        for k in range(K):
            x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
            okx = (x0k >= -1) & (x0k <= W_img - 1)
            xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
        xmin = jnp.clip((jnp.min(xmin_v) // 128) * 128, 0, max(W - XW_, 0))
        return pl.multiple_of(xmin, 128)

    # Double-buffered x-window copies (as _kernel_tapgroup).
    dbuf = XW_ != W
    bufs, sems = (xwin, xwin2), (sem1, sem2)
    xmins = [chunk_xmin(cx) for cx in range(n_chunks)] if dbuf else None

    def xw_copy(cx):
        return pltpu.make_async_copy(
            bigwin.at[:, :, pl.ds(xmins[cx], XW_)], bufs[cx % 2], sems[cx % 2]
        )

    if dbuf:
        xw_copy(0).start()

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        if dbuf:
            xmin = xmins[cx]
            xw_copy(cx).wait()
            if cx + 1 < n_chunks:
                xw_copy(cx + 1).start()
            win_ref = bufs[cx % 2]
        else:
            xmin = jnp.int32(0)
            win_ref = bigwin

        xminf = xmin.astype(jnp.float32)

        def build_ew3(i, kr):
            return jnp.concatenate(
                [
                    jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(j_iota - (pxs[t][i : i + 1, sl] - xminf)),
                    ).astype(jnp.bfloat16)
                    for t in (3 * kr, 3 * kr + 1, 3 * kr + 2)
                ],
                axis=1,
            )

        # Software-pipelined hat builds (see _kernel_tapgroup).
        iters = [(i, kr) for i in range(ROWS) for kr in range(3)]
        if pipeline_hats:
            nxt = build_ew3(*iters[0])
        msamps = []
        for idx, (i, kr) in enumerate(iters):
            taps = (3 * kr, 3 * kr + 1, 3 * kr + 2)
            r_min = jnp.full((1, 128), WIN - 1, jnp.int32)
            for t in taps:
                y0t = jnp.floor(pys[t][i : i + 1, sl]).astype(jnp.int32)
                ok_t = (y0t >= -1) & (y0t <= H - 1)
                r_min = jnp.minimum(
                    r_min, jnp.where(ok_t, y0t - win_start, WIN - 1)
                )
            r0 = jnp.clip(jnp.min(r_min), 0, WIN - DRG)

            if pipeline_hats:
                ew3 = nxt
                if idx + 1 < len(iters):
                    nxt = build_ew3(*iters[idx + 1])
            else:
                ew3 = build_ew3(i, kr)  # [XW_, 3*128]

            stack = win_ref[pl.ds(r0, DRG), :, :].reshape(DRG * C, XW_)
            mm = jnp.dot(
                stack, ew3, preferred_element_type=jnp.float32
            )  # [DRG*C, 3*128]

            for tj, t in enumerate(taps):
                py_t = pys[t][i : i + 1, sl]
                samp = jnp.zeros((C, 128), jnp.float32)
                for g in range(DRG):
                    row_y = (win_start + r0 + g).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_t - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)
                    samp = samp + (
                        mm[g * C : (g + 1) * C, tj * 128 : (tj + 1) * 128]
                        * w_y
                    )
                m_t = off_s[2 * K + t, i : i + 1, sl]
                msamps.append((samp * m_t).astype(jnp.bfloat16))

            if kr == 2:
                mstack = jnp.concatenate(msamps, axis=0)  # [K*C, 128] bf16
                msamps = []
                out_ref[0, i, :, sl] = jnp.dot(
                    w_ref[...], mstack, preferred_element_type=jnp.float32
                )


@functools.partial(
    jax.jit, static_argnames=("interpret", "xw", "pipeline_hats", "io_cf")
)
def _dcn_onehot_fused_batched(
    x: jax.Array,  # [B, H, W, C] bf16 (io_cf: [B, H, C, W])
    k_off: jax.Array,  # [3, 3, C, 3*K] offset-conv kernel (HWIO)
    b_off: jax.Array,  # [3*K] offset-conv bias
    weight: jax.Array,  # [K, C, C_out]
    interpret: bool = False,
    xw: int = XW,
    pipeline_hats: bool = False,
    io_cf: bool = False,
) -> jax.Array:
    if io_cf:
        B, H, C, W_img = x.shape
    else:
        B, H, W_img, C = x.shape
    C_out = weight.shape[-1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    XW_ = min(xw, W)
    if W != W_img:
        pad = (
            ((0, 0), (0, 0), (0, 0), (0, W - W_img))
            if io_cf
            else ((0, 0), (0, 0), (0, W - W_img), (0, 0))
        )
        x = jnp.pad(x, pad)

    # The kernel's native feature layout is [B, H, C, W] (x on lanes);
    # io_cf callers hand it over directly and skip both relayouts.
    x_t = x if io_cf else x.transpose(0, 1, 3, 2)  # [B, H, C, W]
    w_flat = weight.transpose(2, 0, 1).reshape(C_out, K * C)
    # Tap-major columns matching phase A's im2col build order (dy outer,
    # dx inner), channels contiguous per tap.
    woff = k_off.transpose(3, 0, 1, 2).reshape(3 * K, K * C)

    kernel = functools.partial(
        _kernel_fused, H=H, W=W, W_img=W_img, C=C, C_out=C_out, XW_=XW_,
        pipeline_hats=pipeline_hats,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // ROWS),
        in_specs=[
            pl.BlockSpec((3 * K, K * C), lambda b, s: (0, 0)),
            pl.BlockSpec((3 * K, 1), lambda b, s: (0, 0)),
            pl.BlockSpec((C_out, K * C), lambda b, s: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ROWS, C_out, W), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, C_out, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW_), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW_), jnp.bfloat16),
            pltpu.VMEM((3 * K, ROWS, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        woff.astype(jnp.bfloat16),
        b_off.reshape(3 * K, 1).astype(jnp.float32),
        w_flat.astype(jnp.bfloat16),
        x_t,
    )
    if io_cf:
        return out[:, :, :, :W_img]  # [B, H, C_out, W_img]
    return out.transpose(0, 1, 3, 2)[:, :, :W_img, :]  # [B, H, W_img, C_out]


def deform_conv2d_onehot_fused(
    x: jax.Array,  # [B, H, W, C] (io_cf: [B, H, C, W])
    k_off: jax.Array,  # [3, 3, C, 3*K] offset-conv kernel
    b_off: jax.Array,  # [3*K] offset-conv bias
    weight: jax.Array,  # [K, C, C_out]
    bias: jax.Array | None = None,
    interpret: bool = False,
    xw: int = XW,
    pipeline_hats: bool = False,
    io_cf: bool = False,
) -> jax.Array:
    """DCNv2 with the offset/mask conv computed inside the kernel.

    Equals ``deform_conv2d_onehot(x, *split(conv(x, k_off) + b_off), ...)``
    with the interleaved torch channel layout (reference
    models/dcn.py:62-80) — but the offsets never round-trip through HBM.

    With ``io_cf`` the input and output use the kernel's native
    channels-first [B, H, C, W] layout — the ARF-head trunk carries this
    layout across its stacked DCN layers so the per-layer lane-axis
    relayouts disappear (PERFORMANCE.md round 5, FeatureNet composite).
    """
    out = _dcn_onehot_fused_batched(
        x.astype(jnp.bfloat16),
        k_off,
        b_off,
        weight,
        interpret=interpret,
        xw=xw,
        pipeline_hats=pipeline_hats,
        io_cf=io_cf,
    )
    if bias is not None:
        b = bias.astype(out.dtype)
        out = out + (b[:, None] if io_cf else b)
    return out.astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "xw", "tap_grouped", "pipeline_hats")
)
def _dcn_onehot_batched(
    x: jax.Array,  # [B, H, W, C] bf16
    dy: jax.Array,  # [B, H, W, K] f32
    dx: jax.Array,
    mask: jax.Array,
    weight: jax.Array,  # [K, C, C_out]
    interpret: bool = False,
    xw: int = XW,
    tap_grouped: bool = True,
    pipeline_hats: bool = False,
) -> jax.Array:
    B, H, W_img, C = x.shape
    C_out = weight.shape[-1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    XW_ = min(xw, W)
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
    w_flat = weight.transpose(2, 0, 1).reshape(C_out, K * C)

    kernel = functools.partial(
        _kernel_tapgroup if tap_grouped else _kernel,
        H=H, W=W, W_img=W_img, C=C, C_out=C_out, XW_=XW_,
        **({"pipeline_hats": pipeline_hats} if tap_grouped else {}),
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
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW_), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW_), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        dy_t.astype(jnp.float32),
        dx_t.astype(jnp.float32),
        m_t.astype(jnp.float32),
        w_flat.astype(jnp.bfloat16),
        x_t,
    )
    return out.transpose(0, 1, 3, 2)[:, :, :W_img, :]  # [B, H, W_img, C_out]


def deform_conv2d_onehot(
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
    xw: int = XW,
    tap_grouped: bool = True,
    pipeline_hats: bool = False,
) -> jax.Array:
    """Batched DCNv2, one-hot MXU kernel (bf16 inference path)."""
    assert stride == 1 and padding == 1 and dilation == 1
    out = _dcn_onehot_batched(
        x.astype(jnp.bfloat16),
        offset_y.astype(jnp.float32),
        offset_x.astype(jnp.float32),
        mask.astype(jnp.float32),
        weight,
        interpret=interpret,
        xw=xw,
        tap_grouped=tap_grouped,
        pipeline_hats=pipeline_hats,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
