"""Pallas TPU kernel v4: plane-sweep warp-correlation, one-hot MXU variant.

Same row-sweep structure as warp_rowsweep.py (pre-transposed [H, C, W]
layout, WIN-row window DMA, 128-aligned x-window), but the bilinear sample
is computed on the MXU instead of lane-gathers: per output row a "hat"
weight matrix Ew[j, l] = max(0, 1 - |j - (px(l) - xmin)|) realizes the
x-direction bilinear interpolation (including zeros-padding semantics —
out-of-window positions simply match no j), and each candidate window row
contributes one [C, XW] @ [XW, 128] matmul scaled by the y-hat weight.

Probed on this chip: the gather pattern costs ~520 ns per row-sample at
DR=6 while this one-hot form costs ~275 ns (f32) — and the matmuls run at
the MXU's native bf16, so the window/feature data path is bf16 end-to-end,
halving VMEM traffic. Numerics: bilinear weights and features are rounded
to bf16 (the model's bf16 compute mode); use warp_rowsweep for exact-f32.

Reference behavior spec: homo_warping at reference models/module.py:284-322
(grid_sample zeros padding, align_corners=True) fused with the pair-wise
correlation mean over channels at reference models/TransMVSNet.py:79-80.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INVALID = -1.0e6

ROWS = 8  # output rows per strip
WIN = 16  # source window rows
DR = 6  # candidate window rows per output row (per-row matmul path)


def _correlate_strip(
    r,  # scalar getter r(i, j) into the 3x4 relative projection (SMEM)
    dep,  # [ROWS, W] depth hypotheses for this strip
    strip,  # strip index (program id)
    ref_ref,  # VMEM [1, ROWS, C, W] reference features
    src_window_at,  # fn(win_start) -> HBM ref slice for the WIN-row DMA
    emit,  # fn(i, sl, sim_row [1, 128]) output writer
    bigwin,  # scratch VMEM [WIN, C, W] bf16
    xwin,  # scratch VMEM [WIN, C, XW] bf16
    xwin2,  # scratch VMEM [WIN, C, XW] bf16 (double-buffer partner)
    sem0,
    sem1,
    sem2,
    *,
    H: int,
    W: int,
    W_img: int,
    C: int,
    XW: int,
):
    """Shared strip body for the one-hot warp kernels: project the strip's
    pixels into the source view, DMA the candidate row window, and emit one
    correlation row per (output row, 128-lane chunk)."""
    n_chunks = W // 128

    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    yo = (strip * ROWS + row_i).astype(jnp.float32)
    xo = col_i.astype(jnp.float32)

    n0 = (r(0, 0) * xo + r(0, 1) * yo + r(0, 2)) * dep + r(0, 3)
    n1 = (r(1, 0) * xo + r(1, 1) * yo + r(1, 2)) * dep + r(1, 3)
    n2 = (r(2, 0) * xo + r(2, 1) * yo + r(2, 2)) * dep + r(2, 3)
    invalid = n2 < 1e-6
    safe_z = jnp.where(invalid, 1.0, n2)
    px = jnp.where(invalid, _INVALID, n0 / safe_z)
    py = jnp.where(invalid, _INVALID, n1 / safe_z)

    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    y_ok = (y0 >= -1) & (y0 <= H - 1)
    win_start = jnp.clip(
        jnp.min(jnp.where(y_ok, y0, H - 1)), 0, max(H - WIN, 0)
    )

    copy = pltpu.make_async_copy(src_window_at(win_start), bigwin, sem0)
    copy.start()
    copy.wait()

    j_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (XW, 128), 0).astype(jnp.float32)
    )

    def chunk_xmin(cx):
        sl = slice(cx * 128, cx * 128 + 128)
        x0_c = x0[:, sl]
        x_ok_c = (x0_c >= -1) & (x0_c <= W_img - 1)
        xmin = jnp.clip(
            (jnp.min(jnp.where(x_ok_c, x0_c, W_img - 1)) // 128) * 128,
            0,
            max(W - XW, 0),
        )
        return pl.multiple_of(xmin, 128)

    # Double-buffered x-window copies: chunk cx+1's window DMA is issued
    # before chunk cx's compute (extents depend only on the projection,
    # already computed).
    dbuf = XW != W
    bufs, sems = (xwin, xwin2), (sem1, sem2)
    xmins = [chunk_xmin(cx) for cx in range(n_chunks)] if dbuf else None

    def xw_copy(cx):
        return pltpu.make_async_copy(
            bigwin.at[:, :, pl.ds(xmins[cx], XW)], bufs[cx % 2], sems[cx % 2]
        )

    if dbuf:
        xw_copy(0).start()

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)
        y0_c = y0[:, sl]
        px_c = px[:, sl]
        py_c = py[:, sl]

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
        # Measured dispatch (v5e): when one stacked [G·C, XW] @ [XW, 128]
        # matmul covers >= DR candidate rows (C <= 16 → G = 128//C >= 8),
        # stacking beats per-row matmuls (stage2 53→46 ms, stage3 41→28 ms
        # per 4 views); at C = 32 the extra stacked window loads cost more
        # than the M=32 MXU waste, so the per-row DR loop stays.
        group = max(1, min(WIN, 128 // C))
        stacked = group >= DR
        cover = group if stacked else DR
        for i in range(ROWS):
            pxw = px_c[i : i + 1] - xminf  # [1, 128] window-relative x
            py_i = py_c[i : i + 1]

            # x-bilinear as a hat one-hot; OOW/invalid lanes match no j.
            ew = jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - pxw)).astype(
                jnp.bfloat16
            )  # [XW, 128]

            y_loc = y0_c[i : i + 1] - win_start
            ok_i = (y0_c[i : i + 1] >= -1) & (y0_c[i : i + 1] <= H - 1)
            r0 = jnp.clip(
                jnp.min(jnp.where(ok_i, y_loc, WIN - 1)), 0, WIN - cover
            )

            samp = jnp.zeros((C, 128), jnp.float32)
            if stacked:
                stack = win_ref[pl.ds(r0, group), :, :].reshape(
                    group * C, -1
                )  # [G·C, XW] bf16
                m = jnp.dot(
                    stack, ew, preferred_element_type=jnp.float32
                )  # [G·C, 128]
                for g in range(group):
                    row_y = (win_start + r0 + g).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_i - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)  # [1, 128]
                    samp = samp + m[g * C : (g + 1) * C] * w_y
            else:
                for dr in range(DR):
                    wr_idx = r0 + dr
                    row_y = (win_start + wr_idx).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_i - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)  # [1, 128]

                    slab = win_ref[pl.ds(wr_idx, 1), :, :][0]  # [C, XW] bf16
                    m = jnp.dot(slab, ew, preferred_element_type=jnp.float32)
                    samp = samp + m * w_y

            ref_slab = ref_ref[0, i, :, sl].astype(jnp.float32)  # [C, 128]
            sim_row = jnp.sum(samp * ref_slab, axis=0, keepdims=True) * (
                1.0 / C
            )
            emit(i, sl, sim_row)


def _kernel(
    rel_ref,  # SMEM [1, 3, 4]
    depth_ref,  # VMEM [1, 1, ROWS, W]
    ref_ref,  # VMEM [1, ROWS, C, W] bf16 (reference features, x in lanes)
    src_hbm,  # ANY [B, H, C, W] bf16
    out_ref,  # VMEM [1, 1, ROWS, W] f32
    bigwin,  # scratch VMEM [WIN, C, W] bf16
    xwin,  # scratch VMEM [WIN, C, XW] bf16
    xwin2,  # scratch VMEM [WIN, C, XW] bf16
    sem0,
    sem1,
    sem2,
    *,
    H: int,
    W: int,
    W_img: int,
    C: int,
    XW: int,
):
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)

    def emit(i, sl, sim_row):
        out_ref[0, 0, i : i + 1, sl] = sim_row

    _correlate_strip(
        lambda i, j: rel_ref[0, i, j],  # SMEM supports scalar loads only
        depth_ref[0, 0],
        strip,
        ref_ref,
        lambda ws: src_hbm.at[b_idx, pl.ds(ws, WIN), :, :],
        emit,
        bigwin,
        xwin,
        xwin2,
        sem0,
        sem1,
        sem2,
        H=H,
        W=W,
        W_img=W_img,
        C=C,
        XW=XW,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _warp_onehot_batched(
    src_fea: jax.Array,  # [B, H, W, C] bf16
    ref_fea: jax.Array,
    rel: jax.Array,  # [B, 3, 4] f32
    depth_values: jax.Array,  # [B, D, H, W] f32
    interpret: bool = False,
) -> jax.Array:
    B, H, W_img, C = src_fea.shape
    D = depth_values.shape[1]
    assert H % ROWS == 0, f"H={H} must be a multiple of {ROWS}"
    assert H >= WIN, f"H={H} must be >= {WIN}"
    W = -(-W_img // 128) * 128
    XW = min(384, W)
    if W != W_img:
        padw = ((0, 0), (0, 0), (0, W - W_img), (0, 0))
        src_fea = jnp.pad(src_fea, padw)
        ref_fea = jnp.pad(ref_fea, padw)
        depth_values = jnp.pad(
            depth_values, ((0, 0), (0, 0), (0, 0), (0, W - W_img)), mode="edge"
        )

    src_t = src_fea.transpose(0, 1, 3, 2)  # [B, H, C, W]
    ref_t = ref_fea.transpose(0, 1, 3, 2)

    kernel = functools.partial(_kernel, H=H, W=W, W_img=W_img, C=C, XW=XW)
    out = pl.pallas_call(
        kernel,
        # d innermost so the ref strip block is reused across depths.
        grid=(B, H // ROWS, D),
        in_specs=[
            pl.BlockSpec(
                (1, 3, 4), lambda b, s, d: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, ROWS, W), lambda b, s, d: (b, d, s, 0)),
            pl.BlockSpec((1, ROWS, C, W), lambda b, s, d: (b, s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ROWS, W), lambda b, s, d: (b, d, s, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rel.astype(jnp.float32), depth_values.astype(jnp.float32), ref_t, src_t)
    return out[:, :, :, :W_img]


def warp_correlate_onehot(
    src_fea: jax.Array,  # [B, H, W, C]
    ref_fea: jax.Array,
    src_proj: jax.Array,  # [B, 4, 4]
    ref_proj: jax.Array,
    depth_values: jax.Array,  # [B, D, H, W]
    interpret: bool = False,
) -> jax.Array:
    """Batched fused warp-correlation, one-hot MXU kernel (bf16 data path)."""
    from transmvsnet_tpu.ops.geometry import relative_projection

    rel = relative_projection(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32)
    )[:, :3, :]
    return _warp_onehot_batched(
        src_fea.astype(jnp.bfloat16),
        ref_fea.astype(jnp.bfloat16),
        rel,
        depth_values,
        interpret=interpret,
    )


def _wsum_kernel(
    rel_ref,  # SMEM [1, 1, 3, 4]
    depth_ref,  # VMEM [1, 1, ROWS, W]
    ref_ref,  # VMEM [1, ROWS, C, W] bf16
    vw_ref,  # VMEM [1, 1, ROWS, W] f32 per-view weight
    src_hbm,  # ANY [B, S, H, C, W] bf16
    out_ref,  # VMEM [1, 1, ROWS, W] f32, accumulated over s
    bigwin,
    xwin,
    xwin2,
    sem0,
    sem1,
    sem2,
    *,
    H: int,
    W: int,
    W_img: int,
    C: int,
    XW: int,
    S: int,
):
    b_idx = pl.program_id(0)
    strip = pl.program_id(1)
    s_idx = pl.program_id(3)  # innermost: out block revisited across views

    @pl.when(s_idx == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def emit(i, sl, sim_row):
        vw_row = vw_ref[0, 0, i : i + 1, sl]
        out_ref[0, 0, i : i + 1, sl] = (
            out_ref[0, 0, i : i + 1, sl] + sim_row * vw_row
        )

    _correlate_strip(
        lambda i, j: rel_ref[0, 0, i, j],
        depth_ref[0, 0],
        strip,
        ref_ref,
        lambda ws: src_hbm.at[b_idx, s_idx, pl.ds(ws, WIN), :, :],
        emit,
        bigwin,
        xwin,
        xwin2,
        sem0,
        sem1,
        sem2,
        H=H,
        W=W,
        W_img=W_img,
        C=C,
        XW=XW,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _warp_onehot_wsum_batched(
    src_feas: jax.Array,  # [B, S, H, W, C] bf16
    ref_fea: jax.Array,  # [B, H, W, C] bf16
    rel: jax.Array,  # [B, S, 3, 4] f32
    depth_values: jax.Array,  # [B, D, H, W] f32
    view_weights: jax.Array,  # [B, S, H, W] f32
    interpret: bool = False,
) -> jax.Array:
    B, S, H, W_img, C = src_feas.shape
    D = depth_values.shape[1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    XW = min(384, W)
    if W != W_img:
        src_feas = jnp.pad(
            src_feas, ((0, 0), (0, 0), (0, 0), (0, W - W_img), (0, 0))
        )
        ref_fea = jnp.pad(ref_fea, ((0, 0), (0, 0), (0, W - W_img), (0, 0)))
        depth_values = jnp.pad(
            depth_values, ((0, 0), (0, 0), (0, 0), (0, W - W_img)), mode="edge"
        )
        view_weights = jnp.pad(
            view_weights, ((0, 0), (0, 0), (0, 0), (0, W - W_img))
        )

    src_t = src_feas.transpose(0, 1, 2, 4, 3)  # [B, S, H, C, W]
    ref_t = ref_fea.transpose(0, 1, 3, 2)  # [B, H, C, W]

    kernel = functools.partial(
        _wsum_kernel, H=H, W=W, W_img=W_img, C=C, XW=XW, S=S
    )
    out = pl.pallas_call(
        kernel,
        # s innermost: the (b, strip, d) output block stays resident in
        # VMEM while the S views accumulate into it — the [B, S, D, h, w]
        # per-view similarity volume is never materialized.
        grid=(B, H // ROWS, D, S),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 3, 4),
                lambda b, st, d, s: (b, s, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 1, ROWS, W), lambda b, st, d, s: (b, d, st, 0)),
            pl.BlockSpec((1, ROWS, C, W), lambda b, st, d, s: (b, st, 0, 0)),
            pl.BlockSpec((1, 1, ROWS, W), lambda b, st, d, s: (b, s, st, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ROWS, W), lambda b, st, d, s: (b, d, st, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW), jnp.bfloat16),
            pltpu.VMEM((WIN, C, XW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        rel.astype(jnp.float32),
        depth_values.astype(jnp.float32),
        ref_t,
        view_weights.astype(jnp.float32),
        src_t,
    )
    return out[:, :, :, :W_img]


def warp_correlate_wsum_onehot(
    src_feas: jax.Array,  # [B, S, H, W, C]
    ref_fea: jax.Array,  # [B, H, W, C]
    src_projs: jax.Array,  # [B, S, 4, 4]
    ref_proj: jax.Array,  # [B, 4, 4]
    depth_values: jax.Array,  # [B, D, H, W]
    view_weights: jax.Array,  # [B, S, H, W]
    interpret: bool = False,
) -> jax.Array:
    """Warp-correlation summed over source views with per-view weights.

    Returns Σ_s w_s · sim_s as [B, D, H, W] (caller divides by Σ_s w_s).
    Equals ``Σ_s view_weights[:, s, None] * warp_correlate(src_s, ...)``
    but never materializes the [B, S, D, H, W] per-view volume and reads
    the reference/depth blocks once per (strip, d) instead of per view.
    """
    from transmvsnet_tpu.ops.geometry import relative_projection

    B, S = src_feas.shape[:2]
    rel = jax.vmap(
        lambda sp, rp: relative_projection(
            sp.astype(jnp.float32), rp.astype(jnp.float32)
        ),
        in_axes=(1, None),
        out_axes=1,
    )(src_projs, ref_proj)[:, :, :3, :]
    return _warp_onehot_wsum_batched(
        src_feas.astype(jnp.bfloat16),
        ref_fea.astype(jnp.bfloat16),
        rel,
        depth_values,
        view_weights,
        interpret=interpret,
    )
