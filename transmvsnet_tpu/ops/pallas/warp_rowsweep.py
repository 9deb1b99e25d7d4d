"""Pallas TPU kernel v3: plane-sweep warp-correlation by row sweep.

Mosaic's dynamic gather moves one vreg along the gathered axis (8 sublanes
or 128 lanes), dynamic lane slicing is unavailable, and slice shapes must
respect the (8, 128) tiling — so the kernel is built exclusively from
primitives probed to work on hardware:

  - DMA with free-form multi-dim slicing (HBM→VMEM and VMEM→VMEM),
  - dynamic *sublane/leading-dim* slicing of refs,
  - [C, 128] lane-gathers (one 128-lane vreg gathered per call).

Layout trick: features enter pre-transposed as [H, C, W] so the x axis is
the lane axis end-to-end and no in-kernel transposes are needed.

Per (depth, 8-row output strip): DMA a WIN-row source window [WIN, C, W];
per 128-col output chunk, DMA the 256-col x-window [WIN, C, 256]
(VMEM→VMEM) anchored at the chunk's minimum source column; every bilinear
tap is then one [C, 128] lane-gather from the dynamically selected window
row, masked by row/column membership; the channel reduction against the
reference is a sublane sum.

Approximation contract: in-image samples outside the WIN×256 window (or
beyond the DR candidate rows of an output row) read as zero. For MVS
plane-sweep geometry the spreads are a few pixels; tests measure ~100%
agreement with the XLA reference implementation.
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
DR = 6  # candidate window rows per output row (y0 spread + y1 tap + margin)


def _kernel(
    rel_ref,  # SMEM [1, 3, 4]
    depth_ref,  # VMEM [1, 1, ROWS, W]
    ref_ref,  # VMEM [1, ROWS, C, W]  (strip's reference features, x in lanes)
    src_hbm,  # ANY [B, H, C, W]
    out_ref,  # VMEM [1, 1, ROWS, W]
    bigwin,  # scratch VMEM [WIN, C, W]
    xwin,  # scratch VMEM [WIN, C, XW]
    sem0,
    sem1,
    *,
    H: int,
    W: int,  # padded layout width (multiple of 128)
    W_img: int,  # true image width for bounds checks
    C: int,
    XW: int,  # x-window width (multiple of 128)
):
    b_idx = pl.program_id(0)
    strip = pl.program_id(2)
    n_chunks = W // 128
    n_halves = XW // 128

    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, W), 1)
    yo = (strip * ROWS + row_i).astype(jnp.float32)
    xo = col_i.astype(jnp.float32)
    dep = depth_ref[0, 0]

    def r(i, j):  # SMEM supports scalar loads only
        return rel_ref[0, i, j]

    n0 = (r(0, 0) * xo + r(0, 1) * yo + r(0, 2)) * dep + r(0, 3)
    n1 = (r(1, 0) * xo + r(1, 1) * yo + r(1, 2)) * dep + r(1, 3)
    n2 = (r(2, 0) * xo + r(2, 1) * yo + r(2, 2)) * dep + r(2, 3)
    invalid = n2 < 1e-6
    safe_z = jnp.where(invalid, 1.0, n2)
    px = jnp.where(invalid, _INVALID, n0 / safe_z)
    py = jnp.where(invalid, _INVALID, n1 / safe_z)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = (px - x0f).astype(jnp.float32)
    fy = (py - y0f).astype(jnp.float32)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    y_ok = (y0 >= -1) & (y0 <= H - 1)
    win_start = jnp.clip(
        jnp.min(jnp.where(y_ok, y0, H - 1)), 0, max(H - WIN, 0)
    )

    copy = pltpu.make_async_copy(
        src_hbm.at[b_idx, pl.ds(win_start, WIN), :, :], bigwin, sem0
    )
    copy.start()
    copy.wait()

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)
        x0_c = x0[:, sl]
        y0_c = y0[:, sl]
        fx_c = fx[:, sl]
        fy_c = fy[:, sl]

        x_ok_c = (x0_c >= -1) & (x0_c <= W_img - 1)
        # 128-aligned window base: VMEM->VMEM DMA lane offsets must be
        # tile-aligned; XW=384 leaves >=256 headroom above the true minimum.
        xmin = jnp.clip(
            (jnp.min(jnp.where(x_ok_c, x0_c, W_img - 1)) // 128) * 128,
            0,
            max(W - XW, 0),
        )
        xmin = pl.multiple_of(xmin, 128)

        if XW == W:
            # window spans the whole (padded) width: xmin is always 0 and
            # the VMEM->VMEM copy would duplicate bigwin — read it directly.
            win_ref = bigwin
        else:
            xcopy = pltpu.make_async_copy(
                bigwin.at[:, :, pl.ds(xmin, XW)], xwin, sem1
            )
            xcopy.start()
            xcopy.wait()
            win_ref = xwin

        for i in range(ROWS):
            y0_i = y0_c[i : i + 1]  # [1, 128]
            x0_i = x0_c[i : i + 1]
            fx_i = fx_c[i : i + 1]
            fy_i = fy_c[i : i + 1]

            y_loc = y0_i - win_start
            ok_i = (y0_i >= -1) & (y0_i <= H - 1)
            r0 = jnp.clip(
                jnp.min(jnp.where(ok_i, y_loc, WIN - 1)), 0, WIN - DR
            )

            samp = jnp.zeros((C, 128), jnp.float32)
            for dr in range(DR):
                wr_idx = r0 + dr
                row_y = win_start + wr_idx
                w_y = jnp.where(y0_i == row_y, 1.0 - fy_i, 0.0) + jnp.where(
                    y0_i + 1 == row_y, fy_i, 0.0
                )
                row_in = (row_y >= 0) & (row_y <= H - 1)
                w_y = w_y * row_in.astype(jnp.float32)  # [1, 128]

                slabs = win_ref[pl.ds(wr_idx, 1), :, :][0]  # [C, XW]

                for xt, w_x in ((x0_i, 1.0 - fx_i), (x0_i + 1, fx_i)):
                    x_in = (xt >= 0) & (xt <= W_img - 1)
                    xloc = xt - xmin
                    in_win = (xloc >= 0) & (xloc < XW)
                    g = jnp.zeros((C, 128), jnp.float32)
                    for h in range(n_halves):
                        use_h = (xloc >= h * 128) & (xloc < (h + 1) * 128)
                        idx = jnp.clip(xloc - h * 128, 0, 127)
                        gh = jnp.take_along_axis(
                            slabs[:, h * 128 : (h + 1) * 128],
                            jnp.broadcast_to(idx, (C, 128)),
                            axis=1,
                        )
                        g = jnp.where(jnp.broadcast_to(use_h, (C, 128)), gh, g)
                    wgt = w_y * w_x * (x_in & in_win).astype(jnp.float32)
                    samp = samp + g * jnp.broadcast_to(wgt, (C, 128))

            ref_slab = ref_ref[0, i, :, sl]  # [C, 128]
            sim_row = jnp.sum(samp * ref_slab, axis=0, keepdims=True) * (
                1.0 / C
            )
            out_ref[0, 0, i : i + 1, sl] = sim_row


@functools.partial(jax.jit, static_argnames=("interpret",))
def _warp_rowsweep_batched(
    src_fea: jax.Array,  # [B, H, W, C]
    ref_fea: jax.Array,
    rel: jax.Array,  # [B, 3, 4]
    depth_values: jax.Array,  # [B, D, H, W]
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

    kernel = functools.partial(
        _kernel, H=H, W=W, W_img=W_img, C=C, XW=XW
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, D, H // ROWS),
        in_specs=[
            pl.BlockSpec(
                (1, 3, 4), lambda b, d, s: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, ROWS, W), lambda b, d, s: (b, d, s, 0)),
            pl.BlockSpec((1, ROWS, C, W), lambda b, d, s: (b, s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, ROWS, W), lambda b, d, s: (b, d, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.float32),
            pltpu.VMEM((WIN, C, XW), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rel.astype(jnp.float32), depth_values, ref_t, src_t)
    return out[:, :, :, :W_img]


def warp_correlate_rowsweep(
    src_fea: jax.Array,  # [B, H, W, C]
    ref_fea: jax.Array,
    src_proj: jax.Array,  # [B, 4, 4]
    ref_proj: jax.Array,
    depth_values: jax.Array,  # [B, D, H, W]
    interpret: bool = False,
) -> jax.Array:
    """Batched fused warp-correlation, row-sweep kernel."""
    from transmvsnet_tpu.ops.geometry import relative_projection

    rel = relative_projection(src_proj, ref_proj)[:, :3, :]
    return _warp_rowsweep_batched(
        src_fea.astype(jnp.float32),
        ref_fea.astype(jnp.float32),
        rel,
        depth_values.astype(jnp.float32),
        interpret=interpret,
    )
