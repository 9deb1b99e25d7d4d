"""Pallas TPU kernel: fused plane-sweep warp + correlation.

Why a kernel: XLA's TPU gather lowers per-pixel bilinear taps to row
gathers that pad each row to the 128-lane tile and issue serially —
measured 348 ms for a single stage-2 source view at DTU resolution, with
worker crashes at stage-3 DCN scale (microbench.py). Mosaic's
`tpu.dynamic_gather` (reached via ``take_along_axis(axis=0)``) performs a
vectorized per-lane sublane gather, but requires operand, indices, and
output to share one 2-D shape. The kernel design makes that restriction
free:

  - 128 lanes pack P = 128/C_eff output pixels × C_eff channels (features
    are zero-padded to C_eff when that improves the geometry constraints).
  - Gather rows pack a *depth-chunk*: rows (d_local, t) for Dc consecutive
    hypothesis planes × T_blk pixel groups, sized so Dc·T_blk equals the
    source band's row count S = BAND·W — the gather is then 100% useful.
  - Per (depth-chunk, block), the needed source rows form a narrow band
    (epipolar geometry, smooth hypothesis windows, and consecutive planes
    move nearly together). The band start is computed on-core and DMA'd.
  - The [S, C] band expands to [S, 128] (P channel copies) with one MXU
    matmul; each bilinear tap is ONE sublane gather; the channel-mean
    against the reference is a [S,128]x[128,P] block-diagonal matmul.

Semantics match ops/warp.warp_correlate (zeros padding, invalid-point
masking) except that in-image samples falling outside the BAND-row window
are dropped (zero). The packing leaves ≥half the band as margin above the
block's own row extent; ``band_overflow`` quantifies the effect on a given
geometry (≈0 for MVS rigs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INVALID = -1.0e6

# Target band footprint in rows*columns: S = BAND*W ≈ 4608 keeps every
# [S, 128] f32 buffer at ~2.4 MB so band+accumulators+index temporaries fit
# VMEM comfortably.
_TARGET_S = 4608


def plan(H: int, W: int, C: int, D: int):
    """Choose (C_eff, P, BAND, Dc, T_blk) for the packed gather.

    Constraints: 128 % C_eff == 0; S = BAND*W with Dc*T_blk == S; the
    block's output-row extent T_blk*P/W should be ≤ BAND/2 so half the band
    is margin for the warp's row spread.
    """
    BAND = max(1, min(H, _TARGET_S // W))
    S = BAND * W
    best = None
    c_eff = C
    while c_eff <= 128:
        if 128 % c_eff == 0:
            P = 128 // c_eff
            # pick the largest depth chunk Dc dividing (padded) D with
            # output rows T_blk*P/W ≤ BAND/2  ⇔  Dc ≥ 2*P (since
            # T_blk*P/W = BAND*P/Dc).
            for dc in (64, 48, 32, 16, 12, 8, 6, 4, 3, 2, 1):
                if dc > max(D, 1):
                    continue
                if S % dc != 0:
                    continue
                rows_cover = BAND * P / dc
                if rows_cover <= max(BAND // 2, 1) or BAND >= H:
                    waste = c_eff / C
                    cand = (waste, -dc, c_eff, P, dc)
                    if best is None or cand < best:
                        best = cand
                    break
        c_eff *= 2
    if best is None:  # tiny shapes: fall back to per-depth, full-H band
        c_eff = C
        while 128 % c_eff != 0:
            c_eff *= 2
        P = 128 // c_eff
        dc = 1
    else:
        _, _, c_eff, P, dc = best
    T_blk = S // dc
    return c_eff, P, BAND, dc, T_blk


def _kernel(
    rel_ref,  # SMEM [3, 4]: rows of P_src @ P_ref^-1 (R | t)
    depth_ref,  # VMEM [Dc, T_blk, P]
    ref_ref,  # VMEM [T_blk, 128]
    src_hbm,  # ANY  [H*W, C_eff]
    out_ref,  # VMEM [Dc, T_blk, P]
    band_vmem,  # scratch [S, C_eff]
    sem,
    *,
    H: int,
    W: int,
    C: int,
    P: int,
    T_blk: int,
    Dc: int,
    BAND: int,
):
    g_idx = pl.program_id(1)
    S = BAND * W

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    t_row = row_iota % T_blk  # pixel-group within the block
    p_lane = lane_iota // C

    lin = (g_idx * T_blk + t_row) * P + p_lane  # output pixel id
    xo = (lin % W).astype(jnp.float32)
    yo = (lin // W).astype(jnp.float32)

    # depth per (d_local, t, p) -> [S, P] -> [S, 128] with each pixel's
    # depth replicated across its C lanes. jnp.repeat's reshape is not
    # lowerable by Mosaic; use a [P, 128] 0/1 matmul instead.
    r_p = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
    r_l = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
    rep = (r_l // C == r_p).astype(jnp.float32)
    dep = jnp.dot(
        depth_ref[...].reshape(S, P), rep, preferred_element_type=jnp.float32
    )

    r = rel_ref
    n0 = (r[0, 0] * xo + r[0, 1] * yo + r[0, 2]) * dep + r[0, 3]
    n1 = (r[1, 0] * xo + r[1, 1] * yo + r[1, 2]) * dep + r[1, 3]
    n2 = (r[2, 0] * xo + r[2, 1] * yo + r[2, 2]) * dep + r[2, 3]

    invalid = n2 < 1e-6
    safe_z = jnp.where(invalid, 1.0, n2)
    px = jnp.where(invalid, _INVALID, n0 / safe_z)
    py = jnp.where(invalid, _INVALID, n1 / safe_z)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = px - x0f
    fy = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    y_ok = (y0 >= -1) & (y0 <= H - 1)
    y_for_min = jnp.where(y_ok, y0, H - 1)
    band_start = jnp.clip(jnp.min(y_for_min), 0, max(H - BAND, 0))

    copy = pltpu.make_async_copy(
        src_hbm.at[pl.ds(band_start * W, S), :], band_vmem, sem
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
        g = jnp.take_along_axis(tiled, idx, axis=0)  # [S, 128]
        return g * (weight * (in_img & in_band).astype(jnp.float32))

    acc = tap(x0, y0, (1.0 - fx) * (1.0 - fy))
    acc += tap(x0 + 1, y0, fx * (1.0 - fy))
    acc += tap(x0, y0 + 1, (1.0 - fx) * fy)
    acc += tap(x0 + 1, y0 + 1, fx * fy)

    # ref features replicated across the depth chunk.
    ref_rep = jnp.broadcast_to(
        ref_ref[...][None], (Dc, T_blk, 128)
    ).reshape(S, 128)

    s_l = jax.lax.broadcasted_iota(jnp.int32, (128, P), 0)
    s_p = jax.lax.broadcasted_iota(jnp.int32, (128, P), 1)
    sel = (s_l // C == s_p).astype(jnp.float32)
    sim = jnp.dot(acc * ref_rep, sel, preferred_element_type=jnp.float32)
    out_ref[...] = sim.reshape(Dc, T_blk, P)


@functools.partial(jax.jit, static_argnames=("interpret", "mean_divisor"))
def _warp_correlate_pallas_single(
    src_fea: jax.Array,  # [H, W, C]
    ref_fea: jax.Array,  # [H, W, C]
    rel: jax.Array,  # [3, 4]
    depth_values: jax.Array,  # [D, H, W]
    interpret: bool = False,
    mean_divisor: int | None = None,
) -> jax.Array:
    H, W, C_in = src_fea.shape
    D = depth_values.shape[0]
    C, P, BAND, Dc, T_blk = plan(H, W, C_in, D)
    S = BAND * W

    # Zero-pad channels to C_eff (padded lanes contribute 0 to the mean).
    if C != C_in:
        padc = ((0, 0), (0, 0), (0, C - C_in))
        src_fea = jnp.pad(src_fea, padc)
        ref_fea = jnp.pad(ref_fea, padc)

    npix = H * W
    block_pix = T_blk * P
    nb = -(-npix // block_pix)
    padn = nb * block_pix - npix

    Dp = -(-D // Dc) * Dc

    ref_flat = ref_fea.reshape(npix, C)
    if padn:
        ref_flat = jnp.pad(ref_flat, ((0, padn), (0, 0)))
    ref_re = ref_flat.reshape(nb * T_blk, 128)

    depth_flat = depth_values.reshape(D, npix)
    if Dp != D or padn:
        depth_flat = jnp.pad(
            depth_flat, ((0, Dp - D), (0, padn)), mode="edge"
        )
    depth_re = depth_flat.reshape(Dp, nb * T_blk, P)

    kernel = functools.partial(
        _kernel, H=H, W=W, C=C, P=P, T_blk=T_blk, Dc=Dc, BAND=BAND
    )
    out = pl.pallas_call(
        kernel,
        grid=(Dp // Dc, nb),
        in_specs=[
            pl.BlockSpec((3, 4), lambda d, g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Dc, T_blk, P), lambda d, g: (d, g, 0)),
            pl.BlockSpec((T_blk, 128), lambda d, g: (g, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Dc, T_blk, P), lambda d, g: (d, g, 0)),
        out_shape=jax.ShapeDtypeStruct((Dp, nb * T_blk, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rel.astype(jnp.float32), depth_re, ref_re, src_fea.reshape(npix, C))

    out = out.reshape(Dp, nb * block_pix)[:D]
    if padn:
        out = out[:, :npix]
    divisor = mean_divisor if mean_divisor is not None else C_in
    return out.reshape(D, H, W) * (1.0 / divisor)


def warp_correlate_pallas(
    src_fea: jax.Array,  # [B, H, W, C]
    ref_fea: jax.Array,
    src_proj: jax.Array,  # [B, 4, 4]
    ref_proj: jax.Array,
    depth_values: jax.Array,  # [B, D, H, W]
    interpret: bool = False,
) -> jax.Array:
    """Batched fused warp-correlation on the Pallas TPU kernel.

    Drop-in for ops.warp.warp_correlate (inference path — no custom VJP yet).
    """
    from transmvsnet_tpu.ops.geometry import relative_projection

    rel = relative_projection(src_proj, ref_proj)[:, :3, :]  # [B, 3, 4]
    fn = functools.partial(_warp_correlate_pallas_single, interpret=interpret)
    return jax.vmap(fn)(
        src_fea.astype(jnp.float32),
        ref_fea.astype(jnp.float32),
        rel,
        depth_values.astype(jnp.float32),
    )


def band_overflow(
    src_hw: tuple[int, int],
    rel: np.ndarray,
    depth_values: np.ndarray,
    C: int = 8,
) -> float:
    """Fraction of in-image bilinear taps the banded kernel drops on a given
    geometry — host-side validation of the plan() constraints."""
    H, W = src_hw
    D = depth_values.shape[0]
    C_eff, P, BAND, Dc, T_blk = plan(H, W, C, D)
    block_pix = T_blk * P
    npix = H * W
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(npix)], 0)
    total = 0
    dropped = 0
    Dp = -(-D // Dc) * Dc
    dv = depth_values.reshape(D, npix)
    dv = np.pad(dv, ((0, Dp - D), (0, 0)), mode="edge")
    nb = -(-npix // block_pix)
    for dchunk in range(Dp // Dc):
        for b in range(nb):
            sl = slice(b * block_pix, min((b + 1) * block_pix, npix))
            y0s = []
            oks = []
            for dl in range(Dc):
                d = dchunk * Dc + dl
                dep = dv[d, sl]
                p = rel[:, :3] @ pix[:, sl] * dep + rel[:, 3:4]
                z = p[2]
                ok = z > 1e-6
                py = np.where(ok, p[1] / np.where(ok, z, 1), -1e9)
                y0 = np.floor(py).astype(np.int64)
                y0s.append(y0)
                oks.append(ok & (y0 >= -1) & (y0 <= H - 1))
            y0s = np.stack(y0s)
            oks = np.stack(oks)
            if not oks.any():
                continue
            start = np.clip(
                np.min(np.where(oks, y0s, H - 1)), 0, max(H - BAND, 0)
            )
            lo, hi = start, start + BAND - 1
            for tap_y in (y0s, y0s + 1):
                tap_in = oks & (tap_y >= 0) & (tap_y <= H - 1)
                total += int(tap_in.sum())
                dropped += int((tap_in & ((tap_y < lo) | (tap_y > hi))).sum())
    return dropped / max(total, 1)
