"""Pallas TPU kernel: fused plane-sweep warp + correlation.

Why a kernel: XLA's TPU gather lowers the per-pixel bilinear taps to a
row-gather whose rows pad to the 128-lane tile — 4-16x wasted bandwidth and
two orders of magnitude off speed-of-light at DTU resolution (measured
348 ms for one stage-2 view; see microbench.py). Mosaic *does* support
vectorized dynamic gathers along the sublane dimension, which this kernel
exploits:

  - Outputs are processed in blocks of T sublanes × 128 lanes, where the
    128 lanes pack P = 128/C output pixels × C channels.
  - Per (depth, block), the needed source rows form a narrow band (epipolar
    geometry + smooth hypothesis windows). The band's start row is computed
    on-core, then DMA'd from HBM.
  - The [BAND·W, C] band is expanded to [BAND·W, 128] (P channel copies)
    with one tiny MXU matmul, making every lane productive.
  - Each bilinear tap is then ONE sublane-gather `take_along_axis(axis=0)`
    serving all 128 lanes, weighted and accumulated.
  - The channel mean against the reference features is a [T,128]x[128,P]
    block-diagonal matmul.

Semantics match ops/warp.warp_correlate (zeros padding, invalid-point
masking) with one documented approximation: source samples are drawn from a
BAND-row window around the block's minimum source row. In-image samples
falling outside the band are dropped (treated as zero). For plane-sweep MVS
the per-block row spread is a few rows, far below BAND (8-32); the
`band_overflow` helper and tests quantify this on representative geometry.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INVALID = -1.0e6


def _band_rows(w: int, h: int) -> int:
    """Band height: ~5 MB of 128-lane-padded VMEM, at least 8 rows."""
    rows = max(8, int(2 ** math.floor(math.log2(10240 / max(w, 1)))))
    return min(rows, h)


def _kernel(
    rel_ref,  # SMEM [3, 4]: rows of P_src @ P_ref^-1 (R | t)
    depth_ref,  # VMEM [1, T, P]
    ref_ref,  # VMEM [T, 128]  (P x C lane-packed reference features)
    src_hbm,  # ANY  [H*W, C]  flattened source features
    out_ref,  # VMEM [1, T, P]
    band_vmem,  # scratch [BAND*W, C]
    sem,  # DMA semaphore
    *,
    H: int,
    W: int,
    C: int,
    P: int,
    T: int,
    BAND: int,
):
    nb_idx = pl.program_id(1)
    S = BAND * W

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    p_lane = l_iota // C

    lin = (nb_idx * T + t_iota) * P + p_lane  # linear output pixel id
    xo = (lin % W).astype(jnp.float32)
    yo = (lin // W).astype(jnp.float32)

    dep = jnp.repeat(depth_ref[0], C, axis=1)

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

    # Band start: min in-image floor(py) over the block (padded/invalid
    # pixels excluded), clamped so the band stays inside the image.
    y_ok = (y0 >= -1) & (y0 <= H - 1)
    y_for_min = jnp.where(y_ok, y0, H - 1)
    band_start = jnp.clip(jnp.min(y_for_min), 0, max(H - BAND, 0))

    copy = pltpu.make_async_copy(
        src_hbm.at[pl.ds(band_start * W, S), :], band_vmem, sem
    )
    copy.start()

    # Channel-replication matrix E[c, l] = 1 iff l % C == c; the band
    # expands to [S, 128] via one MXU matmul so all lanes are productive.
    e_c = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    e_l = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    expand = (e_l % C == e_c).astype(jnp.float32)

    copy.wait()
    tiled = jnp.dot(
        band_vmem[...], expand, preferred_element_type=jnp.float32
    )  # [S, 128]

    def tap(xi, yi, weight):
        y_loc = yi - band_start
        in_img = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        in_band = (y_loc >= 0) & (y_loc <= BAND - 1)
        idx = jnp.clip(y_loc * W + xi, 0, S - 1)
        g = jnp.take_along_axis(tiled, idx, axis=0)  # [T, 128]
        return g * (weight * (in_img & in_band).astype(jnp.float32))

    acc = tap(x0, y0, (1.0 - fx) * (1.0 - fy))
    acc += tap(x0 + 1, y0, fx * (1.0 - fy))
    acc += tap(x0, y0 + 1, (1.0 - fx) * fy)
    acc += tap(x0 + 1, y0 + 1, fx * fy)

    # sim[t, p] = mean_c (acc * ref)[t, p*C + c]
    s_l = jax.lax.broadcasted_iota(jnp.int32, (128, P), 0)
    s_p = jax.lax.broadcasted_iota(jnp.int32, (128, P), 1)
    sel = (s_l // C == s_p).astype(jnp.float32)
    sim = jnp.dot(
        acc * ref_ref[...], sel, preferred_element_type=jnp.float32
    ) * (1.0 / C)
    out_ref[0] = sim


@functools.partial(jax.jit, static_argnames=("interpret",))
def _warp_correlate_pallas_single(
    src_fea: jax.Array,  # [H, W, C]
    ref_fea: jax.Array,  # [H, W, C]
    rel: jax.Array,  # [3, 4]
    depth_values: jax.Array,  # [D, H, W]
    interpret: bool = False,
) -> jax.Array:
    H, W, C = src_fea.shape
    D = depth_values.shape[0]
    assert 128 % C == 0, f"C={C} must divide 128"
    P = 128 // C
    T = 256
    BAND = _band_rows(W, H)

    npix = H * W
    block_pix = T * P
    nb = -(-npix // block_pix)
    pad = nb * block_pix - npix

    ref_flat = ref_fea.reshape(npix, C)
    if pad:
        ref_flat = jnp.pad(ref_flat, ((0, pad), (0, 0)))
    ref_re = ref_flat.reshape(nb * T, 128)

    depth_flat = depth_values.reshape(D, npix)
    if pad:
        depth_flat = jnp.pad(depth_flat, ((0, 0), (0, pad)))
    depth_re = depth_flat.reshape(D, nb * T, P)

    src_flat = src_fea.reshape(npix, C)

    kernel = functools.partial(
        _kernel, H=H, W=W, C=C, P=P, T=T, BAND=BAND
    )
    out = pl.pallas_call(
        kernel,
        grid=(D, nb),
        in_specs=[
            pl.BlockSpec((3, 4), lambda d, g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, P), lambda d, g: (d, g, 0)),
            pl.BlockSpec((T, 128), lambda d, g: (g, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, T, P), lambda d, g: (d, g, 0)),
        out_shape=jax.ShapeDtypeStruct((D, nb * T, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BAND * W, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rel.astype(jnp.float32), depth_re, ref_re, src_flat)

    out = out.reshape(D, nb * block_pix)
    if pad:
        out = out[:, :npix]
    return out.reshape(D, H, W)


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
    T: int = 256,
) -> float:
    """Fraction of in-image samples the banded kernel would drop — a
    host-side diagnostic for validating BAND on a given geometry."""
    H, W = src_hw
    D = depth_values.shape[0]
    C_proxy = 8
    P = 128 // C_proxy
    BAND = _band_rows(W, H)
    block_pix = T * P
    npix = H * W
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(npix)], 0)
    total = 0
    dropped = 0
    for d in range(D):
        dep = depth_values[d].reshape(-1)
        p = rel[:, :3] @ pix * dep + rel[:, 3:4]
        z = p[2]
        ok = z > 1e-6
        py = np.where(ok, p[1] / np.where(ok, z, 1), -1e9)
        y0 = np.floor(py).astype(np.int64)
        in_img = (y0 >= -1) & (y0 <= H - 1)
        nb = -(-npix // block_pix)
        for b in range(nb):
            sl = slice(b * block_pix, min((b + 1) * block_pix, npix))
            blk = y0[sl]
            ok_blk = in_img[sl]
            if not ok_blk.any():
                continue
            start = np.clip(np.min(np.where(ok_blk, blk, H - 1)), 0, max(H - BAND, 0))
            lo, hi = start, start + BAND - 1
            for tap_y in (blk, blk + 1):
                tap_in_img = ok_blk & (tap_y >= 0) & (tap_y <= H - 1)
                total += int(tap_in_img.sum())
                dropped += int((tap_in_img & ((tap_y < lo) | (tap_y > hi))).sum())
    return dropped / max(total, 1)
