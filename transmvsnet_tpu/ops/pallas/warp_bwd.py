"""Pallas TPU backward kernel for the one-hot warp-correlation.

Native VJP for ``warp_onehot.warp_correlate_wsum_onehot`` (and, with S=1,
for the per-view ``warp_correlate_onehot``): given the cotangent g of the
weighted similarity Σ_s vw_s·mean_C(warp(src_s)⊙ref), produce dsrc, dref
and dvw without ever touching XLA's serial TPU gather/scatter path — that
path is why the recompute-VJP train step measured 9 s (PERFORMANCE.md
"Training performance").

The one-hot formulation makes every gradient a matmul:

  sim[l]   = (1/C)·Σ_c ref[c,l] · samp[c,l],
  samp     = Σ_r w_y(r,l) · win[r] @ Ew,          Ew[j,l] = hat(j − px[l])
  ⇒ dref   = samp ⊙ (vw·g/C)                       (recompute samp)
    dvw    = Σ_d g ⊙ sim                           (recompute sim)
    dwin[r] = (ref ⊙ vw·g/C ⊙ w_y(r)) @ Ewᵀ        (MXU A·Bᵀ contraction)

dwin is a scatter into data-dependent source rows, so the kernel
accumulates it with read-modify-write window DMAs into an HBM-resident
dsrc buffer (zero-initialized via input_output_aliases). Grid steps on
TPU execute sequentially and both DMAs are waited on, so the RMW is
race-free. The window/cover selection replicates the forward kernel
exactly — gradients correspond tap-for-tap to what the forward sampled.

Reference behavior spec: grads of homo_warping flow to src_fea only (grid
built under no-grad, reference models/module.py:294-322); the correlation
mean and the weighted view sum are reference models/TransMVSNet.py:79-93.

Window-truncation contract: gradients follow the forward's 128-aligned
x-window truncation (see dcn_bwd.py for the full statement). When
W > _XW, taps of a chunk's last lanes that fall outside the snapped
[xmin, xmin+XW) window are dropped consistently with the truncated
forward; dsrc/dref there deviate from the untruncated gradients at those
boundary lanes only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmvsnet_tpu.ops.pallas.warp_onehot import _INVALID, DR, ROWS, WIN

# x-window width, matching the forward's (warp_onehot uses min(384, W):
# plane-sweep px spreads wider than the DCN's learned offsets).
_XW = 384
# VMEM budget for the full-image dsrc accumulator (f32 [H, C, W]): the
# v5e core has ~16 MB VMEM shared with the window scratch + pipeline
# blocks; 8 MB keeps comfortable headroom (train s1 4.0 MB / s2 6.3 MB
# qualify, train s3 and the eval shapes stay on the window-RMW path).
_FULL_ACC_BYTES = 8 * 1024 * 1024


def _bwd_kernel(
    rel_ref,  # SMEM [1, 1, 3, 4]
    dep_ref,  # VMEM [1, 1, ROWS, W] f32
    ref_ref,  # VMEM [1, ROWS, C, W] bf16
    vw_ref,  # VMEM [1, 1, ROWS, W] f32
    g_ref,  # VMEM [1, 1, ROWS, W] f32 cotangent of the weighted sim
    src_hbm,  # ANY [B, S, H, C, W] bf16
    dsrc_in,  # ANY [B, S, H, C, W] f32 (zeros, aliased to dsrc_out);
    #           full_acc: ANY [1] f32 dummy (no aliasing, write-only dsrc)
    dsrc_out,  # ANY [B, S, H, C, W] f32 (accumulated via window RMW;
    #           full_acc: written once per (b, s) from the VMEM accumulator)
    dref_ref,  # VMEM [1, ROWS, C, W] f32, accumulated over (s, d);
    #           full_acc: per-(b·S+s) partial block, summed over S in XLA
    dvw_ref,  # VMEM [1, 1, ROWS, W] f32, accumulated over d
    bigwin,  # scratch VMEM [WIN, C, W] bf16
    accwin,  # scratch VMEM [WIN, C, W] f32 (full_acc: [H, C, W] f32)
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
    XW_: int,
    full_acc: bool = False,
):
    del dsrc_in  # same buffer as dsrc_out; declared for the alias only
    b_idx = pl.program_id(0)
    if full_acc:
        # Grid (B, S, strips, D): the f32 dsrc accumulator for source view
        # s lives in VMEM across ALL (strip, d) iterations and is flushed
        # to HBM once per (b, s) — no per-(s, d) HBM read-modify-write
        # traffic at all (the old path's dominant cost at the train
        # shapes; PERFORMANCE.md "Backward kernel tuning").
        s_idx = pl.program_id(1)
        strip = pl.program_id(2)
    else:
        strip = pl.program_id(1)
        s_idx = pl.program_id(2)
    d_idx = pl.program_id(3)
    n_chunks = W // 128
    n_strips = pl.num_programs(2 if full_acc else 1)
    n_depths = pl.num_programs(3)

    if full_acc:
        # dref block is per (b, s, strip) here — first visit is d == 0.
        @pl.when(d_idx == 0)
        def _init_dref_s():
            dref_ref[...] = jnp.zeros_like(dref_ref)

        @pl.when((strip == 0) & (d_idx == 0))
        def _init_acc():
            accwin[...] = jnp.zeros_like(accwin)
    else:
        @pl.when((s_idx == 0) & (d_idx == 0))
        def _init_dref():
            dref_ref[...] = jnp.zeros_like(dref_ref)

    @pl.when(d_idx == 0)
    def _init_dvw():
        dvw_ref[...] = jnp.zeros_like(dvw_ref)

    # --- projection of the strip's pixels (identical to the forward) ---
    def r(i, j):
        return rel_ref[0, 0, i, j]

    dep = dep_ref[0, 0]
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
    y_ok = (y0 >= -1) & (y0 <= H - 1)
    win_start = jnp.clip(
        jnp.min(jnp.where(y_ok, y0, H - 1)), 0, max(H - WIN, 0)
    )

    copy = pltpu.make_async_copy(
        src_hbm.at[b_idx, s_idx, pl.ds(win_start, WIN), :, :], bigwin, sem0
    )
    copy.start()
    if not full_acc:
        rmw_read = pltpu.make_async_copy(
            dsrc_out.at[b_idx, s_idx, pl.ds(win_start, WIN), :, :],
            accwin,
            sem1,
        )
        rmw_read.start()
        rmw_read.wait()
    copy.wait()

    # Windowed hat columns, mirroring the forward's 128-aligned x-window
    # (the first-cut backward built full-width [W, 128] hats — at the
    # 512x640 recipe shape that tripled both the VPU hat build and the
    # matmul contraction; see PERFORMANCE.md "Backward kernel tuning").
    # The window-gradient scatter lands in an XW-wide slice of the RMW
    # accumulator, staged through VMEM DMAs per chunk.
    j_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (XW_, 128), 0).astype(jnp.float32)
    )
    windowed = XW_ != W
    x0 = jnp.floor(px).astype(jnp.int32)

    group = max(1, min(WIN, 128 // C))
    stacked = group >= DR
    cover = group if stacked else DR
    inv_c = 1.0 / C

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)
        px_c = px[:, sl]
        py_c = py[:, sl]
        y0_c = y0[:, sl]

        x0_c = x0[:, sl]
        x_ok_c = (x0_c >= -1) & (x0_c <= W_img - 1)
        xmin = jnp.clip(
            (jnp.min(jnp.where(x_ok_c, x0_c, W_img - 1)) // 128) * 128,
            0,
            max(W - XW_, 0),
        )
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
        # full_acc: the accumulator is the whole source image, so scatter
        # rows are absolute (win_start + window-relative r).
        row_base = win_start if full_acc else 0
        xminf = xmin.astype(jnp.float32)

        for i in range(ROWS):
            pxi = px_c[i : i + 1]  # [1, 128] absolute x
            pyi = py_c[i : i + 1]
            gl = g_ref[0, 0, i : i + 1, sl]  # [1, 128]
            vwl = vw_ref[0, 0, i : i + 1, sl]
            ql = gl * vwl * inv_c  # d(loss)/d(samp·ref) per lane

            ew = jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - (pxi - xminf))).astype(
                jnp.bfloat16
            )  # [XW_, 128]

            y_loc = y0_c[i : i + 1] - win_start
            ok_i = (y0_c[i : i + 1] >= -1) & (y0_c[i : i + 1] <= H - 1)
            r0 = jnp.clip(
                jnp.min(jnp.where(ok_i, y_loc, WIN - 1)), 0, WIN - cover
            )

            ref_slab = ref_ref[0, i, :, sl].astype(jnp.float32)  # [C, 128]
            q = ref_slab * ql  # [C, 128] — cotangent routed to the sample

            samp = jnp.zeros((C, 128), jnp.float32)
            if stacked:
                stack = win_ref[pl.ds(r0, group), :, :].reshape(group * C, XW_)
                m = jnp.dot(
                    stack, ew, preferred_element_type=jnp.float32
                )  # [G·C, 128]
                wys = []
                for gi in range(group):
                    row_y = (win_start + r0 + gi).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(pyi - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)  # [1, 128]
                    wys.append(w_y)
                    samp = samp + m[gi * C : (gi + 1) * C] * w_y
                # Scatter all G window rows with one A·Bᵀ matmul.
                qs = jnp.concatenate(
                    [(q * w_y).astype(jnp.bfloat16) for w_y in wys], axis=0
                )  # [G·C, 128]
                dwin = jax.lax.dot_general(
                    qs,
                    ew,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G·C, XW_]
                acc_ref[pl.ds(row_base + r0, group), :, :] = acc_ref[
                    pl.ds(row_base + r0, group), :, :
                ] + dwin.reshape(group, C, XW_)
            else:
                for dr in range(DR):
                    wr = r0 + dr
                    row_y = (win_start + wr).astype(jnp.float32)
                    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(pyi - row_y))
                    row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                    w_y = w_y * row_in.astype(jnp.float32)

                    slab = win_ref[pl.ds(wr, 1), :, :][0]  # [C, XW_] bf16
                    m = jnp.dot(slab, ew, preferred_element_type=jnp.float32)
                    samp = samp + m * w_y

                    dwin = jax.lax.dot_general(
                        (q * w_y).astype(jnp.bfloat16),
                        ew,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C, XW_]
                    acc_ref[pl.ds(row_base + wr, 1), :, :] = (
                        acc_ref[pl.ds(row_base + wr, 1), :, :] + dwin[None]
                    )

            dref_ref[0, i, :, sl] = dref_ref[0, i, :, sl] + samp * ql
            sim_row = jnp.sum(samp * ref_slab, axis=0, keepdims=True) * inv_c
            dvw_ref[0, 0, i : i + 1, sl] = (
                dvw_ref[0, 0, i : i + 1, sl] + gl * sim_row
            )

        if windowed:
            aw = pltpu.make_async_copy(
                accx, accwin.at[:, :, pl.ds(xmin, XW_)], sem1
            )
            aw.start()
            aw.wait()

    if full_acc:
        @pl.when((strip == n_strips - 1) & (d_idx == n_depths - 1))
        def _flush():
            fl = pltpu.make_async_copy(
                accwin, dsrc_out.at[b_idx, s_idx], sem1
            )
            fl.start()
            fl.wait()
    else:
        rmw_write = pltpu.make_async_copy(
            accwin,
            dsrc_out.at[b_idx, s_idx, pl.ds(win_start, WIN), :, :],
            sem1,
        )
        rmw_write.start()
        rmw_write.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _warp_wsum_bwd_batched(
    src_feas: jax.Array,  # [B, S, H, W, C] bf16
    ref_fea: jax.Array,  # [B, H, W, C] bf16
    rel: jax.Array,  # [B, S, 3, 4] f32
    depth_values: jax.Array,  # [B, D, H, W] f32
    view_weights: jax.Array,  # [B, S, H, W] f32
    g: jax.Array,  # [B, D, H, W] f32
    interpret: bool = False,
):
    B, S, H, W_img, C = src_feas.shape
    D = depth_values.shape[1]
    assert H % ROWS == 0 and H >= WIN, (H,)
    W = -(-W_img // 128) * 128
    XW_ = min(_XW, W)
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
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, W - W_img)))

    src_t = src_feas.transpose(0, 1, 2, 4, 3)  # [B, S, H, C, W]
    ref_t = ref_fea.transpose(0, 1, 3, 2)  # [B, H, C, W]

    # Full-image VMEM dsrc accumulator (see _bwd_kernel): only when the
    # kernel is un-windowed (XW_ == W, so no accx staging exists) and the
    # [H, C, W] f32 accumulator fits the VMEM budget. At the train recipe
    # shapes (s1 128x160 C32: 4.0 MB, s2 256x320 C16: 6.3 MB) this removes
    # the per-(s, d) HBM read-modify-write of the dsrc window entirely —
    # dsrc becomes one HBM write per (b, s).
    full_acc = XW_ == W and H * C * W * 4 <= _FULL_ACC_BYTES
    kernel = functools.partial(
        _bwd_kernel, H=H, W=W, W_img=W_img, C=C, XW_=XW_, full_acc=full_acc
    )
    common = dict(
        scratch_shapes=[
            pltpu.VMEM((WIN, C, W), jnp.bfloat16),
            pltpu.VMEM((H if full_acc else WIN, C, W), jnp.float32),
            pltpu.VMEM((WIN, C, XW_), jnp.bfloat16),
            # accx is unused under full_acc (windowed is False) — shrink it.
            pltpu.VMEM((1 if full_acc else WIN, C, XW_), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    args = (
        rel.astype(jnp.float32),
        depth_values.astype(jnp.float32),
        ref_t,
        view_weights.astype(jnp.float32),
        g.astype(jnp.float32),
        src_t,
    )
    if full_acc:
        dsrc, drefs, dvw = pl.pallas_call(
            kernel,
            grid=(B, S, H // ROWS, D),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 3, 4),
                    lambda b, s, st, d: (b, s, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, s, st, d: (b, d, st, 0)
                ),
                pl.BlockSpec(
                    (1, ROWS, C, W), lambda b, s, st, d: (b, st, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, s, st, d: (b, s, st, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, s, st, d: (b, d, st, 0)
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                # Per-(b, s) dref partials (flat b·S+s leading axis keeps
                # the block rank identical to the RMW path; a (b, st)
                # block would be revisited non-consecutively under this
                # grid order, which Pallas outputs don't support).
                pl.BlockSpec(
                    (1, ROWS, C, W),
                    lambda b, s, st, d, S=S: (b * S + s, st, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, s, st, d: (b, s, st, 0)
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, S, H, C, W), jnp.float32),
                jax.ShapeDtypeStruct((B * S, H, C, W), jnp.float32),
                jax.ShapeDtypeStruct((B, S, H, W), jnp.float32),
            ),
            **common,
        )(*args, jnp.zeros((1,), jnp.float32))
        dref = jnp.sum(drefs.reshape(B, S, H, C, W), axis=1)
    else:
        dsrc0 = jnp.zeros((B, S, H, C, W), jnp.float32)
        dsrc, dref, dvw = pl.pallas_call(
            kernel,
            grid=(B, H // ROWS, S, D),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 3, 4),
                    lambda b, st, s, d: (b, s, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, st, s, d: (b, d, st, 0)
                ),
                pl.BlockSpec(
                    (1, ROWS, C, W), lambda b, st, s, d: (b, st, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, st, s, d: (b, s, st, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, st, s, d: (b, d, st, 0)
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, ROWS, C, W), lambda b, st, s, d: (b, st, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, ROWS, W), lambda b, st, s, d: (b, s, st, 0)
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, S, H, C, W), jnp.float32),
                jax.ShapeDtypeStruct((B, H, C, W), jnp.float32),
                jax.ShapeDtypeStruct((B, S, H, W), jnp.float32),
            ),
            input_output_aliases={6: 0},
            **common,
        )(*args, dsrc0)
    dsrc = dsrc.transpose(0, 1, 2, 4, 3)[:, :, :, :W_img]  # [B, S, H, W, C]
    dref = dref.transpose(0, 1, 3, 2)[:, :, :W_img]  # [B, H, W, C]
    return dsrc, dref, dvw[:, :, :, :W_img]


def warp_correlate_wsum_bwd(
    src_feas: jax.Array,  # [B, S, H, W, C]
    ref_fea: jax.Array,  # [B, H, W, C]
    src_projs: jax.Array,  # [B, S, 4, 4]
    ref_proj: jax.Array,  # [B, 4, 4]
    depth_values: jax.Array,  # [B, D, H, W]
    view_weights: jax.Array,  # [B, S, H, W]
    g: jax.Array,  # [B, D, H, W] cotangent
    interpret: bool = False,
):
    """Gradients (dsrc, dref, dvw) of the fused weighted warp-correlation.

    All outputs f32; projections/depth hypotheses receive no gradient (the
    sample grid is no-grad, reference models/module.py:294-316).
    """
    from transmvsnet_tpu.ops.geometry import relative_projection

    rel = jax.vmap(
        lambda sp, rp: relative_projection(
            sp.astype(jnp.float32), rp.astype(jnp.float32)
        ),
        in_axes=(1, None),
        out_axes=1,
    )(src_projs, ref_proj)[:, :, :3, :]
    return _warp_wsum_bwd_batched(
        src_feas.astype(jnp.bfloat16),
        ref_fea.astype(jnp.bfloat16),
        rel,
        depth_values,
        view_weights,
        g,
        interpret=interpret,
    )


def warp_correlate_bwd(
    src_fea: jax.Array,  # [B, H, W, C]
    ref_fea: jax.Array,
    src_proj: jax.Array,  # [B, 4, 4]
    ref_proj: jax.Array,
    depth_values: jax.Array,  # [B, D, H, W]
    g: jax.Array,  # [B, D, H, W]
    interpret: bool = False,
):
    """Gradients (dsrc, dref) of the per-view warp-correlation (S=1 case)."""
    B, H, W, _ = src_fea.shape
    vw = jnp.ones((B, 1, H, W), jnp.float32)
    dsrc, dref, _ = warp_correlate_wsum_bwd(
        src_fea[:, None],
        ref_fea,
        src_proj[:, None],
        ref_proj,
        depth_values,
        vw,
        g,
        interpret=interpret,
    )
    return dsrc[:, 0], dref
