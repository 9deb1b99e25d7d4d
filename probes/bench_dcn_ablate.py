"""Ablation timing of the tap-grouped DCN sampler: where do the 40 ms go?

Main matmuls account for ~19 ms at peak MXU on the 864x1152 C32 BV5 layer;
this probe times kernel variants with individual cost buckets removed
(outputs are WRONG for ablated variants — timing only):

  base    — the shipping _kernel_tapgroup
  noew    — hat matrices (ew3) hoisted to one constant per kernel
            (removes the per-(row,chunk,krow) [XW,384] VPU hat build)
  nowy    — y-interpolation weights replaced by plain sum over DRG rows
  noxmin  — per-chunk xmin reduction replaced by a static xmin
  drg4    — DRG=4 instead of 5 (20% less matmul stack)
  mmonly  — noew+nowy+noxmin: DMAs + matmuls only
"""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmvsnet_tpu.utils_bench import timed_ms

ROWS = 8
WIN = 16
K = 9
XW = 256


def _kernel_ablate(
    dy_ref, dx_ref, mask_ref, w_ref, x_hbm, out_ref, bigwin, xwin, xwin2,
    sem0, sem1, sem2,
    *, H, W, W_img, C, C_out, XW_, drg, no_ew, no_wy, no_xmin, ew_mode,
    hbm_win, double_buf,
):
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

    if not hbm_win:
        copy = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(win_start, WIN), :, :], bigwin, sem0
        )
        copy.start()
        copy.wait()

    j_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (XW_, 128), 0).astype(jnp.float32)
    )
    ew_const = jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - 7.25)).astype(
        jnp.bfloat16
    )
    ew3_const = jnp.concatenate([ew_const] * 3, axis=1)

    if hbm_win:
        # Free-form per-chunk HBM window: no 128-alignment constraint on
        # xmin, so XW_ can be ~160 instead of 256.
        def chunk_xmin(cx):
            sl = slice(cx * 128, cx * 128 + 128)
            xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
            for k in range(K):
                x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
                okx = (x0k >= -1) & (x0k <= W_img - 1)
                xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
            return jnp.clip(jnp.min(xmin_v), 0, max(W - XW_, 0))

        def issue(cx, xmin, buf, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[
                    b_idx, pl.ds(win_start, WIN), :, pl.ds(xmin, XW_)
                ],
                buf,
                sem,
            )
            cp.start()
            return cp

        bufs = (xwin, xwin2)
        sems = (sem1, sem2)
        xmins = [chunk_xmin(cx) for cx in range(n_chunks)]
        if double_buf:
            issue(0, xmins[0], bufs[0], sems[0])

        for cx in range(n_chunks):
            sl = slice(cx * 128, cx * 128 + 128)
            xmin = xmins[cx]
            if double_buf:
                pltpu.make_async_copy(
                    x_hbm.at[
                        b_idx, pl.ds(win_start, WIN), :, pl.ds(xmin, XW_)
                    ],
                    bufs[cx % 2],
                    sems[cx % 2],
                ).wait()
                if cx + 1 < n_chunks:
                    issue(
                        cx + 1, xmins[cx + 1], bufs[(cx + 1) % 2],
                        sems[(cx + 1) % 2],
                    )
                win_ref = bufs[cx % 2]
            else:
                issue(cx, xmin, xwin, sem1).wait()
                win_ref = xwin

            xminf = xmin.astype(jnp.float32)
            for i in range(ROWS):
                msamps = []
                for kr in range(3):
                    taps = (3 * kr, 3 * kr + 1, 3 * kr + 2)
                    r_min = jnp.full((1, 128), WIN - 1, jnp.int32)
                    for t in taps:
                        y0t = jnp.floor(pys[t][i : i + 1, sl]).astype(
                            jnp.int32
                        )
                        ok_t = (y0t >= -1) & (y0t <= H - 1)
                        r_min = jnp.minimum(
                            r_min, jnp.where(ok_t, y0t - win_start, WIN - 1)
                        )
                    r0 = jnp.clip(jnp.min(r_min), 0, WIN - drg)

                    ew3 = jnp.concatenate(
                        [
                            jnp.maximum(
                                0.0,
                                1.0
                                - jnp.abs(
                                    j_iota
                                    - (pxs[t][i : i + 1, sl] - xminf)
                                ),
                            ).astype(jnp.bfloat16)
                            for t in taps
                        ],
                        axis=1,
                    )

                    stack = win_ref[pl.ds(r0, drg), :, :].reshape(
                        drg * C, XW_
                    )
                    mm = jnp.dot(
                        stack, ew3, preferred_element_type=jnp.float32
                    )

                    for tj, t in enumerate(taps):
                        py_t = pys[t][i : i + 1, sl]
                        samp = jnp.zeros((C, 128), jnp.float32)
                        for g in range(drg):
                            row_y = (win_start + r0 + g).astype(jnp.float32)
                            w_y = jnp.maximum(
                                0.0, 1.0 - jnp.abs(py_t - row_y)
                            )
                            row_in = (row_y >= 0.0) & (
                                row_y <= float(H - 1)
                            )
                            w_y = w_y * row_in.astype(jnp.float32)
                            samp = samp + (
                                mm[
                                    g * C : (g + 1) * C,
                                    tj * 128 : (tj + 1) * 128,
                                ]
                                * w_y
                            )
                        m_t = mask_ref[0, t, i : i + 1, sl]
                        msamps.append((samp * m_t).astype(jnp.bfloat16))

                mstack = jnp.concatenate(msamps, axis=0)
                out_ref[0, i, :, sl] = jnp.dot(
                    w_ref[...], mstack, preferred_element_type=jnp.float32
                )
        return

    for cx in range(n_chunks):
        sl = slice(cx * 128, cx * 128 + 128)

        if no_xmin:
            xmin = jnp.clip(cx * 128 - 64, 0, max(W - XW_, 0)) // 128 * 128
            xmin = pl.multiple_of(jnp.int32(xmin), 128)
        else:
            xmin_v = jnp.full((ROWS, 128), W_img - 1, jnp.int32)
            for k in range(K):
                x0k = jnp.floor(pxs[k][:, sl]).astype(jnp.int32)
                okx = (x0k >= -1) & (x0k <= W_img - 1)
                xmin_v = jnp.minimum(xmin_v, jnp.where(okx, x0k, W_img - 1))
            xmin = jnp.clip(
                (jnp.min(xmin_v) // 128) * 128, 0, max(W - XW_, 0)
            )
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
            msamps = []
            for kr in range(3):
                taps = (3 * kr, 3 * kr + 1, 3 * kr + 2)
                r_min = jnp.full((1, 128), WIN - 1, jnp.int32)
                for t in taps:
                    y0t = jnp.floor(pys[t][i : i + 1, sl]).astype(jnp.int32)
                    ok_t = (y0t >= -1) & (y0t <= H - 1)
                    r_min = jnp.minimum(
                        r_min, jnp.where(ok_t, y0t - win_start, WIN - 1)
                    )
                r0 = jnp.clip(jnp.min(r_min), 0, WIN - drg)

                if no_ew:
                    ew3 = ew3_const
                elif ew_mode == "f32":
                    ew3 = jnp.concatenate(
                        [
                            jnp.maximum(
                                0.0,
                                1.0
                                - jnp.abs(
                                    j_iota - (pxs[t][i : i + 1, sl] - xminf)
                                ),
                            ).astype(jnp.bfloat16)
                            for t in taps
                        ],
                        axis=1,
                    )
                elif ew_mode == "bf16":
                    # One f32 range-reduced subtract per tap, then bf16.
                    ew3 = jnp.concatenate(
                        [
                            jnp.maximum(
                                jnp.bfloat16(0.0),
                                jnp.bfloat16(1.0)
                                - jnp.abs(
                                    (
                                        j_iota
                                        - (pxs[t][i : i + 1, sl] - xminf)
                                    ).astype(jnp.bfloat16)
                                ),
                            )
                            for t in taps
                        ],
                        axis=1,
                    )
                else:  # "bf16merged": one [XW, 384] build for the 3 taps
                    pxw3 = jnp.concatenate(
                        [pxs[t][i : i + 1, sl] - xminf for t in taps], axis=1
                    )  # [1, 384] f32
                    j3 = jax.lax.broadcasted_iota(
                        jnp.int32, (XW_, 3 * 128), 0
                    ).astype(jnp.float32)
                    d3 = (j3 - pxw3).astype(jnp.bfloat16)
                    ew3 = jnp.maximum(
                        jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(d3)
                    )

                stack = win_ref[pl.ds(r0, drg), :, :].reshape(drg * C, XW_)
                mm = jnp.dot(stack, ew3, preferred_element_type=jnp.float32)

                for tj, t in enumerate(taps):
                    py_t = pys[t][i : i + 1, sl]
                    samp = jnp.zeros((C, 128), jnp.float32)
                    for g in range(drg):
                        if no_wy:
                            samp = samp + mm[
                                g * C : (g + 1) * C, tj * 128 : (tj + 1) * 128
                            ]
                        else:
                            row_y = (win_start + r0 + g).astype(jnp.float32)
                            w_y = jnp.maximum(
                                0.0, 1.0 - jnp.abs(py_t - row_y)
                            )
                            row_in = (row_y >= 0.0) & (row_y <= float(H - 1))
                            w_y = w_y * row_in.astype(jnp.float32)
                            samp = samp + (
                                mm[
                                    g * C : (g + 1) * C,
                                    tj * 128 : (tj + 1) * 128,
                                ]
                                * w_y
                            )
                    m_t = mask_ref[0, t, i : i + 1, sl]
                    msamps.append((samp * m_t).astype(jnp.bfloat16))

            mstack = jnp.concatenate(msamps, axis=0)
            out_ref[0, i, :, sl] = jnp.dot(
                w_ref[...], mstack, preferred_element_type=jnp.float32
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "drg", "no_ew", "no_wy", "no_xmin", "ew_mode", "hbm_win",
        "double_buf", "xw",
    ),
)
def dcn_ablate(x, dy, dx, mask, weight, drg=5, no_ew=False, no_wy=False,
               no_xmin=False, ew_mode="f32", hbm_win=False, double_buf=False,
               xw=XW):
    B, H, W_img, C = x.shape
    C_out = weight.shape[-1]
    W = -(-W_img // 128) * 128
    XW_ = min(xw, W)
    if W != W_img:
        pad = ((0, 0), (0, 0), (0, W - W_img), (0, 0))
        x, dy, dx, mask = (jnp.pad(a, pad) for a in (x, dy, dx, mask))

    x_t = x.transpose(0, 1, 3, 2)
    dy_t = dy.transpose(0, 3, 1, 2)
    dx_t = dx.transpose(0, 3, 1, 2)
    m_t = mask.transpose(0, 3, 1, 2)
    w_flat = weight.transpose(2, 0, 1).reshape(C_out, K * C)

    kernel = functools.partial(
        _kernel_ablate, H=H, W=W, W_img=W_img, C=C, C_out=C_out, XW_=XW_,
        drg=drg, no_ew=no_ew, no_wy=no_wy, no_xmin=no_xmin, ew_mode=ew_mode,
        hbm_win=hbm_win, double_buf=double_buf,
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
    )(
        dy_t.astype(jnp.float32),
        dx_t.astype(jnp.float32),
        m_t.astype(jnp.float32),
        w_flat.astype(jnp.bfloat16),
        x_t,
    )
    return out.transpose(0, 1, 3, 2)[:, :, :W_img, :]


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    H, W, C, Cout = 864, 1152, 32, 32
    x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    dy = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
    dx = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
    m = jnp.asarray(rng.rand(5, H, W, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.1)

    variants = [
        ("base", dict()),
        ("xw160", dict(hbm_win=True, xw=160)),
        ("xw160db", dict(hbm_win=True, double_buf=True, xw=160)),
        ("xw144db", dict(hbm_win=True, double_buf=True, xw=144)),
        ("xw160db_drg4", dict(hbm_win=True, double_buf=True, xw=160, drg=4)),
    ]
    ref = np.asarray(dcn_ablate(x, dy, dx, m, w), np.float32)
    scale = np.abs(ref).max()
    for name, kw in variants:
        f = functools.partial(dcn_ablate, **kw)
        out = np.asarray(f(x, dy, dx, m, w), np.float32)
        agree = np.isclose(out / scale, ref / scale, rtol=0, atol=3e-2).mean()
        ms, _ = timed_ms(f, x, dy, dx, m, w, iters=6, warmup=2)
        print(f"{name:<14} {ms:8.2f} ms  agree={agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
