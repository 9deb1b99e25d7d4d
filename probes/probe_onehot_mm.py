"""Probe: hat-weight one-hot MXU bilinear inside a row-sweep-like kernel.

Per inner iteration: build Ew [256,128] from float x positions (hat fn),
matmul a dyn-sliced window row [C,256] @ Ew, weight by wy, accumulate.
Compare against the gather-based pattern at equal logical work
(1 row-tap with DR candidate rows).
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

C = 32
WIN = 16
XW = 256
DR = 6
GRID = 2048
INNER = 8  # "rows" per grid cell


def mk_onehot():
    def kern(win_ref, px_ref, py_ref, r0_ref, out_ref):
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (XW, 128), 0).astype(
            jnp.float32
        )
        acc = jnp.zeros((C, 128), jnp.float32)
        for i in range(INNER):
            px = px_ref[i : i + 1, :]  # [1,128] float window-relative x
            py = py_ref[i : i + 1, :]
            ew = jnp.maximum(0.0, 1.0 - jnp.abs(j_iota - px))  # [XW,128]
            r0 = r0_ref[0, i]
            samp = jnp.zeros((C, 128), jnp.float32)
            for dr in range(DR):
                wr = r0 + dr
                slab = win_ref[pl.ds(wr, 1), :, :][0]  # [C, XW]
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - wr.astype(jnp.float32)))
                m = jnp.dot(slab, ew, preferred_element_type=jnp.float32)
                samp = samp + m * wy
            acc = acc + samp
        out_ref[...] = acc

    return pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((WIN, C, XW), lambda i: (0, 0, 0)),
            pl.BlockSpec((INNER, 128), lambda i: (0, 0)),
            pl.BlockSpec((INNER, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, INNER), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
    )


def mk_gather():
    def kern(win_ref, px_ref, py_ref, r0_ref, out_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        for i in range(INNER):
            px = px_ref[i : i + 1, :]
            py = py_ref[i : i + 1, :]
            x0 = jnp.floor(px).astype(jnp.int32)
            fx = px - x0.astype(jnp.float32)
            r0 = r0_ref[0, i]
            samp = jnp.zeros((C, 128), jnp.float32)
            for dr in range(DR):
                wr = r0 + dr
                slab = win_ref[pl.ds(wr, 1), :, :][0]
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - wr.astype(jnp.float32)))
                for xt, wx in ((x0, 1.0 - fx), (x0 + 1, fx)):
                    g = jnp.zeros((C, 128), jnp.float32)
                    for h in range(XW // 128):
                        use_h = (xt >= h * 128) & (xt < (h + 1) * 128)
                        ii = jnp.clip(xt - h * 128, 0, 127)
                        gh = jnp.take_along_axis(
                            slab[:, h * 128 : (h + 1) * 128],
                            jnp.broadcast_to(ii, (C, 128)),
                            axis=1,
                        )
                        g = jnp.where(jnp.broadcast_to(use_h, (C, 128)), gh, g)
                    samp = samp + g * jnp.broadcast_to(wy * wx, (C, 128))
            acc = acc + samp
        out_ref[...] = acc

    return pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((WIN, C, XW), lambda i: (0, 0, 0)),
            pl.BlockSpec((INNER, 128), lambda i: (0, 0)),
            pl.BlockSpec((INNER, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, INNER), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
    )


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    win = jnp.asarray(rng.rand(WIN, C, XW).astype(np.float32))
    px = jnp.asarray((rng.rand(INNER, 128) * 250).astype(np.float32))
    py = jnp.asarray((rng.rand(INNER, 128) * (WIN - 2) + 0.5).astype(np.float32))
    r0 = jnp.asarray(np.zeros((1, INNER), np.int32))

    a = np.asarray(jax.jit(mk_onehot())(win, px, py, r0))
    b = np.asarray(jax.jit(mk_gather())(win, px, py, r0))
    print("onehot vs gather max abs diff:", np.abs(a - b).max())

    ms1, _ = timed_ms(jax.jit(mk_onehot()), win, px, py, r0, iters=8, warmup=2)
    ms2, _ = timed_ms(jax.jit(mk_gather()), win, px, py, r0, iters=8, warmup=2)
    n = GRID * INNER
    print(f"onehot-hat MXU : {ms1:8.3f} ms ({ms1*1e6/n:7.1f} ns/row-sample, DR={DR})")
    print(f"gather pattern : {ms2:8.3f} ms ({ms2*1e6/n:7.1f} ns/row-sample, DR={DR})")


if __name__ == "__main__":
    main()
