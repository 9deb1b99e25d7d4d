"""Isolate the marginal cost of a [C,128] lane-gather on this chip.

Same kernel body, three variants: (a) real take_along_axis gathers,
(b) gathers replaced by an elementwise op of equal arity, (c) empty loop.
Also: dynamic-sublane-slice cost and a one-hot MXU contraction alternative.
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
ROWS_GRID = 4096
INNER = 16


def run(name, kern, *arrays):
    f = pl.pallas_call(
        kern,
        grid=(ROWS_GRID,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim) for a in arrays],
        out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
    )
    ms, _ = timed_ms(jax.jit(f), *arrays, iters=8, warmup=2)
    per = ms * 1e6 / (ROWS_GRID * INNER)
    print(f"{name:<40} {ms:8.3f} ms  ({per:6.1f} ns/iter)")
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    op = jnp.asarray(rng.rand(C, 128).astype(np.float32))
    idxs = jnp.asarray(rng.randint(0, 128, size=(INNER * 8, 128)).astype(np.int32))

    def kern_gather(op_ref, idx_ref, out_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        for r in range(INNER):
            idx = jnp.broadcast_to(idx_ref[r : r + 1, :], (C, 128))
            g = jnp.take_along_axis(op_ref[...], idx, axis=1)
            acc = acc + g
        out_ref[...] = acc

    def kern_nogather(op_ref, idx_ref, out_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        for r in range(INNER):
            idx = jnp.broadcast_to(idx_ref[r : r + 1, :], (C, 128))
            g = op_ref[...] + idx.astype(jnp.float32)
            acc = acc + g
        out_ref[...] = acc

    def kern_empty(op_ref, idx_ref, out_ref):
        out_ref[...] = op_ref[...]

    run("16x gather [32,128] (bcast idx)", kern_gather, op, idxs)
    run("16x add-instead-of-gather", kern_nogather, op, idxs)
    run("no-op", kern_empty, op, idxs)

    # one-hot MXU alternative: samp = slab[ C, 256 ] @ A[256, 128]
    slab = jnp.asarray(rng.rand(C, 256).astype(np.float32))
    idx256 = jnp.asarray(rng.randint(0, 255, size=(INNER * 8, 128)).astype(np.int32))
    fxs = jnp.asarray(rng.rand(INNER * 8, 128).astype(np.float32))

    def kern_onehot(slab_ref, idx_ref, fx_ref, out_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        for r in range(INNER):
            x0 = idx_ref[r : r + 1, :]  # [1,128]
            fx = fx_ref[r : r + 1, :]
            a = jnp.where(j_iota == x0, 1.0 - fx, 0.0) + jnp.where(
                j_iota == x0 + 1, fx, 0.0
            )
            acc = acc + jnp.dot(
                slab_ref[...], a, preferred_element_type=jnp.float32
            )
        out_ref[...] = acc

    run("16x one-hot MXU bilinear-x [C,256]@[256,128]", kern_onehot, slab, idx256, fxs)

    # two-gather bilinear-x for comparison (the real pattern)
    def kern_bilin2(slab_ref, idx_ref, fx_ref, out_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        for r in range(INNER):
            x0 = idx_ref[r : r + 1, :]
            fx = fx_ref[r : r + 1, :]
            g = jnp.zeros((C, 128), jnp.float32)
            for h in range(2):
                use_h = (x0 >= h * 128) & (x0 < (h + 1) * 128)
                ii = jnp.clip(x0 - h * 128, 0, 127)
                for xt, wx in ((ii, 1.0 - fx), (jnp.clip(ii + 1, 0, 127), fx)):
                    gh = jnp.take_along_axis(
                        slab_ref[:, h * 128 : (h + 1) * 128],
                        jnp.broadcast_to(xt, (C, 128)),
                        axis=1,
                    )
                    g = g + jnp.where(
                        jnp.broadcast_to(use_h, (C, 128)), gh * wx, 0.0
                    )
            acc = acc + g
        out_ref[...] = acc

    run("16x 2-half 2-tap gather bilinear-x", kern_bilin2, slab, idx256, fxs)

    # dynamic sublane slice cost: slab = win_ref[pl.ds(r0,1)][0]
    win = jnp.asarray(rng.rand(16, C, 128).astype(np.float32))
    r0s = jnp.asarray(rng.randint(0, 15, size=(1, INNER * 8)).astype(np.int32))

    def kern_dynslice(win_ref, r0_ref, out_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        for r in range(INNER):
            r0 = r0_ref[0, r]
            slab = win_ref[pl.ds(r0, 1), :, :][0]
            acc = acc + slab
        out_ref[...] = acc

    f = pl.pallas_call(
        kern_dynslice,
        grid=(ROWS_GRID,),
        in_specs=[
            pl.BlockSpec((16, C, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, INNER * 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
    )
    ms, _ = timed_ms(jax.jit(f), win, r0s, iters=8, warmup=2)
    print(f"{'16x dyn-sublane-slice [1,C,128]':<40} {ms:8.3f} ms  ({ms*1e6/(ROWS_GRID*INNER):6.1f} ns/iter)")


if __name__ == "__main__":
    main()
