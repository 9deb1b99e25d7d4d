"""Probe: cost of STATIC unaligned lane slices of a VMEM ref vs one-hot matmul.

Decision input for a shift-select DCN sampler: bilinear-x sampling needs
X[:, base+s : base+s+128] for a handful of static shifts s. Dynamic lane
slicing doesn't exist on TPU; this measures whether *static* unaligned
lane slices lower efficiently (lane rotate) or crawl, against the
one-hot-matmul realization of the same contraction.

Shapes mimic the DCN inner op: window [C=32, 384] bf16, output [32, 128].
"""

import os, sys, functools

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmvsnet_tpu.utils_bench import timed_ms

C, XW = 32, 384
REPS = 64  # inner repetitions per grid step
GRID = 256
SHIFTS = (97, 98, 99, 100, 101)  # unaligned static offsets
ALIGNED = (0, 128, 256)


def run(name, kernel, args, in_specs):
    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((GRID, C, 128), jnp.float32),
    )
    # wrap: pallas out block has leading 1? Use index_map over grid writes.
    ms, _ = timed_ms(jax.jit(f), *args, iters=10, warmup=2)
    n_ops = GRID * REPS * len(SHIFTS)
    print(f"{name:<28} {ms:8.3f} ms  ({ms * 1e6 / n_ops:7.1f} ns/op)", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(GRID, C, XW).astype(np.float32)).astype(jnp.bfloat16)

    xspec = pl.BlockSpec((1, C, XW), lambda g: (g, 0, 0))

    # slice kernels: x block [1, C, XW] -> treat [C, XW]
    def slice_k(offs):
        def k(x_ref, o_ref):
            acc = jnp.zeros((C, 128), jnp.float32)
            for r in range(REPS):
                coef = 0.5 + 0.001 * r
                for i, s in enumerate(offs):
                    sl = x_ref[0, :, s : s + 128].astype(jnp.float32)
                    acc = acc + sl * (coef + i)
            o_ref[0] = acc
        return k

    run("static unaligned slices", slice_k(SHIFTS), (x,), [xspec])
    run("static aligned slices", slice_k(ALIGNED + (0, 128)), (x,), [xspec])

    # one-hot matmul control: E [n_shift, XW, 128] bf16 hat-like
    E = np.zeros((len(SHIFTS), XW, 128), np.float32)
    for i, s in enumerate(SHIFTS):
        for l in range(128):
            E[i, min(s + l, XW - 1), l] = 1.0
    e = jnp.asarray(E).astype(jnp.bfloat16)

    def onehot_k(x_ref, e_ref, o_ref):
        acc = jnp.zeros((C, 128), jnp.float32)
        for r in range(REPS):
            for i in range(len(SHIFTS)):
                m = jnp.dot(
                    x_ref[0], e_ref[0, i], preferred_element_type=jnp.float32
                )
                acc = acc + m * (0.5 + 0.001 * r + i)
        o_ref[0] = acc

    espec = pl.BlockSpec(
        (1, len(SHIFTS), XW, 128), lambda g: (0, 0, 0, 0)
    )
    run("one-hot matmuls", onehot_k, (x, e[None]), [xspec, espec])


if __name__ == "__main__":
    main()
