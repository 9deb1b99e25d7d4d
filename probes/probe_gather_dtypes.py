"""Probe: which dtypes does Mosaic's lane dynamic_gather support on this chip?

Tests take_along_axis on [C, 128] operands in f32 / bf16 / i32, and the
packed-pair trick (two bf16 x-neighbors in one i32 word, one gather for both
bilinear x taps). Prints pass/fail + timings.
"""

import os

os.makedirs(".jax_cache", exist_ok=True)

import functools

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(op_ref, idx_ref, out_ref, *, C, reps):
    idx = idx_ref[...]  # [C, 128] i32
    acc = jnp.zeros_like(out_ref)
    g = op_ref[...]
    for r in range(reps):
        g = jnp.take_along_axis(op_ref[...], (idx + r) % 128, axis=1)
        acc = acc + g.astype(acc.dtype)
    out_ref[...] = acc


def try_dtype(dtype, C=32, reps=64):
    rng = np.random.RandomState(0)
    op = jnp.asarray(rng.rand(C, 128).astype(np.float32) * 10).astype(dtype)
    idx = jnp.asarray(rng.randint(0, 128, size=(C, 128)).astype(np.int32))
    out_dtype = jnp.float32 if dtype != jnp.int32 else jnp.int32
    f = pl.pallas_call(
        functools.partial(gather_kernel, C=C, reps=reps),
        out_shape=jax.ShapeDtypeStruct((C, 128), out_dtype),
    )
    try:
        res = jax.jit(f)(op, idx)
        res.block_until_ready()
        # correctness on last rep
        exp = np.take_along_axis(
            np.asarray(op, np.float64), (np.asarray(idx) + reps - 1) % 128, 1
        )
        got = np.asarray(res, np.float64)
        # acc sums all reps; recompute expected sum
        expsum = sum(
            np.take_along_axis(np.asarray(op, np.float64), (np.asarray(idx) + r) % 128, 1)
            for r in range(reps)
        )
        ok = np.allclose(got, expsum, rtol=2e-2, atol=1e-2)
        print(f"gather {np.dtype(dtype).name:8s} C={C}: lowers, correct={ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"gather {np.dtype(dtype).name:8s} C={C}: FAIL: {msg}")
        return False


def time_gathers():
    """Time a gather-heavy kernel per dtype: reps gathers of [C,128]."""
    from transmvsnet_tpu.utils_bench import timed_ms

    C, reps, rows = 32, 16, 512
    rng = np.random.RandomState(0)

    def mk(dtype):
        def kern(op_ref, idx_ref, out_ref):
            acc = jnp.zeros((C, 128), jnp.float32)
            for r in range(reps):
                idx = (idx_ref[...] + r * 7) % 128
                g = jnp.take_along_axis(op_ref[...], idx, axis=1)
                acc = acc + g.astype(jnp.float32)
            out_ref[...] = acc

        return pl.pallas_call(
            kern,
            grid=(rows,),
            in_specs=[
                pl.BlockSpec((C, 128), lambda i: (0, 0)),
                pl.BlockSpec((C, 128), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        )

    idx = jnp.asarray(rng.randint(0, 128, size=(C, 128)).astype(np.int32))
    for dtype in (jnp.float32, jnp.bfloat16):
        op = jnp.asarray(rng.rand(C, 128).astype(np.float32)).astype(dtype)
        try:
            ms, _ = timed_ms(jax.jit(mk(dtype)), op, idx, iters=8, warmup=2)
            per = ms * 1e6 / (rows * reps)  # ns per [C,128] gather
            print(f"timing {np.dtype(dtype).name:8s}: {ms:8.3f} ms -> {per:7.1f} ns per [{C},128] gather")
        except Exception as e:
            print(f"timing {np.dtype(dtype).name:8s}: FAIL {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    try_dtype(jnp.float32)
    try_dtype(jnp.bfloat16)
    try_dtype(jnp.int32)
    try_dtype(jnp.bfloat16, C=8)
    time_gathers()
