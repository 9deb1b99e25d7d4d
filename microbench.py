"""Micro-benchmarks of the hot ops on the current accelerator.

Times each op standalone (small graphs → fast compiles) to locate the
bottleneck without compiling the full model. Usage: python microbench.py
"""

import os
import time

import numpy as np

os.makedirs(".jax_cache", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp


def timeit(name, fn, *args, iters=10):
    from transmvsnet_tpu.utils_bench import timed_ms

    run_ms, compile_s = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<44} compile {compile_s:7.1f}s   run {run_ms:9.3f} ms", flush=True)
    return run_ms


def main():
    from transmvsnet_tpu.ops.warp import warp_correlate
    from transmvsnet_tpu.ops.dcn import deform_conv2d
    from transmvsnet_tpu.ops.sampling import bilinear_sample

    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print("device:", dev)

    # --- warp_correlate per stage (B=1, one source view) ---
    stages = [
        ("stage1 warpcorr 216x288 C32 D48", 216, 288, 32, 48),
        ("stage2 warpcorr 432x576 C16 D32", 432, 576, 16, 32),
        ("stage3 warpcorr 864x1152 C8 D8", 864, 1152, 8, 8),
    ]
    proj = np.eye(4, dtype=np.float32)[None]
    proj2 = proj.copy()
    proj2[0, 0, 3] = 10.0
    for name, H, W, C, D in stages:
        src = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32))
        ref = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32))
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
                (1, D, H, W),
            ).copy()
        )
        f = jax.jit(warp_correlate)
        timeit(name, f, src, ref, jnp.asarray(proj2), jnp.asarray(proj), dv)

    # --- single bilinear gather (stage1 scale) ---
    src = jnp.asarray(rng.rand(1, 216, 288, 32).astype(np.float32))
    x = jnp.asarray(rng.rand(1, 48, 216, 288).astype(np.float32) * 287)
    y = jnp.asarray(rng.rand(1, 48, 216, 288).astype(np.float32) * 215)
    timeit("bilinear_sample 216x288 C32 D48", jax.jit(bilinear_sample), src, x, y)

    # --- one DCN layer per head scale (B=V=5 merged) ---
    for name, H, W, C in [
        ("dcn 216x288 C32 (BV5)", 216, 288, 32),
        ("dcn 432x576 C32 (BV5)", 432, 576, 32),
        ("dcn 864x1152 C32 (BV5)", 864, 1152, 32),
    ]:
        xin = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32))
        dy = jnp.asarray(rng.randn(5, H, W, 9).astype(np.float32))
        dxo = jnp.asarray(rng.randn(5, H, W, 9).astype(np.float32))
        m = jnp.asarray(rng.rand(5, H, W, 9).astype(np.float32))
        wgt = jnp.asarray(rng.randn(9, C, C).astype(np.float32) * 0.1)
        f = jax.jit(lambda a, b, c, d, e: deform_conv2d(a, b, c, d, e))
        timeit(name, f, xin, dy, dxo, m, wgt)

    # --- plain conv2d for comparison (lead conv of out3) ---
    from jax import lax

    xin = jnp.asarray(rng.rand(5, 864, 1152, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1)

    @jax.jit
    def conv(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

    timeit("conv3x3 864x1152 C32->32 (BV5)", conv, xin, k)

    # --- CostRegNet stage1 ---
    from transmvsnet_tpu.models.cost_reg import CostRegNet

    creg = CostRegNet(8)
    vol = jnp.asarray(rng.rand(1, 48, 216, 288, 1).astype(np.float32))
    vars_ = creg.init(jax.random.PRNGKey(0), vol, False)
    f = jax.jit(lambda v, x: creg.apply(v, x, False))
    timeit("costreg stage1 48x216x288", f, vars_, vol)
    vol3 = jnp.asarray(rng.rand(1, 8, 864, 1152, 1).astype(np.float32))
    vars3 = creg.init(jax.random.PRNGKey(0), vol3, False)
    timeit("costreg stage3 8x864x1152", f, vars3, vol3)

    # --- FMT linear attention (one layer, 5 views batched) ---
    from transmvsnet_tpu.models.fmt import linear_attention

    L = 216 * 288
    q = jnp.asarray(rng.rand(5, L, 8, 4).astype(np.float32))
    timeit("linear attention L62k H8 D4 (x5)", jax.jit(linear_attention), q, q, q)


def timer_sanity():
    """Known-FLOPs matmul to validate the timing methodology."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    b = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    f = jax.jit(lambda a, b: a @ b)
    ms = timeit("matmul 4096^3 f32 (137 GFLOP)", f, a, b)
    print(f"  -> implies {2*4096**3/ (ms/1e3) / 1e12:.1f} TFLOP/s f32")
    a16 = a.astype(jnp.bfloat16); b16 = b.astype(jnp.bfloat16)
    f16 = jax.jit(lambda a, b: (a @ b))
    ms = timeit("matmul 4096^3 bf16", f16, a16, b16)
    print(f"  -> implies {2*4096**3/ (ms/1e3) / 1e12:.1f} TFLOP/s bf16")


if __name__ == "__main__":
    timer_sanity()
    main()
