"""A/B: tap-grouped DCN kernel with vs without software-pipelined hat builds.

The round-4b ablation (probes/bench_dcn_ablate.py) showed the VPU hat
build is 17.6 of the 40 ms full-res layer and the matmul+DMA floor ~22 —
nearly additive, i.e. the engines serialize on the build->matmul
dependency chain. pipeline_hats builds iteration idx+1's hat matrices
before issuing iteration idx's matmul so the scheduler has adjacent
independent VPU/MXU work (PERFORMANCE.md "DCN forward").

Also checks bit-equality (same math, different op order only).
"""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import functools

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot
from transmvsnet_tpu.utils_bench import timed_ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    K = 9
    for H, W in [(216, 288), (432, 576), (864, 1152)]:
        x = jnp.asarray(rng.rand(5, H, W, 32).astype(np.float32)).astype(
            jnp.bfloat16
        )
        dy = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
        dx = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
        m = jnp.asarray(rng.rand(5, H, W, K).astype(np.float32))
        w = jnp.asarray(rng.randn(K, 32, 32).astype(np.float32) * 0.1)

        base = functools.partial(deform_conv2d_onehot, pipeline_hats=False)
        pipe = functools.partial(deform_conv2d_onehot, pipeline_hats=True)
        o1 = np.asarray(base(x, dy, dx, m, w))
        o2 = np.asarray(pipe(x, dy, dx, m, w))
        agree = float((o1 == o2).mean())
        ms1, _ = timed_ms(jax.jit(base), x, dy, dx, m, w, iters=8, warmup=2)
        ms2, _ = timed_ms(jax.jit(pipe), x, dy, dx, m, w, iters=8, warmup=2)
        print(
            f"{H}x{W} C32 BV=5: base {ms1:6.2f} ms  pipelined {ms2:6.2f} ms"
            f"  ({ms1 / ms2:.2f}x)  bit-agree {agree:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
