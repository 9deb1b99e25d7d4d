"""A/B: warp rowsweep (gather) vs one-hot MXU variant at stage shapes."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms
from transmvsnet_tpu.ops.pallas.warp_rowsweep import warp_correlate_rowsweep
from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_onehot


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    proj = np.eye(4, dtype=np.float32)[None]
    proj2 = proj.copy()
    proj2[0, 0, 3] = 10.0
    for name, H, W, C, D in [
        ("stage1 216x288 C32 D48", 216, 288, 32, 48),
        ("stage2 432x576 C16 D32", 432, 576, 16, 32),
        ("stage3 864x1152 C8 D8", 864, 1152, 8, 8),
    ]:
        src = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32))
        ref = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32))
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
                (1, D, H, W),
            ).copy()
        )
        sp, rp = jnp.asarray(proj2), jnp.asarray(proj)
        ms1, _ = timed_ms(
            jax.jit(warp_correlate_rowsweep), src, ref, sp, rp, dv, iters=6, warmup=2
        )
        ms2, _ = timed_ms(
            jax.jit(warp_correlate_onehot), src, ref, sp, rp, dv, iters=6, warmup=2
        )
        print(f"{name:<28} rowsweep {ms1:8.2f} ms   onehot {ms2:8.2f} ms   ({ms1/ms2:.2f}x)")


if __name__ == "__main__":
    main()
