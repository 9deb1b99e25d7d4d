"""A/B: per-tap vs tap-grouped one-hot DCN kernel at head shapes."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    for name, H, W, C, Cout in [
        ("216x288 32->32 (BV5)", 216, 288, 32, 32),
        ("432x576 32->32 (BV5)", 432, 576, 32, 32),
        ("864x1152 32->32 (BV5)", 864, 1152, 32, 32),
        ("864x1152 32->8 (BV5)", 864, 1152, 32, 8),
    ]:
        x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32))
        dy = jnp.asarray((rng.rand(5, H, W, 9) * 2 - 1).astype(np.float32))
        dx = jnp.asarray((rng.rand(5, H, W, 9) * 2 - 1).astype(np.float32))
        m = jnp.asarray(rng.rand(5, H, W, 9).astype(np.float32))
        w = jnp.asarray(rng.randn(9, C, Cout).astype(np.float32) * 0.1)
        f1 = jax.jit(lambda a, b, c, d, e: deform_conv2d_onehot(a, b, c, d, e, tap_grouped=False))
        f2 = jax.jit(lambda a, b, c, d, e: deform_conv2d_onehot(a, b, c, d, e, tap_grouped=True))
        o1 = np.asarray(f1(x, dy, dx, m, w))
        o2 = np.asarray(f2(x, dy, dx, m, w))
        agree = np.isclose(o1, o2, rtol=3e-2, atol=3e-2 * np.abs(o1).max()).mean()
        ms1, _ = timed_ms(f1, x, dy, dx, m, w, iters=6, warmup=2)
        ms2, _ = timed_ms(f2, x, dy, dx, m, w, iters=6, warmup=2)
        print(f"{name:<24} pertap {ms1:8.2f} ms   tapgroup {ms2:8.2f} ms   ({ms1/ms2:.2f}x)  agree={agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
