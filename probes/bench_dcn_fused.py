"""A/B: offset-conv prelude + tap-grouped DCN vs fully fused DCN kernel."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms
from transmvsnet_tpu.ops.pallas.dcn_onehot import (
    deform_conv2d_onehot,
    deform_conv2d_onehot_fused,
)


def offsets_xla(x, k_off, b_off):
    off = jax.lax.conv_general_dilated(
        x, k_off.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_off.astype(x.dtype)
    o1, o2, m = jnp.split(off, 3, axis=-1)
    cat = jnp.concatenate([o1, o2], axis=-1)
    return (cat[..., 0::2].astype(jnp.float32),
            cat[..., 1::2].astype(jnp.float32),
            jax.nn.sigmoid(m).astype(jnp.float32))


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    for name, H, W, C, Cout in [
        ("216x288 32->32 (BV5)", 216, 288, 32, 32),
        ("432x576 32->32 (BV5)", 432, 576, 32, 32),
        ("864x1152 32->32 (BV5)", 864, 1152, 32, 32),
    ]:
        x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
        k_off = jnp.asarray(rng.randn(3, 3, C, 27).astype(np.float32) * 0.02)
        b_off = jnp.asarray(rng.randn(27).astype(np.float32) * 0.05)
        w = jnp.asarray(rng.randn(9, C, Cout).astype(np.float32) * 0.1)

        def composed(a, ko, bo, ww):
            dy, dx, m = offsets_xla(a, ko, bo)
            return deform_conv2d_onehot(a, dy, dx, m, ww)

        def fused(a, ko, bo, ww):
            return deform_conv2d_onehot_fused(a, ko, bo, ww)

        f1 = jax.jit(composed)
        f2 = jax.jit(fused)
        o1 = np.asarray(f1(x, k_off, b_off, w), np.float32)
        o2 = np.asarray(f2(x, k_off, b_off, w), np.float32)
        scale = np.abs(o1).max()
        agree = np.isclose(o1 / scale, o2 / scale, rtol=0, atol=3e-2).mean()
        ms1, _ = timed_ms(f1, x, k_off, b_off, w, iters=6, warmup=2)
        ms2, _ = timed_ms(f2, x, k_off, b_off, w, iters=6, warmup=2)
        print(f"{name:<24} composed {ms1:8.2f} ms   fused {ms2:8.2f} ms   ({ms1/ms2:.2f}x)  agree={agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
