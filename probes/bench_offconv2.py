"""Offset-prelude variants: padded-32 transpose, NCHW conv output."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<52} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(5, 864, 1152, 32).astype(np.float32)).astype(jnp.bfloat16)
    w32 = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    def conv32_t(a, w):
        off = jax.lax.conv_general_dilated(
            a, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        off_t = off.transpose(0, 3, 1, 2)  # [B, 32, H, W]
        dy = off_t[:, 0:18:2].astype(jnp.float32)
        dx = off_t[:, 1:18:2].astype(jnp.float32)
        m = jax.nn.sigmoid(off_t[:, 18:27].astype(jnp.float32))
        return dy, dx, m

    t("conv(32out) + transpose32 + rows", jax.jit(conv32_t), x, w32)

    def conv_nchw(a, w):
        off = jax.lax.conv_general_dilated(
            a, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
        )  # [B, 32, H, W] directly
        dy = off[:, 0:18:2].astype(jnp.float32)
        dx = off[:, 1:18:2].astype(jnp.float32)
        m = jax.nn.sigmoid(off[:, 18:27].astype(jnp.float32))
        return dy, dx, m

    t("conv NCHW-out(32) + rows", jax.jit(conv_nchw), x, w32)

    # And with f32 conv output (kernel wants f32 offsets anyway).
    def conv_nchw_f32(a, w):
        off = jax.lax.conv_general_dilated(
            a, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        return off[:, 0:18:2], off[:, 1:18:2], jax.nn.sigmoid(off[:, 18:27])

    t("conv NCHW-out(32,f32) + rows", jax.jit(conv_nchw_f32), x, w32)


if __name__ == "__main__":
    main()
