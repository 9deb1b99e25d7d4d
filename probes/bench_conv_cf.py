"""A/B: XLA NHWC conv vs channels-first tap-matmul conv, fwd and fwd+bwd.

Premise (from the FeatureNet backward HLO): XLA's conv backward at the
small channel counts (C=8..32) picks transposed layouts with large copy
ops — FeatureNet's non-DCN backward measures ~97 ms of the 517 ms train
step. A 3x3 conv is Sum_t W_t @ shift_t(x) — nine [O, C] @ [C, N*H*W]
matmuls in a channels-first layout whose VJP is more matmuls of the same
shape (the _CFConv1x1 trick extended to spatial taps).
"""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_cf(x, w):
    # x [N, H, W, C] -> [C, N, H, W]; pad; 9 shifted [O,C]@[C,N*H*W].
    N, H, W, C = x.shape
    O = w.shape[-1]
    xt = x.transpose(3, 0, 1, 2)
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(
                xp, (0, 0, dy, dx), (C, N, dy + H, dx + W)
            ).reshape(C, N * H * W)
            wt = w[dy, dx].transpose(1, 0)  # [O, C]
            part = jnp.dot(wt, sl, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype).reshape(O, N, H, W).transpose(1, 2, 3, 0)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    for N, H, W, C, O in [
        (5, 512, 640, 8, 8),
        (5, 256, 320, 16, 16),
        (5, 128, 160, 32, 32),
    ]:
        x = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = jnp.asarray(
            (rng.randn(3, 3, C, O) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        o1 = np.asarray(conv_xla(x, w), np.float32)
        o2 = np.asarray(conv_cf(x, w), np.float32)
        scale = np.abs(o1).max()
        agree = float(
            np.isclose(o1 / scale, o2 / scale, rtol=0, atol=2e-2).mean()
        )

        def loss1(x_, w_):
            return jnp.sum(conv_xla(x_, w_).astype(jnp.float32) ** 2)

        def loss2(x_, w_):
            return jnp.sum(conv_cf(x_, w_).astype(jnp.float32) ** 2)

        g1 = jax.jit(jax.value_and_grad(loss1, argnums=(0, 1)))
        g2 = jax.jit(jax.value_and_grad(loss2, argnums=(0, 1)))

        f1, _ = timed_ms(jax.jit(conv_xla), x, w, iters=8, warmup=2)
        f2, _ = timed_ms(jax.jit(conv_cf), x, w, iters=8, warmup=2)
        b1, _ = timed_ms(g1, x, w, iters=8, warmup=2)
        b2, _ = timed_ms(g2, x, w, iters=8, warmup=2)
        print(
            f"[{N},{H},{W},{C}]->{O}: xla fwd {f1:6.2f} fwd+bwd {b1:7.2f} | "
            f"cf fwd {f2:6.2f} fwd+bwd {b2:7.2f}  ({b1/b2:.2f}x) "
            f"agree {agree:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
