"""Per-op timing of the native backward kernels at the train recipe shapes.

The 512x640 B=1 train step is 600 ms (probes/bench_train_single.py) but the
backward kernels landed unprofiled. This times each bwd op standalone
(timed_ms is fine for standalone ops) and the matching forward for ratio.

Shapes (B=1, V=5 -> BV=5 feature batch, S=4 source views):
  DCN layers:  128x160 / 256x320 / 512x640, C=32, 3 layers each
  warp stages: s1 128x160 D48 C32 | s2 256x320 D32 C16 | s3 512x640 D8 C8
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
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot
from transmvsnet_tpu.ops.pallas.dcn_bwd import deform_conv2d_bwd
from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_wsum_onehot
from transmvsnet_tpu.ops.pallas.warp_bwd import warp_correlate_wsum_bwd


def dcn_shapes():
    for H, W in [(128, 160), (256, 320), (512, 640)]:
        yield H, W, 32, 32


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    K = 9

    tot_f = tot_b = 0.0
    for H, W, C, Cout in dcn_shapes():
        x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32)).astype(
            jnp.bfloat16
        )
        dy = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
        dx = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
        m = jnp.asarray(rng.rand(5, H, W, K).astype(np.float32))
        w = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(5, H, W, Cout).astype(np.float32))

        fms, _ = timed_ms(
            jax.jit(deform_conv2d_onehot), x, dy, dx, m, w, iters=8, warmup=2
        )
        bms, _ = timed_ms(
            jax.jit(deform_conv2d_bwd), x, dy, dx, m, w, g, iters=8, warmup=2
        )
        tot_f += 3 * fms
        tot_b += 3 * bms
        print(
            f"dcn {H}x{W} C{C}      fwd {fms:7.2f} ms   bwd {bms:7.2f} ms"
            f"  (x3 layers)",
            flush=True,
        )

    for name, H, W, C, D in [
        ("s1", 128, 160, 32, 48),
        ("s2", 256, 320, 16, 32),
        ("s3", 512, 640, 8, 8),
    ]:
        S = 4
        src = jnp.asarray(
            rng.rand(1, S, H, W, C).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32)).astype(
            jnp.bfloat16
        )
        # Near-identity relative projections with small parallax.
        sp = np.tile(np.eye(4, dtype=np.float32), (1, S, 1, 1))
        sp[:, :, 0, 3] = np.linspace(-4.0, 4.0, S)
        rp = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
        K4 = np.eye(4, dtype=np.float32)
        K4[0, 0] = K4[1, 1] = 100.0
        K4[0, 2], K4[1, 2] = W / 2, H / 2
        sp = jnp.asarray(np.einsum("ij,bsjk->bsik", K4, sp))
        rp = jnp.asarray(np.einsum("ij,bjk->bik", K4, rp))
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(0.5, 2.0, D, dtype=np.float32)[None, :, None, None],
                (1, D, H, W),
            ).copy()
        )
        vw = jnp.asarray(rng.rand(1, S, H, W).astype(np.float32))
        g = jnp.asarray(rng.randn(1, D, H, W).astype(np.float32))

        fms, _ = timed_ms(
            jax.jit(warp_correlate_wsum_onehot),
            src, ref, sp, rp, dv, vw, iters=6, warmup=2,
        )
        bms, _ = timed_ms(
            jax.jit(warp_correlate_wsum_bwd),
            src, ref, sp, rp, dv, vw, g, iters=6, warmup=2,
        )
        tot_f += fms
        tot_b += bms
        print(
            f"warp {name} {H}x{W} C{C} D{D}  fwd {fms:7.2f} ms"
            f"   bwd {bms:7.2f} ms",
            flush=True,
        )

    print(f"\nkernel totals: fwd {tot_f:.1f} ms   bwd {tot_b:.1f} ms")


if __name__ == "__main__":
    main()
