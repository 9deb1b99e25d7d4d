"""Locate the fused-DCN backward's non-kernel cost (train shapes).

Times, per stage shape: (a) the kernel-only dcn_bwd, (b) the FULL fused
VJP backward (jax.grad through deform_conv2d_fused_with_vjp), and (c) the
offset-conv recompute + its VJP alone. Hypothesis: (b) - (a) ~= (c), i.e.
the XLA offset-conv round trip (27-channel conv + interleave split and
its transposed VJP) is the missing ~90 ms of the train step's FeatureNet
backward (9 layers).
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

from transmvsnet_tpu.ops.pallas.dcn_bwd import deform_conv2d_bwd
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot_fused
from transmvsnet_tpu.ops.pallas.vjp import (
    _offset_conv,
    deform_conv2d_fused_with_vjp,
    split_offsets,
)
from transmvsnet_tpu.utils_bench import timed_ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    K = 9
    for H, W, C in [(128, 160, 32), (256, 320, 16), (512, 640, 8)]:
        Cout = C
        x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32)).astype(
            jnp.bfloat16
        )
        k_off = jnp.asarray(
            (rng.randn(3, 3, C, 27) * 0.01).astype(np.float32)
        )
        b_off = jnp.asarray((rng.randn(27) * 0.01).astype(np.float32))
        w = jnp.asarray((rng.randn(K, C, Cout) * 0.1).astype(np.float32))
        b = jnp.asarray((rng.randn(Cout) * 0.1).astype(np.float32))
        dy = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
        dxo = jnp.asarray(rng.randn(5, H, W, K).astype(np.float32) * 0.5)
        m = jnp.asarray(rng.rand(5, H, W, K).astype(np.float32))
        g = jnp.asarray(rng.randn(5, H, W, Cout).astype(np.float32))

        kern_ms, _ = timed_ms(
            jax.jit(deform_conv2d_bwd), x, dy, dxo, m, w, g, iters=8, warmup=2
        )

        f = deform_conv2d_fused_with_vjp(
            deform_conv2d_onehot_fused, pallas_bwd=deform_conv2d_bwd
        )
        grad_fn = jax.jit(
            jax.grad(
                lambda *a: jnp.sum(f(*a).astype(jnp.float32) ** 2),
                argnums=tuple(range(5)),
            )
        )
        full_ms, _ = timed_ms(grad_fn, x, k_off, b_off, w, b, iters=6, warmup=2)

        def off_round_trip(x_, k_, bo_):
            off, vjp = jax.vjp(_offset_conv, x_, k_, bo_)
            a, bb, c = split_offsets(off)
            doff = jnp.concatenate(
                [off * 0 + 1.0], axis=-1
            )  # placeholder cotangent, same shape/dtype
            return vjp(doff.astype(off.dtype)), (a, bb, c)

        off_ms, _ = timed_ms(
            jax.jit(off_round_trip), x, k_off, b_off, iters=8, warmup=2
        )
        fwd_ms, _ = timed_ms(
            jax.jit(deform_conv2d_onehot_fused), x, k_off, b_off, w, b,
            iters=8, warmup=2,
        )
        print(
            f"{H}x{W} C{C}: fused fwd {fwd_ms:6.2f}  kernel bwd {kern_ms:6.2f}"
            f"  FULL vjp bwd {full_ms:7.2f}  off-conv+vjp {off_ms:6.2f}"
            f"  (x3 layers each)",
            flush=True,
        )


if __name__ == "__main__":
    main()
