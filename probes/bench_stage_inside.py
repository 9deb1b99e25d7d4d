"""Split depth_stage internals: where do the per-stage glue ms go?

Per stage (shapes of the DTU eval setting): times
  a. warp-prep + kernel     (broadcast ref/depth to S views, reshape, warp)
  b. weighted view sum      (sim * w / sum(w))
  c. costreg+softmax+wta    (dense cost reg on similarity)
  d. sample generation      (initial/refine)
against the composed run_stage total from bench_stage_glue.py.
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

DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
STAGES = [  # (name, h, w, C, D)
    ("stage1", 216, 288, 32, 48),
    ("stage2", 432, 576, 16, 32),
    ("stage3", 864, 1152, 8, 8),
]


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<46} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], "dtype:", DTYPE)
    rng = np.random.RandomState(0)
    from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_onehot
    from transmvsnet_tpu.models.cost_reg import CostRegNetDense
    from transmvsnet_tpu.models.transmvsnet import depth_wta
    from transmvsnet_tpu.ops.geometry import refine_depth_samples

    B, S = 1, 4
    cr = CostRegNetDense(8)
    vol_t = jnp.asarray(rng.rand(1, 8, 16, 32, 1).astype(np.float32)).astype(DTYPE)
    vars_c = cr.init(jax.random.PRNGKey(0), vol_t, False)

    for (s, h, w, C, D) in STAGES:
        print(f"--- {s} ({h}x{w} C{C} D{D}) ---", flush=True)
        feats = jnp.asarray(
            rng.rand(B, S + 1, h, w, C).astype(np.float32)
        ).astype(DTYPE)
        proj = np.eye(4, dtype=np.float32)[None, None].repeat(S + 1, 1)
        proj[:, 1:, 0, 3] = 10.0
        projs = jnp.asarray(proj)
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
                (B, D, h, w),
            ).copy()
        )

        # a. warp-prep + kernel (as depth_stage does it)
        def warp_prep(feats, projs, dv):
            ref_fea = feats[:, 0]
            src_feas = feats[:, 1:]
            sim = warp_correlate_onehot(
                src_feas.reshape(B * S, h, w, C),
                jnp.broadcast_to(ref_fea[:, None], (B, S, h, w, C)).reshape(
                    B * S, h, w, C
                ),
                projs[:, 1:].reshape(B * S, 4, 4),
                jnp.broadcast_to(projs[:, :1], (B, S, 4, 4)).reshape(B * S, 4, 4),
                jnp.broadcast_to(dv[:, None], (B, S, D, h, w)).reshape(
                    B * S, D, h, w
                ),
            ).reshape(B, S, D, h, w)
            return sim

        t(f"{s} a. warp prep+kernel", jax.jit(warp_prep), feats, projs, dv)

        # b. weighted view sum
        sim = jnp.asarray(rng.rand(B, S, D, h, w).astype(np.float32))
        vw = jnp.asarray(rng.rand(B, S, h, w, 1).astype(np.float32))

        def wsum(sim, vw):
            w_b = vw[..., 0][:, :, None]
            return jnp.sum(sim * w_b, axis=1) / (1e-5 + jnp.sum(w_b, axis=1))

        t(f"{s} b. weighted view sum", jax.jit(wsum), sim, vw)

        # c. costreg + softmax + wta
        similarity = jnp.asarray(rng.rand(B, D, h, w).astype(np.float32))

        def reg(v, similarity, dv):
            cost = cr.apply(v, similarity.astype(DTYPE)[..., None], False)[..., 0]
            p = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
            return depth_wta(p, dv), jnp.max(p, axis=1)

        t(f"{s} c. costreg+softmax+wta", jax.jit(reg), vars_c, similarity, dv)

        # d. sample generation (stages 2-3 refine)
        if s != "stage1":
            prev = jnp.asarray(rng.rand(B, h // 2, w // 2).astype(np.float32) * 400 + 425)
            t(
                f"{s} d. refine samples",
                jax.jit(
                    lambda p: refine_depth_samples(p, D, 2.5, (h, w), (864, 1152))
                ),
                prev,
            )


if __name__ == "__main__":
    main()
