"""Full-forward block breakdown at the DTU eval setting (bf16 + pallas).

Times each major block of the current fast path standalone so the next
optimization target is data, not guesswork:
  FeatureNet, FMTWithPathway, per-stage warp-correlate (one-hot kernels),
  PixelwiseNet, per-stage CostRegNet, softmax+WTA.
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
    print(f"{name:<48} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], "dtype:", DTYPE)
    rng = np.random.RandomState(0)
    total = 0.0

    # --- FeatureNet ---
    from transmvsnet_tpu.models.feature_net import FeatureNet

    fnet = FeatureNet(base_channels=8, use_pallas=True)
    tiny = jnp.asarray(rng.rand(5, 64, 128, 3).astype(np.float32)).astype(DTYPE)
    vars_f = fnet.init(jax.random.PRNGKey(0), tiny, False)
    imgs = jnp.asarray(rng.rand(5, 864, 1152, 3).astype(np.float32)).astype(DTYPE)
    total += t("FeatureNet 864x1152 x5", jax.jit(lambda v, x: fnet.apply(v, x, False)), vars_f, imgs)

    # --- FMT ---
    from transmvsnet_tpu.models.fmt import FMTWithPathway

    fmt = FMTWithPathway(base_channels=8)
    feats_t = {
        s: jnp.asarray(rng.rand(1, 5, 16 * (2 ** i), 32 * (2 ** i), c).astype(np.float32)).astype(DTYPE)
        for i, (s, _, _, c, _) in enumerate(STAGES)
    }
    vars_m = fmt.init(jax.random.PRNGKey(0), feats_t)
    feats = {
        s: jnp.asarray(rng.rand(1, 5, h, w, c).astype(np.float32)).astype(DTYPE)
        for (s, h, w, c, _) in STAGES
    }
    total += t("FMTWithPathway", jax.jit(lambda v, x: fmt.apply(v, x)), vars_m, feats)

    # --- per-stage warp-correlate (4 source views flattened) ---
    from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_onehot
    from transmvsnet_tpu.ops.pallas.warp_rowsweep import warp_correlate_rowsweep

    kern = warp_correlate_onehot if DTYPE == "bfloat16" else warp_correlate_rowsweep
    proj = np.eye(4, dtype=np.float32)[None].repeat(4, 0)
    proj2 = proj.copy()
    proj2[:, 0, 3] = 10.0
    for (s, h, w, C, D) in STAGES:
        src = jnp.asarray(rng.rand(4, h, w, C).astype(np.float32)).astype(DTYPE)
        ref = jnp.asarray(rng.rand(4, h, w, C).astype(np.float32)).astype(DTYPE)
        dv = jnp.asarray(
            np.broadcast_to(
                np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
                (4, D, h, w),
            ).copy()
        )
        total += t(
            f"warp {s} {h}x{w} C{C} D{D} (4 views)",
            jax.jit(kern), src, ref, jnp.asarray(proj2), jnp.asarray(proj), dv,
        )

    # --- PixelwiseNet (stage 1 only) ---
    from transmvsnet_tpu.models.cost_reg import CostRegNet, PixelwiseNet

    pw = PixelwiseNet()
    sim_t = jnp.asarray(rng.rand(4, 8, 16, 32, 1).astype(np.float32)).astype(DTYPE)
    vars_p = pw.init(jax.random.PRNGKey(0), sim_t, False)
    sim1 = jnp.asarray(rng.rand(4, 48, 216, 288, 1).astype(np.float32)).astype(DTYPE)
    total += t("PixelwiseNet stage1", jax.jit(lambda v, x: pw.apply(v, x, False)), vars_p, sim1)

    # --- per-stage CostRegNet (dense depth-as-channels path) ---
    from transmvsnet_tpu.models.cost_reg import CostRegNetDense

    cr = CostRegNetDense(8)
    vol_t = jnp.asarray(rng.rand(1, 8, 16, 32, 1).astype(np.float32)).astype(DTYPE)
    vars_c = cr.init(jax.random.PRNGKey(0), vol_t, False)
    for (s, h, w, C, D) in STAGES:
        vol = jnp.asarray(rng.rand(1, D, h, w, 1).astype(np.float32)).astype(DTYPE)
        total += t(f"CostRegNetDense {s} D{D} {h}x{w}", jax.jit(lambda v, x: cr.apply(v, x, False)), vars_c, vol)

    # --- softmax + WTA per stage ---
    from transmvsnet_tpu.models.transmvsnet import depth_wta

    def swta(cost, dv):
        p = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
        return depth_wta(p, dv), jnp.max(p, axis=1)

    for (s, h, w, C, D) in STAGES:
        cost = jnp.asarray(rng.rand(1, D, h, w).astype(np.float32)).astype(DTYPE)
        dv = jnp.asarray(rng.rand(1, D, h, w).astype(np.float32))
        total += t(f"softmax+WTA {s}", jax.jit(swta), cost, dv)

    print(f"sum of blocks: {total:.1f} ms  (~{1e3/total:.2f} maps/s upper bound)")


if __name__ == "__main__":
    main()
