"""Is per-stage glue from CHAINING (XLA scheduling across pallas calls),
or from the model wrapper (flax/custom_vjp)?

Times, at stage-2 and stage-3 shapes:
  A. pieces chained in one jit with the RAW kernel (no flax, no custom_vjp)
  B. same chain but warp wrapped in the custom_vjp wrapper
  C. same chain via model.apply run_stage (full wrapper)
Compare against the pieces-sum from bench_stage_inside.py (~60 / ~53 ms).
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

DTYPE = "bfloat16"


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<52} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_onehot
    from transmvsnet_tpu.ops.pallas.vjp import warp_correlate_with_vjp
    from transmvsnet_tpu.models.cost_reg import CostRegNetDense
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet, depth_wta
    from transmvsnet_tpu.ops.geometry import refine_depth_samples
    from transmvsnet_tpu.config import ModelConfig

    B, S = 1, 4
    cr = CostRegNetDense(8)
    vol_t = jnp.asarray(rng.rand(1, 8, 16, 32, 1).astype(np.float32)).astype(DTYPE)
    vars_c = cr.init(jax.random.PRNGKey(0), vol_t, False)

    model = TransMVSNet(ModelConfig(use_pallas=True, compute_dtype=DTYPE))
    from __graft_entry__ import _example_inputs

    t_imgs, t_projs, t_dv = _example_inputs(B=1, V=5, H=64, W=128, num_hyp=192)
    vars_m = model.init(jax.random.PRNGKey(0), t_imgs, t_projs, t_dv, train=False)

    for (s, i_stage, h, w, C, D) in [
        ("stage2", 1, 432, 576, 16, 32),
        ("stage3", 2, 864, 1152, 8, 8),
    ]:
        print(f"--- {s} ---", flush=True)
        feats = jnp.asarray(
            rng.rand(B, S + 1, h, w, C).astype(np.float32)
        ).astype(DTYPE)
        proj = np.eye(4, dtype=np.float32)[None, None].repeat(S + 1, 1)
        proj[:, 1:, 0, 3] = 10.0
        projs = jnp.asarray(proj)
        prev = jnp.asarray(
            rng.rand(B, h // 2, w // 2).astype(np.float32) * 400 + 425
        )
        vw = jnp.asarray(rng.rand(B, S, h // 2, w // 2, 1).astype(np.float32))

        def chain(feats, projs, prev, vw, warp_fn):
            from transmvsnet_tpu.ops.sampling import upsample_nearest_2x

            dv = refine_depth_samples(prev, D, 2.5, (h, w), (864, 1152))
            vw2 = upsample_nearest_2x(vw.reshape(B * S, h // 2, w // 2, 1))
            vw2 = vw2.reshape(B, S, h, w, 1)
            ref_fea = feats[:, 0]
            src_feas = feats[:, 1:]
            sim = warp_fn(
                src_feas.reshape(B * S, h, w, C),
                jnp.broadcast_to(ref_fea[:, None], (B, S, h, w, C)).reshape(
                    B * S, h, w, C
                ),
                projs[:, 1:].reshape(B * S, 4, 4),
                jnp.broadcast_to(projs[:, :1], (B, S, 4, 4)).reshape(
                    B * S, 4, 4
                ),
                jnp.broadcast_to(dv[:, None], (B, S, D, h, w)).reshape(
                    B * S, D, h, w
                ),
            ).reshape(B, S, D, h, w)
            w_b = vw2[..., 0][:, :, None]
            similarity = jnp.sum(sim * w_b, axis=1) / (
                1e-5 + jnp.sum(w_b, axis=1)
            )
            cost = cr.apply(vars_c, similarity.astype(DTYPE)[..., None], False)[
                ..., 0
            ]
            p = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
            return depth_wta(p, dv), jnp.max(p, axis=1)

        t(
            f"{s} A. chained, raw kernel",
            jax.jit(lambda f_, p_, pr_, v_: chain(f_, p_, pr_, v_, warp_correlate_onehot)),
            feats, projs, prev, vw,
        )
        wrapped = warp_correlate_with_vjp(warp_correlate_onehot)
        t(
            f"{s} B. chained, custom_vjp kernel",
            jax.jit(lambda f_, p_, pr_, v_: chain(f_, p_, pr_, v_, wrapped)),
            feats, projs, prev, vw,
        )

        # D. chained but f32 similarity into costreg (as the model does)
        def chain_f32(feats, projs, prev, vw):
            from transmvsnet_tpu.ops.sampling import upsample_nearest_2x

            dv = refine_depth_samples(prev, D, 2.5, (h, w), (864, 1152))
            vw2 = upsample_nearest_2x(vw.reshape(B * S, h // 2, w // 2, 1))
            vw2 = vw2.reshape(B, S, h, w, 1)
            ref_fea = feats[:, 0]
            src_feas = feats[:, 1:]
            sim = warp_correlate_onehot(
                src_feas.reshape(B * S, h, w, C),
                jnp.broadcast_to(ref_fea[:, None], (B, S, h, w, C)).reshape(
                    B * S, h, w, C
                ),
                projs[:, 1:].reshape(B * S, 4, 4),
                jnp.broadcast_to(projs[:, :1], (B, S, 4, 4)).reshape(
                    B * S, 4, 4
                ),
                jnp.broadcast_to(dv[:, None], (B, S, D, h, w)).reshape(
                    B * S, D, h, w
                ),
            ).reshape(B, S, D, h, w)
            w_b = vw2[..., 0][:, :, None]
            similarity = jnp.sum(sim * w_b, axis=1) / (
                1e-5 + jnp.sum(w_b, axis=1)
            )
            cost = cr.apply(vars_c, similarity[..., None], False)[..., 0]
            p = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
            return depth_wta(p, dv), jnp.max(p, axis=1)

        t(f"{s} D. chained, f32 costreg input", jax.jit(chain_f32), feats, projs, prev, vw)

        # C. via the model wrapper (pair-format projections)
        pairs = np.zeros((B, S + 1, 2, 4, 4), np.float32)
        pairs[:, :, 0] = np.eye(4)
        pairs[:, 1:, 0, 0, 3] = 10.0
        pairs[:, :, 1] = np.eye(4)
        pairs_j = jnp.asarray(pairs)

        def via_model(vars_m, feats, pairs_j, prev, vw):
            from transmvsnet_tpu.ops.sampling import upsample_nearest_2x

            dv = refine_depth_samples(prev, D, 2.5, (h, w), (864, 1152))
            vw2 = upsample_nearest_2x(vw.reshape(B * S, h // 2, w // 2, 1))
            vw2 = vw2.reshape(B, S, h, w, 1)
            out, _ = model.apply(
                vars_m, feats, pairs_j, dv, i_stage, vw2, False,
                method=TransMVSNet.run_stage,
            )
            return out["depth"], out["photo_confidence"]

        t(f"{s} C. via model.run_stage", jax.jit(via_model), vars_m, feats, pairs_j, prev, vw)


if __name__ == "__main__":
    main()
