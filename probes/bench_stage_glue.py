"""Locate the unaccounted full-forward time: stage-level composition probe.

Times (a) extract_features (FeatureNet+FMT jointly), (b) each cascade stage
via run_stage including sample generation and view-weight upsampling, and
(c) the full forward in the same process, so (c) - sum(a,b) is the real
glue/fusion overhead.
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


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<48} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], "dtype:", DTYPE)
    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.ops.geometry import (
        initial_depth_samples,
        refine_depth_samples,
    )
    from transmvsnet_tpu.ops.sampling import upsample_nearest_2x

    from __graft_entry__ import _example_inputs

    H, W = 864, 1152
    model = TransMVSNet(ModelConfig(use_pallas=True, compute_dtype=DTYPE))
    imgs, projs, dv = _example_inputs(B=1, V=5, H=H, W=W, num_hyp=192)
    t_imgs, t_projs, t_dv = _example_inputs(B=1, V=5, H=64, W=128, num_hyp=192)
    variables = model.init(jax.random.PRNGKey(0), t_imgs, t_projs, t_dv, train=False)
    cfg = model.cfg

    feat_fn = jax.jit(
        lambda v, x: model.apply(v, x, False, method=TransMVSNet.extract_features)
    )
    total = t("extract_features (FeatureNet+FMT)", feat_fn, variables, imgs)
    features = jax.block_until_ready(feat_fn(variables, imgs))

    # Per-stage: sample gen + run_stage (+ vw upsample for stages 2-3).
    num_hyp = dv.shape[1]
    depth_interval = (dv[:, -1] - dv[:, 0]) / num_hyp

    def stage_fn(i):
        scale = cfg.stage_scales[i]
        h, w = H // scale, W // scale

        def f(v, feats, prev_depth, vw):
            if prev_depth is None:
                samples = initial_depth_samples(dv, cfg.ndepths[i], (h, w))
            else:
                samples = refine_depth_samples(
                    jax.lax.stop_gradient(prev_depth),
                    cfg.ndepths[i],
                    cfg.depth_interval_ratios[i] * depth_interval,
                    (h, w),
                    (H, W),
                )
            if vw is not None:
                BV = vw.shape[0] * vw.shape[1]
                vw2 = upsample_nearest_2x(vw.reshape(BV, *vw.shape[2:]))
                vw = vw2.reshape(vw.shape[0], vw.shape[1], *vw2.shape[1:])
            out, vw = model.apply(
                v, feats[f"stage{i+1}"], projs[f"stage{i+1}"], samples, i, vw,
                False, method=TransMVSNet.run_stage,
            )
            return out["depth"], out["photo_confidence"], vw

        return f

    prev_depth, vw = None, None
    for i in range(3):
        f = stage_fn(i)
        if i == 0:
            g = jax.jit(lambda v, feats: f(v, feats, None, None))
            total += t(f"stage{i+1} (samples+warp+costreg+wta)", g, variables, features)
            prev_depth, _, vw = jax.block_until_ready(g(variables, features))
        else:
            g = jax.jit(f)
            total += t(f"stage{i+1} (samples+warp+costreg+wta)", g, variables, features, prev_depth, vw)
            prev_depth, _, vw = jax.block_until_ready(g(variables, features, prev_depth, vw))

    print(f"sum of stages: {total:.1f} ms", flush=True)

    fwd = jax.jit(
        lambda v, i, p, d: model.apply(v, i, p, d, train=False)["depth"]
    )
    full = t("FULL forward", fwd, variables, imgs, projs, dv)
    print(f"glue/fusion overhead: {full - total:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
