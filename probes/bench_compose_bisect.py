"""Bisect the full-forward composition overhead.

The parts (extract_features, per-stage run_stage) sum to ~210 ms but the
full jitted forward measured ~720 ms. This probe grows the jitted graph
one stage at a time to locate where the cliff appears:
  A: extract only
  B: extract + stage1
  C: extract + stage1 + stage2
  D: extract + stage1 + stage2 + stage3   (== full forward, minus dict glue)
Also times D with jax.profiler trace if TRACE=1 (may not work over the
remote tunnel).
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
    print(f"{name:<44} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
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
    num_hyp = dv.shape[1]
    depth_interval = (dv[:, -1] - dv[:, 0]) / num_hyp

    def upto(n_stages):
        def f(v, im):
            feats = model.apply(
                v, im, False, method=TransMVSNet.extract_features
            )
            prev_depth, vw = None, None
            out = jnp.float32(0)
            for i in range(n_stages):
                scale = cfg.stage_scales[i]
                h, w = H // scale, W // scale
                if prev_depth is None:
                    samples = initial_depth_samples(dv, cfg.ndepths[i], (h, w))
                else:
                    samples = refine_depth_samples(
                        jax.lax.stop_gradient(prev_depth),
                        cfg.ndepths[i],
                        cfg.depth_interval_ratios[i] * depth_interval,
                        (h, w), (H, W),
                    )
                    BV = vw.shape[0] * vw.shape[1]
                    vw2 = upsample_nearest_2x(vw.reshape(BV, *vw.shape[2:]))
                    vw = vw2.reshape(vw.shape[0], vw.shape[1], *vw2.shape[1:])
                so, vw = model.apply(
                    v, feats[f"stage{i+1}"], projs[f"stage{i+1}"], samples, i,
                    vw, False, method=TransMVSNet.run_stage,
                )
                prev_depth = so["depth"]
            if n_stages == 0:
                return sum(jnp.sum(x.astype(jnp.float32)) for x in feats.values())
            return prev_depth

        return jax.jit(f)

    for n in [0, 1, 2, 3]:
        t(f"extract + {n} stage(s)", upto(n), variables, imgs)

    if os.environ.get("TRACE"):
        f3 = upto(3)
        r = f3(variables, imgs)
        jax.block_until_ready(r)
        with jax.profiler.trace("/tmp/jaxtrace"):
            r = f3(variables, imgs)
            jax.block_until_ready(r)
        print("trace written to /tmp/jaxtrace")


if __name__ == "__main__":
    main()
