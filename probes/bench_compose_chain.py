"""Locate the full-forward composition overhead via chained dispatches.

The fori_loop timing harness crashes the TPU worker on the staged
composition graphs (see PERFORMANCE.md "Measurement rules"), so this
probe times each growing graph by wall clock over N dependency-chained
dispatches: iteration i feeds `imgs + out_scalar(i-1) * 0` so dispatches
serialize; the ~20 ms fixed overhead is shared across the chain.

  A: extract_features only
  B: extract + stage1
  C: extract + stage1 + stage2
  D: full forward (extract + 3 stages)

  python probes/bench_compose_chain.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def chained_ms(fn, variables, imgs, projs, dv, iters):
    """Time fn over `iters` serialized dispatches (wall clock)."""
    jfn = jax.jit(fn)
    t0 = time.time()
    s = jnp.float32(0.0)
    out = jfn(variables, imgs, projs, dv)
    s = out
    float(s)  # block
    compile_s = time.time() - t0

    for _ in range(2):  # warmup
        s = jfn(variables, imgs + s.astype(imgs.dtype) * 0, projs, dv)
    float(s)
    t0 = time.time()
    for _ in range(iters):
        s = jfn(variables, imgs + s.astype(imgs.dtype) * 0, projs, dv)
    float(s)  # force chain completion
    return (time.time() - t0) / iters * 1e3, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.ops.geometry import (
        initial_depth_samples,
        refine_depth_samples,
    )
    from transmvsnet_tpu.ops.sampling import upsample_nearest_2x

    from __graft_entry__ import _example_inputs

    print("device:", jax.devices()[0], "dtype:", DTYPE)
    H, W = 864, 1152
    model = TransMVSNet(ModelConfig(use_pallas=True, compute_dtype=DTYPE))
    cfg = model.cfg
    imgs, projs, dv = _example_inputs(B=1, V=5, H=H, W=W, num_hyp=192)
    t_imgs, t_projs, t_dv = _example_inputs(B=1, V=5, H=64, W=128, num_hyp=192)
    variables = model.init(
        jax.random.PRNGKey(0), t_imgs, t_projs, t_dv, train=False
    )

    def upto(n_stages):
        def fn(variables, imgs, projs, dv):
            def run(self, imgs, projs, dv):
                features = self.extract_features(imgs, False)
                acc = sum(
                    jnp.sum(f.astype(jnp.float32)) for f in features.values()
                )
                B = imgs.shape[0]
                depth_interval = (dv[:, -1] - dv[:, 0]) / dv.shape[1]
                prev_depth = None
                view_weights = None
                for i in range(n_stages):
                    stage = f"stage{i + 1}"
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
                    if i > 0:
                        BV = view_weights.shape[0] * view_weights.shape[1]
                        vw = view_weights.reshape(BV, *view_weights.shape[2:])
                        vw = upsample_nearest_2x(vw)
                        view_weights = vw.reshape(B, 4, *vw.shape[1:])
                    out, view_weights = self.run_stage(
                        features[stage], projs[stage], samples, i, view_weights
                    )
                    prev_depth = out["depth"]
                    acc = acc + jnp.sum(out["depth"].astype(jnp.float32))
                return acc

            return model.apply(
                variables, imgs, projs, dv, method=run
            )

        return fn

    def full(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return jnp.sum(out["depth"].astype(jnp.float32)) + jnp.sum(
            out["photo_confidence"].astype(jnp.float32)
        )

    results = {}
    for name, fn in [
        ("A extract", upto(0)),
        ("B extract+s1", upto(1)),
        ("C extract+s1+s2", upto(2)),
        ("D extract+s1+s2+s3", upto(3)),
        ("E full forward (dict outputs)", full),
    ]:
        ms, comp = chained_ms(fn, variables, imgs, projs, dv, args.iters)
        results[name] = ms
        print(f"{name:<32} compile {comp:6.1f}s   run {ms:8.2f} ms", flush=True)
    names = list(results)
    for a, b in zip(names, names[1:]):
        print(f"delta {b:<28} {results[b] - results[a]:8.2f} ms")


if __name__ == "__main__":
    main()
