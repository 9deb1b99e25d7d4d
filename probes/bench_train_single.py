"""Train-step probe without the in-graph timing harness.

The fori_loop-wrapped timing graph (utils_bench.timed_ms) crashes the TPU
worker at the 512x640 recipe shape even though every component op passes
standalone (probes/probe_train_crash.py). This probe runs the REAL train
step the way tools/train.py does — one jit per step, state donated — and
times N dependency-chained steps by wall clock (each step consumes the
previous state, so dispatches cannot overlap; at ~1-2 s/step the ~20 ms
dispatch/fetch overhead is <2% — acceptable without the in-graph loop).

  python probes/bench_train_single.py [--no_pallas] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=6)
    args = p.parse_args()

    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
    from transmvsnet_tpu.train.step import create_train_state, make_train_step

    from __graft_entry__ import _example_inputs

    B, V, H, W = args.batch, 5, 512, 640
    model = TransMVSNet(
        ModelConfig(
            use_pallas=not args.no_pallas,
            compute_dtype=args.dtype,
            remat=not args.no_remat,
        )
    )
    imgs, projs, dv = _example_inputs(B=B, V=V, H=H, W=W, num_hyp=192)
    rng = np.random.RandomState(0)
    depth = {}
    mask = {}
    for s, scale in [("stage1", 4), ("stage2", 2), ("stage3", 1)]:
        d = rng.uniform(480.0, 880.0, (B, H // scale, W // scale)).astype(
            np.float32
        )
        depth[s] = jnp.asarray(d)
        mask[s] = jnp.asarray(np.ones_like(d))
    batch = {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv,
        "depth": depth,
        "mask": mask,
    }

    t_imgs, t_projs, t_dv = _example_inputs(B=1, V=V, H=64, W=128, num_hyp=192)
    variables = model.init(
        jax.random.PRNGKey(0), t_imgs, t_projs, t_dv, train=False
    )
    optimizer = make_optimizer(warmup_multistep(1e-3, [10**9], 0.5))
    state = create_train_state(model, variables, optimizer)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=0)

    t0 = time.time()
    state, scalars = step(state, batch)
    loss0 = float(scalars["loss"])  # blocks
    compile_s = time.time() - t0
    print(f"first step OK: loss {loss0:.4f} (compile+run {compile_s:.1f}s)", flush=True)

    # Dependency-chained timing: each step consumes the previous state.
    t0 = time.time()
    for _ in range(args.steps):
        state, scalars = step(state, batch)
    final = float(scalars["loss"])  # forces completion of the chain
    dt = (time.time() - t0) / args.steps
    print(
        json.dumps(
            {
                "metric": "train_step_ms_512x640_5view_chained",
                "batch": B,
                "pallas": not args.no_pallas,
                "remat": not args.no_remat,
                "dtype": args.dtype,
                "value": round(dt * 1e3, 1),
                "maps_per_s_train": round(B / dt, 4),
                "compile_s": round(compile_s, 1),
                "loss_finite": bool(np.isfinite(final)),
            }
        )
    )


if __name__ == "__main__":
    main()
