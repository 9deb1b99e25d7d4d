"""Training-step throughput at the reference recipe shape (VERDICT item 7).

Times the full jitted train step (forward + backward + Adam) at the DTU
training shape — 512x640, batch 2, 5 views, 48/32/8 cascade (reference
scripts/train.sh:9-24) — A/B-ing the Pallas kernels (custom VJPs,
XLA-recompute backward) against the pure-XLA path.

Usage: python probes/bench_train.py [--no_pallas] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
    from transmvsnet_tpu.train.step import create_train_state, make_train_step
    from transmvsnet_tpu.utils_bench import timed_ms

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
    # GT pyramid around the hypothesis range midpoint.
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
    step = make_train_step(model, optimizer)

    def run(state, batch):
        new_state, scalars = step(state, batch)
        return new_state.params, scalars["loss"]

    run_ms, compile_s = timed_ms(run, state, batch, iters=args.iters, warmup=2)
    print(
        json.dumps(
            {
                "metric": "train_step_ms_512x640_b2_5view",
                "pallas": not args.no_pallas,
                "dtype": args.dtype,
                "value": round(run_ms, 2),
                "maps_per_s": round(B * 1e3 / run_ms, 4),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
