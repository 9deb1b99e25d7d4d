"""Isolate the TPU-worker crash in the 512x640 train step (round 3).

Both bench_train arms (Pallas fwd + XLA-recompute bwd, and pure XLA)
crash the TPU worker at the DTU recipe shape. This probe runs each
suspect op's forward and forward+backward standalone, smallest first, to
find the crasher:

  python probes/probe_train_crash.py [--op warp|dcn|all] [--stage N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def run_case(name, fn, *args):
    print(f"--- {name}: compiling/running", flush=True)
    out = jax.jit(fn)(*args)
    s = float(
        sum(
            jnp.sum(jnp.abs(o.astype(jnp.float32)))
            for o in jax.tree_util.tree_leaves(out)
        )
    )
    print(f"--- {name}: OK (checksum {s:.4e})", flush=True)


def warp_cases(stage: int):
    from transmvsnet_tpu.ops.warp import warp_correlate

    # Train-shape stages at 512x640 (B=1, S=4 flattened into batch).
    shapes = {
        1: (4, 128, 160, 32, 48),
        2: (4, 256, 320, 16, 32),
        3: (4, 512, 640, 8, 8),
    }
    B, H, W, C, D = shapes[stage]
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    ref = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    proj = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).astype(jnp.float32)
    pr2 = proj.at[:, 0, 3].add(3.0)
    dep = jnp.asarray(
        np.broadcast_to(
            np.linspace(425.0, 935.0, D, dtype=np.float32)[None, :, None, None],
            (B, D, H, W),
        ).copy()
    )

    run_case(
        f"warp_xla_fwd s{stage}",
        lambda s_, r_: warp_correlate(s_, r_, pr2, proj, dep),
        src, ref,
    )
    run_case(
        f"warp_xla_bwd s{stage}",
        lambda s_, r_: jax.grad(
            lambda a, b: jnp.sum(warp_correlate(a, b, pr2, proj, dep))
        )(s_, r_),
        src, ref,
    )


def dcn_cases(n_imgs: int):
    from transmvsnet_tpu.ops.dcn import deform_conv2d

    H, W, C = 512, 640, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n_imgs, H, W, C).astype(np.float32))
    dy = jnp.asarray((rng.rand(n_imgs, H, W, 9) * 2 - 1).astype(np.float32))
    dx = jnp.asarray((rng.rand(n_imgs, H, W, 9) * 2 - 1).astype(np.float32))
    m = jnp.asarray(rng.rand(n_imgs, H, W, 9).astype(np.float32))
    w = jnp.asarray(rng.randn(9, C, C).astype(np.float32) * 0.1)
    b = jnp.zeros((C,), jnp.float32)

    run_case(
        f"dcn_xla_fwd {n_imgs}x{H}x{W}",
        lambda x_, w_: deform_conv2d(x_, dy, dx, m, w_, b),
        x, w,
    )
    run_case(
        f"dcn_xla_bwd {n_imgs}x{H}x{W}",
        lambda x_, w_: jax.grad(
            lambda a, ww: jnp.sum(deform_conv2d(a, dy, dx, m, ww, b))
        )(x_, w_),
        x, w,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--op", default="all", choices=["warp", "dcn", "all"])
    p.add_argument("--stage", type=int, default=0, help="warp stage (0=all)")
    p.add_argument("--imgs", type=int, default=5)
    args = p.parse_args()
    print("device:", jax.devices()[0])
    if args.op in ("warp", "all"):
        for s in ([args.stage] if args.stage else [1, 2, 3]):
            warp_cases(s)
    if args.op in ("dcn", "all"):
        dcn_cases(args.imgs)
    print("ALL CASES PASSED")
