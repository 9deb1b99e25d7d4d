"""Quantify the value of the seq/view sharding axes (VERDICT round-2 item 7).

Real multi-chip hardware is unavailable, and the virtual 8-device CPU mesh
runs on a 2-core host, so wall-clock there measures thread contention, not
parallelism. Instead this probe compiles the two shardable subgraphs under
GSPMD at their REAL shapes and reports the quantities that decide whether
an axis is worth turning on:

  - per-device FLOPs (XLA cost analysis of the partitioned module) — the
    compute each chip would execute;
  - collective traffic (bytes through all-reduce / all-gather /
    reduce-scatter / collective-permute, parsed from the optimized HLO) —
    what the axis costs in ICI bandwidth;
  - per-device peak activation bytes accessed — the HBM-pressure relief.

Subgraphs probed:
  1. FMT at the DTU-eval token count (216x288 = 62,208 tokens, 1+4 views,
     d_model 32) with the token ("seq") axis sharded 1x vs 8x.
  2. Stage-1 plane-sweep correlation + view accumulation (D=48, C=32,
     S=4 source views) with the view axis sharded 1x vs 4x.

Usage: python probes/bench_sharding_value.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.parallel.hlo_analysis import collective_bytes  # noqa: E402


def analyze(fn, args, mesh, rules_ctx, label: str) -> dict:
    from contextlib import nullcontext

    ctx = rules_ctx if rules_ctx is not None else nullcontext()
    with mesh, ctx:
        compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    text = compiled.as_text()
    coll = collective_bytes(text)
    rec = {
        "config": label,
        "flops_per_device": float(ca.get("flops", float("nan"))),
        "bytes_accessed_per_device": float(ca.get("bytes accessed", float("nan"))),
        "collective_bytes": coll,
        "collective_bytes_total": sum(coll.values()),
    }
    print(json.dumps(rec))
    return rec


def probe_fmt():
    from transmvsnet_tpu.config import MeshConfig
    from transmvsnet_tpu.models.fmt import FMT
    from transmvsnet_tpu.parallel.mesh import make_mesh
    from transmvsnet_tpu.parallel.sharding import sharding_rules

    B, S, H, W, C = 1, 4, 216, 288, 32  # DTU-eval stage-1: 62,208 tokens
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    src = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32))
    fmt = FMT(d_model=C, n_heads=8)
    variables = fmt.init(jax.random.PRNGKey(0), ref, src)

    def f(ref, src):
        return fmt.apply(variables, ref, src)

    results = []
    for depth_ax in (1, 8):
        mesh = make_mesh(MeshConfig(data=1, view=1, depth=depth_ax))
        results.append(
            analyze(f, (ref, src), mesh, sharding_rules(mesh), f"fmt_seq{depth_ax}")
        )
    return {"subgraph": "fmt_62208_tokens", "configs": results}


def probe_view_accumulation():
    from transmvsnet_tpu.config import MeshConfig
    from transmvsnet_tpu.ops.warp import warp_correlate
    from transmvsnet_tpu.parallel.mesh import make_mesh
    from transmvsnet_tpu.parallel.sharding import constrain, sharding_rules

    B, S, C, D, H, W = 1, 4, 32, 48, 216, 288
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    srcs = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32))
    ref_proj = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).astype(jnp.float32)
    src_projs = jnp.tile(jnp.eye(4)[None, None], (B, S, 1, 1)).astype(
        jnp.float32
    )
    depth = jnp.asarray(
        np.broadcast_to(
            np.linspace(425.0, 935.0, D, dtype=np.float32)[None, :, None, None],
            (B, D, H, W),
        ).copy()
    )

    def f(ref, srcs, src_projs, ref_proj, depth):
        srcs = constrain(srcs, None, "view", None, None, None)

        def per_view(src, P):
            return warp_correlate(src, ref, P, ref_proj, depth)

        corr = jax.vmap(per_view, in_axes=(1, 1), out_axes=1)(srcs, src_projs)
        corr = constrain(corr, None, "view", None, None, None)
        return jnp.sum(corr, axis=1)  # view accumulation (psum over view)

    results = []
    for view_ax in (1, 4):
        mesh = make_mesh(MeshConfig(data=1, view=view_ax, depth=1))
        results.append(
            analyze(
                f,
                (ref, srcs, src_projs, ref_proj, depth),
                mesh,
                sharding_rules(mesh),
                f"warpcorr_view{view_ax}",
            )
        )
    return {"subgraph": "stage1_warp_correlate_accumulate", "configs": results}


if __name__ == "__main__":
    out = [probe_fmt(), probe_view_accumulation()]
    print(json.dumps({"summary": out}))
