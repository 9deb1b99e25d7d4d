"""FLOP count + MFU for the bench forward (VERDICT weak-1: honest ceiling).

Uses XLA's compiled cost analysis for the exact FLOPs of the flagship
forward at the bench shape, then reports MFU against the chip's peak and
the arithmetic behind bench.py's 2080Ti-equivalent baseline constant.

Usage: python probes/flops_mfu.py [--measure]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Peak dense matmul throughput, FLOP/s.
PEAK = {
    "tpu_v5e_bf16": 197e12,  # one v5e chip
    "2080ti_fp32": 13.45e12,
    "2080ti_fp16": 26.9e12,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true", help="also time maps/s")
    args = p.parse_args()

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet

    from __graft_entry__ import _example_inputs

    B, V, H, W = 1, 5, 864, 1152
    model = TransMVSNet(ModelConfig(use_pallas=True, compute_dtype="bfloat16"))
    imgs, projs, dv = _example_inputs(B=B, V=V, H=H, W=W, num_hyp=192)
    t_imgs, t_projs, t_dv = _example_inputs(B=1, V=V, H=64, W=128, num_hyp=192)
    variables = model.init(
        jax.random.PRNGKey(0), t_imgs, t_projs, t_dv, train=False
    )

    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["depth"], out["photo_confidence"]

    compiled = jax.jit(forward).lower(variables, imgs, projs, dv).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", float("nan")))
    out = {
        "flops_per_map": flops,
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }
    if args.measure:
        from transmvsnet_tpu.utils_bench import timed_ms

        run_ms, _ = timed_ms(forward, variables, imgs, projs, dv, iters=8, warmup=2)
        maps_per_s = B * 1e3 / run_ms
        out["maps_per_s"] = round(maps_per_s, 3)
        out["mfu_v5e_bf16"] = round(flops * maps_per_s / PEAK["tpu_v5e_bf16"], 4)
    for name, peak in PEAK.items():
        # Throughput a perfectly-utilized chip would reach on these FLOPs.
        out[f"speed_of_light_maps_per_s_{name}"] = round(peak / flops, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
