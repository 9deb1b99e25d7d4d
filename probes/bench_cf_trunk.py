"""A/B the channels-first ARF trunk (FeatureNet cf_trunk) on hardware.

Round-5 trace finding (PERFORMANCE.md "FeatureNet composite"): ~4.3 ms of
reshapes plus ~3 ms x6 copies around the DCN custom calls are the NHWC <->
[B, H, C, W] lane-axis relayouts at every kernel boundary (the f32 dx
cotangents at C=8 lane-pad 16x). The cf trunk carries the kernel-native
layout across each ARF head's three DCN layers — one transpose in, one
out, per head.

Instrument: dependency-chained wall-clock dispatches (the timed_ms
fori_loop harness crashed the TPU worker on the FeatureNet fwd+bwd
composite — same class as the full train step; see PERFORMANCE.md
"Measurement rules"). Each iteration perturbs the input with the previous
iteration's scalar result so dispatches cannot overlap.

Stages: (1) compiled cf-vs-nhwc equivalence at 128x640 (catches kernel
faults distinctly from harness issues), (2) fwd and fwd+bwd timing at the
recipe shape [5, 512, 640, 3] bf16 for cf_trunk in {off, on}.

Usage: python probes/bench_cf_trunk.py [--eval-shape] [--skip-check]
"""

import os, sys, time

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.models.feature_net import FeatureNet


def equivalence_check():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 128, 640, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    outs = {}
    for cf in (False, True):
        feat = FeatureNet(8, use_pallas=True, cf_trunk=cf)
        fvars = feat.init(jax.random.PRNGKey(0), x[:1, :64, :128], False)
        out = feat.apply(fvars, x, False)
        outs[cf] = {k: np.asarray(v, np.float32) for k, v in out.items()}
    for k in outs[False]:
        a, b = outs[True][k], outs[False][k]
        scale = max(np.abs(b).max(), 1e-6)
        med = np.median(np.abs(a - b)) / scale
        mx = np.abs(a - b).max() / scale
        print(f"equiv {k}: max {mx:.2e} median {med:.2e}", flush=True)
        assert mx < 1e-2, (k, mx)
    print("equivalence_check OK", flush=True)


def chained_ms(fn, v, imgs, iters=6):
    """fn(v, imgs) -> scalar f32. Chains iterations via the scalar."""
    f = jax.jit(fn)
    c = f(v, imgs)
    c.block_until_ready()  # compile + warm
    c = f(v, imgs + c.astype(imgs.dtype) * 1e-12)
    float(c)
    t0 = time.time()
    for _ in range(iters):
        c = f(v, imgs + c.astype(imgs.dtype) * 1e-12)
    float(c)  # force the chain
    return (time.time() - t0) / iters * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    if "--skip-check" not in sys.argv:
        equivalence_check()

    H, W = (864, 1152) if "--eval-shape" in sys.argv else (512, 640)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(5, H, W, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )

    for cf in (False, True):
        feat = FeatureNet(8, use_pallas=True, cf_trunk=cf)
        fvars = feat.init(jax.random.PRNGKey(0), imgs[:1, :64, :128], False)

        def f_fwd(v, x):
            out, _ = feat.apply(v, x, True, mutable=["batch_stats"])
            return sum(
                jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values()
            )

        def f_both(v, x):
            loss, g = jax.value_and_grad(lambda vv: f_fwd(vv, x))(v)
            return loss + sum(
                jnp.sum(l.astype(jnp.float32) ** 2)
                for l in jax.tree_util.tree_leaves(g)
            )

        fwd_ms = chained_ms(f_fwd, fvars, imgs)
        both_ms = chained_ms(f_both, fvars, imgs)
        print(
            f"cf_trunk={int(cf)}  H{H}xW{W}  fwd {fwd_ms:8.2f} ms"
            f"   fwd+bwd {both_ms:8.2f} ms   bwd {both_ms - fwd_ms:8.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
