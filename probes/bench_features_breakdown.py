"""Where does the 1.11 s features+FMT block go? Component timings on TPU.

Times, at the DTU eval setting (864x1152, V=5, B=1):
  - each DCN rowsweep layer shape (9 layers across the 3 ARF heads),
  - FeatureNet.apply in full (pallas path),
  - FMTWithPathway.apply,
so the optimization target is data, not guesswork.
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
    print(f"{name:<52} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0], "dtype:", DTYPE)
    rng = np.random.RandomState(0)
    from transmvsnet_tpu.ops.pallas.dcn_rowsweep import deform_conv2d_rowsweep

    total_dcn = 0.0
    for name, H, W, C, Cout in [
        ("dcn rowsweep 216x288 32->32 (BV5)", 216, 288, 32, 32),
        ("dcn rowsweep 216x288 32->32 (BV5) b", 216, 288, 32, 32),
        ("dcn rowsweep 432x576 32->32 (BV5)", 432, 576, 32, 32),
        ("dcn rowsweep 432x576 32->16 (BV5)", 432, 576, 32, 16),
        ("dcn rowsweep 864x1152 32->32 (BV5)", 864, 1152, 32, 32),
        ("dcn rowsweep 864x1152 32->8 (BV5)", 864, 1152, 32, 8),
    ]:
        x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32))
        dy = jnp.asarray((rng.rand(5, H, W, 9) * 2 - 1).astype(np.float32))
        dx = jnp.asarray((rng.rand(5, H, W, 9) * 2 - 1).astype(np.float32))
        m = jnp.asarray(rng.rand(5, H, W, 9).astype(np.float32))
        w = jnp.asarray(rng.randn(9, C, Cout).astype(np.float32) * 0.1)
        ms = t(name, jax.jit(
            lambda a, b, c, d, e: deform_conv2d_rowsweep(a, b, c, d, e)
        ), x, dy, dx, m, w)
        mult = 2 if "b" in name[-1:] else 1
        total_dcn += ms * (2 if name.endswith("b") else 1)
    # heads have dcn0+dcn1 (32->32) + dcn2; the "b" line stands for the dup
    print(f"(sum of one-of-each above: {total_dcn:.1f} ms; real heads have 2x 32->32 per scale)")

    # --- FeatureNet full (pallas path) ---
    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.feature_net import FeatureNet

    fnet = FeatureNet(base_channels=8, use_pallas=True)
    imgs_t = jnp.asarray(rng.rand(5, 64, 128, 3).astype(np.float32)).astype(DTYPE)
    vars_f = fnet.init(jax.random.PRNGKey(0), imgs_t, False)
    imgs = jnp.asarray(rng.rand(5, 864, 1152, 3).astype(np.float32)).astype(DTYPE)
    f = jax.jit(lambda v, x: fnet.apply(v, x, False))
    t("FeatureNet full 864x1152 x5 (pallas)", f, vars_f, imgs)

    fnet_x = FeatureNet(base_channels=8, use_pallas=False)
    f2 = jax.jit(lambda v, x: fnet_x.apply(v, x, False))
    try:
        t("FeatureNet 216-only? skip", lambda *a: None)
    except Exception:
        pass

    # --- FMTWithPathway ---
    from transmvsnet_tpu.models.fmt import FMTWithPathway

    fmt = FMTWithPathway(base_channels=8)
    feats_t = {
        "stage1": jnp.asarray(rng.rand(1, 5, 16, 32, 32).astype(np.float32)).astype(DTYPE),
        "stage2": jnp.asarray(rng.rand(1, 5, 32, 64, 16).astype(np.float32)).astype(DTYPE),
        "stage3": jnp.asarray(rng.rand(1, 5, 64, 128, 8).astype(np.float32)).astype(DTYPE),
    }
    vars_m = fmt.init(jax.random.PRNGKey(0), feats_t)
    feats = {
        "stage1": jnp.asarray(rng.rand(1, 5, 216, 288, 32).astype(np.float32)).astype(DTYPE),
        "stage2": jnp.asarray(rng.rand(1, 5, 432, 576, 16).astype(np.float32)).astype(DTYPE),
        "stage3": jnp.asarray(rng.rand(1, 5, 864, 1152, 8).astype(np.float32)).astype(DTYPE),
    }
    g = jax.jit(lambda v, x: fmt.apply(v, x))
    t("FMTWithPathway (B1 V5, 216x288 tokens)", g, vars_m, feats)


if __name__ == "__main__":
    main()
