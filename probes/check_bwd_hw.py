"""Hardware smoke test for the Pallas backward kernels.

Runs warp_bwd / dcn_bwd compiled on the TPU at small shapes and compares
against their own interpret-mode executions (which tests pin to the XLA
gradients). Checks the Mosaic-sensitive constructs: A·Bᵀ dot_general,
input_output_aliases zero-init, dynamic-sublane VMEM RMW, window DMAs.

  python probes/check_bwd_hw.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.makedirs(".jax_cache", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))

import jax.numpy as jnp
import numpy as np

from pallas_inputs import make_inputs
from test_pallas_dcn_rowsweep import smooth_offsets
from test_pallas_wsum import _inputs as wsum_inputs

from transmvsnet_tpu.ops.pallas.dcn_bwd import deform_conv2d_bwd
from transmvsnet_tpu.ops.pallas.warp_bwd import warp_correlate_wsum_bwd


def compare(name, hw, it):
    ok = True
    for i, (a, b) in enumerate(zip(hw, it)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        close = np.isclose(a / scale, b / scale, rtol=0, atol=3e-2)
        med = np.median(np.abs(a - b)) / scale
        print(f"  {name}[{i}]: close={close.mean():.4f} med={med:.2e} max|b|={scale:.3e}")
        ok &= close.mean() > 0.995
    return ok


def main():
    print("device:", jax.devices()[0])

    # --- warp wsum backward ---
    src, ref, sp, rp, dv, vw = wsum_inputs(B=1, S=3, H=16, W=128, C=8, D=4)
    g = jnp.asarray(np.random.RandomState(7).rand(1, 4, 16, 128).astype(np.float32))
    hw = jax.tree.map(lambda x: np.asarray(x), warp_correlate_wsum_bwd(src, ref, sp, rp, dv, vw, g))
    it = warp_correlate_wsum_bwd(src, ref, sp, rp, dv, vw, g, interpret=True)
    ok1 = compare("warp_wsum_bwd", hw, it)

    # C=32 exercises the per-dr (non-stacked) branch.
    src, ref, sp, rp, dv, vw = wsum_inputs(B=1, S=2, H=16, W=128, C=32, D=4)
    g = jnp.asarray(np.random.RandomState(8).rand(1, 4, 16, 128).astype(np.float32))
    hw = jax.tree.map(lambda x: np.asarray(x), warp_correlate_wsum_bwd(src, ref, sp, rp, dv, vw, g))
    it = warp_correlate_wsum_bwd(src, ref, sp, rp, dv, vw, g, interpret=True)
    ok2 = compare("warp_wsum_bwd C32", hw, it)

    # --- dcn backward ---
    x, dy, dx, mask, w, b = make_inputs(B=2, H=32, W=128, C=8, C_out=8, off_scale=0.0)
    dy = jnp.round(smooth_offsets(2, 32, 128, 9, 1.5, seed=1) * 8) / 8
    dx = jnp.round(smooth_offsets(2, 32, 128, 9, 1.5, seed=2) * 8) / 8
    g = jnp.asarray(np.random.RandomState(9).rand(2, 32, 128, 8).astype(np.float32))
    hw = jax.tree.map(lambda t: np.asarray(t), deform_conv2d_bwd(x, dy, dx, mask, w, g))
    it = deform_conv2d_bwd(x, dy, dx, mask, w, g, interpret=True)
    ok3 = compare("dcn_bwd", hw, it)

    x, dy, dx, mask, w, b = make_inputs(B=1, H=16, W=256, C=32, C_out=32, off_scale=0.0)
    dy = jnp.round(smooth_offsets(1, 16, 256, 9, 1.5, seed=3) * 8) / 8
    dx = jnp.round(smooth_offsets(1, 16, 256, 9, 1.5, seed=4) * 8) / 8
    g = jnp.asarray(np.random.RandomState(10).rand(1, 16, 256, 32).astype(np.float32))
    hw = jax.tree.map(lambda t: np.asarray(t), deform_conv2d_bwd(x, dy, dx, mask, w, g))
    it = deform_conv2d_bwd(x, dy, dx, mask, w, g, interpret=True)
    ok4 = compare("dcn_bwd C32", hw, it)

    print("ALL OK" if (ok1 and ok2 and ok3 and ok4) else "MISMATCH")


if __name__ == "__main__":
    main()
