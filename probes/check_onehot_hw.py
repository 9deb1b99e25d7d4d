"""Hardware vs interpret bit-exactness check for the one-hot kernels."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_onehot
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)

    # warp: modest shape, real-ish projection
    H, W, C, D = 64, 160, 32, 8
    src = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
    ref = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
    proj = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
    proj2 = proj.copy()
    proj2[:, 0, 3] = 7.0
    proj2[:, 1, 3] = -3.0
    dv = jnp.asarray(
        np.broadcast_to(
            np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
            (2, D, H, W),
        ).copy()
    )
    hw = warp_correlate_onehot(src, ref, jnp.asarray(proj2), jnp.asarray(proj), dv)
    it = warp_correlate_onehot(
        src, ref, jnp.asarray(proj2), jnp.asarray(proj), dv, interpret=True
    )
    diff = np.abs(np.asarray(hw) - np.asarray(it)).max()
    print(f"warp_onehot   max|hw - interpret| = {diff:.3e}")
    assert diff == 0.0, "warp onehot not bit-exact on hardware"

    # dcn
    H, W, C, Cout = 64, 160, 32, 16
    x = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
    dy = jnp.asarray((rng.rand(2, H, W, 9) * 2 - 1).astype(np.float32))
    dx = jnp.asarray((rng.rand(2, H, W, 9) * 2 - 1).astype(np.float32))
    m = jnp.asarray(rng.rand(2, H, W, 9).astype(np.float32))
    w = jnp.asarray(rng.randn(9, C, Cout).astype(np.float32) * 0.1)
    hw = deform_conv2d_onehot(x, dy, dx, m, w)
    it = deform_conv2d_onehot(x, dy, dx, m, w, interpret=True)
    diff = np.abs(np.asarray(hw) - np.asarray(it)).max()
    print(f"dcn_onehot    max|hw - interpret| = {diff:.3e}")
    assert diff == 0.0, "dcn onehot not bit-exact on hardware"
    print("OK")


if __name__ == "__main__":
    main()
