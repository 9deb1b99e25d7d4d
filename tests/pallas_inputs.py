"""Shared random-input builder for the Pallas DCN kernel tests."""

import numpy as np
import jax.numpy as jnp


def make_inputs(B=2, H=16, W=24, C=8, C_out=8, K=9, seed=0, off_scale=2.0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, H, W, C).astype(np.float32)
    dy = (rng.randn(B, H, W, K) * off_scale).astype(np.float32)
    dx = (rng.randn(B, H, W, K) * off_scale).astype(np.float32)
    mask = rng.rand(B, H, W, K).astype(np.float32)
    w = (rng.randn(K, C, C_out) * 0.1).astype(np.float32)
    b = rng.randn(C_out).astype(np.float32)
    return map(jnp.asarray, (x, dy, dx, mask, w, b))
