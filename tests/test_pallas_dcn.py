"""Pallas DCN kernel vs the XLA deform_conv2d (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.ops.dcn import deform_conv2d
from transmvsnet_tpu.ops.pallas.dcn_kernel import deform_conv2d_pallas


def make_inputs(B=2, H=16, W=24, C=8, C_out=8, K=9, seed=0, off_scale=2.0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, H, W, C).astype(np.float32)
    dy = (rng.randn(B, H, W, K) * off_scale).astype(np.float32)
    dx = (rng.randn(B, H, W, K) * off_scale).astype(np.float32)
    mask = rng.rand(B, H, W, K).astype(np.float32)
    w = (rng.randn(K, C, C_out) * 0.1).astype(np.float32)
    b = rng.randn(C_out).astype(np.float32)
    return map(jnp.asarray, (x, dy, dx, mask, w, b))


class TestPallasDCN:
    @pytest.mark.parametrize("C,C_out", [(8, 8), (16, 8), (32, 32), (32, 16)])
    def test_matches_xla(self, C, C_out):
        x, dy, dx, mask, w, b = make_inputs(C=C, C_out=C_out, off_scale=1.5)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_pallas(x, dy, dx, mask, w, b, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_zero_offsets_zero_mask(self):
        """Zero offsets + unit mask reduce to a plain 3x3 conv; zero mask
        kills everything but the bias."""
        x, dy, dx, mask, w, b = make_inputs(C=8, C_out=8)
        zero = jnp.zeros_like(dy)
        ones = jnp.ones_like(mask)
        expected = np.asarray(deform_conv2d(x, zero, zero, ones, w, b))
        got = np.asarray(
            deform_conv2d_pallas(x, zero, zero, ones, w, b, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

        got0 = np.asarray(
            deform_conv2d_pallas(
                x, zero, zero, jnp.zeros_like(mask), w, b, interpret=True
            )
        )
        np.testing.assert_allclose(
            got0, np.broadcast_to(np.asarray(b), got0.shape), atol=1e-5
        )

    def test_nonsquare_with_padding_tail(self):
        x, dy, dx, mask, w, b = make_inputs(B=1, H=20, W=28, C=16, C_out=8)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_pallas(x, dy, dx, mask, w, b, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
