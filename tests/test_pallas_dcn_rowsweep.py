"""Row-sweep DCN kernel vs the XLA deform_conv2d (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.ops.dcn import deform_conv2d
from transmvsnet_tpu.ops.pallas.dcn_rowsweep import deform_conv2d_rowsweep

from pallas_inputs import make_inputs


def smooth_offsets(B, H, W, K, amplitude=4.0, seed=0):
    """Spatially smooth offset fields — the row-sweep window contract:
    large magnitudes are fine, lane-local spread must be small (learned DCN
    offsets are smooth; iid-random fields are adversarial)."""
    rng = np.random.RandomState(seed)
    ys = np.arange(H)[None, :, None, None]
    xs = np.arange(W)[None, None, :, None]
    phase = rng.rand(1, 1, 1, K) * 6.28
    # lane-locally smooth: |d(offset)/dx| <= A*2*pi*f ~ 0.03/px
    f1 = rng.uniform(0.0004, 0.0008, (1, 1, 1, K))
    f2 = rng.uniform(0.0004, 0.0008, (1, 1, 1, K))
    field = amplitude * np.sin(2 * np.pi * (f1 * ys + f2 * xs) + phase)
    return jnp.asarray(np.broadcast_to(field, (B, H, W, K)).astype(np.float32))


class TestDCNRowSweep:
    @pytest.mark.parametrize("C,C_out", [(8, 8), (16, 8), (32, 32), (32, 16)])
    def test_matches_xla(self, C, C_out):
        x, dy, dx, mask, w, b = make_inputs(
            H=32, W=128, C=C, C_out=C_out, off_scale=0.0
        )
        dy = smooth_offsets(x.shape[0], 32, 128, 9, amplitude=1.5, seed=1)
        dx = smooth_offsets(x.shape[0], 32, 128, 9, amplitude=1.5, seed=2)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_rowsweep(x, dy, dx, mask, w, b, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_unpadded_width(self):
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=24, W=96, C=16, C_out=8, off_scale=0.0
        )
        dy = smooth_offsets(1, 24, 96, 9, amplitude=1.5, seed=3)
        dx = smooth_offsets(1, 24, 96, 9, amplitude=1.5, seed=4)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_rowsweep(x, dy, dx, mask, w, b, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_plain_conv_equivalence(self):
        x, dy, dx, mask, w, b = make_inputs(H=32, W=128, C=8, C_out=8)
        zero = jnp.zeros_like(dy)
        ones = jnp.ones_like(mask)
        expected = np.asarray(deform_conv2d(x, zero, zero, ones, w, b))
        got = np.asarray(
            deform_conv2d_rowsweep(x, zero, zero, ones, w, b, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
