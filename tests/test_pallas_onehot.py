"""One-hot MXU Pallas kernels vs the XLA implementations (interpret).

The one-hot variants carry a bf16 feature/weight data path (the model's
bf16 compute mode), so comparisons use bf16-scale tolerances.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.ops.geometry import fuse_projection
from transmvsnet_tpu.ops.warp import warp_correlate
from transmvsnet_tpu.ops.pallas.warp_onehot import warp_correlate_onehot

from test_geometry import make_cameras
from test_pallas_rowsweep import scene


from transmvsnet_tpu.ops.dcn import deform_conv2d
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot

from pallas_inputs import make_inputs
from test_pallas_dcn_rowsweep import smooth_offsets


class TestDCNOnehot:
    @pytest.mark.parametrize("C,C_out", [(8, 8), (32, 32), (32, 16)])
    def test_matches_xla(self, C, C_out):
        x, dy, dx, mask, w, b = make_inputs(
            H=32, W=128, C=C, C_out=C_out, off_scale=0.0
        )
        dy = smooth_offsets(x.shape[0], 32, 128, 9, amplitude=1.5, seed=1)
        dx = smooth_offsets(x.shape[0], 32, 128, 9, amplitude=1.5, seed=2)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_onehot(x, dy, dx, mask, w, b, interpret=True)
        )
        # bf16 feature/weight payload: scale tolerances to the output range.
        scale = np.abs(expected).max()
        np.testing.assert_allclose(
            got / scale, expected / scale, rtol=0, atol=4e-2
        )
        assert np.median(np.abs(got - expected)) < 2e-2 * scale

    def test_windowed_width_w384(self):
        # W=384 > XW=256: the windowed x-window branch (and double-buffered
        # DMA path) that all production shapes run through. Comparison
        # excludes the chunk-boundary lanes (x % 128 in {125,126,127})
        # where the snapped window legitimately drops the +1 tap — the
        # truncation contract stated in the kernel docstrings.
        W = 384
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=16, W=W, C=8, C_out=8, off_scale=0.0
        )
        dy = smooth_offsets(1, 16, W, 9, amplitude=1.0, seed=7)
        dx = smooth_offsets(1, 16, W, 9, amplitude=1.0, seed=8)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_onehot(x, dy, dx, mask, w, b, interpret=True)
        )
        keep = ~np.isin(np.arange(W) % 128, (125, 126, 127))
        scale = np.abs(expected).max()
        np.testing.assert_allclose(
            got[:, :, keep] / scale, expected[:, :, keep] / scale,
            rtol=0, atol=4e-2,
        )
        assert np.median(np.abs(got - expected)) < 2e-2 * scale

    def test_unpadded_width(self):
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=24, W=96, C=16, C_out=8, off_scale=0.0
        )
        dy = smooth_offsets(1, 24, 96, 9, amplitude=1.5, seed=3)
        dx = smooth_offsets(1, 24, 96, 9, amplitude=1.5, seed=4)
        expected = np.asarray(deform_conv2d(x, dy, dx, mask, w, b))
        got = np.asarray(
            deform_conv2d_onehot(x, dy, dx, mask, w, b, interpret=True)
        )
        scale = np.abs(expected).max()
        np.testing.assert_allclose(
            got / scale, expected / scale, rtol=0, atol=4e-2
        )


class TestWarpOnehot:
    @pytest.mark.parametrize("C", [8, 16, 32])
    def test_matches_xla(self, C):
        src, ref, sp, rp, dv = scene(C=C)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_onehot(src, ref, sp, rp, dv, interpret=True)
        )
        # bf16 payload: |err| ~ 2^-8 relative to the C-mean of products of
        # unit-normal features.
        close = np.isclose(got, expected, rtol=3e-2, atol=3e-2)
        assert close.mean() > 0.995, close.mean()
        assert np.median(np.abs(got - expected)) < 5e-3

    def test_wide_image(self):
        src, ref, sp, rp, dv = scene(H=16, W=256, C=16, D=4)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_onehot(src, ref, sp, rp, dv, interpret=True)
        )
        close = np.isclose(got, expected, rtol=3e-2, atol=3e-2)
        assert close.mean() > 0.995, close.mean()

    def test_windowed_width_w512(self):
        # W=512 > XW=384: the windowed + double-buffered branch the
        # production warp shapes (W=640/1152) run through.
        src, ref, sp, rp, dv = scene(H=16, W=512, C=8, D=2)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_onehot(src, ref, sp, rp, dv, interpret=True)
        )
        close = np.isclose(got, expected, rtol=3e-2, atol=3e-2)
        assert close.mean() > 0.995, close.mean()
        assert np.median(np.abs(got - expected)) < 5e-3


class TestDCNOnehotFused:
    def _params(self, B=1, H=32, W=128, C=16, C_out=16, seed=5):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        k_off = jnp.asarray(rng.randn(3, 3, C, 27).astype(np.float32) * 0.05)
        b_off = jnp.asarray(rng.randn(27).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.randn(9, C, C_out).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C_out).astype(np.float32) * 0.1)
        return x, k_off, b_off, w, b

    @staticmethod
    def _offsets_xla(x, k_off, b_off):
        """The DCN module's offset prelude (reference models/dcn.py:62-70)."""
        off = jax.lax.conv_general_dilated(
            x, k_off.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_off.astype(x.dtype)
        o1, o2, m = jnp.split(off, 3, axis=-1)
        cat = jnp.concatenate([o1, o2], axis=-1)
        return cat[..., 0::2], cat[..., 1::2], jax.nn.sigmoid(m)

    @pytest.mark.parametrize("C,C_out,H,W", [(16, 16, 32, 128), (32, 8, 24, 96)])
    def test_fused_matches_composed(self, C, C_out, H, W):
        import jax

        from transmvsnet_tpu.ops.pallas.dcn_onehot import (
            deform_conv2d_onehot_fused,
        )

        x, k_off, b_off, w, b = self._params(H=H, W=W, C=C, C_out=C_out)
        xb = x.astype(jnp.bfloat16)
        dy, dx, m = self._offsets_xla(xb, k_off, b_off)
        composed = np.asarray(
            deform_conv2d_onehot(
                xb, dy.astype(jnp.float32), dx.astype(jnp.float32),
                m.astype(jnp.float32), w, b, interpret=True,
            ),
            np.float32,
        )
        fused = np.asarray(
            deform_conv2d_onehot_fused(
                xb, k_off, b_off, w, b, interpret=True
            ),
            np.float32,
        )
        # The in-kernel bf16 conv and XLA's bf16 conv round offsets
        # slightly differently; where an offset sits on an integer
        # boundary the floor() flips and isolated pixels sample different
        # taps — compare by close-fraction like the warp kernel tests.
        scale = np.abs(composed).max()
        close = np.isclose(
            fused / scale, composed / scale, rtol=0, atol=4e-2
        )
        assert close.mean() > 0.995, close.mean()
        assert np.median(np.abs(fused - composed)) < 1e-2 * scale

    @pytest.mark.parametrize("W", [128, 96])  # 96 exercises the W-pad path
    def test_fused_io_cf_matches_nhwc(self, W):
        """The channels-first I/O path is the same kernel behind transposed
        wrappers — outputs must match the NHWC path exactly."""
        from transmvsnet_tpu.ops.pallas.dcn_onehot import (
            deform_conv2d_onehot_fused,
        )

        x, k_off, b_off, w, b = self._params(H=16, W=W, C=16, C_out=8)
        xb = x.astype(jnp.bfloat16)
        out_nhwc = np.asarray(
            deform_conv2d_onehot_fused(xb, k_off, b_off, w, b, interpret=True),
            np.float32,
        )
        out_cf = np.asarray(
            deform_conv2d_onehot_fused(
                xb.transpose(0, 1, 3, 2), k_off, b_off, w, b,
                interpret=True, io_cf=True,
            ),
            np.float32,
        )
        np.testing.assert_allclose(
            out_cf.transpose(0, 1, 3, 2), out_nhwc, rtol=0, atol=0
        )
