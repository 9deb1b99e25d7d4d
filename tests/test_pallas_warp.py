"""Pallas warp-correlate kernel vs the XLA reference implementation
(interpret mode on CPU; the TPU run is exercised by microbench/bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.ops.geometry import fuse_projection
from transmvsnet_tpu.ops.warp import warp_correlate
from transmvsnet_tpu.ops.pallas.warp_kernel import (
    band_overflow,
    warp_correlate_pallas,
)

from test_geometry import make_cameras


def scene(B=1, H=32, W=64, C=8, D=8, seed=0, depth_lo=420.0, depth_hi=900.0):
    rng = np.random.RandomState(seed)
    cams = make_cameras(rng, n=2)
    # Scale the toy cameras to a DTU-ish depth range.
    cams[:, 1, :3, :3] *= 2.0
    src = rng.randn(B, H, W, C).astype(np.float32)
    ref = rng.randn(B, H, W, C).astype(np.float32)
    base = np.linspace(depth_lo, depth_hi, D, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (B, D, H, W)).astype(np.float32)
    # per-pixel wobble like refined stage hypotheses
    dv = dv + 5.0 * rng.rand(B, D, H, W).astype(np.float32)
    rp = fuse_projection(jnp.asarray(cams[0:1]))
    sp = fuse_projection(jnp.asarray(cams[1:2]))
    return jnp.asarray(src), jnp.asarray(ref), sp, rp, jnp.asarray(dv)


class TestPallasWarpCorrelate:
    @pytest.mark.parametrize("C", [8, 16, 32])
    def test_matches_xla_implementation(self, C):
        src, ref, sp, rp, dv = scene(C=C)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_pallas(src, ref, sp, rp, dv, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_nonsquare_and_padding_tail(self):
        # H*W not divisible by the block size exercises the pad path.
        src, ref, sp, rp, dv = scene(H=24, W=40, C=16, D=4)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_pallas(src, ref, sp, rp, dv, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_band_overflow_negligible_on_mvs_geometry(self):
        src, ref, sp, rp, dv = scene(H=64, W=96, C=8, D=8)
        from transmvsnet_tpu.ops.geometry import relative_projection

        rel = np.asarray(relative_projection(sp, rp))[0, :3, :]
        frac = band_overflow((64, 96), rel, np.asarray(dv)[0])
        assert frac < 1e-3, frac
