"""Row-sweep Pallas warp kernel vs the XLA implementation (interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.ops.geometry import fuse_projection
from transmvsnet_tpu.ops.warp import warp_correlate
from transmvsnet_tpu.ops.pallas.warp_rowsweep import warp_correlate_rowsweep

from test_geometry import make_cameras


def scene(B=1, H=32, W=128, C=8, D=6, seed=0):
    rng = np.random.RandomState(seed)
    cams = make_cameras(rng, n=2)
    cams[:, 1, :3, :3] *= 2.0
    src = rng.randn(B, H, W, C).astype(np.float32)
    ref = rng.randn(B, H, W, C).astype(np.float32)
    base = np.linspace(420.0, 900.0, D, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (B, D, H, W)).astype(np.float32)
    dv = dv + 5.0 * rng.rand(B, D, H, W).astype(np.float32)
    rp = fuse_projection(jnp.asarray(cams[0:1]))
    sp = fuse_projection(jnp.asarray(cams[1:2]))
    return jnp.asarray(src), jnp.asarray(ref), sp, rp, jnp.asarray(dv)


class TestRowSweep:
    @pytest.mark.parametrize("C", [8, 16, 32])
    def test_matches_xla(self, C):
        src, ref, sp, rp, dv = scene(C=C)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_rowsweep(src, ref, sp, rp, dv, interpret=True)
        )
        # The windowed kernel may drop a small fraction of extreme taps.
        close = np.isclose(got, expected, rtol=1e-4, atol=1e-4)
        assert close.mean() > 0.995, close.mean()
        np.testing.assert_allclose(
            np.median(np.abs(got - expected)), 0.0, atol=1e-5
        )

    def test_wide_image(self):
        src, ref, sp, rp, dv = scene(H=16, W=256, C=16, D=4)
        expected = np.asarray(warp_correlate(src, ref, sp, rp, dv))
        got = np.asarray(
            warp_correlate_rowsweep(src, ref, sp, rp, dv, interpret=True)
        )
        close = np.isclose(got, expected, rtol=1e-4, atol=1e-4)
        assert close.mean() > 0.995, close.mean()
