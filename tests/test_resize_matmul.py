"""Matmul-formulated resizes must match the gather formulation exactly.

On TPU, resizes run as small dense matmuls (static-index gathers are
serial there); both paths implement torch interpolate semantics
(reference models/TransMVSNet.py:176-178, models/FMT.py:209).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from transmvsnet_tpu.ops.sampling import resize_bilinear, resize_nearest


@pytest.mark.parametrize(
    "shape,out_hw",
    [
        ((2, 27, 36, 3), (54, 72)),
        ((2, 54, 72, 3), (27, 36)),
        ((1, 16, 20, 8), (24, 30)),
        ((1, 16, 20, 4), (16, 30)),  # one axis unchanged
        ((1, 17, 19, 2), (23, 29)),  # non-integral ratios
    ],
)
def test_bilinear_matmul_matches_gather(shape, out_hw):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    a = resize_bilinear(x, out_hw, via="gather")
    b = resize_bilinear(x, out_hw, via="matmul")
    # fp reassociation only: the matmul accumulates the two taps (plus
    # zeros) in a different order than the gather-lerp.
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize(
    "shape,out_hw",
    [((2, 27, 36, 3), (54, 72)), ((1, 54, 72, 2), (27, 36)), ((1, 17, 19, 2), (23, 29))],
)
def test_nearest_matmul_matches_gather(shape, out_hw):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    a = resize_nearest(x, out_hw, via="gather")
    b = resize_nearest(x, out_hw, via="matmul")
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
