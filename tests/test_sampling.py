"""Parity tests for sampling ops against PyTorch (CPU) oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from transmvsnet_tpu.ops.sampling import (
    bilinear_sample,
    grid_sample,
    resize_bilinear,
    resize_nearest,
    upsample_nearest_2x,
)

RNG = np.random.RandomState(0)


def _rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


class TestGridSample:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_torch_align_corners_true(self, seed):
        rng = np.random.RandomState(seed)
        B, H, W, C = 2, 13, 17, 5
        img = rng.randn(B, H, W, C).astype(np.float32)
        # Grid spanning in-bounds and far out-of-bounds (incl. the reference's
        # -99 invalid marker, module.py:312-314).
        grid = rng.uniform(-1.6, 1.6, size=(B, 7, 11, 2)).astype(np.float32)
        grid[0, 0, 0] = (-99.0, -99.0)
        grid[0, 0, 1] = (1.0, 1.0)
        grid[0, 0, 2] = (-1.0, -1.0)

        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        ref = TF.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_pixel_coords_identity(self):
        img = _rand(1, 6, 8, 3)
        ys, xs = np.meshgrid(np.arange(6.0), np.arange(8.0), indexing="ij")
        out = np.asarray(
            bilinear_sample(
                jnp.asarray(img),
                jnp.asarray(xs[None].astype(np.float32)),
                jnp.asarray(ys[None].astype(np.float32)),
            )
        )
        np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)


class TestResize:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((16, 24), (64, 96)), ((64, 96), (16, 24)), ((13, 17), (29, 23)),
         ((216, 288), (864, 1152))],
    )
    def test_bilinear_matches_torch(self, in_hw, out_hw):
        B, C = 2, 3
        x = _rand(B, *in_hw, C)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (14, 18)), ((8, 8), (3, 5))])
    def test_nearest_matches_torch(self, in_hw, out_hw):
        x = _rand(1, *in_hw, 2)
        ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref)

    def test_upsample_nearest_2x_matches_torch(self):
        x = _rand(2, 5, 7, 3)
        ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref)
