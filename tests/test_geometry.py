"""Geometry tests: homography warp vs a NumPy reprojection oracle and vs the
reference's warp math re-derived with torch grid_sample, plus depth-sample
schedule parity with the reference's upsample+trilinear composition."""

import numpy as np
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from transmvsnet_tpu.ops.geometry import (
    fuse_projection,
    warp_coords,
    initial_depth_samples,
    refine_depth_samples,
)
from transmvsnet_tpu.ops.warp import homo_warp, warp_correlate


def make_cameras(rng, n=2):
    """Random-ish but well-conditioned camera pairs looking at z>0."""
    cams = []
    for i in range(n):
        angle = 0.08 * i
        R = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ],
            dtype=np.float32,
        )
        t = np.array([0.3 * i, 0.05 * i, 0.1 * i], dtype=np.float32)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = t
        K = np.array(
            [[60.0, 0, 16.0], [0, 60.0, 12.0], [0, 0, 1]], dtype=np.float32
        )
        K4 = np.zeros((4, 4), dtype=np.float32)
        K4[:3, :3] = K
        cams.append(np.stack([E, K4]))
    return np.stack(cams)  # [n, 2, 4, 4]


def torch_homo_warp(src_fea_nchw, src_proj, ref_proj, depth_values):
    """Oracle: the reference warp math (module.py:284-322) in torch ops."""
    batch, channels = src_fea_nchw.shape[0], src_fea_nchw.shape[1]
    num_depth = depth_values.shape[1]
    height, width = src_fea_nchw.shape[2], src_fea_nchw.shape[3]
    with torch.no_grad():
        proj = torch.matmul(src_proj, torch.inverse(ref_proj))
        rot = proj[:, :3, :3]
        trans = proj[:, :3, 3:4]
        y, x = torch.meshgrid(
            torch.arange(0, height, dtype=torch.float32),
            torch.arange(0, width, dtype=torch.float32),
            indexing="ij",
        )
        y, x = y.reshape(height * width), x.reshape(height * width)
        xyz = torch.stack((x, y, torch.ones_like(x)))
        xyz = xyz.unsqueeze(0).repeat(batch, 1, 1)
        rot_xyz = torch.matmul(rot, xyz)
        rot_depth_xyz = rot_xyz.unsqueeze(2).repeat(
            1, 1, num_depth, 1
        ) * depth_values.view(batch, 1, num_depth, -1)
        proj_xyz = rot_depth_xyz + trans.view(batch, 3, 1, 1)
        invalid = (proj_xyz[:, 2:3] < 1e-6).squeeze(1)
        proj_xy = proj_xyz[:, :2] / proj_xyz[:, 2:3]
        px = proj_xy[:, 0] / ((width - 1) / 2) - 1
        px[invalid] = -99.0
        py = proj_xy[:, 1] / ((height - 1) / 2) - 1
        py[invalid] = -99.0
        grid = torch.stack((px, py), dim=3)
    warped = TF.grid_sample(
        src_fea_nchw,
        grid.view(batch, num_depth * height, width, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    )
    return warped.view(batch, channels, num_depth, height, width)


class TestWarp:
    def test_homo_warp_matches_torch_oracle(self):
        rng = np.random.RandomState(1)
        H, W, C, D = 24, 32, 4, 6
        cams = make_cameras(rng)
        src_fea = rng.randn(1, H, W, C).astype(np.float32)
        depths = np.linspace(4.0, 8.0, D, dtype=np.float32)
        depth_values = np.broadcast_to(
            depths[None, :, None, None], (1, D, H, W)
        ).astype(np.float32)

        ref_p = fuse_projection(jnp.asarray(cams[0:1]))
        src_p = fuse_projection(jnp.asarray(cams[1:2]))
        ours = np.asarray(
            homo_warp(jnp.asarray(src_fea), src_p, ref_p, jnp.asarray(depth_values))
        )  # [B, D, H, W, C]

        def np_fused(c):
            E, K = c[0], c[1]
            P = E.copy()
            P[:3, :] = K[:3, :3] @ E[:3, :]
            return P

        oracle = torch_homo_warp(
            torch.from_numpy(src_fea).permute(0, 3, 1, 2),
            torch.from_numpy(np_fused(cams[1]))[None],
            torch.from_numpy(np_fused(cams[0]))[None],
            torch.from_numpy(depth_values),
        ).numpy()  # [B, C, D, H, W]
        np.testing.assert_allclose(
            ours, oracle.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-4
        )

    def test_identity_warp_recovers_features_at_true_depth(self):
        """Same camera for src and ref: warp at any depth is the identity."""
        rng = np.random.RandomState(2)
        H, W, C = 16, 20, 3
        cams = make_cameras(rng, n=1)
        fea = rng.randn(1, H, W, C).astype(np.float32)
        depth_values = np.full((1, 2, H, W), 5.0, dtype=np.float32)
        p = fuse_projection(jnp.asarray(cams[0:1]))
        out = np.asarray(homo_warp(jnp.asarray(fea), p, p, jnp.asarray(depth_values)))
        for d in range(2):
            np.testing.assert_allclose(out[:, d], fea, rtol=1e-3, atol=1e-3)

    def test_warp_correlate_equals_explicit(self):
        rng = np.random.RandomState(3)
        H, W, C, D = 12, 16, 8, 4
        cams = make_cameras(rng)
        src = rng.randn(1, H, W, C).astype(np.float32)
        ref = rng.randn(1, H, W, C).astype(np.float32)
        dv = np.broadcast_to(
            np.linspace(4, 7, D, dtype=np.float32)[None, :, None, None], (1, D, H, W)
        ).astype(np.float32)
        rp = fuse_projection(jnp.asarray(cams[0:1]))
        sp = fuse_projection(jnp.asarray(cams[1:2]))
        warped = homo_warp(jnp.asarray(src), sp, rp, jnp.asarray(dv))
        expected = np.asarray(warped * jnp.asarray(ref)[:, None]).mean(-1)
        got = np.asarray(
            warp_correlate(jnp.asarray(src), jnp.asarray(ref), sp, rp, jnp.asarray(dv))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


class TestDepthSamples:
    def test_initial_matches_reference_formula(self):
        hyp = np.linspace(425.0, 931.45, 192, dtype=np.float32)[None]
        out = np.asarray(initial_depth_samples(jnp.asarray(hyp), 48, (8, 10)))
        assert out.shape == (1, 48, 8, 10)
        expected = np.linspace(425.0, 931.45, 48, dtype=np.float32)
        np.testing.assert_allclose(out[0, :, 3, 4], expected, rtol=1e-5)

    def test_refine_matches_torch_composition(self):
        """Our collapsed resize must equal upsample→window→trilinear-resize."""
        rng = np.random.RandomState(4)
        B, hp, wp = 2, 6, 8
        full_hw = (24, 32)
        stage_hw = (12, 16)
        ndepth, interval = 8, 2.5
        prev = (500 + 50 * rng.rand(B, hp, wp)).astype(np.float32)

        ours = np.asarray(
            refine_depth_samples(jnp.asarray(prev), ndepth, interval, stage_hw, full_hw)
        )

        t_prev = torch.from_numpy(prev)
        cur = TF.interpolate(
            t_prev.unsqueeze(1), list(full_hw), mode="bilinear", align_corners=False
        ).squeeze(1)
        cmin = cur - ndepth / 2 * interval
        cmax = cur + ndepth / 2 * interval
        step = (cmax - cmin) / (ndepth - 1)
        samples = cmin.unsqueeze(1) + torch.arange(ndepth, dtype=torch.float32).view(
            1, -1, 1, 1
        ) * step.unsqueeze(1)
        resized = TF.interpolate(
            samples.unsqueeze(1),
            [ndepth, stage_hw[0], stage_hw[1]],
            mode="trilinear",
            align_corners=False,
        ).squeeze(1)
        np.testing.assert_allclose(ours, resized.numpy(), rtol=1e-4, atol=1e-3)
