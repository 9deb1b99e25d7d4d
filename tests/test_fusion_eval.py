"""End-to-end fusion + evaluation on the synthetic scene: GT depth maps fuse
into a point cloud lying on the known plane; the DTU-style evaluator reports
near-zero accuracy/completeness against plane samples."""

import os

import numpy as np
import pytest

from transmvsnet_tpu.data.cams import write_cam_file
from transmvsnet_tpu.data.pfm import save_pfm
from transmvsnet_tpu.data.synthetic import SyntheticScene
from transmvsnet_tpu.fusion.dynamic import FusionParams, fuse_scan
from transmvsnet_tpu.fusion.ply import read_ply, write_ply
from transmvsnet_tpu.eval.dtu_eval import (
    evaluate_point_cloud,
    nn_distances,
    reduce_points,
)


@pytest.fixture(scope="module")
def scan_dir(tmp_path_factory):
    """Materialize GT depth + confidence + cams for one synthetic scene."""
    root = tmp_path_factory.mktemp("synthscan")
    scene = SyntheticScene(num_views=4, height=64, width=96)
    import cv2

    os.makedirs(root / "depth_est")
    os.makedirs(root / "confidence")
    os.makedirs(root / "cams")
    os.makedirs(root / "images")
    for v in range(scene.V):
        img, depth = scene.render(v)
        save_pfm(str(root / f"depth_est/{v:0>8}.pfm"), depth)
        save_pfm(str(root / f"confidence/{v:0>8}.pfm"), np.ones_like(depth))
        pair = np.zeros((2, 4, 4), dtype=np.float32)
        pair[0] = scene.extrinsics[v]
        pair[1, :3, :3] = scene.K
        write_cam_file(str(root / f"cams/{v:0>8}_cam.txt"), pair, "1.0 0.01")
        cv2.imwrite(
            str(root / f"images/{v:0>8}.jpg"),
            cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
    with open(root / "pair.txt", "w") as f:
        f.write(f"{scene.V}\n")
        for v in range(scene.V):
            others = [o for o in range(scene.V) if o != v]
            f.write(f"{v}\n{len(others)} ")
            f.write(" ".join(f"{o} {10.0}" for o in others) + "\n")
    return str(root), scene


class TestDynamicFusion:
    def test_gt_depths_fuse_onto_plane(self, scan_dir, tmp_path):
        root, scene = scan_dir
        out_ply = str(tmp_path / "fused.ply")
        xyz, rgb = fuse_scan(root, out_ply, FusionParams(photo_threshold=0.5, thres_view=2))
        assert len(xyz) > 2000, "fusion should accept most GT pixels"
        # All fused points must lie on the scene plane n·p = c.
        residual = np.abs(xyz @ scene.n - scene.c)
        assert np.percentile(residual, 95) < 1e-2, residual.max()
        # PLY round trip.
        back_xyz, back_rgb = read_ply(out_ply)
        np.testing.assert_allclose(back_xyz, xyz.astype(np.float32), atol=1e-5)
        assert back_rgb.shape == back_xyz.shape

    def test_corrupted_depth_is_rejected(self, scan_dir, tmp_path):
        """Poisoning one view's depth map must not poison the cloud."""
        root, scene = scan_dir
        import shutil

        bad_root = tmp_path / "bad"
        shutil.copytree(root, bad_root)
        _, depth = scene.render(0)
        save_pfm(str(bad_root / "depth_est/00000000.pfm"), depth * 1.5)
        xyz, _ = fuse_scan(
            str(bad_root), "", FusionParams(photo_threshold=0.5, thres_view=2)
        )
        residual = np.abs(xyz @ scene.n - scene.c)
        # Points from the poisoned ref view fail consistency; survivors stay
        # on the plane.
        assert np.percentile(residual, 90) < 2e-2


class TestEvaluator:
    def _plane_samples(self, scene, n=4000, seed=0):
        rng = np.random.RandomState(seed)
        # Sample the plane patch in front of the cameras.
        x = rng.uniform(-3, 3, n)
        y = rng.uniform(-2, 2, n)
        z = (scene.c - scene.n[0] * x - scene.n[1] * y) / scene.n[2]
        return np.stack([x, y, z], axis=1)

    def test_perfect_cloud_scores_near_zero(self, scan_dir, tmp_path):
        root, scene = scan_dir
        xyz, _ = fuse_scan(root, "", FusionParams(photo_threshold=0.5, thres_view=2))
        gt = self._plane_samples(scene)
        r = evaluate_point_cloud(
            xyz.astype(np.float64), gt, min_dist=0.02, reduce_data=True
        )
        assert r["acc_mean"] < 0.1
        assert r["overall"] < 0.3  # comp limited by GT sampling density

    def test_reduce_points_spacing(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(2000, 3)
        red = reduce_points(pts, min_dist=0.1)
        assert len(red) < len(pts)
        d = nn_distances(red, red, max_dist=10.0)
        # self-distance is 0; check pairwise min spacing via 2-NN
        from scipy.spatial import cKDTree

        dd, _ = cKDTree(red).query(red, k=2)
        assert dd[:, 1].min() >= 0.1 - 1e-9

    def test_nn_distances_cap(self):
        a = np.zeros((1, 3))
        b = np.array([[100.0, 0, 0]])
        assert nn_distances(a, b, max_dist=60.0)[0] == 60.0

    def test_known_offset_cloud(self):
        rng = np.random.RandomState(1)
        gt = rng.rand(5000, 3) * 10
        data = gt + np.array([0.05, 0, 0])
        r = evaluate_point_cloud(data, gt, min_dist=0.0, reduce_data=False)
        assert abs(r["acc_mean"] - 0.05) < 0.02
        assert abs(r["comp_mean"] - 0.05) < 0.02
