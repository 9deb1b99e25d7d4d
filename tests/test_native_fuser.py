"""Native C++ fuser: build + fuse GT synthetic depths onto the known plane."""

import os

import numpy as np
import pytest

from transmvsnet_tpu.data.cams import write_cam_file
from transmvsnet_tpu.data.pfm import save_pfm
from transmvsnet_tpu.data.synthetic import SyntheticScene
from transmvsnet_tpu.fusion.native import ensure_built, native_fuse_scan
from transmvsnet_tpu.fusion.ply import read_ply


def _write_ppm(path, img):
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write((img * 255).astype(np.uint8).tobytes())


@pytest.fixture(scope="module")
def native_scan(tmp_path_factory):
    root = tmp_path_factory.mktemp("nativescan")
    scene = SyntheticScene(num_views=4, height=64, width=96)
    os.makedirs(root / "depth_est")
    os.makedirs(root / "cams")
    os.makedirs(root / "images")
    for v in range(scene.V):
        img, depth = scene.render(v)
        save_pfm(str(root / f"depth_est/{v:0>8}.pfm"), depth)
        pair = np.zeros((2, 4, 4), dtype=np.float32)
        pair[0] = scene.extrinsics[v]
        pair[1, :3, :3] = scene.K
        write_cam_file(str(root / f"cams/{v:0>8}_cam.txt"), pair, "1.0 0.01")
        _write_ppm(str(root / f"images/{v:0>8}.ppm"), img)
    with open(root / "pair.txt", "w") as f:
        f.write(f"{scene.V}\n")
        for v in range(scene.V):
            others = [o for o in range(scene.V) if o != v]
            f.write(f"{v}\n{len(others)} ")
            f.write(" ".join(f"{o} 10.0" for o in others) + "\n")
    return str(root), scene


class TestNativeFuser:
    def test_build(self):
        binary = ensure_built()
        assert os.path.exists(binary)

    def test_fuse_gt_depths(self, native_scan, tmp_path):
        root, scene = native_scan
        out = str(tmp_path / "native.ply")
        native_fuse_scan(root, out, disp_threshold=0.25, num_consistent=3)
        xyz, rgb = read_ply(out)
        assert len(xyz) > 3000
        residual = np.abs(xyz @ scene.n - scene.c)
        assert np.percentile(residual, 95) < 1e-2
        # Colors came from the PPM images (not all white).
        assert rgb is not None and rgb.std() > 5

    def test_rejects_inconsistent_view(self, native_scan, tmp_path):
        root, scene = native_scan
        import shutil

        bad = tmp_path / "bad"
        shutil.copytree(root, bad)
        _, depth = scene.render(0)
        save_pfm(str(bad / "depth_est/00000000.pfm"), depth * 2.0)
        out = str(tmp_path / "bad.ply")
        native_fuse_scan(str(bad), out, num_consistent=3)
        xyz, _ = read_ply(out)
        residual = np.abs(xyz @ scene.n - scene.c)
        assert np.percentile(residual, 95) < 2e-2
