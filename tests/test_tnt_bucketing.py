"""TnT loader shape bucketing (SURVEY §7 hard part 5, VERDICT item 9).

Two miniature TnT-layout scenes with different native resolutions and
ragged pair.txt source lists: the loader must emit a CONSTANT view count
(padding by repeating the best source, the general_eval contract) and at
most one image shape per resolution group — per-sample shape variance
would trigger an XLA recompile per sample on TPU.
"""

import os

import numpy as np
import pytest

from transmvsnet_tpu.data.cams import write_cam_file
from transmvsnet_tpu.data.datasets import TnTEvalDataset


def _materialize_tnt_scene(root, scan, wh, n_views, src_counts):
    """Write images/, cams_1/, pair.txt in the TnT on-disk layout."""
    import cv2

    w, h = wh
    scan_dir = os.path.join(root, scan)
    os.makedirs(os.path.join(scan_dir, "images"))
    os.makedirs(os.path.join(scan_dir, "cams_1"))
    rng = np.random.RandomState(0)
    for v in range(n_views):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(scan_dir, f"images/{v:0>8}.jpg"), img)
        pair = np.zeros((2, 4, 4), dtype=np.float32)
        pair[0] = np.eye(4)
        pair[0, 0, 3] = 0.1 * v
        pair[1, :3, :3] = [[4 * w, 0, 2 * w], [0, 4 * w, 2 * h], [0, 0, 1]]
        write_cam_file(
            os.path.join(scan_dir, f"cams_1/{v:0>8}_cam.txt"),
            pair,
            depth_line="2.0 10.0",
        )
    with open(os.path.join(scan_dir, "pair.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            others = [o for o in range(n_views) if o != v][: src_counts[v]]
            f.write(f"{v}\n{len(others)} ")
            f.write(" ".join(f"{o} {50.0}" for o in others) + "\n")


@pytest.fixture(scope="module")
def tnt_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tnt"))
    # Two resolution groups (both multiples of 32 so snapping is identity)
    # and ragged source lists (3, 1, 2, 3 and 2, 3, 1 sources).
    _materialize_tnt_scene(root, "MiniA", (96, 64), 4, [3, 1, 2, 3])
    _materialize_tnt_scene(root, "MiniB", (128, 64), 3, [2, 2, 1])
    TnTEvalDataset.IMAGE_SIZES = dict(
        TnTEvalDataset.IMAGE_SIZES, MiniA=(96, 64), MiniB=(128, 64)
    )
    return root


class TestTnTBucketing:
    def test_constant_view_count(self, tnt_root):
        ds = TnTEvalDataset(tnt_root, ["MiniA", "MiniB"], nviews=4, ndepths=16)
        for i in range(len(ds)):
            s = ds[i]
            assert s["imgs"].shape[0] == 4, i
            assert s["proj_matrices"]["stage1"].shape[0] == 4

    def test_one_shape_per_resolution_group(self, tnt_root):
        ds = TnTEvalDataset(tnt_root, ["MiniA", "MiniB"], nviews=4, ndepths=16)
        shapes = {ds[i]["imgs"].shape for i in range(len(ds))}
        assert shapes == {(4, 64, 96, 3), (4, 64, 128, 3)}, shapes

    def test_bucket_hw_forces_single_shape(self, tnt_root):
        ds = TnTEvalDataset(
            tnt_root,
            ["MiniA", "MiniB"],
            nviews=4,
            ndepths=16,
            bucket_hw=(64, 96),
        )
        shapes = {ds[i]["imgs"].shape for i in range(len(ds))}
        assert len(shapes) == 1, shapes

    def test_clipping_mode_preserved(self, tnt_root):
        """pad_views=False keeps the reference's per-sample clipping."""
        ds = TnTEvalDataset(
            tnt_root, ["MiniA"], nviews=4, ndepths=16, pad_views=False
        )
        counts = sorted(ds[i]["imgs"].shape[0] for i in range(len(ds)))
        assert counts == [2, 3, 4, 4]
