"""Data-layer tests: PFM IO, camera parsing, synthetic scene photoconsistency,
sharded loader contract."""

import os

import numpy as np
import jax.numpy as jnp

from transmvsnet_tpu.data.pfm import read_pfm, save_pfm
from transmvsnet_tpu.data.cams import (
    read_cam_file,
    read_pair_file,
    write_cam_file,
)
from transmvsnet_tpu.data.synthetic import SyntheticDataset, SyntheticScene
from transmvsnet_tpu.data.loader import ShardedLoader
from transmvsnet_tpu.ops.geometry import fuse_projection
from transmvsnet_tpu.ops.warp import homo_warp


class TestPFM:
    def test_roundtrip(self, tmp_path):
        img = np.random.RandomState(0).rand(13, 17).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        save_pfm(p, img)
        back, scale = read_pfm(p)
        np.testing.assert_array_equal(back, img)
        assert scale == 1.0

    def test_color_roundtrip(self, tmp_path):
        img = np.random.RandomState(1).rand(5, 7, 3).astype(np.float32)
        p = str(tmp_path / "c.pfm")
        save_pfm(p, img)
        back, _ = read_pfm(p)
        np.testing.assert_array_equal(back, img)

    def test_header_bytes(self, tmp_path):
        """Golden header: Pf, dims, negative scale on little-endian."""
        img = np.zeros((2, 3), dtype=np.float32)
        p = str(tmp_path / "h.pfm")
        save_pfm(p, img)
        raw = open(p, "rb").read()
        assert raw.startswith(b"Pf\n3 2\n-1.000000\n")


class TestCams:
    def test_cam_file_roundtrip(self, tmp_path):
        pair = np.zeros((2, 4, 4), dtype=np.float32)
        pair[0] = np.eye(4)
        pair[0, :3, 3] = [1, 2, 3]
        pair[1, :3, :3] = [[100, 0, 50], [0, 100, 40], [0, 0, 1]]
        p = str(tmp_path / "cam.txt")
        write_cam_file(p, pair, depth_line="425.0 2.5")
        cam = read_cam_file(p, "dtu_train", interval_scale=1.06)
        np.testing.assert_allclose(cam.extrinsics, pair[0], atol=1e-5)
        np.testing.assert_allclose(cam.intrinsics, pair[1, :3, :3], atol=1e-3)
        assert abs(cam.depth_min - 425.0) < 1e-6
        assert abs(cam.depth_interval - 2.5 * 1.06) < 1e-6

    def test_minmax_convention(self, tmp_path):
        pair = np.zeros((2, 4, 4), dtype=np.float32)
        pair[0] = np.eye(4)
        pair[1, :3, :3] = np.eye(3) * 4  # /4 at read -> identity
        p = str(tmp_path / "cam.txt")
        write_cam_file(p, pair, depth_line="2.0 10.0")
        cam = read_cam_file(p, "minmax", ndepths=192)
        assert abs(cam.depth_interval - 8.0 / 192) < 1e-6
        assert cam.depth_max == 10.0

    def test_pair_file(self, tmp_path):
        p = str(tmp_path / "pair.txt")
        with open(p, "w") as f:
            f.write("2\n0\n2 1 50.0 2 25.0\n1\n0\n")
        pairs = read_pair_file(p)
        assert pairs == [(0, [1, 2])]  # empty-src entry dropped


class TestSynthetic:
    def test_photoconsistency_via_homo_warp(self):
        """Warping a source view at the ref GT depth must reproduce the ref
        image — validates cameras, depth, and the warp jointly."""
        scene = SyntheticScene(num_views=3, height=48, width=64)
        ref_img, ref_depth = scene.render(0)
        src_img, _ = scene.render(1)

        pair = np.zeros((2, 2, 4, 4), dtype=np.float32)
        for k, v in enumerate([0, 1]):
            pair[k, 0] = scene.extrinsics[v]
            pair[k, 1, :3, :3] = scene.K
        ref_p = fuse_projection(jnp.asarray(pair[0:1]))
        src_p = fuse_projection(jnp.asarray(pair[1:2]))
        dv = jnp.asarray(ref_depth[None, None])  # [1, 1, H, W]
        warped = np.asarray(
            homo_warp(jnp.asarray(src_img[None]), src_p, ref_p, dv)
        )[0, 0]
        valid = (np.abs(warped).sum(-1) > 1e-6)  # in-frame
        assert valid.mean() > 0.5
        err = np.abs(warped - ref_img)[valid]
        assert err.mean() < 0.03  # bilinear resampling error on smooth texture

    def test_dataset_contract(self):
        ds = SyntheticDataset(nviews=4, ndepths=16, num_samples=2, height=32, width=48)
        s = ds[0]
        assert s["imgs"].shape == (4, 32, 48, 3)
        assert s["proj_matrices"]["stage1"].shape == (4, 2, 4, 4)
        assert s["depth_values"].shape == (16,)
        assert s["depth"]["stage1"].shape == (8, 12)
        assert s["mask"]["stage3"].shape == (32, 48)
        d = s["depth"]["stage3"]
        assert s["depth_values"][0] < d.min() and d.max() < s["depth_values"][-1]

    def test_materialize_and_reload(self, tmp_path):
        from transmvsnet_tpu.data.datasets import GeneralEvalDataset

        ds = SyntheticDataset(nviews=3, ndepths=16, num_samples=1, height=64, width=96)
        ds.materialize(str(tmp_path))
        eval_ds = GeneralEvalDataset(
            str(tmp_path), ["synth0"], nviews=3, ndepths=16, max_h=64, max_w=96
        )
        assert len(eval_ds) == 3
        s = eval_ds[0]
        assert s["imgs"].shape == (3, 64, 96, 3)
        assert s["depth_values"].shape == (16,)


class TestLoader:
    def _mini_dataset(self, n=10):
        class DS:
            def __len__(self):
                return n

            def __getitem__(self, i):
                return {"x": np.full((2,), i, dtype=np.float32)}

        return DS()

    def test_sharding_partitions_all_indices(self):
        ds = self._mini_dataset(10)
        seen = []
        for shard in range(4):
            loader = ShardedLoader(
                ds, batch_size=1, num_shards=4, shard_id=shard, num_workers=0
            )
            for batch in loader:
                seen.append(int(batch["x"][0, 0]))
        assert len(seen) == 12  # padded to equal shards (ceil(10/4)*4)
        assert set(seen) == set(range(10))

    def test_shuffle_changes_with_epoch(self):
        ds = self._mini_dataset(8)
        loader = ShardedLoader(ds, batch_size=8, shuffle=True, num_workers=0)
        loader.set_epoch(0)
        a = next(iter(loader))["x"][:, 0].tolist()
        loader.set_epoch(1)
        b = next(iter(loader))["x"][:, 0].tolist()
        assert a != b
        assert sorted(a) == sorted(b)

    def test_batch_stacking_nested(self):
        class DS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return {
                    "a": np.ones((3,)) * i,
                    "nested": {"b": np.zeros((2, 2))},
                    "name": f"s{i}",
                }

        loader = ShardedLoader(DS(), batch_size=2, num_workers=2)
        batch = next(iter(loader))
        assert batch["a"].shape == (2, 3)
        assert batch["nested"]["b"].shape == (2, 2, 2)
        assert batch["name"] == ["s0", "s1"]
