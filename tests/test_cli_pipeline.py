"""End-to-end CLI plumbing: materialized synthetic scene → inference CLI →
fusion CLI → (empty-tolerant) evaluation. Uses random weights — validates
the file contracts between stages, not reconstruction quality."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute CLI chains; run explicitly or in the full suite

from transmvsnet_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def synth_eval_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    ds = SyntheticDataset(nviews=4, ndepths=32, num_samples=1, height=64, width=96)
    ds.materialize(str(root))
    listfile = root / "list.txt"
    listfile.write_text("synth0\n")
    return str(root), str(listfile)


class TestInferFusePipeline:
    def test_infer_writes_contract_files(self, synth_eval_root, tmp_path):
        from transmvsnet_tpu.tools import infer

        root, listfile = synth_eval_root
        outdir = str(tmp_path / "out")
        infer.main(
            [
                "--datapath", root,
                "--testlist", listfile,
                "--outdir", outdir,
                "--num_view", "3",
                "--numdepth", "32",
                "--max_h", "64",
                "--max_w", "96",
                "--ndepths", "16,8,8",
            ]
        )
        for view in range(4):
            for sub, suffix in [
                ("depth_est", ".pfm"),
                ("confidence", ".pfm"),
                ("cams", "_cam.txt"),
                ("images", ".jpg"),
            ]:
                p = os.path.join(outdir, f"synth0/{sub}/{view:0>8}{suffix}")
                assert os.path.exists(p), p

        from transmvsnet_tpu.data.pfm import read_pfm

        d, _ = read_pfm(os.path.join(outdir, "synth0/depth_est/00000000.pfm"))
        assert d.shape == (64, 96)
        assert np.isfinite(d).all()

        # Fusion over the inferred maps must run end to end.
        from transmvsnet_tpu.tools import fuse

        plydir = str(tmp_path / "plys")
        fuse.main(
            [
                "--testpath", outdir,
                "--testlist", listfile,
                "--outdir", plydir,
                "--test_dataset", "tnt",
                "--thres_view", "2",
                "--num_workers", "1",
            ]
        )
        assert os.path.exists(os.path.join(plydir, "synth0.ply"))


class TestDTUFuseEvalChain:
    """The DTU naming contract between the fuser and the evaluator.

    Fuses a DTU-named synthetic scan via the CLI (--test_dataset dtu) and
    then evaluates it with evaluate_dtu over synthetic DTU-layout ground
    truth. Fails if the fuser's PLY naming and the evaluator's expected
    naming (mvsnet%03d_l3.ply, BaseEvalMain_web.m:34) ever drift apart."""

    def _materialize_gt_scan(self, root):
        import cv2

        from transmvsnet_tpu.data.cams import write_cam_file
        from transmvsnet_tpu.data.pfm import save_pfm
        from transmvsnet_tpu.data.synthetic import SyntheticScene

        scene = SyntheticScene(num_views=4, height=64, width=96)
        for sub in ("depth_est", "confidence", "cams", "images"):
            os.makedirs(os.path.join(root, sub))
        for v in range(scene.V):
            img, depth = scene.render(v)
            save_pfm(os.path.join(root, f"depth_est/{v:0>8}.pfm"), depth)
            save_pfm(
                os.path.join(root, f"confidence/{v:0>8}.pfm"), np.ones_like(depth)
            )
            pair = np.zeros((2, 4, 4), dtype=np.float32)
            pair[0] = scene.extrinsics[v]
            pair[1, :3, :3] = scene.K
            write_cam_file(
                os.path.join(root, f"cams/{v:0>8}_cam.txt"), pair, "1.0 0.01"
            )
            cv2.imwrite(
                os.path.join(root, f"images/{v:0>8}.jpg"),
                cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
        with open(os.path.join(root, "pair.txt"), "w") as f:
            f.write(f"{scene.V}\n")
            for v in range(scene.V):
                others = [o for o in range(scene.V) if o != v]
                f.write(f"{v}\n{len(others)} ")
                f.write(" ".join(f"{o} {10.0}" for o in others) + "\n")
        return scene

    def _materialize_dtu_gt(self, gt_root, scene, scan_id=1):
        from scipy.io import savemat

        from transmvsnet_tpu.fusion.ply import write_ply

        rng = np.random.RandomState(0)
        x = rng.uniform(-3, 3, 8000)
        y = rng.uniform(-2, 2, 8000)
        z = (scene.c - scene.n[0] * x - scene.n[1] * y) / scene.n[2]
        stl = np.stack([x, y, z], axis=1).astype(np.float32)
        os.makedirs(os.path.join(gt_root, "Points/stl"))
        write_ply(
            os.path.join(gt_root, f"Points/stl/stl{scan_id:03d}_total.ply"),
            stl,
            np.full((len(stl), 3), 128, np.uint8),
        )
        os.makedirs(os.path.join(gt_root, "ObsMask"))
        savemat(
            os.path.join(gt_root, f"ObsMask/ObsMask{scan_id}_10.mat"),
            {
                "ObsMask": np.ones((40, 40, 40), np.uint8),
                "BB": np.array([[-5.0, -5.0, 0.0], [15.0, 15.0, 20.0]]),
                "Res": 0.5,
            },
        )
        savemat(
            os.path.join(gt_root, f"ObsMask/Plane{scan_id}.mat"),
            {"P": np.array([0.0, 0.0, 1.0, -1.0])},
        )

    def test_dtu_fuse_then_evaluate(self, tmp_path):
        from transmvsnet_tpu.eval.dtu_eval import evaluate_dtu
        from transmvsnet_tpu.tools import fuse

        scan_root = tmp_path / "out" / "scan1"
        os.makedirs(scan_root)
        scene = self._materialize_gt_scan(str(scan_root))
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")

        plydir = str(tmp_path / "plys")
        fuse.main(
            [
                "--testpath", str(tmp_path / "out"),
                "--testlist", str(listfile),
                "--outdir", plydir,
                "--test_dataset", "dtu",
                "--photo_threshold", "0.5",
                "--thres_view", "2",
                "--num_workers", "1",
            ]
        )

        gt_root = str(tmp_path / "gt")
        self._materialize_dtu_gt(gt_root, scene, scan_id=1)
        # evaluate_dtu locates the PLY by its own naming rule — this is the
        # contract under test; a naming drift raises FileNotFoundError here.
        result = evaluate_dtu(plydir, gt_root, scan_ids=[1])
        assert np.isfinite(result["overall"])
        assert result["overall"] < 0.5, result

    def test_dtu_normal_filter_method(self, tmp_path):
        """--filter_method normal: the upstream fixed-threshold filter
        (reference README.md:149-152 0.314 ablation row) runs the same CLI
        chain; GT depths are mutually consistent so the 1 px / 0.01 test
        accepts the surface, and the fused cloud evaluates near zero."""
        from transmvsnet_tpu.eval.dtu_eval import evaluate_dtu
        from transmvsnet_tpu.tools import fuse

        scan_root = tmp_path / "out" / "scan1"
        os.makedirs(scan_root)
        scene = self._materialize_gt_scan(str(scan_root))
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")

        plydir = str(tmp_path / "plys")
        fuse.main(
            [
                "--testpath", str(tmp_path / "out"),
                "--testlist", str(listfile),
                "--outdir", plydir,
                "--test_dataset", "dtu",
                "--filter_method", "normal",
                "--photo_threshold", "0.5",
                "--thres_view", "2",
                "--num_workers", "1",
            ]
        )
        gt_root = str(tmp_path / "gt")
        self._materialize_dtu_gt(gt_root, scene, scan_id=1)
        result = evaluate_dtu(plydir, gt_root, scan_ids=[1])
        assert np.isfinite(result["overall"])
        assert result["overall"] < 0.5, result

    def test_dtu_native_filter_method(self, tmp_path):
        """--filter_method native: the C++ binary runs the same CLI chain
        end-to-end and emits colored points (JPEG→PPM bridge)."""
        from transmvsnet_tpu.fusion.ply import read_ply
        from transmvsnet_tpu.tools import fuse

        scan_root = tmp_path / "out" / "scan1"
        os.makedirs(scan_root)
        self._materialize_gt_scan(str(scan_root))
        listfile = tmp_path / "list.txt"
        listfile.write_text("scan1\n")

        plydir = str(tmp_path / "plys")
        fuse.main(
            [
                "--testpath", str(tmp_path / "out"),
                "--testlist", str(listfile),
                "--outdir", plydir,
                "--test_dataset", "dtu",
                "--filter_method", "native",
                "--num_consistent", "2",
            ]
        )
        ply = os.path.join(plydir, "mvsnet001_l3.ply")
        assert os.path.exists(ply)
        xyz, rgb = read_ply(ply)
        assert len(xyz) > 1000
        # Colored points: the JPEG images were bridged to PPM for the binary.
        assert rgb is not None and np.asarray(rgb).std() > 0


class TestTrainCLISmoke:
    def test_synthetic_one_epoch(self, tmp_path):
        from transmvsnet_tpu.tools import train

        state = train.main(
            [
                "--dataset", "synthetic",
                "--epochs", "1",
                "--batch_size", "2",
                "--nviews", "3",
                "--numdepth", "32",
                "--ndepths", "16,8,8",
                "--logdir", str(tmp_path / "ckpt"),
                "--summary_freq", "1",
                "--mesh_data", "2",
            ]
        )
        assert int(state.step) >= 1
        metrics = (tmp_path / "ckpt" / "metrics.jsonl").read_text().strip()
        assert metrics
        rec = json.loads(metrics.splitlines()[0])
        assert "loss" in rec
        # A checkpoint landed and is restorable.
        import glob

        assert glob.glob(str(tmp_path / "ckpt" / "*"))
