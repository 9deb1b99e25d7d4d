"""End-to-end CLI plumbing: materialized synthetic scene → inference CLI →
fusion CLI → (empty-tolerant) evaluation. Uses random weights — validates
the file contracts between stages, not reconstruction quality."""

import json
import os

import numpy as np
import pytest

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
