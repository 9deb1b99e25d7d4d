"""Tanks & Temples dress rehearsal: materialized mini-TnT scenes driven
through the real CLIs — `infer --dataset tnt --inverse_depth` → `fuse
--test_dataset tnt` (the scripts/test_tnt.sh chain, reference
tnt_eval.py:27-40,174-182, scripts/test_tnt.sh:12-32).

Exercises the TnT-specific contracts end-to-end: cams_1/ layout, the
minmax cam convention (line 11 = depth_min depth_max), inverse-depth
hypothesis sampling, the per-scene-resolution two-compile-group story,
--bucket_hw single-group mode, and the fuser's TnT photo-threshold
default (0.18) + per-scan `<scan>.ply` naming.
"""

import os

import numpy as np
import pytest

from transmvsnet_tpu.data.pfm import read_pfm
from transmvsnet_tpu.data.synthetic import SyntheticScene

# Two names from TnTEvalDataset.IMAGE_SIZES so the loader's per-scene
# native-size table is exercised; the materialized images are tiny, so
# scale_mvs_input keeps them and snaps to /32 multiples.
SCANS = {"Horse": (96, 64), "M60": (128, 64)}  # name -> (W, H)


def _materialize_tnt(root: str) -> dict[str, SyntheticScene]:
    import cv2

    scenes = {}
    for seed, (scan, (W, H)) in enumerate(SCANS.items()):
        scene = SyntheticScene(num_views=4, height=H, width=W, seed=seed)
        scenes[scan] = scene
        scan_dir = os.path.join(root, scan)
        os.makedirs(os.path.join(scan_dir, "images"), exist_ok=True)
        os.makedirs(os.path.join(scan_dir, "cams_1"), exist_ok=True)
        lo, hi = scene.depth_range()
        for v in range(scene.V):
            img, _ = scene.render(v)
            cv2.imwrite(
                os.path.join(scan_dir, f"images/{v:0>8}.jpg"),
                cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
            pair = np.zeros((2, 4, 4), dtype=np.float32)
            pair[0] = scene.extrinsics[v]
            pair[1, :3, :3] = scene.K  # full-res K; loader applies the /4
            from transmvsnet_tpu.data.cams import write_cam_file

            # minmax convention: line 11 = "depth_min depth_max"
            write_cam_file(
                os.path.join(scan_dir, f"cams_1/{v:0>8}_cam.txt"),
                pair,
                depth_line=f"{lo:.6f} {hi:.6f}",
            )
        with open(os.path.join(scan_dir, "pair.txt"), "w") as f:
            f.write(f"{scene.V}\n")
            for v in range(scene.V):
                others = [o for o in range(scene.V) if o != v]
                f.write(f"{v}\n{len(others)} ")
                f.write(
                    " ".join(f"{o} {100.0 - i}" for i, o in enumerate(others))
                    + "\n"
                )
    return scenes


@pytest.fixture(scope="module")
def tnt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tnt")
    scenes = _materialize_tnt(str(root))
    listfile = root / "list.txt"
    listfile.write_text("\n".join(SCANS) + "\n")
    return str(root), str(listfile), scenes


def test_inverse_depth_hypotheses(tnt_root):
    """minmax cams + inverse-depth sampling: hypotheses span [min, max),
    are uniform in 1/d (reference tnt_eval.py:174-182), and are NOT
    uniform in d."""
    root, _, scenes = tnt_root
    from transmvsnet_tpu.data.datasets import TnTEvalDataset

    ds = TnTEvalDataset(
        root, list(SCANS), nviews=4, ndepths=32, inverse_depth=True
    )
    sample = ds[0]
    dv = sample["depth_values"]
    lo, hi = scenes["Horse"].depth_range()
    assert dv.shape == (32,)
    diffs = np.diff(dv)
    assert (diffs < 0).all() or (diffs > 0).all(), "not monotonic"
    inv = np.sort(1.0 / dv)
    steps = np.diff(inv)
    assert np.allclose(steps, steps[0], rtol=1e-4), "not uniform in 1/d"
    d_steps = np.abs(np.diff(np.sort(dv)))
    assert d_steps.max() / d_steps.min() > 1.5, "degenerated to linear-in-d"
    assert dv.min() >= lo - 1e-3 and dv.max() <= hi + 1e-3


@pytest.mark.slow
def test_tnt_infer_fuse_chain(tnt_root, tmp_path):
    """The full scripts/test_tnt.sh chain on two resolution groups."""
    from transmvsnet_tpu.tools import fuse, infer

    root, listfile, _ = tnt_root
    outdir = str(tmp_path / "out")
    infer.main(
        [
            "--dataset", "tnt",
            "--datapath", root,
            "--testlist", listfile,
            "--outdir", outdir,
            "--num_view", "4",
            "--numdepth", "32",
            "--interval_scale", "1.0",
            "--inverse_depth",
            "--ndepths", "16,8,8",
        ]
    )

    # Per-scene native resolutions survive to the outputs: two groups.
    for scan, (W, H) in SCANS.items():
        for v in range(4):
            p = os.path.join(outdir, f"{scan}/depth_est/{v:0>8}.pfm")
            assert os.path.exists(p), p
            d, _ = read_pfm(p)
            assert d.shape == (H // 32 * 32, W // 32 * 32), (scan, d.shape)
            assert np.isfinite(d).all()

    # Fuse with TnT defaults: photo_threshold must default to 0.18
    # (reference scripts/test_tnt.sh:30) and outputs are <scan>.ply.
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
    for scan in SCANS:
        assert os.path.exists(os.path.join(plydir, f"{scan}.ply")), scan


@pytest.mark.slow
def test_tnt_bucket_hw_single_group(tnt_root, tmp_path):
    """--bucket_hw forces ONE output resolution across scenes (single
    compiled shape for the whole run)."""
    from transmvsnet_tpu.tools import infer

    root, listfile, _ = tnt_root
    outdir = str(tmp_path / "out_bucket")
    infer.main(
        [
            "--dataset", "tnt",
            "--datapath", root,
            "--testlist", listfile,
            "--outdir", outdir,
            "--num_view", "4",
            "--numdepth", "32",
            "--inverse_depth",
            "--bucket_hw", "64,128",
            "--ndepths", "16,8,8",
        ]
    )
    for scan in SCANS:
        d, _ = read_pfm(os.path.join(outdir, f"{scan}/depth_est/00000000.pfm"))
        assert d.shape == (64, 128), (scan, d.shape)
