"""Hermetic DTU-accuracy proxy gate (VERDICT round-1 item 1).

The north-star metric is DTU overall 0.305 mm (reference README.md:149-152,
DTU-MATLAB spec). Neither the DTU evaluation data nor the published
model_dtu.ckpt exists in this environment and there is no network egress
(documented in STATUS.md), so the real number cannot be produced here.
This gate is the strongest hermetic substitute: a short from-scratch
training run on the multi-object textured synthetic benchmark must drive
the FULL pipeline — train → checkpoint → infer CLI → fuse CLI →
evaluate_dtu (the MATLAB-spec math) — below a pinned overall score.
Geometry, model, loss, optimization, IO contracts, fusion, and the
evaluator all have to be simultaneously correct for this to pass; an
untrained model scores ~20-40× worse (see the pin's calibration note).
"""

import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.data.loader import ShardedLoader
from transmvsnet_tpu.data.synthetic import SyntheticDataset
from transmvsnet_tpu.eval.dtu_eval import evaluate_dtu
from transmvsnet_tpu.fusion.ply import write_ply
from transmvsnet_tpu.models.transmvsnet import TransMVSNet
from transmvsnet_tpu.train.checkpoint import save_weights
from transmvsnet_tpu.train.loop import run_epoch
from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
from transmvsnet_tpu.train.step import create_train_state, make_train_step

# Pinned accuracy gate, in scene units (scene scale ~6; the evaluator's
# 20-unit outlier cap and 0.2-unit reduce are loose at this scale, like
# DTU's mm constants at mm scale).
#
# Calibration (probes/calibrate_gate.py, 2026-08-21, after the round-3
# synthetic-geometry fixes — stage-1 intrinsics K[2,2] and the convergent
# ring sign): trained 60 epochs, photo 0.3, seeds 0/1/2 → overall
# 0.547 / 0.440 / 0.210 (direct depth-err medians 0.041/0.032/0.032);
# scores are photo-threshold-insensitive (±0.02 over 0.1-0.5). An
# untrained model fails geometric consistency entirely → empty cloud →
# NaN overall (direct err ~3.8), which the isfinite assert rejects. One
# gate run ≈ 17 min wall on the 2-core CI host. The 0.80 pin holds 1.46×
# headroom over the worst calibrated seed (CI runs seed 0: 0.547).
PINNED_OVERALL = float(os.environ.get("GATE_PIN", "0.80"))
# The fused overall has a 2.6× across-seed spread (fusion-marginal vote
# regions), so it alone could hide a depth-quality regression inside its
# headroom. The direct depth-error median is fusion-noise-free and
# separates trained (0.032-0.041 across seeds) from untrained (3.77) by
# ~100×; pin it 10× above the calibrated band and 10× below untrained.
PINNED_DIRECT_ERR_MEDIAN = float(os.environ.get("GATE_PIN_DIRECT", "0.4"))
GATE_EPOCHS = int(os.environ.get("GATE_EPOCHS", "60"))
# LR decay epoch for the polish phase (calibrated: halve lr at epoch 40).
GATE_DECAY_EPOCH = int(os.environ.get("GATE_DECAY_EPOCH", "40"))
# Training seed (model init + shuffling); the calibration sweep varies this
# to measure across-seed variance of the gate score (scenes stay fixed).
GATE_SEED = int(os.environ.get("GATE_SEED", "0"))
GATE_LR = float(os.environ.get("GATE_LR", "2e-3"))
# Camera-ring baseline for the benchmark scenes; probes/calibrate_gate.py
# imports these so the calibration recipe cannot drift from the gate's.
GATE_BASELINE = float(os.environ.get("GATE_BASELINE", "1.3"))


def _train_small_model(ds, epochs: int, lr: float = GATE_LR, seed: int = GATE_SEED):
    model = TransMVSNet(ModelConfig(ndepths=(16, 8, 8)))
    sample = ds[0]
    init_batch = {
        "imgs": jnp.asarray(sample["imgs"][None]),
        "proj_matrices": {
            k: jnp.asarray(v[None]) for k, v in sample["proj_matrices"].items()
        },
        "depth_values": jnp.asarray(sample["depth_values"][None]),
    }
    variables = model.init(
        jax.random.PRNGKey(seed),
        init_batch["imgs"],
        init_batch["proj_matrices"],
        init_batch["depth_values"],
        train=False,
    )
    steps_per_epoch = (len(ds) + 1) // 2  # batch 2
    milestones = (
        [GATE_DECAY_EPOCH * steps_per_epoch] if GATE_DECAY_EPOCH else [10**9]
    )
    optimizer = make_optimizer(
        warmup_multistep(lr, milestones, 0.5, warmup_iters=30)
    )
    state = create_train_state(model, variables, optimizer)
    step = jax.jit(make_train_step(model, optimizer))
    loader = ShardedLoader(ds, 2, shuffle=True, num_workers=0, seed=seed)
    means = {}
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        state, means = run_epoch(step, state, loader, train=True)
    return model, state, means


def _visibility_counts(scene, pts: np.ndarray, rel_tol: float = 0.02) -> np.ndarray:
    """Number of views in which each world point is visible (not occluded,
    inside the frustum) — the analytic analog of DTU's ObsMask, which marks
    voxels the structured-light scanner observed from multiple positions."""
    depths = [scene.render(v)[1] for v in range(scene.V)]
    cnt = np.zeros(len(pts), np.int32)
    for v in range(scene.V):
        E = scene.extrinsics[v]
        R, t = E[:3, :3], E[:3, 3]
        cam = pts @ R.T + t
        z = cam[:, 2]
        uvw = cam @ scene.K.T
        u = np.round(uvw[:, 0] / np.maximum(uvw[:, 2], 1e-9)).astype(int)
        w = np.round(uvw[:, 1] / np.maximum(uvw[:, 2], 1e-9)).astype(int)
        ok = (z > 1e-6) & (u >= 0) & (u < scene.W) & (w >= 0) & (w < scene.H)
        d = np.zeros(len(pts))
        d[ok] = depths[v][w[ok], u[ok]]
        cnt += (ok & (np.abs(z - d) < rel_tol * np.maximum(d, 1e-9))).astype(
            np.int32
        )
    return cnt


def _materialize_gt(gt_root: str, scene, scan_id: int = 1, min_vis: int = 3) -> None:
    """Analytic ground truth in the DTU evaluator's on-disk layout.

    The GT cloud keeps only points visible in >= min_vis views: fusion at
    thres_view=2 can only ever reconstruct points seen by the reference
    plus two consistent sources, so single-view surface would inflate the
    completeness term with structurally unreachable points (measured: a
    perfect-depth reconstruction scores comp 0.24 against the unfiltered
    cloud vs 0.097 filtered)."""
    from scipy.io import savemat

    stl = scene.surface_points(stride=1)
    stl = stl[_visibility_counts(scene, stl) >= min_vis]
    os.makedirs(os.path.join(gt_root, "Points/stl"), exist_ok=True)
    write_ply(
        os.path.join(gt_root, f"Points/stl/stl{scan_id:03d}_total.ply"),
        stl,
        np.full((len(stl), 3), 128, np.uint8),
    )
    lo = stl.min(axis=0) - 1.0
    hi = stl.max(axis=0) + 1.0
    res = 0.1
    shape = np.maximum(((hi - lo) / res).astype(int) + 1, 1)
    os.makedirs(os.path.join(gt_root, "ObsMask"), exist_ok=True)
    savemat(
        os.path.join(gt_root, f"ObsMask/ObsMask{scan_id}_10.mat"),
        {
            "ObsMask": np.ones(shape, np.uint8),
            "BB": np.stack([lo, hi]).astype(np.float64),
            "Res": float(res),
        },
    )
    # "Above-ground" half-space containing the whole visible surface:
    # spheres float in FRONT of the plane (toward the cameras), so orient
    # the test plane as -n·p + (c + margin) > 0.
    P = np.concatenate([-scene.n, [scene.c + 0.05]])
    savemat(os.path.join(gt_root, f"ObsMask/Plane{scan_id}.mat"), {"P": P})


@pytest.mark.slow
def test_accuracy_gate(tmp_path):
    # baseline=1.3 widens the camera ring to ~4.3 px of full-res disparity
    # per unit depth (a narrower ring caps depth accuracy at the sub-pixel
    # matching noise); tex_freq=2 sharpens the correlation peak.
    ds = SyntheticDataset(
        nviews=5, ndepths=32, num_samples=6, height=64, width=96,
        num_objects=2, baseline=GATE_BASELINE, tex_freq=2.0,
    )
    model, state, means = _train_small_model(ds, GATE_EPOCHS)
    assert np.isfinite(means["loss"]), means

    # Tight fusion-free gate: direct depth error vs analytic GT (view 0).
    sample0 = ds[0]
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(sample0["imgs"][None]),
        {k: jnp.asarray(v[None]) for k, v in sample0["proj_matrices"].items()},
        jnp.asarray(sample0["depth_values"][None]),
        train=False,
    )
    _, gt_depth = ds.scenes[0].render(0)
    direct_err = float(
        np.median(np.abs(np.asarray(out["depth"][0]) - gt_depth))
    )
    print("direct depth-err median:", direct_err)
    assert direct_err < PINNED_DIRECT_ERR_MEDIAN, direct_err

    # Checkpoint, then drive the real inference CLI from it.
    ckpt_dir = str(tmp_path / "weights")
    save_weights(
        ckpt_dir, {"params": state.params, "batch_stats": state.batch_stats}
    )

    data_root = tmp_path / "data"
    ds.materialize(str(data_root))
    shutil.move(str(data_root / "synth0"), str(data_root / "scan1"))
    listfile = tmp_path / "list.txt"
    listfile.write_text("scan1\n")

    from transmvsnet_tpu.tools import fuse, infer

    outdir = str(tmp_path / "out")
    infer.main(
        [
            "--datapath", str(data_root),
            "--testlist", str(listfile),
            "--outdir", outdir,
            "--loadckpt", ckpt_dir,
            "--num_view", "5",
            "--numdepth", "32",
            "--max_h", "64",
            "--max_w", "96",
            "--ndepths", "16,8,8",
        ]
    )

    plydir = str(tmp_path / "plys")
    fuse.main(
        [
            "--testpath", outdir,
            "--testlist", str(listfile),
            "--outdir", plydir,
            "--test_dataset", "dtu",
            "--photo_threshold", "0.3",
            "--thres_view", "2",
            # The vote-ladder rungs are DTU-quantization-tuned (~0.1%
            # relative steps); this benchmark's 32-bin sweep quantizes at
            # ~0.9% relative, so widen proportionally (see FusionParams).
            "--dist_scale", "2",
            "--rel_diff_scale", "8",
            "--num_workers", "1",
        ]
    )

    gt_root = str(tmp_path / "gt")
    _materialize_gt(gt_root, ds.scenes[0], scan_id=1)
    result = evaluate_dtu(plydir, gt_root, scan_ids=[1])
    print("accuracy gate:", result)
    assert np.isfinite(result["overall"])
    assert result["overall"] < PINNED_OVERALL, result
