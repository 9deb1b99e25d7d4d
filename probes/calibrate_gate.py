"""Calibrate the hermetic accuracy gate (VERDICT round-2 item 4).

Runs the gate's training loop with per-epoch loss/EPE printing, then the
direct depth-vs-analytic-GT error and the full infer→fuse→evaluate chain
score, for one seed. Run for several seeds to measure variance:

  for s in 0 1 2; do GATE_SEED=$s python probes/calibrate_gate.py; done
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    # The recipe (epochs, lr schedule, scene baseline) is imported from the
    # gate itself so calibration can never silently run a different config
    # than the one backing the pin; env vars still override both sides.
    from test_accuracy_gate import (
        GATE_BASELINE as baseline,
        GATE_DECAY_EPOCH as decay_epoch,
        GATE_EPOCHS as epochs,
        GATE_LR as lr,
        GATE_SEED as seed,
    )

    t_start = time.time()

    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.data.loader import ShardedLoader
    from transmvsnet_tpu.data.synthetic import SyntheticDataset
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.train.loop import run_epoch
    from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
    from transmvsnet_tpu.train.step import create_train_state, make_train_step

    ds = SyntheticDataset(
        nviews=5, ndepths=32, num_samples=6, height=64, width=96,
        num_objects=2, baseline=baseline, tex_freq=2.0,
    )
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
    steps_per_epoch = 3  # 6 samples / batch 2
    milestones = (
        [decay_epoch * steps_per_epoch] if decay_epoch else [10**9]
    )
    optimizer = make_optimizer(
        warmup_multistep(lr, milestones, 0.5, warmup_iters=30)
    )
    state = create_train_state(model, variables, optimizer)
    step = jax.jit(make_train_step(model, optimizer))
    loader = ShardedLoader(ds, 2, shuffle=True, num_workers=0, seed=seed)
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        state, means = run_epoch(step, state, loader, train=True)
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(
                f"epoch {epoch:3d} loss {means['loss']:.4f} "
                f"depth_loss {means.get('depth_loss', float('nan')):.4f} "
                f"abs_err {means.get('abs_depth_error', float('nan')):.4f}",
                flush=True,
            )

    # Direct depth error vs analytic GT on scene 0 view 0 (no fusion).
    scene = ds.scenes[0]
    sample = ds[0]
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(sample["imgs"][None]),
        {k: jnp.asarray(v[None]) for k, v in sample["proj_matrices"].items()},
        jnp.asarray(sample["depth_values"][None]),
        train=False,
    )
    est = np.asarray(out["depth"][0])
    _, gt = scene.render(0)
    err = np.abs(est - gt)
    print(
        f"direct depth err: med {np.median(err):.4f} mean {err.mean():.4f} "
        f"p90 {np.percentile(err, 90):.4f} (GT range {gt.min():.2f}-{gt.max():.2f})"
    )

    # Full chain: checkpoint -> infer CLI -> fuse CLI -> evaluate.
    from transmvsnet_tpu.eval.dtu_eval import evaluate_dtu
    from transmvsnet_tpu.tools import fuse, infer
    from transmvsnet_tpu.train.checkpoint import save_weights
    from test_accuracy_gate import _materialize_gt as materialize_gt

    tmp = tempfile.mkdtemp(prefix=f"gate_cal_s{seed}_")
    try:
        ckpt_dir = os.path.join(tmp, "weights")
        save_weights(
            ckpt_dir, {"params": state.params, "batch_stats": state.batch_stats}
        )
        data_root = os.path.join(tmp, "data")
        ds.materialize(data_root)
        shutil.move(
            os.path.join(data_root, "synth0"), os.path.join(data_root, "scan1")
        )
        listfile = os.path.join(tmp, "list.txt")
        with open(listfile, "w") as f:
            f.write("scan1\n")
        outdir = os.path.join(tmp, "out")
        infer.main(
            [
                "--datapath", data_root, "--testlist", listfile,
                "--outdir", outdir, "--loadckpt", ckpt_dir,
                "--num_view", "5", "--numdepth", "32",
                "--max_h", "64", "--max_w", "96", "--ndepths", "16,8,8",
            ]
        )
        from transmvsnet_tpu.data.pfm import read_pfm

        confs = np.stack(
            [
                read_pfm(
                    os.path.join(outdir, f"scan1/confidence/{v:0>8}.pfm")
                )[0]
                for v in range(5)
            ]
        )
        print(
            "confidence quantiles:",
            {q: round(float(np.quantile(confs, q)), 4) for q in (0.1, 0.5, 0.9)},
            "frac>thresh:",
            round(float((confs > float(os.environ.get("GATE_PHOTO", "0.1"))).mean()), 3),
        )
        gt_root = os.path.join(tmp, "gt")
        materialize_gt(gt_root, scene, scan_id=1)
        # GATE_FILTER=normal calibrates the upstream fixed-threshold filter
        # path (reference README.md:149-152 ablation row) on the same gate
        # scenes; default calibrates the dynamic vote-ladder.
        filter_method = os.environ.get("GATE_FILTER", "dynamic")
        for photo in ("0.1", "0.3", "0.5"):
            plydir = os.path.join(tmp, f"plys_{photo}")
            fuse_args = [
                "--testpath", outdir, "--testlist", listfile,
                "--outdir", plydir, "--test_dataset", "dtu",
                "--filter_method", filter_method,
                "--photo_threshold", photo,
                "--num_workers", "1",
            ]
            if filter_method == "normal":
                # Upstream thresholds are 1 px / 0.01 rel-depth on DTU-sized
                # images; the gate scenes are 64x96 with a tiny model, so
                # loosen by the same factors the dynamic calibration uses
                # (dist_scale=2, rel_diff_scale=8).
                fuse_args += ["--geo_pixel_thres", "2.0",
                              "--geo_depth_thres", "0.08"]
            else:
                fuse_args += ["--thres_view", "2",
                              "--dist_scale", "2", "--rel_diff_scale", "8"]
            fuse.main(fuse_args)
            result = evaluate_dtu(plydir, gt_root, scan_ids=[1])
            print(
                json.dumps(
                    {
                        "seed": seed,
                        "epochs": epochs,
                        "filter": filter_method,
                        "photo": photo,
                        "overall": result["overall"],
                        "acc": result["acc_mean"],
                        "comp": result["comp_mean"],
                        "direct_err_median": float(np.median(err)),
                        "wall_s": round(time.time() - t_start, 1),
                    }
                )
            )
    finally:
        if os.environ.get("GATE_KEEP"):
            print("kept artifacts:", tmp)
        else:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    main()
