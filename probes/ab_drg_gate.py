"""DRG=4 vs DRG=5 evaluated on the ACCURACY GATE, not pixel agreement.

The round-4b ablation showed DRG=4 saves 9.1 ms/layer at full res but
costs 2.4% pixel agreement at sigma=0.5 offsets — a number that says
nothing about actual depth quality (VERDICT r4 weak #3). This A/B runs
the gate-calibrated model's inference on TPU through the bf16 one-hot
kernels at both DRG values and scores each with the gate's instruments:
direct depth-error median vs the analytic GT, and the fused overall.

Prereq (CPU, ~17 min): GATE_KEEP=1 GATE_SEED=0 python probes/calibrate_gate.py
  -> prints "kept artifacts: /tmp/gate_cal_s0_XXXX"
Then:   python probes/ab_drg_gate.py --artifacts /tmp/gate_cal_s0_XXXX

DRG is threaded via the TMVS_DCN_DRG env var (read at dcn_onehot import,
so forward and backward stay consistent) — each variant runs inference in
a fresh subprocess.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", required=True,
                    help="kept calibrate_gate tmp dir")
    ap.add_argument("--drgs", default="5,4")
    args = ap.parse_args()
    art = args.artifacts
    ckpt = os.path.join(art, "weights")
    data_root = os.path.join(art, "data")
    gt_root = os.path.join(art, "gt")
    listfile = os.path.join(art, "list.txt")
    for p in (ckpt, data_root, gt_root, listfile):
        assert os.path.exists(p), p

    # Rebuild the gate dataset for the analytic GT depth (deterministic).
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from test_accuracy_gate import GATE_BASELINE

    from transmvsnet_tpu.data.pfm import read_pfm
    from transmvsnet_tpu.data.synthetic import SyntheticDataset
    from transmvsnet_tpu.eval.dtu_eval import evaluate_dtu
    from transmvsnet_tpu.tools import fuse

    ds = SyntheticDataset(
        nviews=5, ndepths=32, num_samples=6, height=64, width=96,
        num_objects=2, baseline=GATE_BASELINE, tex_freq=2.0,
    )
    _, gt_depth = ds.scenes[0].render(0)

    for drg in (int(x) for x in args.drgs.split(",")):
        outdir = os.path.join(art, f"out_drg{drg}")
        env = dict(os.environ, TMVS_DCN_DRG=str(drg))
        subprocess.run(
            [
                sys.executable, "-m", "transmvsnet_tpu.tools.infer",
                "--datapath", data_root, "--testlist", listfile,
                "--outdir", outdir, "--loadckpt", ckpt,
                "--num_view", "5", "--numdepth", "32",
                "--max_h", "64", "--max_w", "96", "--ndepths", "16,8,8",
                "--dtype", "bfloat16",
            ],
            check=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        est = read_pfm(os.path.join(outdir, "scan1/depth_est/00000000.pfm"))[0]
        err = np.abs(est - gt_depth)
        plydir = os.path.join(art, f"plys_drg{drg}")
        fuse.main(
            [
                "--testpath", outdir, "--testlist", listfile,
                "--outdir", plydir, "--test_dataset", "dtu",
                "--photo_threshold", "0.3", "--thres_view", "2",
                "--dist_scale", "2", "--rel_diff_scale", "8",
                "--num_workers", "1",
            ]
        )
        result = evaluate_dtu(plydir, gt_root, scan_ids=[1])
        print(
            json.dumps(
                {
                    "drg": drg,
                    "direct_err_median": float(np.median(err)),
                    "direct_err_mean": float(err.mean()),
                    "overall": result["overall"],
                    "acc": result["acc_mean"],
                    "comp": result["comp_mean"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
