"""Inference CLI: depth-map + confidence estimation over eval scans.

The reference test.py save_depth contract (reference test.py:69-158) with
the fork's 8-bit PNG quantization removed — float PFM depth/confidence
end-to-end (upstream intent, SURVEY.md provenance caveat). Per reference
view this writes, under outdir/<scan>/:
  depth_est/NNNNNNNN.pfm     float depth
  confidence/NNNNNNNN.pfm    blended stage1*2*3 confidence
  cams/NNNNNNNN_cam.txt      MVSNet cam at model resolution
  images/NNNNNNNN.jpg        the (resized) reference image
ready for fusion (transmvsnet_tpu.tools.fuse).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.data.cams import write_cam_file
from transmvsnet_tpu.data.loader import ShardedLoader
from transmvsnet_tpu.data.pfm import save_pfm
from transmvsnet_tpu.data.registry import get_dataset
from transmvsnet_tpu.models.transmvsnet import TransMVSNet
from transmvsnet_tpu.train.checkpoint import load_weights
from transmvsnet_tpu.train.step import TrainState, make_infer_step


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TransMVSNet-TPU inference")
    p.add_argument("--dataset", default="general_eval")
    p.add_argument("--datapath", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--loadckpt", default="")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.0)
    p.add_argument("--max_h", type=int, default=864)
    p.add_argument("--max_w", type=int, default=1152)
    p.add_argument("--ndepths", default="48,32,8")
    p.add_argument("--depth_inter_r", default="4,1,0.5")
    p.add_argument(
        "--no_pallas",
        action="store_true",
        help="disable the Pallas TPU kernels (XLA fallback)",
    )
    p.add_argument(
        "--dtype",
        default="float32",
        choices=["float32", "bfloat16"],
        help="activation compute dtype (bfloat16 = the TPU-native "
        "one-hot kernel path, the bench.py configuration)",
    )
    p.add_argument(
        "--inverse_depth",
        action="store_true",
        help="TnT: sample hypotheses uniformly in inverse depth "
        "(reference datasets/tnt_eval.py:174-182)",
    )
    p.add_argument(
        "--bucket_hw",
        default="",
        help="TnT: force one 'H,W' resolution bucket for all scenes "
        "(default: per-scene native sizes, at most two compiled shapes)",
    )
    return p.parse_args(argv)


def save_outputs(outdir, filename_tpl, depth, confidence, cam_pair, img):
    import cv2

    def path(kind, suffix):
        p = os.path.join(outdir, filename_tpl.format(kind, suffix))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    save_pfm(path("depth_est", ".pfm"), depth.astype(np.float32))
    save_pfm(path("confidence", ".pfm"), confidence.astype(np.float32))
    write_cam_file(path("cams", "_cam.txt"), cam_pair)
    img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(path("images", ".jpg"), cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))


def main(argv=None):
    args = parse_args(argv)
    with open(args.testlist) as f:
        scans = [line.rstrip() for line in f if line.strip()]

    cls = get_dataset(args.dataset)
    kwargs = dict(
        datapath=args.datapath,
        listfile=scans,
        nviews=args.num_view,
        ndepths=args.numdepth,
        interval_scale=args.interval_scale,
    )
    if args.dataset in ("general_eval", "dtu_eval"):
        kwargs.update(max_h=args.max_h, max_w=args.max_w)
    if args.dataset == "tnt":
        kwargs.update(inverse_depth=args.inverse_depth)
        if args.bucket_hw:
            h, w = (int(x) for x in args.bucket_hw.split(","))
            kwargs.update(bucket_hw=(h, w))
    dataset = cls(**kwargs)
    loader = ShardedLoader(dataset, args.batch_size, num_workers=2)

    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    ratios = tuple(float(x) for x in args.depth_inter_r.split(","))
    model = TransMVSNet(
        ModelConfig(
            ndepths=ndepths,
            depth_interval_ratios=ratios,
            use_pallas=not args.no_pallas,
            compute_dtype=args.dtype,
        )
    )

    sample = dataset[0]
    # Parameters are input-size independent; initialize on a tiny crop so
    # eager init stays fast.
    init_args = (
        jnp.asarray(sample["imgs"][None, :, :64, :128]),
        {k: jnp.asarray(v[None]) for k, v in sample["proj_matrices"].items()},
        jnp.asarray(sample["depth_values"][None]),
    )
    variables = model.init(jax.random.PRNGKey(0), *init_args, train=False)
    if args.loadckpt:
        if args.loadckpt.endswith(".ckpt"):
            from transmvsnet_tpu.convert.torch_weights import (
                convert_state_dict,
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(args.loadckpt)
            variables = jax.tree_util.tree_map(
                jnp.asarray,
                convert_state_dict(
                    sd, jax.tree_util.tree_map(np.asarray, variables)
                ),
            )
        else:
            variables = load_weights(args.loadckpt, variables)
        print(f"loaded {args.loadckpt}")

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=None,
    )
    infer_step = jax.jit(make_infer_step(model))

    n = len(loader)
    for i, raw in enumerate(loader):
        t0 = time.time()
        batch = {
            "imgs": jnp.asarray(raw["imgs"]),
            "proj_matrices": {
                k: jnp.asarray(v) for k, v in raw["proj_matrices"].items()
            },
            "depth_values": jnp.asarray(raw["depth_values"]),
        }
        out = infer_step(state, batch)
        depth = np.asarray(out["depth"])
        conf = np.asarray(out["confidence"])
        dt = time.time() - t0
        print(f"iter {i + 1}/{n} time {dt:.3f}s res {depth.shape}")
        for b, filename in enumerate(raw["filename"]):
            save_outputs(
                args.outdir,
                filename,
                depth[b],
                conf[b],
                raw["proj_matrices"]["stage3"][b, 0],
                raw["imgs"][b, 0],
            )

    # Make each scan folder self-contained for fusion: copy pair.txt.
    import shutil

    for scan in scans:
        src = os.path.join(args.datapath, scan, "pair.txt")
        dst = os.path.join(args.outdir, scan, "pair.txt")
        if os.path.exists(src) and not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(src, dst)


if __name__ == "__main__":
    main()
