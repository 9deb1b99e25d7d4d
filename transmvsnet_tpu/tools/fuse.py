"""Fusion CLI: depth maps → point clouds (reference dynamic_fusion.py CLI).

  python -m transmvsnet_tpu.tools.fuse --testpath out/ --testlist list.txt \
      --outdir plys/ --test_dataset dtu --photo_threshold 0.3 --thres_view 3
"""

from __future__ import annotations

import argparse

from transmvsnet_tpu.fusion.dynamic import FusionParams, fuse_scans


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Depth-map fusion")
    p.add_argument("--testpath", required=True, help="per-scan outputs root")
    p.add_argument("--testlist", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument(
        "--filter_method",
        default="dynamic",
        choices=["dynamic", "normal", "native"],
        help="dynamic = Python vote-ladder fuser (reference "
        "dynamic_fusion.py); normal = upstream fixed-threshold filter "
        "(the reference README.md:149-152 0.314 ablation row; 1 px / "
        "0.01 rel-depth over >= thres_view views); native = the C++ "
        "tpu_fuser binary (the fusibile role, reference gipuma.py)",
    )
    p.add_argument("--photo_threshold", type=float, default=None)
    p.add_argument("--thres_view", type=int, default=3)
    p.add_argument("--dist_scale", type=float, default=1.0)
    p.add_argument("--rel_diff_scale", type=float, default=1.0)
    p.add_argument("--geo_pixel_thres", type=float, default=1.0)
    p.add_argument("--geo_depth_thres", type=float, default=0.01)
    p.add_argument("--disp_threshold", type=float, default=0.25)
    p.add_argument("--num_consistent", type=int, default=3)
    p.add_argument("--test_dataset", default="dtu", choices=["dtu", "tnt"])
    p.add_argument("--num_workers", type=int, default=8)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    with open(args.testlist) as f:
        scans = [line.rstrip() for line in f if line.strip()]
    if args.filter_method == "native":
        from transmvsnet_tpu.fusion.native import native_fuse_scans

        outputs = native_fuse_scans(
            args.testpath,
            scans,
            args.outdir,
            disp_threshold=args.disp_threshold,
            num_consistent=args.num_consistent,
            dataset=args.test_dataset,
        )
    else:
        # Per-dataset confidence default: 0.3 DTU / 0.18 TnT for the
        # dynamic ladder (reference dynamic_fusion.py:182,
        # scripts/test_tnt.sh:30); the normal filter's convention is a
        # high fixed confidence cut (MVSNet-family 0.9).
        photo = args.photo_threshold
        if photo is None:
            if args.filter_method == "normal":
                photo = 0.9
            else:
                photo = 0.18 if args.test_dataset == "tnt" else 0.3
        params = FusionParams(
            photo_threshold=photo,
            thres_view=args.thres_view,
            dist_scale=args.dist_scale,
            rel_diff_scale=args.rel_diff_scale,
            mode=args.filter_method,
            geo_pixel_thres=args.geo_pixel_thres,
            geo_depth_thres=args.geo_depth_thres,
        )
        outputs = fuse_scans(
            args.testpath,
            scans,
            args.outdir,
            params,
            dataset=args.test_dataset,
            num_workers=args.num_workers,
        )
    for o in outputs:
        print("wrote", o)


if __name__ == "__main__":
    main()
