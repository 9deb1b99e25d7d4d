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
    p.add_argument("--photo_threshold", type=float, default=0.3)
    p.add_argument("--thres_view", type=int, default=3)
    p.add_argument("--test_dataset", default="dtu", choices=["dtu", "tnt"])
    p.add_argument("--num_workers", type=int, default=8)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    with open(args.testlist) as f:
        scans = [line.rstrip() for line in f if line.strip()]
    # TnT default threshold if unset explicitly (reference scripts/test_tnt.sh:30).
    params = FusionParams(
        photo_threshold=args.photo_threshold, thres_view=args.thres_view
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
