#!/usr/bin/env bash
# Tanks & Temples recipe (reference scripts/test_tnt.sh:12-32): 11 views,
# interval_scale 1.0, inverse-depth TnT loader, dynamic fusion with
# photo_threshold 0.18 and thres_view 5; PLYs upload to the T&T leaderboard.
set -euo pipefail
TNT_ROOT=${1:?usage: test_tnt.sh <TNT_DIR> <CKPT> [OUT_DIR] [LIST]}
CKPT=${2:?need a checkpoint (model_bld.ckpt or orbax dir)}
OUT=${3:-./outputs/tnt}
LIST=${4:-lists/tnt/intermediate.txt}

python -m transmvsnet_tpu.tools.infer \
  --dataset tnt \
  --datapath "$TNT_ROOT" \
  --testlist "$LIST" \
  --outdir "$OUT/depth" \
  --loadckpt "$CKPT" \
  --num_view 11 \
  --numdepth 192 \
  --interval_scale 1.0 \
  --ndepths 48,32,8

python -m transmvsnet_tpu.tools.fuse \
  --testpath "$OUT/depth" \
  --testlist "$LIST" \
  --outdir "$OUT/plys" \
  --test_dataset tnt \
  --filter_method dynamic \
  --thres_view 5
