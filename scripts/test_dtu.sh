#!/usr/bin/env bash
# DTU test recipe (reference scripts/test_dtu.sh + DTU-MATLAB eval):
# inference at 1152x864, 5 views, dynamic fusion (photo 0.3), then the
# Python DTU evaluator (acc/comp/overall vs the 0.305 north star).
set -euo pipefail
DTU_TEST=${1:?usage: test_dtu.sh <DTU_TEST_DIR> <CKPT> <DTU_GT_DIR> [OUT_DIR]}
CKPT=${2:?need a checkpoint (model_dtu.ckpt or orbax dir)}
DTU_GT=${3:?need the DTU ground-truth dir (Points/stl + ObsMask)}
OUT=${4:-./outputs/dtu}

python -m transmvsnet_tpu.tools.infer \
  --datapath "$DTU_TEST" \
  --testlist lists/dtu/test.txt \
  --outdir "$OUT/depth" \
  --loadckpt "$CKPT" \
  --num_view 5 \
  --numdepth 192 \
  --interval_scale 1.06 \
  --max_h 864 --max_w 1152 \
  --ndepths 48,32,8

python -m transmvsnet_tpu.tools.fuse \
  --testpath "$OUT/depth" \
  --testlist lists/dtu/test.txt \
  --outdir "$OUT/plys" \
  --test_dataset dtu \
  --filter_method dynamic \
  --thres_view 3

python -m transmvsnet_tpu.tools.eval_dtu \
  --plydir "$OUT/plys" \
  --gtpath "$DTU_GT"
