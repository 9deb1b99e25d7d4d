#!/usr/bin/env bash
# BlendedMVS finetune recipe (reference scripts/train_bld_fintune.sh:11-28):
# start from the DTU checkpoint (torch .ckpt converted transparently, or an
# orbax dir), batch 1, 4 views, lr 2e-4, decay at epochs 6/10/14.
set -euo pipefail
BLD_ROOT=${1:?usage: train_bld_finetune.sh <BLENDEDMVS_DIR> <CKPT> [LOG_DIR]}
CKPT=${2:?need a DTU checkpoint (model_dtu.ckpt or orbax dir)}
LOG_DIR=${3:-./checkpoints/bld}

python -m transmvsnet_tpu.tools.train \
  --dataset blended \
  --datapath "$BLD_ROOT" \
  --trainlist lists/bld/training_list.txt \
  --testlist lists/bld/validation_list.txt \
  --logdir "$LOG_DIR" \
  --loadckpt "$CKPT" \
  --loss bld \
  --epochs 10 \
  --lr 0.0002 \
  --lrepochs 6,10,14:2 \
  --batch_size 1 \
  --nviews 4 \
  --numdepth 192 \
  --interval_scale 1.0 \
  --ndepths 48,32,8 \
  --depth_inter_r 4,1,0.5 \
  --dlossw 1.0,1.0,1.0 \
  --dtype bfloat16
