#!/usr/bin/env bash
# DTU training recipe (reference scripts/train.sh:9-24): 16 epochs,
# effective batch 16 (8 replicas x batch 2 in the reference; here batch 2
# per data-shard of the mesh), lr 1e-3, decay x0.5 at epochs 6/8/12,
# 48/32/8 cascade, 5 views, 192 hypotheses, interval_scale 1.06.
set -euo pipefail
DTU_TRAINING=${1:?usage: train_dtu.sh <DTU_TRAINING_DIR> [LOG_DIR]}
LOG_DIR=${2:-./checkpoints/dtu}

python -m transmvsnet_tpu.tools.train \
  --dataset dtu \
  --datapath "$DTU_TRAINING" \
  --trainlist lists/dtu/train.txt \
  --testlist lists/dtu/val.txt \
  --logdir "$LOG_DIR" \
  --epochs 16 \
  --lr 0.001 \
  --lrepochs 6,8,12:2 \
  --batch_size 2 \
  --nviews 5 \
  --numdepth 192 \
  --interval_scale 1.06 \
  --ndepths 48,32,8 \
  --depth_inter_r 4,1,0.5 \
  --dlossw 1.0,1.0,1.0 \
  --dtype bfloat16 \
  "$@"
