#!/usr/bin/env bash
# LEVIR-CD evaluation recipe — the rebuild of the reference scripts/eval.sh
# (:1-21): 16-patch sweep of the test tiles against the best checkpoint.
set -e

gpus=0
data_name=LEVIR
net_G=newUNetTrans
split=test
project_name=CROP_newUNetTrans_LEVIR_b4_lr0.001_train_val_200_linear_ce
checkpoint_root=checkpoints

python -m dahitra_tpu.cli.eval_cd \
    --gpu_ids ${gpus} \
    --data_name ${data_name} \
    --net_G ${net_G} \
    --split ${split} \
    --project_name ${project_name} \
    --checkpoint_root ${checkpoint_root} \
    --num_patches 16 \
    --bf16
