#!/usr/bin/env bash
# LEVIR-CD training recipe — the rebuild of the reference scripts/run_cd.sh
# (reference :1-37): DAHiTra (newUNetTrans), lr 0.001, linear decay,
# 200 epochs, 256px, batch 4. bf16 keeps the MXU on the fast path.
set -e

gpus=0                       # device ordinals for the mesh (e.g. 0,1 = data parallel)
checkpoint_root=checkpoints
data_name=LEVIR
img_size=256
batch_size=4
lr=0.001
max_epochs=200
net_G=newUNetTrans
lr_policy=linear
split=train
split_val=val
project_name=CROP_${net_G}_${data_name}_b${batch_size}_lr${lr}_${split}_${split_val}_${max_epochs}_${lr_policy}_ce

python -m dahitra_tpu.cli.main_cd \
    --gpu_ids ${gpus} \
    --checkpoint_root ${checkpoint_root} \
    --data_name ${data_name} \
    --img_size ${img_size} \
    --batch_size ${batch_size} \
    --lr ${lr} \
    --max_epochs ${max_epochs} \
    --net_G ${net_G} \
    --lr_policy ${lr_policy} \
    --split ${split} \
    --split_val ${split_val} \
    --project_name ${project_name} \
    --bf16
