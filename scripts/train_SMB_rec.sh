#!/bin/bash
# Discriminative SMB training (parity: ref scripts/train_SMB_rec.sh).
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=SASRec}
: ${tasks:=smb_dis}
: ${epochs:=100}
: ${batch_size:=256}
: ${lr:=1e-3}
: ${output_dir:=./checkpoint/${dataset}/${backbone}-${tasks}}
python main.py train_SMB_rec \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --tasks "$tasks" --backbone "$backbone" --max_his_len "$max_his_len" \
    --epochs "$epochs" --batch_size "$batch_size" --learning_rate "$lr" \
    --output_dir "$output_dir" $(expand_extra_args) "$@"
