#!/bin/bash
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=Qwen3}
: ${tasks:=mb_explicit_decoder_4}
: ${epochs:=200}
: ${batch_size:=256}
: ${lr:=5e-4}
: ${temperature:=0.7}
: ${output_dir:=./checkpoint/${dataset}/${backbone}-${tasks}-${tok_tag}}
python main.py train_MB_decoder \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --tasks "$tasks" --backbone "$backbone" --index_file "$index_file" \
    --max_his_len "$max_his_len" --epochs "$epochs" --batch_size "$batch_size" \
    --learning_rate "$lr" --temperature "$temperature" \
    --output_dir "$output_dir" $(expand_extra_args) "$@"
