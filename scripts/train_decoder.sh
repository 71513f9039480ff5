#!/bin/bash
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=TIGER}
: ${epochs:=200}
: ${batch_size:=256}
: ${lr:=5e-4}
: ${temperature:=1.0}
: ${output_dir:=./checkpoint/${dataset}/${backbone}-seqrec-${tok_tag}}
python main.py train_decoder \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --backbone "$backbone" --index_file "$index_file" --max_his_len "$max_his_len" \
    --epochs "$epochs" --batch_size "$batch_size" --learning_rate "$lr" \
    --temperature "$temperature" --output_dir "$output_dir" $(expand_extra_args) "$@"
