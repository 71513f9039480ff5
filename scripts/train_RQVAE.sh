#!/bin/bash
# RQ-VAE tokenizer training (parity: ref scripts/train_RQVAE.sh).
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${epochs:=20000}
: ${lr:=1e-3}
: ${emb_file:=}
: ${cf_emb_file:=}
: ${output_dir:=./checkpoint/${dataset}/rqvae-alpha${alpha}-beta${beta}}
args=""
[ -n "$emb_file" ] && args="$args --emb_file $emb_file"
[ -n "$cf_emb_file" ] && args="$args --cf_emb_file $cf_emb_file"
python main.py RQVAE \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --epochs "$epochs" --learning_rate "$lr" --alpha "$alpha" --beta "$beta" \
    --kmeans_init --output_dir "$output_dir" $args $(expand_extra_args) "$@"
