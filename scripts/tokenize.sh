#!/bin/bash
# Semantic-ID emission (parity: ref scripts/tokenize.sh): mode via env.
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${mode:=rq_vae}
: ${ckpt_path:=./checkpoint/${dataset}/rqvae-alpha${alpha}-beta${beta}}
python main.py tokenize \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --mode "$mode" --ckpt_path "$ckpt_path" --alpha "$alpha" --beta "$beta" \
    --chunk_size "$chunk_size" $(expand_extra_args) "$@"
