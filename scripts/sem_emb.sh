#!/bin/bash
# Item text embeddings (parity: ref scripts/sem_emb.sh).
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${plm_name:=hash}
: ${plm_checkpoint:=}
args=""
[ -n "$plm_checkpoint" ] && args="--plm_checkpoint $plm_checkpoint"
python main.py SemEmb \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --plm_name "$plm_name" $args $(expand_extra_args) "$@"
