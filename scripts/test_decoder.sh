#!/bin/bash
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=TIGER}
: ${num_beams:=20}
: ${ckpt_path:=./checkpoint/${dataset}/${backbone}-seqrec-${tok_tag}}
: ${results_file:=./results/${dataset}/${backbone}-seqrec-${tok_tag}.json}
python main.py test_decoder \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --index_file "$index_file" --max_his_len "$max_his_len" \
    --num_beams "$num_beams" --ckpt_path "$ckpt_path" \
    --results_file "$results_file" $(expand_extra_args) "$@"
