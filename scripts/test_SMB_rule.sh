#!/bin/bash
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${num_items:=20}
: ${results_file:=./results/${dataset}/rule.json}
python main.py test_SMB_rule \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --index_file "$index_file" --max_his_len "$max_his_len" \
    --num_items "$num_items" --results_file "$results_file" --unique $(expand_extra_args) "$@"
