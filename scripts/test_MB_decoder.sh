#!/bin/bash
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=Qwen3}
: ${tasks:=mb_explicit_decoder_4}
: ${test_task:=mb_explicit}
: ${num_beams:=20}
: ${ckpt_path:=./checkpoint/${dataset}/${backbone}-${tasks}-${tok_tag}}
: ${results_file:=./results/${dataset}/${backbone}-${tasks}-${tok_tag}-mb.json}
: ${ckpt_num:=best}
# ref test_SMB_decoder.sh:96-102: ckpt_num=N selects an intermediate
# checkpoint; ours are epoch_N snapshot tags inside ckpt_path
if [[ "$ckpt_num" == "best" || "$ckpt_num" == "last" ]]; then
    : ${ckpt_tag:=$ckpt_num}
else
    : ${ckpt_tag:=epoch_${ckpt_num}}
    echo "Using checkpoint from epoch ${ckpt_num}."
fi
python main.py test_MB_decoder \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --test_task "$test_task" --index_file "$index_file" --max_his_len "$max_his_len" \
    --num_beams "$num_beams" --ckpt_path "$ckpt_path" --ckpt_tag "$ckpt_tag" \
    --results_file "$results_file" $(expand_extra_args) "$@"
