#!/bin/bash
# GAMER flagship eval (parity: ref scripts/test_SMB_decoder.sh).
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=Qwen3Multi}
: ${tasks:=smb_explicit_decoder_4}
: ${test_task:=smb_explicit}
: ${num_beams:=20}
: ${test_batch_size:=128}
: ${max_his_len:=100}
: ${ckpt_path:=./checkpoint/${dataset}/${backbone}-${tasks}-${tok_tag}}
: ${results_file:=./results/${dataset}/${backbone}-${tasks}-${tok_tag}-${test_task}.json}
: ${ckpt_num:=best}
# ref test_SMB_decoder.sh:96-102: ckpt_num=N selects an intermediate
# checkpoint; ours are epoch_N snapshot tags inside ckpt_path
if [[ "$ckpt_num" == "best" || "$ckpt_num" == "last" ]]; then
    : ${ckpt_tag:=$ckpt_num}
else
    : ${ckpt_tag:=epoch_${ckpt_num}}
    echo "Using checkpoint from epoch ${ckpt_num}."
fi
python main.py test_SMB_decoder \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --test_task "$test_task" --index_file "$index_file" \
    --max_his_len "$max_his_len" --num_beams "$num_beams" \
    --test_batch_size "$test_batch_size" --ckpt_path "$ckpt_path" --ckpt_tag "$ckpt_tag" \
    --results_file "$results_file" $(expand_extra_args) "$@"
