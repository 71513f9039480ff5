#!/bin/bash
# GAMER flagship training (parity: ref scripts/train_SMB_decoder.sh).
# Usage: dataset=ShortVideoAD backbone=Qwen3Multi tasks=smb_explicit_decoder_4 bash scripts/train_SMB_decoder.sh
set -e
cd "$(dirname "$0")/.."
. scripts/common.sh
: ${backbone:=Qwen3Multi}
# backbone -> shipped config dir (ref scripts/train_SMB_decoder.sh:22-40);
# base_model="" selects the built-in preset (same values)
case "${base_model=auto}" in
  auto)
    case "$backbone" in
      TIGER|PBATransformer|Qwen3Multi|Qwen3SessionMulti|Qwen3Moe|Qwen3SessionMoe)
        base_model=./config/s2s-models/$backbone ;;
      Qwen3MoeAction) base_model=./config/s2s-models/Qwen3ActionMoe ;;
      Qwen3|Qwen3Session) base_model=./config/s2s-models/Qwen3-Light ;;
      *) base_model= ;;
    esac ;;
esac
base_model_arg=""
if [ -n "$base_model" ]; then base_model_arg="--base_model $base_model"; fi
: ${tasks:=smb_explicit_decoder_4}
: ${batch_size:=1024}
: ${micro_batch_size:=256}
: ${epochs:=200}
: ${lr:=5e-4}
: ${temperature:=0.7}
: ${patience:=20}
: ${max_his_len:=100}
: ${output_dir:=./checkpoint/${dataset}/${backbone}-${tasks}-${tok_tag}}
python main.py train_SMB_decoder \
    --dataset "$dataset" --data_path "$data_path" --seed "$seed" \
    --tasks "$tasks" --backbone "$backbone" --index_file "$index_file" \
    --max_his_len "$max_his_len" --epochs "$epochs" --batch_size "$batch_size" \
    --micro_batch_size "$micro_batch_size" --learning_rate "$lr" \
    --temperature "$temperature" --patience "$patience" \
    --output_dir "$output_dir" $base_model_arg $(expand_extra_args) "$@"
