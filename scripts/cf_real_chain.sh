#!/bin/bash
# Real reference CF embeddings (the only real data in the mount) through the
# RQ-VAE tokenizer chain, one dataset per invocation: $1 in {Instruments,
# Beauty, Yelp}. CPU-safe (forces JAX_PLATFORMS=cpu); results land in
# runs/cf_real/<dataset>/. See docs/benchmarks.md "Real reference data".
set -e
DS=$1
[ -n "$DS" ] || { echo "usage: $0 <Beauty|Yelp|Instruments>"; exit 1; }
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=cpu
EMB=/root/reference/pretrained_ckpt/cf-embs/${DS}-32d-sasrec.pt
OUT=runs/cf_real/$DS
mkdir -p "$OUT" /tmp/cf_data/$DS
python main.py RQVAE --dataset "$DS" --data_path /tmp/cf_data \
  --emb_file "$EMB" --cf_emb_file "$EMB" --alpha 0.02 \
  --output_dir "$OUT/rqvae" --epochs 300 --batch_size 1024 \
  --num_emb 256 --num_levels 3 --e_dim 32 --layers 256,128,64 \
  --kmeans_init --seed 7 > "$OUT/train.log" 2>&1
python main.py tokenize --mode rq_vae --dataset "$DS" --data_path /tmp/cf_data \
  --ckpt_path "$OUT/rqvae" --ckpt_tag best_collision --epoch 300 \
  --emb_file "$EMB" --seed 7 > "$OUT/tokenize.log" 2>&1
cp /tmp/cf_data/$DS/${DS}.index.*.json "$OUT/" 2>/dev/null || true
echo "$DS done"
grep -E "best|collision" "$OUT/train.log" | tail -3
tail -5 "$OUT/tokenize.log"
