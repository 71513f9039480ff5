#!/bin/bash
# Round-4 TPU sequence (post-adoption): bench main with the adopted
# single-mul dropout mixer + expert-major MoE layout (expect ~940 seq/s if
# the individually-measured gains compose), then the flagship TIGER retrain
# (single driver this time — the 16:42 UTC race came from an unverified
# kill of the previous sequencer), then a final bench.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/gamer_tpu_xla
OUT=runs/perf_r4
mkdir -p "$OUT" artifacts/perf_r4

stage() {
  name=$1; shift
  if [ -e "$OUT/.done.$name" ]; then echo "skip $name"; return; fi
  echo "[$(date +%H:%M:%S)] stage $name"
  if timeout 3000 "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/.done.$name"
    echo "[$(date +%H:%M:%S)] $name ok: $(tail -1 "$OUT/$name.log")"
  else
    echo "[$(date +%H:%M:%S)] $name FAILED (see $OUT/$name.log)"
  fi
}

stage bench_adopted python bench.py
cp "$OUT"/bench_adopted.log artifacts/perf_r4/ 2>/dev/null
echo "[$(date +%H:%M:%S)] launching flagship tiger retrain"
python scripts/quality_run.py --profile flagship
stage bench_final python bench.py
cp "$OUT"/bench_final.log artifacts/perf_r4/ 2>/dev/null
echo "[$(date +%H:%M:%S)] round4 TPU sequence complete"
