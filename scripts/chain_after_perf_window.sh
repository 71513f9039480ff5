#!/bin/bash
# Round-4 sequencing v2: once scripts/perf_round4_window.sh finishes its TPU
# stages, A/B the expert-major MoE layout (runs/wt_moemajor worktree) against
# main — bench main LAST again so drift is visible — then run the flagship
# quality driver (markers skip everything but the new TIGER arm). Keeps the
# chip strictly single-tenant.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/gamer_tpu_xla
OUT=runs/perf_r4

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

while ! grep -q "perf window complete" runs/perf_r4/window.log 2>/dev/null; do
  sleep 120
done
echo "[$(date +%H:%M:%S)] perf window done — moemajor A/B"
stage bench_moemajor env PYTHONPATH=/root/repo/runs/wt_moemajor:/root/.axon_site \
  python /root/repo/runs/wt_moemajor/bench.py
stage bench_c python bench.py
cp "$OUT"/bench_moemajor.log "$OUT"/bench_c.log artifacts/perf_r4/ 2>/dev/null
echo "[$(date +%H:%M:%S)] launching flagship tiger arm"
python scripts/quality_run.py --profile flagship
echo "[$(date +%H:%M:%S)] flagship driver exited"
