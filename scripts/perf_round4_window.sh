#!/bin/bash
# Round-4 perf window: run AFTER the flagship quality chain releases the chip.
# Covers VERDICT r4 #5 (byte-target list + attack A/B) and #6 (micro-batch op
# naming), plus the dropout-mixer experiment A/B (runs/wt_dropmix worktree)
# and a final bench. Marker-idempotent; safe to relaunch.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/gamer_tpu_xla
OUT=runs/perf_r4
mkdir -p "$OUT"

probe() {
  timeout 240 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print(float(np.asarray((x@x).sum())))" >/dev/null 2>&1
}

stage() {
  name=$1; shift
  if [ -e "$OUT/.done.$name" ]; then echo "skip $name"; return; fi
  echo "[$(date +%H:%M:%S)] stage $name"
  if timeout 3000 "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/.done.$name"
    echo "[$(date +%H:%M:%S)] $name ok"
  else
    echo "[$(date +%H:%M:%S)] $name FAILED (see $OUT/$name.log)"
    probe || { echo "tunnel wedged — aborting window"; exit 1; }
  fi
}

until probe; do echo "[$(date +%H:%M:%S)] tunnel busy/wedged; retry in 120s"; sleep 120; done
# A/B discipline: bench main FIRST and LAST around the worktree bench so
# cross-measurement drift is visible (CLAUDE.md: only trust same-session A/Bs)
stage bench_a  python bench.py
stage byte_targets  python scripts/byte_targets.py
stage bench_dropmix env PYTHONPATH=/root/repo/runs/wt_dropmix:/root/.axon_site python /root/repo/runs/wt_dropmix/bench.py
stage bench_b  python bench.py
stage profile_trace python scripts/profile_trace.py
mkdir -p artifacts/perf_r4
cp "$OUT"/*.log artifacts/perf_r4/ 2>/dev/null
echo "[$(date +%H:%M:%S)] perf window complete (logs in artifacts/perf_r4)"
