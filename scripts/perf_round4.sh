#!/bin/bash
# Round-4 perf prelude: SHORT (~30-45 min) — runs BEFORE the flagship quality
# chain so the byte-reduction attack (VERDICT r4 #5) and micro-batch op naming
# (#6) have their target data while the quality run owns the chip.
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
    probe || { echo "tunnel wedged — aborting rail"; exit 1; }
  fi
}

probe || { echo "tunnel wedged — nothing to do"; exit 1; }
stage byte_targets python scripts/byte_targets.py
stage profile_trace python scripts/profile_trace.py
mkdir -p artifacts/perf_r4
cp "$OUT"/*.log artifacts/perf_r4/ 2>/dev/null
echo "[$(date +%H:%M:%S)] perf prelude complete (logs in artifacts/perf_r4)"
