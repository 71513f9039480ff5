#!/bin/bash
# Round-3 perf rail: run after the quality run finishes (TPU exclusive!).
# Each stage logs to runs/perf_r3/<name>.log; a failed stage doesn't stop
# the rail. Probe first; skip everything if the tunnel is wedged.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/gamer_tpu_xla
OUT=runs/perf_r3
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
stage bench python bench.py
stage hbm_inventory python scripts/hbm_inventory.py
stage microbatch python scripts/bench_microbatch.py
stage long_context python scripts/bench_long_context.py
stage dropout_ab python scripts/bench_dropout_ab.py
stage decode python scripts/bench_decode.py
stage bench_final python bench.py
# runs/ is gitignored: copy the evidence into the tracked artifacts/ dir so
# results landing after the session ends still reach the committed tree
mkdir -p artifacts/perf_r3
cp "$OUT"/*.log artifacts/perf_r3/ 2>/dev/null
echo "[$(date +%H:%M:%S)] perf rail complete (logs copied to artifacts/perf_r3)"
