#!/bin/bash
# Round-5 perf rail: runs AFTER the v3-flagship quality chain frees the chip.
#   1. fused MoE-FFN kernel A/B (VERDICT r4 next #2) — sandwich jnp/pallas
#   2. decode re-bench on the final tree (VERDICT r4 missing #4 / next #5)
#   3. bench.py sample (current defaults)
# Evidence write-through to artifacts/perf_r5 (runs/ is gitignored and the
# machine has been reset twice mid-round).
set -uo pipefail
REPO=/root/repo
OUT=$REPO/runs/perf_r5
ART=$REPO/artifacts/perf_r5
mkdir -p "$OUT" "$ART"
cd "$REPO"
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[$(date -u +%H:%M:%S)] $name: $*" | tee -a "$OUT/rail.log"
  timeout "$to" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$?
  echo "[$(date -u +%H:%M:%S)] $name rc=$rc" | tee -a "$OUT/rail.log"
  cp "$OUT/$name.log" "$ART/" 2>/dev/null
  return $rc
}

run moe_ab 5400 python scripts/bench_moe_ab.py
run hbm 3600 python scripts/hbm_inventory.py
run decode 3600 python scripts/bench_decode.py --batch 128 --beams 20
run decode_bf16 3600 python scripts/bench_decode.py --batch 128 --beams 20 --cache_dtype bfloat16
run bench 3600 python bench.py
cp "$OUT"/*.log "$ART/" 2>/dev/null
echo "[$(date -u +%H:%M:%S)] rail done" | tee -a "$OUT/rail.log"
