#!/bin/bash
# Round-4 sequencing: once scripts/perf_round4_window.sh finishes its TPU
# stages, run the flagship quality driver — markers in runs/quality_r3 skip
# every completed arm, so only the new TIGER stage (own budget, see
# quality_run.py tiger_budget) trains + evals. Keeps the chip strictly
# single-tenant: poll the window's completion line, never overlap.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

while ! grep -q "perf window complete" runs/perf_r4/window.log 2>/dev/null; do
  # if the window died without completing (e.g. "aborting window"), take over
  # its polling role rather than deadlocking
  if grep -q "aborting window" runs/perf_r4/window.log 2>/dev/null \
     && ! pgrep -x bash -a | grep -q perf_round4_window; then
    echo "[$(date +%H:%M:%S)] window aborted; relaunching it"
    nohup bash scripts/perf_round4_window.sh >> runs/perf_r4/window.log 2>&1
  fi
  sleep 120
done
echo "[$(date +%H:%M:%S)] perf window done — launching flagship tiger arm"
python scripts/quality_run.py --profile flagship
echo "[$(date +%H:%M:%S)] flagship driver exited"
