#!/bin/bash
# Watcher: wait for the v3-flagship quality driver to exit (chip free), then
# run the round-5 perf rail. Poll by process table — the driver owns the TPU
# for its whole chain (train + eval stages).
set -u
REPO=/root/repo
LOG=$REPO/runs/perf_r5_watch.log
mkdir -p "$REPO/runs"
echo "[$(date -u +%H:%M:%S)] watching for v3 driver exit" >> "$LOG"
while pgrep -f "quality_run.py --profile v3-flagship" > /dev/null; do
  sleep 120
done
echo "[$(date -u +%H:%M:%S)] v3 driver gone; cooling down 120s" >> "$LOG"
sleep 120
bash "$REPO/scripts/perf_round5.sh" >> "$LOG" 2>&1
