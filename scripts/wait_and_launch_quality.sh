#!/bin/bash
# Probe the TPU until it answers, then launch the quality run.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "[$(date +%H:%M:%S)] waiting for TPU tunnel..."
while true; do
  if timeout 180 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print(float(np.asarray((x@x).sum())))" >/dev/null 2>&1; then
    echo "[$(date +%H:%M:%S)] TPU alive — launching quality run"
    break
  fi
  echo "[$(date +%H:%M:%S)] still wedged; retry in 180s"
  sleep 180
done
exec python scripts/quality_run.py
