#!/bin/bash
# Poll the axon tunnel; when it answers, run the full TPU battery.
# Runs inside tmux; writes state to scratch/tpu_watch.log and a
# completion marker to scratch/tpu_battery_done.
set -u
cd "$(dirname "$0")/.."
rm -f scratch/tpu_battery_done
while true; do
  echo "$(date +%H:%M:%S) probing tunnel..." >> scratch/tpu_watch.log
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) tunnel UP - launching battery" >> scratch/tpu_watch.log
    bash scripts/tpu_battery.sh 2>&1 | tee -a scratch/tpu_watch.log
    echo done > scratch/tpu_battery_done
    exit 0
  fi
  sleep 120
done
