#!/bin/bash
# One-shot TPU measurement battery: run everything that needs the chip,
# each step independent, logs under scratch/tpu_logs/.
# Usage: bash scripts/tpu_battery.sh [quick]
set -u
cd "$(dirname "$0")/.."
mkdir -p scratch/tpu_logs
TS=$(date +%m%d-%H%M)
log() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

log "0: device probe"
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting battery"; exit 1; }

log "1: Mosaic validation sweep"
timeout 1800 python -u scripts/tpu_validate.py --quick \
  2>&1 | tee scratch/tpu_logs/validate-$TS.log | tail -5

log "2: per-pass stream profile (3.3M bench matrix)"
timeout 1200 python -u scripts/profile_stream.py \
  2>&1 | tee scratch/tpu_logs/profile-$TS.log | tail -15

log "3: driver bench (full zoo)"
timeout 2400 python -u bench.py \
  2>&1 | tee scratch/tpu_logs/bench-$TS.log | tail -20

log "4: autotune refit on the bench matrix"
timeout 1800 python -u -m spmv_tpu.bench.harness --synthetic powerlaw \
  --nnz 3300000 --rows 1048576 --plan-dir scratch/plans \
  --autotune scratch/tpu_logs/tuned-$TS.json stream \
  2>&1 | tee scratch/tpu_logs/autotune-$TS.log | tail -10

if [ "${1:-}" != "quick" ]; then
  log "5: 100M-nnz stream reach (plan pre-built on disk)"
  timeout 3600 python -u scripts/run_big_stream.py \
    2>&1 | tee scratch/tpu_logs/big100m-$TS.log | tail -8

  log "6: SpMM window kernel bench"
  timeout 1800 python -u scripts/bench_spmm.py \
    2>&1 | tee scratch/tpu_logs/spmm-$TS.log | tail -8

  log "7: 234M-nnz stream reach (com-Orkut scale, plan pre-built)"
  timeout 5400 python -u scripts/run_big_stream.py 234000000 8388608 \
    2>&1 | tee scratch/tpu_logs/big234m-$TS.log | tail -8

  log "8: ops layer bench (spgemm numeric / sptrsv / ilu0 / cg)"
  timeout 1800 python -u scripts/bench_ops.py quick \
    2>&1 | tee scratch/tpu_logs/ops-$TS.log | tail -8
fi

log "battery done"
