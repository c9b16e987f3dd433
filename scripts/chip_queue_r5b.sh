#!/bin/bash
# Round-5 continuation queue: wait out the tunnel congestion (relay port is
# UP but compute round-trips stall — the round-3 outage mode is port DOWN,
# this is the softer variant), then run this session's chip work in order.
# ONE TPU process at a time is a hard constraint on this chip.
#
#   bash scripts/chip_queue_r5b.sh
#
# Logs to /tmp/chip_queue_r5b.log; pid in /tmp/chip_queue_r5b.pid.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/chip_queue_r5b.pid
LOG=/tmp/chip_queue_r5b.log

log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 150 python -c "
import jax, numpy as np
np.asarray(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
" >/dev/null 2>&1
}

log "waiting for a live compute round-trip (150s probe, 60s poll)..."
until probe; do
  log "probe failed; retry in 60s"
  sleep 60
done
log "tunnel is healthy — starting queue"

run() {
  local name=$1; shift
  log "START $name: $*"
  if timeout "$TO" "$@" >> "$LOG" 2>&1; then
    log "OK    $name"
  else
    log "FAIL  $name (rc=$?)"
  fi
}

# 1. Headline bench preview (driver captures the real BENCH_r05 later).
TO=2400 run bench python bench.py
# 2. Scoped-VMEM-limit cross-process A/B (artifacts/vmem_ab.json).
TO=4800 run vmem_ab python benchmarks/ab_vmem.py
# 3. Re-record the eval roofline: the committed artifact has NaN eval_body
#    (loop-invariance hoist) predating the perturbation fix in the harness.
TO=2400 run eval_roofline python benchmarks/eval_roofline.py

log "queue complete"
rm -f /tmp/chip_queue_r5b.pid
