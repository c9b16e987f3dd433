#!/bin/bash
# Queued TPU runs for when the tunnel relay returns (VERDICT r4 items 1-3).
# Polls the relay port (the stdio tunnel .tpu_init.py listens on 8093;
# connection-refused = relay process dead, cannot be revived from inside),
# then runs the full measurement queue sequentially — ONE TPU process at a
# time is a hard constraint on this chip.
#
#   bash scripts/chip_queue.sh [poll_seconds]
#
# Logs to /tmp/chip_queue.log; writes its pid to /tmp/chip_queue.pid so it
# can be stopped with `kill $(cat /tmp/chip_queue.pid)`.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/chip_queue.pid
POLL=${1:-60}
LOG=/tmp/chip_queue.log

log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "waiting for TPU relay (port 8093, poll ${POLL}s)..."
while ! python - <<'EOF' 2>/dev/null
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8093), 2).close()
except OSError:
    sys.exit(1)
EOF
do sleep "$POLL"; done
log "relay is UP — starting queue"

run() {
  local name=$1; shift
  log "START $name: $*"
  if timeout "$TO" "$@" >> "$LOG" 2>&1; then
    log "OK    $name"
  else
    log "FAIL  $name (rc=$?)"
  fi
}

# 1. Headline bench (writes nothing in-tree; driver captures BENCH_rN —
#    this preview proves the numbers early and warms nothing it shouldn't).
TO=3600 run bench python bench.py
# 2. Train roofline segments (artifacts/train_roofline.json).
TO=3600 run roofline python benchmarks/train_roofline.py
# 3. Zoo smoke, all keys (artifacts/zoo_smoke.json).
TO=5400 run zoo_smoke python benchmarks/zoo_tpu_smoke.py
# 4. xBD bench (artifacts/xbd_bench.json).
TO=5400 run xbd_bench python benchmarks/bench_xbd.py
# 5. 200-epoch LEVIR fixture curve (artifacts/learning_curves.json).
TO=10800 run levir_curve python benchmarks/learning_curves.py \
    --only levir --levir_epochs 200

log "queue complete"
rm -f /tmp/chip_queue.pid
