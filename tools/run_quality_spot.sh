#!/bin/bash
# Supervised spot quality run (VERDICT round-5 item 1 + 5).
#
# Runs the full two-pass spot recovery under the stall watchdog: train.py
# exits rc=3 when a device->host sync wedges (dead axon tunnel, round-4
# post-mortem in QUALITY.md); this loop restarts it, and --resume
# (default-on) continues from the last periodic checkpoint instead of
# losing the run.  FRESH=1 (default) clears the output dir first so stale
# checkpoints from older attempts can't be silently resumed.
#
# Usage: FRESH=1 ITERS=300 bash tools/run_quality_spot.sh
set -u
cd "$(dirname "$0")/.."

OUT=out/${OUT_NAME:-spot}
if [ "${FRESH:-1}" = "1" ]; then
  echo "[supervisor] fresh start: clearing $OUT"
  rm -rf "$OUT"
fi

# The axon tunnel relay (127.0.0.1:8113 = remote_compile) dies with the
# TPU worker and can stay down for minutes; don't burn restart attempts
# against a dead tunnel — wait for the port to accept first.
wait_tunnel() {
  for i in $(seq 1 "${TUNNEL_WAIT_MIN:-120}"); do
    if python - <<'EOF'
import socket, sys
s = socket.socket()
s.settimeout(5)
try:
    s.connect(('127.0.0.1', 8113)); sys.exit(0)
except OSError:
    sys.exit(1)
finally:
    s.close()
EOF
    then return 0; fi
    [ "$i" = 1 ] && echo "[supervisor] tunnel down; waiting (up to ${TUNNEL_WAIT_MIN:-120} min)"
    sleep 60
  done
  echo "[supervisor] tunnel still down after ${TUNNEL_WAIT_MIN:-120} min"
  return 1
}

for attempt in $(seq 1 "${MAX_RESTARTS:-12}"); do
  # SKIP_TUNNEL_WAIT=1 for CPU runs (JAX_PLATFORMS=cpu) — no tunnel needed
  if [ "${SKIP_TUNNEL_WAIT:-0}" != "1" ]; then
    wait_tunnel || exit 2
  fi
  echo "[supervisor] attempt $attempt at $(date -u +%H:%M:%S)"
  timeout "${ATTEMPT_TIMEOUT:-18000}" nice -n "${NICENESS:-0}" python train.py \
      --config "${CONFIG:-configs/spot.json}" \
      -i "${ITERS:-300}" --validate true \
      --save-interval "${SAVE_INTERVAL:-50}" \
      --checkpoint-interval "${CKPT_INTERVAL:-25}" \
      ${EXTRA_FLAGS:-}
  rc=$?
  echo "[supervisor] attempt $attempt exited rc=$rc at $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then
    echo "[supervisor] run complete"
    exit 0
  fi
  sleep 30
done
echo "[supervisor] giving up after ${MAX_RESTARTS:-12} attempts"
exit 1
