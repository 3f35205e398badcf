#!/bin/bash
# Round-4 TPU queue, fourth pass: full semantic validation with the fixed
# FISTA elastic-net probe (the ridge shortcut overfit badly at the probe's
# real feature count and bf16 matmul precision corrupted the solve).
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

wait_tpu
echo "=== semantic validation (full, enet probe) ==="
timeout 16000 python tools/semantic_validation.py --stage all -v 500
echo "queue done rc=$?"
