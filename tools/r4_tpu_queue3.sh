#!/bin/bash
# Round-4 TPU queue, third pass: fixed ft_breakdown (the optimizer timers
# donated each other's params — run 2 got full-step/encoder/head numbers
# only), then the long semantic validation.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

wait_tpu
echo "=== ft breakdown (fixed v2) ==="
timeout 2400 python tools/ft_breakdown.py -n 20

wait_tpu
echo "=== semantic validation (full) ==="
timeout 18000 python tools/semantic_validation.py --stage all -v 500
echo "queue done rc=$?"
