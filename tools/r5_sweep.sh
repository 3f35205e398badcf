#!/bin/bash
set -u
cd "$(dirname "$0")/.."
until python tools/tpu_probe.py --timeout 90; do
  echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"; sleep 120
done
echo "=== struct size sweep $(date -u +%H:%M:%S) ==="
timeout 14400 python tools/struct_sweep.py
echo "sweep done rc=$? $(date -u +%H:%M:%S)"
