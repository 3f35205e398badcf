#!/bin/bash
# Round-5 TPU queue, first pass: the full semantic validation (VERDICT r4
# missing #1/#2 — produce and commit results/semantic_validation.json so the
# ft-beats-fs and retrieval gates assert instead of skipping). Stages run
# through tools/semantic_validation.py, which checkpoints and resumes, so a
# tunnel drop mid-run loses at most one checkpoint interval.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

for attempt in 1 2 3; do
  wait_tpu
  echo "=== semantic validation (full, attempt $attempt) $(date -u +%H:%M:%S) ==="
  timeout 14400 python tools/semantic_validation.py --stage all -v 500
  rc=$?
  echo "semantic validation rc=$rc"
  [ $rc -eq 0 ] && break
done
echo "queue done rc=$rc $(date -u +%H:%M:%S)"
