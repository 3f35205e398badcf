#!/bin/bash
# Round-5 TPU queue, second pass (launch after r5_tpu_queue.sh's semantic
# validation lands): the remaining VERDICT r4 measurements, short decisive
# runs first.
#   1. MAE sequence-packing A/B (r4 #3): pack_tokens 1 vs 2 vs 4 at B=1024.
#   2. ViT-H per-piece breakdown (r4 weak #4).
#   3. compare_predictors size sweep on the structured survey (r4 #2).
#   4. JEPA learning evidence (r4 #7).
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

wait_tpu
echo "=== MAE packing A/B $(date -u +%H:%M:%S) ==="
timeout 2400 python -c "
import bench
for pack in (1, 2, 4):
    rate, gf = bench.bench_mae(B=1024, pack_tokens=pack)
    mfu = rate * gf / (bench.PEAK_BF16_TFLOPS * 1e3) * 100
    print(f'mae B=1024 pack={pack}: {rate:.1f} img/s  mfu={mfu:.1f}%', flush=True)
"

wait_tpu
echo "=== ViT-H breakdown $(date -u +%H:%M:%S) ==="
timeout 3600 python tools/vith_breakdown.py -n 10

wait_tpu
echo "=== struct size sweep $(date -u +%H:%M:%S) ==="
timeout 14400 python tools/struct_sweep.py

wait_tpu
echo "=== JEPA validation $(date -u +%H:%M:%S) ==="
timeout 10800 python tools/jepa_validation.py -v 500
echo "queue2 done rc=$? $(date -u +%H:%M:%S)"
