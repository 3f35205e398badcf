#!/bin/bash
# Round-4 TPU queue, second pass (first pass: /tmp/r4_queue_run1.log —
# MAE B=2048 OOM'd on the decoder stash, ft_breakdown crashed on a donated
# params tree, ViT-H stream sweep found non-default slabs SIGKILL the
# compile helper). Short decisive runs first, the long semantic validation
# last; re-probes the tunnel before every stage.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

wait_tpu
echo "=== MAE B=2048 decoder-stash-off ==="
timeout 1800 python -c "
import bench
rate, gf = bench.bench_mae(B=2048, stash_decoder=False)
print(f'mae B=2048 nodecstash: {rate:.1f} img/s  mfu={rate*gf/(bench.PEAK_BF16_TFLOPS*1e3)*100:.1f}%', flush=True)
"

wait_tpu
echo "=== MAE B=1024 decoder-stash-off (iso-batch control) ==="
timeout 1800 python -c "
import bench
rate, gf = bench.bench_mae(B=1024, stash_decoder=False)
print(f'mae B=1024 nodecstash: {rate:.1f} img/s  mfu={rate*gf/(bench.PEAK_BF16_TFLOPS*1e3)*100:.1f}%', flush=True)
"

wait_tpu
echo "=== ft breakdown (fixed) ==="
timeout 2400 python tools/ft_breakdown.py -n 20

wait_tpu
echo "=== semantic validation (full) ==="
timeout 18000 python tools/semantic_validation.py --stage all -v 500
echo "queue done rc=$?"
