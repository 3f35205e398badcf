#!/bin/bash
# Round-4 TPU work queue (consolidated, resilient: re-probes the tunnel
# before every stage — it has dropped twice today):
#   1. MAE at B=2048 (VERDICT r3 #4a — the flagship's OOM argument does not
#      carry over to the N=17 stash; measure it instead of assuming).
#   2. Predictor fine-tune per-stage breakdown (VERDICT r3 #6).
#   3. ViT-H weight-streaming backward kernel tile sweep (VERDICT r3 #5 —
#      model-level default-tile A/B was negative, 400.9 vs 407.2 img/s;
#      this decides whether a non-default slab can win).
#   4. Full semantic validation on the structured synthetic survey
#      (VERDICT r3 #1): pretrain w/ rising probes -> z fine-tune vs
#      from-scratch -> same-class simsearch precision. Resumable per-stage.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

wait_tpu
echo "=== MAE B=2048 ==="
timeout 1800 python -c "
import bench
rate, gf = bench.bench_mae(B=2048)
print(f'mae B=2048: {rate:.1f} img/s  mfu={rate*gf/(bench.PEAK_BF16_TFLOPS*1e3)*100:.1f}%', flush=True)
"

wait_tpu
echo "=== ft breakdown ==="
timeout 2400 python tools/ft_breakdown.py -n 20

wait_tpu
echo "=== tune_tiles vith stream sweep (3D) ==="
timeout 1800 python tools/tune_tiles.py --geom vith --mlp-stream --mlp 0,256,512

wait_tpu
echo "=== semantic validation (full) ==="
timeout 18000 python tools/semantic_validation.py --stage all -v 500
echo "queue done rc=$?"
