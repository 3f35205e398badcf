#!/bin/bash
# Remaining legs of tools/ab_rows.sh (the 2026-08-19 run died after the
# vit_l legs): ViT-H stream-backward A/B + the kernel-level tile sweeps.
# Waits for the TPU tunnel to come back, then runs.
set -u
cd "$(dirname "$0")/.."

until python tools/tpu_probe.py --timeout 90; do
  echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
  sleep 120
done

run_stage() {  # $1=stage  $2=SKY_MLP_ROWS  $3=SKY_MLP_STREAM
  echo "=== stage=$1 rows=$2 stream=$3 ==="
  SKY_MLP_ROWS=$2 SKY_MLP_STREAM=$3 timeout 1200 python -c "
import bench
stage = '$1'
rate, gf = getattr(bench, 'bench_' + stage)()
print(f'{stage}: {rate:.1f} img/s  mfu={rate*gf/(bench.PEAK_BF16_TFLOPS*1e3)*100:.1f}%', flush=True)
"
}

# ViT-H: current recipe (XLA mlp) vs the weight-streaming fused backward
run_stage vit_h 0 0   # baseline: wide -> xla_mlp_block dispatch
run_stage vit_h 0 1   # stream backward, 3D-layout forward
run_stage vit_h 1 1   # stream backward, rows-layout forward

# kernel-level rows sweeps (ms/layer) at the MAE-encoder geometry
echo "=== tune_tiles maeenc rows sweep ==="
SKY_MLP_ROWS=1 timeout 1200 python tools/tune_tiles.py --geom maeenc \
  --rows --mlp-fwd 0,512,1024,2048 --mlp 0,1024,2048
echo "=== tune_tiles maeenc 3D reference ==="
timeout 1200 python tools/tune_tiles.py --geom maeenc --mlp-fwd 0 --mlp 0
echo "=== tune_tiles vith stream sweep (rows) ==="
SKY_MLP_ROWS=1 timeout 1200 python tools/tune_tiles.py --geom vith \
  --rows --mlp-stream --mlp 0,256,512
echo "=== tune_tiles vith stream sweep (3D) ==="
timeout 1200 python tools/tune_tiles.py --geom vith --mlp-stream --mlp 0,256,512
echo "done"
