#!/bin/bash
# One-shot on-chip A/B for the row-flat MLP tiling (SKY_MLP_ROWS) and the
# weight-streaming ViT-H backward (SKY_MLP_STREAM) — VERDICT r3 #4/#5.
#
# The layouts are module-import-time constants, so each variant runs in its
# own subprocess. Stages re-use bench.py's stage functions verbatim so the
# numbers are comparable with BENCH_r0N.json rows.
#
#   bash tools/ab_rows.sh 2>&1 | tee /tmp/ab_rows.log
set -u
cd "$(dirname "$0")/.."

python tools/tpu_probe.py --timeout 90 || { echo "TPU down - aborting"; exit 1; }

run_stage() {  # $1=stage  $2=SKY_MLP_ROWS  $3=SKY_MLP_STREAM
  echo "=== stage=$1 rows=$2 stream=$3 ==="
  SKY_MLP_ROWS=$2 SKY_MLP_STREAM=$3 timeout 1200 python -c "
import bench
stage = '$1'
if stage == 'flagship':
    B, step, params, opt_state, imgs, key = bench._build()
    rate, *_ = bench.bench_device_step(B, step, params, opt_state, imgs, key)
    gf = bench.MODEL_GFLOP_PER_IMG
else:
    rate, gf = getattr(bench, 'bench_' + stage)()
print(f'{stage}: {rate:.1f} img/s  mfu={rate*gf/(bench.PEAK_BF16_TFLOPS*1e3)*100:.1f}%', flush=True)
"
}

# rows-layout A/B on the geometries where the 3D padding bites
for stage in mae flagship vit_l; do
  for rows in 0 1; do
    run_stage "$stage" "$rows" 0
  done
done

# ViT-H: current recipe (XLA mlp) vs the weight-streaming fused backward
run_stage vit_h 1 0   # baseline: wide -> xla_mlp_block dispatch
run_stage vit_h 1 1   # stream backward
run_stage vit_h 0 1   # stream backward, 3D-layout forward

# kernel-level rows sweeps (ms/layer) at the MAE-encoder geometry
echo "=== tune_tiles maeenc rows sweep ==="
SKY_MLP_ROWS=1 timeout 1200 python tools/tune_tiles.py --geom maeenc \
  --rows --mlp-fwd 0,512,1024,2048 --mlp 0,1024,2048
echo "=== tune_tiles maeenc 3D reference ==="
timeout 1200 python tools/tune_tiles.py --geom maeenc --mlp-fwd 0 --mlp 0
echo "=== tune_tiles vitb rows sweep ==="
SKY_MLP_ROWS=1 timeout 1200 python tools/tune_tiles.py --geom vitb \
  --rows --mlp-fwd 0,256,512,1024 --mlp 0,1024,2080
echo "=== tune_tiles vitb 3D reference ==="
timeout 1200 python tools/tune_tiles.py --geom vitb --mlp-fwd 0 --mlp 0
echo "=== tune_tiles vith stream sweep (rows) ==="
SKY_MLP_ROWS=1 timeout 1200 python tools/tune_tiles.py --geom vith \
  --rows --mlp-stream --mlp 0,256,512
echo "done"
