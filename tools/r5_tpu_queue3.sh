#!/bin/bash
# Round-5 TPU queue, third pass (after the struct sweep): retrain the ap
# family with the corrected regression-probe recipe, land the committed
# artifacts (sweep curve, semantic validation at the re-pinned N=512 gate),
# then the JEPA learning run and the short perf measurements.
set -u
cd "$(dirname "$0")/.."

wait_tpu() {
  until python tools/tpu_probe.py --timeout 90; do
    echo "$(date -u +%H:%M:%S) TPU down - retrying in 120s"
    sleep 120
  done
}

wait_tpu
echo "=== ap 128/512 retrain (lp_1 recipe; later sizes already ran fixed) ==="
rm -f models/z_struct_ap_128*.ckpt.msgpack models/z_struct_ap_512*.ckpt.msgpack
timeout 7200 python tools/struct_sweep.py -f ap -s 128 512 --skip_plot

wait_tpu
echo "=== sweep curve artifact $(date -u +%H:%M:%S) ==="
timeout 1800 python compare_predictors.py -f z_struct_ft z_struct_fs z_struct_ap \
  -dd data/structured -o compare_predictors_struct --json

wait_tpu
echo "=== semantic validation finetune+simsearch at N=512 $(date -u +%H:%M:%S) ==="
rm -f models/z_struct_ft.ckpt.msgpack models/z_struct_ft_best.ckpt.msgpack \
      models/z_struct_fs.ckpt.msgpack models/z_struct_fs_best.ckpt.msgpack
timeout 7200 python tools/semantic_validation.py --stage finetune -v 250
timeout 3600 python tools/semantic_validation.py --stage simsearch

wait_tpu
echo "=== JEPA validation $(date -u +%H:%M:%S) ==="
timeout 10800 python tools/jepa_validation.py -v 500
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

echo "queue3 done rc=$? $(date -u +%H:%M:%S)"
