#!/bin/bash
# One-shot on-chip A/B of the pipelined kernel variants (r3).
#
# Times the ViT-B training geometry depth-chains with the baseline
# loop-heads kernels vs the software-pipelined variants
# (attn_block.PIPELINE_FWD/_BWD, mlp_block.PIPELINE_FWD), at the shipped
# default tiles, then runs the on-device kernel parity gate with the
# pipelined variants enabled. Decision rule: flip a PIPELINE_* default to
# on only if its chain time beats baseline by >1% and parity passes.
set -u
cd "$(dirname "$0")/.."
N=${N:-10}

# Fail fast if the tunneled backend is down: a dead tunnel makes every
# stage block ~25 min inside PJRT init before raising UNAVAILABLE.
python tools/tpu_probe.py --timeout 120 || {
    echo "ab_pipeline: TPU unavailable, aborting" >&2; exit 2; }

echo "=== baseline: attn fwd tb=64 / stash-fwd tb=32 / bwd tb=16, mlp tb=16 ==="
python tools/tune_tiles.py --geom vitb --attn-fwd 64 --attn-fwd-stash 32 \
    --attn-bwd 16 --mlp-fwd 16 --mlp 16 -n "$N"

echo "=== pipelined attn fwd ==="
python tools/tune_tiles.py --geom vitb --attn-fwd 32,64 --attn-fwd-stash 16,32 \
    --pipeline -n "$N"

echo "=== pipelined attn bwd (fwd+bwd chain; stash) ==="
python tools/tune_tiles.py --geom vitb --attn-bwd 8,16 --pipeline-bwd -n "$N"

echo "=== pipelined attn fwd+bwd together ==="
python tools/tune_tiles.py --geom vitb --attn-bwd 16 --pipeline --pipeline-bwd -n "$N"

echo "=== pipelined mlp fwd ==="
python tools/tune_tiles.py --geom vitb --mlp-fwd 8,16,32 --mlp-pipeline -n "$N"

echo "=== on-chip parity gate with pipelined variants enabled ==="
SKY_ATTN_PIPELINE=1 SKY_ATTN_PIPELINE_BWD=1 SKY_MLP_PIPELINE=1 \
    python -c "from tools.kernel_parity import run_kernel_parity; import json; print(json.dumps(run_kernel_parity()))"
