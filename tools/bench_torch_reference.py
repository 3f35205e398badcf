#!/usr/bin/env python
"""Measured PyTorch-reference baseline at the bench geometry (VERDICT r1 #10).

Runs the reference-equivalent torch model (``tests/torch_oracle.py`` —
golden-parity-tested against the JAX framework, same math as
``/root/reference/utils/mim_vit.py``) through the reference's training
iteration — forward, NaN-aware SimMIM loss, backward, AdamW step — on the
hardware available here (CPU; the reference itself is fp32 torch and this
environment has no CUDA), at the flagship bench geometry: ViT-B depth 12,
embed 768, 64x64x5 cutouts, patch 8, norm-pix L1.

Prints one JSON line with measured img/s. This pins a *measured* reference
row for BASELINE.md; the A100 figure in bench.py remains an estimate scaled
from published A100/EPYC ratios, but now anchors to a real measurement:

    a100_estimate = cpu_measured * (a100_fp32_matmul_tflops / cpu_tflops)

is intentionally NOT computed here — we report the raw measured number and
document the scaling argument in BASELINE.md instead.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=64, help="batch size (CPU-sized)")
    ap.add_argument("-n", type=int, default=8, help="timed iterations")
    ap.add_argument("--threads", type=int, default=0, help="torch threads (0=default)")
    args = ap.parse_args()

    import numpy as np
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    from tests.torch_oracle import OracleMaskedAutoencoderViT

    torch.manual_seed(0)
    model = OracleMaskedAutoencoderViT(
        img_size=64, patch_size=8, in_chans=5, embed_dim=768, depth=12,
        num_heads=12, simmim=True, norm_pix_loss=True, loss_fn="L1",
    )
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, betas=(0.9, 0.95),
                            weight_decay=0.05)

    B = args.B
    imgs = torch.randn(B, 5, 64, 64)
    # reference MaskGenerator draws ~U(0, 0.9) ratio channel-wise patch masks
    rng = np.random.default_rng(0)
    n_patches = (64 // 8) ** 2
    mask = np.zeros((B, 5, 64, 64), dtype=np.float32)
    for b in range(B):
        ratio = rng.uniform(0, 0.9)
        k = int(np.ceil(n_patches * ratio))
        for c in range(5):
            chosen = rng.choice(n_patches, size=k, replace=False)
            m = np.zeros(n_patches, np.float32)
            m[chosen] = 1.0
            m = m.reshape(8, 8).repeat(8, 0).repeat(8, 1)
            mask[b, c] = m
    mask_t = torch.from_numpy(mask)

    def step():
        opt.zero_grad()
        loss, _, _ = model(imgs, mask=mask_t)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.n):
        step()
    dt = time.perf_counter() - t0
    img_per_sec = B * args.n / dt
    print(json.dumps({
        "metric": "torch_reference_cpu_img_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "batch": B,
        "threads": torch.get_num_threads(),
        "note": "reference-equivalent fp32 torch MIM train iter, CPU",
    }))


if __name__ == "__main__":
    main()
