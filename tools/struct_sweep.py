#!/usr/bin/env python
"""Predictor size sweep on the structured synthetic survey (VERDICT r4 #2).

The reference's scientific claim is a *curve*, not a point: fine-tuning a
pretrained backbone beats from-scratch training in the scarce-label regime
and the gap closes (or inverts) as labels grow
(``/root/reference/compare_predictors.py:23-31,157-256`` — families
fully-supervised / fine-tune / attentive-probe x training-set sizes
2^7..2^14). This driver trains the ``z_struct_{ft,fs,ap}_<N>`` config
families on the structured survey's redshift task and then runs the
``compare_predictors.py`` CLI to commit the curve:

- ``figures/compare_predictors_struct.png`` — MAD/bias/outlier-frac vs N
- ``results/compare_predictors_struct.json`` — the metric-vs-N rows

Needs the ``mim_struct`` pretrained checkpoint (run
``tools/semantic_validation.py --stage pretrain`` first) for the ft/ap
families. Each run checkpoints and resumes, so the sweep can be
interrupted and relaunched.

Usage: python tools/struct_sweep.py [-f ft fs ap] [-s 128 512 2048 8192 12k]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--families", nargs="+", default=["ft", "fs", "ap"])
    ap.add_argument("-s", "--sizes", nargs="+",
                    default=["128", "512", "2048", "8192", "12k"])
    ap.add_argument("-v", "--verbose_iters", type=int, default=250)
    ap.add_argument("-dd", "--data_dir", type=str,
                    default=os.path.join(REPO, "data", "structured"))
    ap.add_argument("--skip_plot", action="store_true")
    args = ap.parse_args()

    from sky_embeddings_tpu.utils.checkpoint import checkpoint_path
    from tools.semantic_validation import ensure_datasets, run_finetune

    ensure_datasets(args.data_dir, quick=False)
    if any(f in ("ft", "ap") for f in args.families):
        mim_ckpt = checkpoint_path(os.path.join(REPO, "models"), "mim_struct")
        if not os.path.exists(mim_ckpt):
            raise SystemExit(
                "mim_struct checkpoint missing — run "
                "tools/semantic_validation.py --stage pretrain first"
            )

    # interleave sizes within a family so an interrupted sweep still has
    # every family represented at the smallest sizes
    for size in args.sizes:
        for fam in args.families:
            name = f"z_struct_{fam}_{size}"
            print(f"\n=== {name} ===", flush=True)
            metrics = run_finetune(name, args.data_dir, args.verbose_iters,
                                   quick=False)
            print(f"{name}: {metrics}", flush=True)

    if not args.skip_plot:
        families = [f"z_struct_{f}" for f in args.families]
        subprocess.run(
            [sys.executable, os.path.join(REPO, "compare_predictors.py"),
             "-f", *families, "-dd", args.data_dir,
             "-o", "compare_predictors_struct", "--json"],
            check=True,
        )


if __name__ == "__main__":
    main()
