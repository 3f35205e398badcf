#!/usr/bin/env python
"""JEPA learning evidence on the structured synthetic survey (VERDICT r4 #7).

The reference ships only the I-JEPA *config* (``configs/jepa_1.ini``; no
model code in the snapshot — SURVEY §2.11). This framework implements the
method end-to-end (``models/jepa.py``, ``train/jepa.py``); what was missing
is proof it *learns*. This driver runs the same probe-canary protocol as
``tools/semantic_validation.py`` stage 1: pretrain ``jepa_struct`` (ViT-S
context/target encoders, 4-deep predictor, EMA target) on the structured
survey with periodic linear probes — **probe accuracy and redshift R² must
RISE**, not just the loss fall.

Writes ``results/jepa_validation.json`` + ``figures/jepa_struct_*`` and
exits non-zero if the gates fail. Gated by
``tests/test_jepa.py::test_committed_jepa_validation_artifact``.

Usage: python tools/jepa_validation.py [--quick] [-v 500]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_pretrain(data_dir: str, verbose_iters: int, quick: bool) -> dict:
    import jax.numpy as jnp

    from sky_embeddings_tpu.configuration import load_config
    from sky_embeddings_tpu.data.device_cache import DeviceDataset
    from sky_embeddings_tpu.train.jepa import JEPATrainer
    from sky_embeddings_tpu.train.pretrain import train_network
    from sky_embeddings_tpu.utils.checkpoint import checkpoint_path

    config = load_config("jepa_struct", os.path.join(REPO, "configs"))
    if quick:
        config.training._values["total_batch_iters"] = "600"
    trainer = JEPATrainer(config)
    ckpt_name = "jepa_struct_quick" if quick else "jepa_struct"
    model_filename = checkpoint_path(os.path.join(REPO, "models"), ckpt_name)
    os.makedirs(os.path.dirname(model_filename), exist_ok=True)
    if trainer.restore(model_filename):
        print(f"Resumed jepa_struct at iteration {trainer.cur_iter}.")

    bs = trainer.batch_size
    img_size = config.architecture.int("img_size")
    # same device-resident serving as the MIM stage; bf16 storage halves the
    # one-time upload (val stays fp32 — losses are trend-gated, not
    # bit-compared)
    train_ds = DeviceDataset(
        os.path.join(data_dir, "struct_train.h5"), batch_size=bs,
        img_size=img_size, shuffle=True, dtype=jnp.bfloat16,
    )
    val_ds = DeviceDataset(
        os.path.join(data_dir, "struct_val.h5"), batch_size=bs,
        img_size=img_size, shuffle=False,
    )
    probe_cls = DeviceDataset(
        os.path.join(data_dir, "struct_probe_cls.h5"), batch_size=256,
        img_size=img_size, label_keys=["class"], shuffle=False,
        drop_remainder=False,
    )
    probe_z = DeviceDataset(
        os.path.join(data_dir, "struct_probe_z.h5"), batch_size=256,
        img_size=img_size, label_keys=["zspec"], shuffle=False,
        drop_remainder=False,
    )
    train_network(
        trainer,
        train_ds.forever(),
        val_ds,
        trainer.total_batch_iters,
        verbose_iters,
        cp_time_minutes=15.0,
        model_filename=model_filename,
        fig_dir=os.path.join(REPO, "figures"),
        lp_class_data_file=probe_cls,
        lp_regress_data_file=probe_z,
        lp_combine="central",
    )
    return {k: [float(x) for x in v] for k, v in trainer.losses.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced scale (CI smoke, no semantic gates)")
    ap.add_argument("-v", "--verbose_iters", type=int, default=500)
    ap.add_argument("-dd", "--data_dir", type=str, default=None)
    args = ap.parse_args()
    if args.data_dir is None:
        sub = "structured_quick" if args.quick else "structured"
        args.data_dir = os.path.join(REPO, "data", sub)

    from tools.semantic_validation import ensure_datasets

    ensure_datasets(args.data_dir, args.quick)

    fname = "jepa_validation_quick.json" if args.quick else "jepa_validation.json"
    results_path = os.path.join(REPO, "results", fname)
    os.makedirs(os.path.dirname(results_path), exist_ok=True)

    losses = run_pretrain(args.data_dir, args.verbose_iters, args.quick)
    record = {
        "pretrain": {
            k: losses.get(k, [])
            for k in ("batch_iters", "train_loss", "val_loss",
                      "val_lp_acc", "val_lp_r2")
        }
    }
    with open(results_path, "w") as f:
        json.dump(record, f, indent=2)
    print(f"\nWrote {results_path}")

    failures = []
    acc = record["pretrain"]["val_lp_acc"]
    r2 = record["pretrain"]["val_lp_r2"]
    if acc and r2:
        print(f"probe acc: {acc[0]:.3f} -> {max(acc):.3f}  "
              f"probe R2: {r2[0]:.3f} -> {max(r2):.3f}")
        if not args.quick:
            if max(acc) < acc[0] + 0.05:
                failures.append(
                    f"probe accuracy did not rise: {acc[0]:.3f} -> {max(acc):.3f}")
            if max(r2) < r2[0] + 0.05:
                failures.append(
                    f"probe R2 did not rise: {r2[0]:.3f} -> {max(r2):.3f}")
    else:
        failures.append("no probe metrics recorded")

    if failures:
        print("\nJEPA SEMANTIC GATES FAILED:")
        for f_ in failures:
            print(f"  - {f_}")
        sys.exit(1)
    print("\nAll JEPA semantic gates passed.")


if __name__ == "__main__":
    main()
