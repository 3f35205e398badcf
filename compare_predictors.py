#!/usr/bin/env python
"""Compare predictor families across training-set sizes
(reference ``compare_predictors.py``): re-evaluates each trained checkpoint
in a sweep and plots metric-vs-num_train curves.

    python compare_predictors.py -f cls_fs cls_ft cls_ap -dd DIR

Each family ``F`` matches configs named ``configs/F_*.ini`` that define
``num_train``; every matching config with a checkpoint is evaluated on its
validation set (accuracy for crossentropy, photo-z bias/MAD/outlier-fraction
for mse).
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from sky_embeddings_tpu.configuration import load_config
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.eval.eval_fns import predictor_infer
from sky_embeddings_tpu.train.predictor import PredictorTrainer
from sky_embeddings_tpu.utils.checkpoint import checkpoint_path
from sky_embeddings_tpu.utils.plotting import photoz_prediction_metrics


def parse_args():
    p = argparse.ArgumentParser("Compare predictors.", add_help=False)
    p.add_argument("-f", "--families", nargs="+", required=True,
                   help="config-name prefixes, e.g. cls_fs cls_ft cls_ap")
    p.add_argument("-dd", "--data_dir", type=str, default=None)
    p.add_argument("-o", "--out_name", type=str, default="compare_predictors")
    p.add_argument("--json", action="store_true",
                   help="also write results/<out_name>.json with the "
                        "metric-vs-num_train rows")
    return p.parse_args()


def evaluate_model(model_name, config_dir, model_dir, data_dir):
    config = load_config(model_name, config_dir)
    mae_name = config.pretrained_mae_name()
    mae_config = load_config(mae_name, config_dir) if mae_name else config
    trainer = PredictorTrainer(config, mae_config)
    loaded = trainer.restore(checkpoint_path(model_dir, model_name, best=True)) or \
        trainer.restore(checkpoint_path(model_dir, model_name))
    if not loaded:
        return None

    data = config.data
    batcher = build_h5_batcher(
        os.path.join(data_dir, data.str("val_data_file")),
        batch_size=config.training.int("batch_size"),
        img_size=config.architecture.int("img_size"),
        label_keys=data.list("label_keys"),
        shuffle=False,
        drop_remainder=False,
    )
    targets, preds = predictor_infer(
        trainer.model, trainer.variables(), batcher,
        use_label_errs=config.training.bool("use_label_errs", False),
    )
    num_train = config.training.int("num_train", -1)
    if num_train < 0:  # full training set — use its actual size for the x-axis
        import h5py

        with h5py.File(os.path.join(data_dir, data.str("train_data_file")), "r") as f:
            num_train = len(f["cutouts"])
    if "crossentropy" in config.training.str("loss_fn").lower():
        acc = float((np.argmax(preds, axis=1) == targets.reshape(-1)).mean())
        return num_train, {"accuracy": acc}
    bias, mad, fout = photoz_prediction_metrics(preds[:, 0], targets[:, 0])
    return num_train, {"bias": bias, "mad": mad, "outlier_frac": fout}


def family_configs(config_dir: str, family: str) -> list:
    """Config names in a sweep family.

    ``cls_ft`` matches ``cls_ft_<size>`` (the bare size token only, so the
    suffix families stay out of the base sweep); ``cls_ft_wide`` /
    ``cls_ft_large`` match ``cls_ft_<size>_wide`` / ``_large`` — the
    reference's 'Fine-tuning (Wide)' and '(Wide+Large)' categories
    (``compare_predictors.py:23-31``).
    """
    names = [
        os.path.splitext(os.path.basename(p))[0]
        for p in sorted(glob.glob(os.path.join(config_dir, "*.ini")))
    ]
    out = []
    base, _, suffix = family.rpartition("_")
    for name in names:
        if name.startswith(family + "_") and "_" not in name[len(family) + 1 :]:
            out.append(name)  # cls_ft -> cls_ft_1k
        elif base and name.startswith(base + "_") and name.endswith("_" + suffix):
            size = name[len(base) + 1 : -(len(suffix) + 1)]
            if size and "_" not in size:
                out.append(name)  # cls_ft_wide -> cls_ft_1k_wide
    return out


def main():
    args = parse_args()
    cur_dir = os.path.dirname(os.path.abspath(__file__))
    config_dir = os.path.join(cur_dir, "configs")
    model_dir = os.path.join(cur_dir, "models")
    fig_dir = os.path.join(cur_dir, "figures")
    data_dir = args.data_dir or os.path.join(cur_dir, "data")
    os.makedirs(fig_dir, exist_ok=True)

    results: dict = defaultdict(list)  # family -> [(num_train, metrics)]
    for family in args.families:
        for name in family_configs(config_dir, family):
            try:
                out = evaluate_model(name, config_dir, model_dir, data_dir)
            except Exception as e:
                print(f"{name}: evaluation failed: {e}")
                continue
            if out is None:
                print(f"{name}: no checkpoint, skipping")
                continue
            num_train, metrics = out
            results[family].append((num_train, metrics))
            print(f"{name}: num_train={num_train} {metrics}")

    if not any(results.values()):
        print("No evaluable checkpoints found.")
        return

    if args.json:
        import json

        out_json = os.path.join(cur_dir, "results", f"{args.out_name}.json")
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(
                {
                    fam: [
                        {"num_train": n, **m}
                        for n, m in sorted(rows, key=lambda r: r[0])
                    ]
                    for fam, rows in results.items()
                },
                f, indent=2,
            )
        print(f"Saved {out_json}")

    metric_names = sorted({k for fam in results.values() for _, m in fam for k in m})
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(metric_names), figsize=(5 * len(metric_names), 4),
                             squeeze=False)
    for j, mname in enumerate(metric_names):
        ax = axes[0, j]
        for family, rows in results.items():
            # sort by num_train only — (int, dict) tuples are not comparable
            # when two configs share the same num_train
            rows = sorted((r for r in rows if mname in r[1]), key=lambda r: r[0])
            if not rows:
                continue
            ns = [r[0] for r in rows]
            vals = [r[1][mname] for r in rows]
            ax.plot(ns, vals, "o-", label=family)
        ax.set_xscale("log", base=2)
        ax.set_xlabel("num_train")
        ax.set_ylabel(mname)
        ax.grid(alpha=0.3)
        ax.legend()
    fig.tight_layout()
    out_png = os.path.join(fig_dir, f"{args.out_name}.png")
    fig.savefig(out_png, dpi=100)
    print(f"Saved {out_png}")


if __name__ == "__main__":
    main()
