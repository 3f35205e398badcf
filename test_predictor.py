#!/usr/bin/env python
"""Predictor evaluation CLI (reference ``test_predictor.py``).

Loads the ``_best`` checkpoint, runs inference over the validation set,
applies an S/N>5 filter, then writes redshift residual/metric figures (mse
losses) or a confusion matrix (crossentropy).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from sky_embeddings_tpu.configuration import load_config
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.eval.eval_fns import predictor_infer
from sky_embeddings_tpu.train.predictor import PredictorTrainer
from sky_embeddings_tpu.utils.checkpoint import checkpoint_path
from sky_embeddings_tpu.utils.misc import build_train_argparser, h5_snr
from sky_embeddings_tpu.utils.plotting import (
    evaluate_z,
    photoz_prediction_metrics,
    plot_conf_mat,
    plot_progress,
    plot_resid_hexbin,
    snr_plots,
    z_plots,
)


def main(args):
    cur_dir = os.path.dirname(os.path.abspath(__file__))
    config_dir = os.path.join(cur_dir, "configs")
    model_dir = os.path.join(cur_dir, "models")
    fig_dir = os.path.join(cur_dir, "figures")
    data_dir = args.data_dir or os.path.join(cur_dir, "data")
    os.makedirs(fig_dir, exist_ok=True)

    model_name = args.model_name
    config = load_config(model_name, config_dir)
    mae_name = config.pretrained_mae_name()
    mae_config = load_config(mae_name, config_dir) if mae_name else config

    trainer = PredictorTrainer(config, mae_config)
    best = checkpoint_path(model_dir, model_name, best=True)
    plain = checkpoint_path(model_dir, model_name)
    loaded = trainer.restore(best) or trainer.restore(plain)
    if not loaded:
        raise SystemExit(f"No checkpoint found for {model_name} in {model_dir}")
    print(f"Evaluating {model_name} at iteration {trainer.cur_iter}.")

    if len(trainer.losses.get("batch_iters", [])) > 1:
        plot_progress(
            trainer.losses,
            savename=os.path.join(fig_dir, f"{model_name}_progress.png"),
        )

    data = config.data
    val_file = os.path.join(data_dir, data.str("val_data_file"))
    label_keys = data.list("label_keys")
    batcher = build_h5_batcher(
        val_file,
        batch_size=config.training.int("batch_size"),
        img_size=config.architecture.int("img_size"),
        label_keys=label_keys,
        shuffle=False,
        drop_remainder=False,
    )
    use_label_errs = config.training.bool("use_label_errs", False)
    targets, preds = predictor_infer(
        trainer.model, trainer.variables(), batcher, use_label_errs=use_label_errs
    )

    # S/N > 5 filter (reference test_predictor.py:90-99)
    snr = h5_snr(val_file, n_central_pix=8)
    snr_min = np.nanmin(snr[:, : min(5, snr.shape[1])], axis=1)[: len(targets)]
    keep = snr_min > 5
    print(f"Keeping {keep.sum()}/{len(keep)} samples with S/N > 5.")
    targets, preds = targets[keep], preds[keep]

    if "mse" in config.training.str("loss_fn").lower():
        z_true, z_pred = targets[:, 0], preds[:, 0]
        bias, mad, fout = photoz_prediction_metrics(z_pred, z_true, threshold=0.15)
        print(f"bias={bias:.4f}  MAD={mad:.4f}  outlier_frac={fout:.4f}")
        plot_resid_hexbin(
            z_true, z_pred,
            savename=os.path.join(fig_dir, f"{model_name}_redshift_hexbin.png"),
        )
        evaluate_z(
            z_pred, z_true, n_bins=8, z_range=(0.2, 1.6), threshold=0.1,
            snr=snr_min[keep],
            savename=os.path.join(fig_dir, f"{model_name}_redshift_metrics.png"),
        )
        # Dedicated multi-panel layouts (reference plotting_fns.py:458-650)
        z_plots(
            z_pred, z_true, n_bins=8, z_range=(0.2, 1.6), threshold=0.1,
            savename=os.path.join(fig_dir, f"{model_name}_redshift.png"),
        )
        snr_plots(
            z_pred, z_true, snr_min[keep],
            savename=os.path.join(fig_dir, f"{model_name}_redshift_snr.png"),
        )
    else:
        y_pred = np.argmax(preds, axis=1)
        y_true = targets.reshape(-1)
        acc = float((y_pred == y_true).mean())
        print(f"accuracy={acc:.4f}")
        plot_conf_mat(
            y_true, y_pred,
            savename=os.path.join(fig_dir, f"{model_name}_confusion.png"),
        )


if __name__ == "__main__":
    parser = build_train_argparser("Predictor evaluation")
    main(parser.parse_args())
