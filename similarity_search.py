#!/usr/bin/env python
"""Embedding similarity search CLI (reference ``similarity_search.py``).

    python similarity_search.py <model_name> [-tgt_fn F] [-tst_fn F] ...

Builds a MIM or predictor model from ``configs/<model_name>.ini`` (predictor
iff the config has a ``pretained_mae`` key), S/N-filters the test set, embeds
the target set with 64 augmentations, streams the test set through the
encoder scoring against the target features, and saves result grids (PNG)
plus ``results/<model>_<target>_simsearch_results_f.npz``.
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from sky_embeddings_tpu.configuration import load_config, str2bool
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.eval.eval_fns import extract_latents
from sky_embeddings_tpu.eval.simsearch import mim_simsearch
from sky_embeddings_tpu.utils.misc import h5_snr
from sky_embeddings_tpu.utils.plotting import display_images, normalize_images


def parse_args():
    p = argparse.ArgumentParser("Similarity searching.", add_help=False)
    p.add_argument("model_name", type=str)
    p.add_argument("-tgt_fn", "--target_fn", type=str,
                   default="HSC_dud_dwarf_galaxy_calexp_GIRYZ7610_64.h5")
    p.add_argument("-tst_fn", "--test_fn", type=str,
                   default="HSC_dud_unknown_calexp_GIRYZ7610_64.h5")
    p.add_argument("-tgt_i", "--target_indices", default="[1,2]")
    p.add_argument("-aug", "--augment_targets", type=str, default="True")
    p.add_argument("-mp", "--max_pool", type=str, default="True")
    p.add_argument("-ct", "--cls_token", type=str, default="False")
    p.add_argument("-snr", "--snr_range", default="[2,7]")
    p.add_argument("-bs", "--batch_size", type=int, default=64)
    p.add_argument("-m", "--metric", type=str, default="cosine")
    p.add_argument("-c", "--combine", type=str, default="min")
    p.add_argument("-dc", "--display_channel", type=int, default=2)
    p.add_argument("-np", "--n_plot", type=int, default=36)
    p.add_argument("-ns", "--n_save", type=int, default=300)
    p.add_argument("-dd", "--data_dir", type=str, default=None)
    p.add_argument("-bank", "--bank", type=str, default=None,
                   help="embedding-bank file under results/: reuse if it "
                        "exists, else embed the test set once and save it. "
                        "Repeated searches then skip the encoder sweep "
                        "(~100x faster per query). Bank mode scores pooled "
                        "per-image features (max_pool/cls_token select the "
                        "pooling); per-patch combine modes need the "
                        "streaming path.")
    return p.parse_args()


def build_model_from_config(config_dir, model_dir, model_name):
    """Build MIM or predictor model + restore weights; returns (model, variables)."""
    from sky_embeddings_tpu.utils.checkpoint import checkpoint_path

    config = load_config(model_name, config_dir)
    mae_name = config.pretrained_mae_name()
    if "TRAINING" in config and (
        "pretained_mae" in config.training or "pretrained_mae" in config.training
    ):
        from sky_embeddings_tpu.train.predictor import PredictorTrainer

        mae_config = load_config(mae_name, config_dir) if mae_name else config
        trainer = PredictorTrainer(config, mae_config)
        loaded = trainer.restore(checkpoint_path(model_dir, model_name, best=True)) or \
            trainer.restore(checkpoint_path(model_dir, model_name))
        if not loaded:
            print(f"WARNING: no checkpoint for {model_name}; using fresh weights.")
        return trainer.model, trainer.variables(), config
    from sky_embeddings_tpu.train.pretrain import MIMPretrainer

    trainer = MIMPretrainer(config)
    if not trainer.restore(checkpoint_path(model_dir, model_name)):
        print(f"WARNING: no checkpoint for {model_name}; using fresh weights.")
    return trainer.model, trainer.variables(), config


def bank_search(model, variables, target_latent, test_batcher, test_path,
                test_indices, bank_path, args):
    """Precomputed-bank retrieval (eval/bank.py): embed the survey once,
    answer every subsequent query from the stored bf16 bank."""
    import h5py

    from sky_embeddings_tpu.eval.bank import EmbeddingBank, build_bank

    pool = "cls" if str2bool(args.cls_token) else (
        "max" if str2bool(args.max_pool) else "mean"
    )
    if os.path.exists(bank_path):
        bank = EmbeddingBank.load(bank_path)
        print(f"Loaded embedding bank {bank_path} "
              f"({bank.features.shape[0]} rows, pool={bank.pool}).")
        if bank.features.shape[0] != len(test_indices):
            raise ValueError(
                f"bank {bank_path} has {bank.features.shape[0]} rows but the "
                f"current S/N filter selects {len(test_indices)} test rows — "
                "the bank was built under different -sr/--snr_range settings; "
                "delete it (or pass a different --bank name) to rebuild"
            )
    else:
        print("Building embedding bank (one-time encoder sweep)...")
        bank = build_bank(model, variables, test_batcher, pool=pool)
        bank.save(bank_path)
        print(f"Saved embedding bank to {bank_path}.")

    scores, rows = bank.query(target_latent, k=args.n_save)
    rows = np.asarray(rows)
    sel = np.asarray(test_indices)[rows]  # bank row -> h5 row (build order)

    # fetch winner images best-first (h5 wants sorted indices; un-sort after)
    order = np.argsort(sel, kind="stable")
    with h5py.File(test_path, "r") as f:
        sorted_imgs = f["cutouts"][sel[order]]
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    images = sorted_imgs[inv].astype(np.float32)
    # same host transforms the batcher applied when the bank was built
    from sky_embeddings_tpu.data.h5_loader import central_crop

    np.maximum(images, -3.0, out=images)
    img_size = model.img_size
    if images.shape[-1] > img_size or images.shape[-2] > img_size:
        images = np.ascontiguousarray(central_crop(images, img_size))

    latent = extract_latents(
        model, variables,
        [{"cutouts": images, "ra_dec": bank.ra_decs[rows]}],
        remove_prefix=False,
    )
    return images, np.asarray(latent), bank.ra_decs[rows], np.asarray(scores)


def main():
    args = parse_args()
    cur_dir = os.path.dirname(os.path.abspath(__file__))
    config_dir = os.path.join(cur_dir, "configs")
    model_dir = os.path.join(cur_dir, "models")
    fig_dir = os.path.join(cur_dir, "figures")
    results_dir = os.path.join(cur_dir, "results")
    data_dir = args.data_dir or os.path.join(cur_dir, "data")
    os.makedirs(results_dir, exist_ok=True)
    os.makedirs(fig_dir, exist_ok=True)

    model, variables, config = build_model_from_config(config_dir, model_dir, args.model_name)
    img_size = config.architecture.int("img_size")
    target_indices = (
        ast.literal_eval(args.target_indices) if args.target_indices != "None" else None
    )
    snr_range = ast.literal_eval(args.snr_range)

    # S/N filter on the test set (central 8 px vs surround; first ≤5 bands)
    print("Estimating S/N for test dataset images...")
    test_path = os.path.join(data_dir, args.test_fn)
    snr = h5_snr(test_path, n_central_pix=8, batch_size=5000)
    snr_min = np.nanmin(snr[:, : min(5, snr.shape[1])], axis=1)
    test_indices = np.where((snr_min > snr_range[0]) & (snr_min < snr_range[1]))[0]
    print(f"{len(test_indices)} test samples in S/N range {snr_range}.")

    target_batcher = build_h5_batcher(
        os.path.join(data_dir, args.target_fn), batch_size=args.batch_size,
        img_size=img_size, shuffle=False, indices=target_indices,
        drop_remainder=False,
    )
    test_batcher = build_h5_batcher(
        test_path, batch_size=args.batch_size, img_size=img_size,
        shuffle=False, indices=test_indices, drop_remainder=False,
    )

    target_latent, target_images = extract_latents(
        model, variables, target_batcher, remove_prefix=False,
        apply_augmentations=str2bool(args.augment_targets), num_augmentations=64,
        key=jax.random.PRNGKey(0), return_images=True,
    )

    display_images(
        normalize_images(target_images[:, args.display_channel]),
        savename=os.path.join(
            fig_dir, f"{args.model_name}_{args.target_fn[:-3]}_simsearch_target.png"
        ),
    )

    if args.bank and args.bank != "None":
        test_images, test_latent, test_ra_decs, test_scores = bank_search(
            model, variables, target_latent, test_batcher, test_path,
            test_indices, os.path.join(results_dir, args.bank), args,
        )
    else:
        test_images, test_latent, test_ra_decs, test_scores = mim_simsearch(
            model, variables, target_latent, test_batcher,
            n_save=args.n_save, metric=args.metric, combine=args.combine,
            use_weights=True, max_pool=str2bool(args.max_pool),
            cls_token=str2bool(args.cls_token),
        )

    display_images(
        normalize_images(test_images[: args.n_plot, args.display_channel]),
        savename=os.path.join(
            fig_dir, f"{args.model_name}_{args.target_fn[:-3]}_simsearch_results_f.png"
        ),
    )

    out = os.path.join(
        results_dir, f"{args.model_name}_{args.target_fn[:-3]}_simsearch_results_f.npz"
    )
    np.savez(
        out,
        test_ra_decs=test_ra_decs,
        test_scores=test_scores,
        target_images=target_images,
        target_features=target_latent,
        test_images=test_images,
        test_features=test_latent,
    )
    print(f"Saved results to {out}")


if __name__ == "__main__":
    main()
