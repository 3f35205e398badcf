#!/usr/bin/env python
"""Sky-wide similarity search over raw survey FITS tiles
(reference ``sky_sim_search.py``): like ``similarity_search.py`` but the test
set is an overlapping-cutout grid streamed from FITS tile directories — the
"search the whole sky" mode.
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from sky_embeddings_tpu.configuration import str2bool
from sky_embeddings_tpu.data.fits_loader import build_fits_batcher
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.eval.eval_fns import extract_latents
from sky_embeddings_tpu.eval.simsearch import mim_simsearch
from sky_embeddings_tpu.utils.plotting import display_images, normalize_images
from similarity_search import build_model_from_config


def parse_args():
    p = argparse.ArgumentParser("Sky-wide similarity searching.", add_help=False)
    p.add_argument("model_name", type=str)
    p.add_argument("-tgt_fn", "--target_fn", type=str,
                   default="HSC_dud_dwarf_galaxy_calexp_GIRYZ7610_64.h5")
    p.add_argument("-fits", "--fits_paths", type=str, default="[]",
                   help="Python list of FITS tile directories (defaults to the config's train_data_paths).")
    p.add_argument("-tgt_i", "--target_indices", default="[1,2]")
    p.add_argument("-aug", "--augment_targets", type=str, default="True")
    p.add_argument("-mp", "--max_pool", type=str, default="True")
    p.add_argument("-ct", "--cls_token", type=str, default="False")
    p.add_argument("-ov", "--overlap", type=float, default=0.4)
    p.add_argument("-bs", "--batch_size", type=int, default=64)
    p.add_argument("-m", "--metric", type=str, default="cosine")
    p.add_argument("-c", "--combine", type=str, default="min")
    p.add_argument("-dc", "--display_channel", type=int, default=2)
    p.add_argument("-np", "--n_plot", type=int, default=36)
    p.add_argument("-ns", "--n_save", type=int, default=300)
    p.add_argument("-dd", "--data_dir", type=str, default=None)
    return p.parse_args()


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

    fits_paths = ast.literal_eval(args.fits_paths)
    if not fits_paths:
        fits_paths = config.data.list("train_data_paths")

    target_indices = (
        ast.literal_eval(args.target_indices) if args.target_indices != "None" else None
    )
    target_batcher = build_h5_batcher(
        os.path.join(data_dir, args.target_fn), batch_size=args.batch_size,
        img_size=img_size, shuffle=False, indices=target_indices,
        drop_remainder=False,
    )
    target_latent, target_images = extract_latents(
        model, variables, target_batcher, remove_prefix=False,
        apply_augmentations=str2bool(args.augment_targets), num_augmentations=64,
        key=jax.random.PRNGKey(0), return_images=True,
    )

    test_batcher = build_fits_batcher(
        fits_paths,
        bands=config.data.list("bands", ["G", "R", "I", "Z", "Y"]),
        min_bands=config.data.int("min_bands", 2),
        batch_size=args.batch_size,
        img_size=img_size,
        use_calexp=config.data.bool("use_calexp", True),
        shuffle=False,
        use_overlap=True,
        overlap=args.overlap,
    )
    print(f"Searching {len(test_batcher)} sky tiles with overlap {args.overlap}...")

    test_images, test_latent, test_ra_decs, test_scores = mim_simsearch(
        model, variables, target_latent, test_batcher,
        n_save=args.n_save, metric=args.metric, combine=args.combine,
        use_weights=True, max_pool=str2bool(args.max_pool),
        cls_token=str2bool(args.cls_token),
    )

    display_images(
        normalize_images(test_images[: args.n_plot, args.display_channel]),
        savename=os.path.join(
            fig_dir, f"{args.model_name}_{args.target_fn[:-3]}_skysearch_results.png"
        ),
    )
    out = os.path.join(
        results_dir, f"{args.model_name}_{args.target_fn[:-3]}_skysearch_results.npz"
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
