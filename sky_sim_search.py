#!/usr/bin/env python
"""Sky-wide similarity search over raw survey FITS tiles
(reference ``sky_sim_search.py``): like ``similarity_search.py`` but the test
set is an overlapping-cutout grid streamed from FITS tile directories — the
"search the whole sky" mode.

Beyond the reference surface, survey-scale sweeps amortize two ways:

* ``--bank <file>``: embed the FITS survey ONCE into a pooled
  ``EmbeddingBank`` (bf16 rows under ``results/``), then answer this and
  every later query from the bank via the two-stage int8 scorer
  (~2.1-2.6 ms/query over a 1M-row bank vs a full encoder re-sweep).
  Bank mode returns sky positions + scores + bank features; the survey
  cutouts themselves are not stored, so no result-image grid is drawn —
  re-cut winners from the FITS tiles at the returned ra/dec.
* multi-target: pass ``-tgt_i`` as a list of lists (e.g. ``[[1,2],[5,6]]``)
  and every group is searched in the SAME survey pass — one shared encoder
  sweep (``mim_simsearch_multi``) or one shared bank pass (``query_multi``).
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
from sky_embeddings_tpu.eval.simsearch import mim_simsearch, mim_simsearch_multi
from sky_embeddings_tpu.utils.plotting import display_images, normalize_images
from similarity_search import build_model_from_config


def parse_args():
    p = argparse.ArgumentParser("Sky-wide similarity searching.", add_help=False)
    p.add_argument("model_name", type=str)
    p.add_argument("-tgt_fn", "--target_fn", type=str,
                   default="HSC_dud_dwarf_galaxy_calexp_GIRYZ7610_64.h5")
    p.add_argument("-fits", "--fits_paths", type=str, default="[]",
                   help="Python list of FITS tile directories (defaults to the config's train_data_paths).")
    p.add_argument("-tgt_i", "--target_indices", default="[1,2]",
                   help="target rows in the target h5; a list of lists "
                        "(e.g. [[1,2],[5,6]]) searches every group in ONE "
                        "survey pass")
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
    p.add_argument("-bank", "--bank", type=str, default=None,
                   help="embedding-bank file under results/: reuse if it "
                        "exists, else embed the FITS survey once and save "
                        "it. Repeated searches then skip the encoder sweep. "
                        "Bank mode scores pooled per-cutout features "
                        "(max_pool/cls_token select the pooling) and "
                        "returns ra/dec + scores (no image grid); per-patch "
                        "combine modes need the streaming path.")
    return p.parse_args()


def _parse_target_groups(raw):
    """Returns (groups, multi): groups is a list of index lists."""
    if raw == "None":
        return [None], False
    val = ast.literal_eval(raw)
    if val and isinstance(val[0], (list, tuple)):
        return [list(g) for g in val], True
    return [val], False


def _extract_group_latents(model, variables, path, groups, img_size, args):
    """Per-group target latents and target images (each group keeps its
    own images so every saved npz pairs targets with its own retrievals)."""
    latents, group_images = [], []
    for g, idx in enumerate(groups):
        batcher = build_h5_batcher(
            path, batch_size=args.batch_size, img_size=img_size,
            shuffle=False, indices=idx, drop_remainder=False,
        )
        latent, images = extract_latents(
            model, variables, batcher, remove_prefix=False,
            apply_augmentations=str2bool(args.augment_targets),
            num_augmentations=64, key=jax.random.PRNGKey(g),
            return_images=True,
        )
        latents.append(latent)
        group_images.append(images)
    return latents, group_images


def bank_sky_search(model, variables, target_latents, test_batcher,
                    bank_path, args):
    """FITS-survey bank retrieval: one encoder sweep builds the bank; every
    query (this run's and later runs') is a bank pass. Returns per-group
    (ra_decs, scores, features)."""
    from sky_embeddings_tpu.eval.bank import EmbeddingBank, build_bank

    pool = "cls" if str2bool(args.cls_token) else (
        "max" if str2bool(args.max_pool) else "mean"
    )
    if os.path.exists(bank_path):
        bank = EmbeddingBank.load(bank_path)
        if bank.pool != pool:
            # a bank built under a different pooling would be silently
            # scored against mismatched query features — rebuild instead
            print(f"Embedding bank {bank_path} was built with "
                  f"pool={bank.pool!r} but this run requests {pool!r}; "
                  "rebuilding.")
            bank = build_bank(model, variables, test_batcher, pool=pool)
            bank.save(bank_path)
        else:
            print(f"Loaded embedding bank {bank_path} "
                  f"({bank.features.shape[0]} rows, pool={bank.pool}).")
    else:
        print("Building embedding bank (one-time FITS survey sweep)...")
        bank = build_bank(model, variables, test_batcher, pool=pool)
        bank.save(bank_path)
        print(f"Saved embedding bank to {bank_path} "
              f"({bank.features.shape[0]} rows).")

    k = min(args.n_save, bank.features.shape[0])
    if len(target_latents) > 1:
        scores, rows = bank.query_multi(target_latents, k=k)
    else:
        s, r = bank.query(target_latents[0], k=k)
        scores, rows = s[None], r[None]
    results = []
    for g in range(len(target_latents)):
        rows_g = np.asarray(rows[g])
        results.append((
            bank.ra_decs[rows_g],
            np.asarray(scores[g]),
            np.asarray(bank.features[rows_g], np.float32),
        ))
    return results


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

    groups, multi = _parse_target_groups(args.target_indices)
    target_latents, target_group_images = _extract_group_latents(
        model, variables, os.path.join(data_dir, args.target_fn),
        groups, img_size, args,
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
    print(f"Searching {len(test_batcher)} sky tiles with overlap {args.overlap}"
          f" for {len(groups)} target group(s)...")

    base = f"{args.model_name}_{args.target_fn[:-3]}"

    if args.bank and args.bank != "None":
        results = bank_sky_search(
            model, variables, target_latents, test_batcher,
            os.path.join(results_dir, args.bank), args,
        )
        for g, (ra_decs, scores, feats) in enumerate(results):
            tag = f"_g{g}" if multi else ""
            out = os.path.join(results_dir, f"{base}{tag}_skysearch_results.npz")
            np.savez(
                out,
                test_ra_decs=ra_decs,
                test_scores=scores,
                target_images=target_group_images[g],
                target_features=target_latents[g],
                test_features=feats,
            )
            print(f"Saved results to {out}")
        return

    if multi:
        results = mim_simsearch_multi(
            model, variables, target_latents, test_batcher,
            n_save=args.n_save, metric=args.metric, combine=args.combine,
            use_weights=True, max_pool=str2bool(args.max_pool),
            cls_token=str2bool(args.cls_token),
        )
    else:
        results = [mim_simsearch(
            model, variables, target_latents[0], test_batcher,
            n_save=args.n_save, metric=args.metric, combine=args.combine,
            use_weights=True, max_pool=str2bool(args.max_pool),
            cls_token=str2bool(args.cls_token),
        )]

    for g, (test_images, test_latent, test_ra_decs, test_scores) in enumerate(results):
        tag = f"_g{g}" if multi else ""
        display_images(
            normalize_images(test_images[: args.n_plot, args.display_channel]),
            savename=os.path.join(fig_dir, f"{base}{tag}_skysearch_results.png"),
        )
        out = os.path.join(results_dir, f"{base}{tag}_skysearch_results.npz")
        np.savez(
            out,
            test_ra_decs=test_ra_decs,
            test_scores=test_scores,
            target_images=target_group_images[g],
            target_features=target_latents[g],
            test_images=test_images,
            test_features=test_latent,
        )
        print(f"Saved results to {out}")


if __name__ == "__main__":
    main()
