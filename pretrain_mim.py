#!/usr/bin/env python
"""Masked-image-modelling pretraining CLI.

Drop-in surface parity with the reference entry point
(``/root/reference/pretrain_mim.py``):

    python pretrain_mim.py <model_name> [-v verbose_iters] [-ct cp_minutes] [-dd data_dir]

``<model_name>`` keys ``configs/<model_name>.ini``, the checkpoint
``models/<model_name>.ckpt.msgpack`` and ``figures/<model_name>_*.png``.
Supports h5 training data (``train_data_file``) or FITS tile directories
(``train_data_paths``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from sky_embeddings_tpu.configuration import load_config
from sky_embeddings_tpu.data.device_cache import build_cached_or_streaming_batcher
from sky_embeddings_tpu.parallel import distributed
from sky_embeddings_tpu.train.pretrain import MIMPretrainer, train_network
from sky_embeddings_tpu.utils.checkpoint import checkpoint_path
from sky_embeddings_tpu.utils.misc import build_train_argparser


def main(args):
    # Multi-host runs (one process per TPU host): opt-in via SKY_DISTRIBUTED=1
    # (set by the gcloud --worker=all launcher, cluster/queue_tpu.py).
    distributed.initialize_from_env()
    n_proc, proc_id = distributed.process_count(), distributed.process_index()
    cur_dir = os.path.dirname(os.path.abspath(__file__))
    config_dir = os.path.join(cur_dir, "configs")
    model_dir = os.path.join(cur_dir, "models")
    fig_dir = os.path.join(cur_dir, "figures")
    data_dir = args.data_dir or os.path.join(cur_dir, "data")
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(fig_dir, exist_ok=True)

    print(f"Using JAX {jax.__version__} with devices: {jax.devices()}")

    model_name = args.model_name
    config = load_config(model_name, config_dir)
    print(f"\nCreating model: {model_name}\n\nConfiguration:")
    print(config.describe())

    pretrainer = MIMPretrainer(config)
    model_filename = checkpoint_path(model_dir, model_name)
    if pretrainer.restore(model_filename):
        print(f"\nResumed from {model_filename} at iteration {pretrainer.cur_iter}.")
    else:
        print("\nStarting fresh model to train...")

    training = config.training
    data = config.data
    batch_size = training.int("batch_size")
    img_size = config.architecture.int("img_size")
    if batch_size % n_proc:
        raise SystemExit(f"batch_size {batch_size} not divisible by {n_proc} processes")
    local_bs = batch_size // n_proc  # each process feeds its shard

    if "train_data_file" in data:
        # pixel clip runs on device inside the jitted step — the host
        # pipeline stays a single read pass (see h5_loader docstring);
        # [DATA] device_cache picks HBM-resident vs streaming serving
        train_batcher = build_cached_or_streaming_batcher(
            data,
            os.path.join(data_dir, data.str("train_data_file")),
            batch_size=local_bs,
            img_size=img_size,
            shuffle=True,
            num_workers=data.int("num_workers", 0),
            process_count=n_proc,
            process_index=proc_id,
        )
        print(f"The training set consists of {train_batcher.num_samples} cutouts.")
        train_batches = train_batcher.forever()
    else:
        from sky_embeddings_tpu.data.fits_loader import build_fits_batcher

        train_batcher = build_fits_batcher(
            data.list("train_data_paths"),
            bands=data.list("bands"),
            min_bands=data.int("min_bands", 2),
            batch_size=batch_size,
            img_size=img_size,
            cutouts_per_tile=data.int("cutouts_per_tile", 1024),
            use_calexp=data.bool("use_calexp", True),
            shuffle=True,
        )
        print(f"The training set consists of {len(train_batcher)} sky tiles.")
        train_batches = train_batcher.forever()

    val_batcher = build_cached_or_streaming_batcher(
        data,
        os.path.join(data_dir, data.str("val_data_file")),
        batch_size=local_bs,
        img_size=img_size,
        shuffle=True,
        process_count=n_proc,
        process_index=proc_id,
    )

    lp_class = (
        os.path.join(data_dir, data.str("lp_class_data_file"))
        if "lp_class_data_file" in data
        else None
    )
    lp_regress = (
        os.path.join(data_dir, data.str("lp_regress_data_file"))
        if "lp_regress_data_file" in data
        else None
    )

    train_network(
        pretrainer,
        train_batches,
        val_batcher,
        pretrainer.total_batch_iters,
        args.verbose_iters,
        args.cp_time,
        model_filename,
        fig_dir=fig_dir if distributed.is_main() else None,
        lp_class_data_file=lp_class,
        lp_regress_data_file=lp_regress,
        lp_combine=data.str("lp_combine", "central"),
        log_fn=print if distributed.is_main() else (lambda *_: None),
    )


if __name__ == "__main__":
    parser = build_train_argparser("Masked image modelling pretraining")
    main(parser.parse_args())
    print("\nTraining complete.")
