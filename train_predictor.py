#!/usr/bin/env python
"""Predictor training CLI (classification / redshift regression heads).

Surface parity with the reference ``train_predictor.py``:

    python train_predictor.py <model_name> [-v N] [-ct M] [-dd DIR]

The predictor config names its pretraining config via ``pretained_mae`` (the
reference's spelling; ``pretrained_mae`` also accepted). Resumes from the
``_best`` checkpoint when present, otherwise warm-starts from the MIM
checkpoint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from sky_embeddings_tpu.configuration import load_config
from sky_embeddings_tpu.data.device_cache import build_cached_or_streaming_batcher
from sky_embeddings_tpu.parallel import distributed
from sky_embeddings_tpu.train.predictor import PredictorTrainer, train_predictor_network
from sky_embeddings_tpu.utils.checkpoint import checkpoint_path
from sky_embeddings_tpu.utils.misc import build_train_argparser, select_training_indices


def main(args):
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

    mae_name = config.pretrained_mae_name()
    if mae_name is None:
        mae_config = config
        mae_filename = None
    else:
        mae_config = load_config(mae_name, config_dir)
        mae_filename = checkpoint_path(model_dir, mae_name)

    trainer = PredictorTrainer(config, mae_config)
    model_filename = checkpoint_path(model_dir, model_name)
    best_filename = checkpoint_path(model_dir, model_name, best=True)

    if os.path.exists(best_filename) and trainer.restore(best_filename):
        print(f"\nResumed from {best_filename} at iteration {trainer.cur_iter}.")
    elif trainer.restore(model_filename):
        print(f"\nResumed from {model_filename} at iteration {trainer.cur_iter}.")
    elif mae_filename and trainer.warm_start(mae_filename):
        print(f"\nWarm-started from pretrained MIM checkpoint {mae_filename}.")
    else:
        print("\nStarting fresh model to train...")

    training = config.training
    data = config.data
    batch_size = training.int("batch_size")
    img_size = config.architecture.int("img_size")
    label_keys = data.list("label_keys")

    num_train = training.int("num_train", -1)
    train_file = os.path.join(data_dir, data.str("train_data_file"))
    if num_train > -1:
        if "crossentropy" in training.str("loss_fn").lower():
            indices = select_training_indices(train_file, num_train, balanced=False)
        else:
            indices = list(range(num_train))
    else:
        indices = None

    if batch_size % n_proc:
        raise SystemExit(f"batch_size {batch_size} not divisible by {n_proc} processes")
    local_bs = batch_size // n_proc
    # clip runs on device in the jitted step (see h5_loader docstring);
    # [DATA] device_cache picks HBM-resident vs streaming serving
    train_batcher = build_cached_or_streaming_batcher(
        data, train_file, batch_size=local_bs, img_size=img_size,
        label_keys=label_keys, shuffle=True, indices=indices,
        num_workers=data.int("num_workers", 0),
        process_count=n_proc, process_index=proc_id,
    )
    print(f"The training set consists of {train_batcher.num_samples} cutouts.")
    val_batcher = build_cached_or_streaming_batcher(
        data,
        os.path.join(data_dir, data.str("val_data_file")),
        batch_size=local_bs, img_size=img_size,
        label_keys=label_keys, shuffle=True,
        process_count=n_proc, process_index=proc_id,
    )

    train_predictor_network(
        trainer,
        train_batcher.forever(),
        val_batcher,
        args.verbose_iters,
        args.cp_time,
        model_filename,
        fig_dir=fig_dir if distributed.is_main() else None,
        log_fn=print if distributed.is_main() else (lambda *_: None),
    )


if __name__ == "__main__":
    parser = build_train_argparser("Predictor training")
    main(parser.parse_args())
    print("\nTraining complete.")
