"""Launcher config generation: the INI a launcher writes must round-trip
through the config loader and build a trainable model (reference
``cc/launch_pretraining.py``/``launch_predictor.py`` generate configs the
training CLIs then consume)."""

import os

import jax.numpy as jnp
import pytest

from sky_embeddings_tpu.cluster import launch_pretraining
from sky_embeddings_tpu.configuration import load_config


def _parse(argv):
    import sys

    old = sys.argv
    sys.argv = ["launch_pretraining.py"] + argv
    try:
        return launch_pretraining.parse_args()
    finally:
        sys.argv = old


def test_pretrain_launcher_config_roundtrip(tmp_path):
    args = _parse(
        [
            "mim_gen", "-vdf", "val.h5", "-tdf", "train.h5",
            "-bs", "32", "-ti", "5000", "-ed", "96", "-nc", "3",
            "-is", "16", "-ps", "4", "-mt", "simmim",
        ]
    )
    cfg = launch_pretraining.build_config(args)
    path = tmp_path / "mim_gen.ini"
    cfg.to_ini(str(path))

    loaded = load_config("mim_gen", str(tmp_path))
    assert loaded["DATA"].str("train_data_file") == "train.h5"
    assert loaded["TRAINING"].int("batch_size") == 32
    assert int(loaded["TRAINING"].float("total_batch_iters")) == 5000
    # simmim configs carry max_mask_ratio, not mask_ratio
    assert loaded["TRAINING"].float("max_mask_ratio") == 0.9
    assert "mask_ratio" not in loaded["TRAINING"]

    from sky_embeddings_tpu.models.mim import build_mim_model

    model = build_mim_model(loaded, dtype=jnp.float32)
    assert model.simmim and model.embed_dim == 96 and model.img_size == 16


def test_pretrain_launcher_mae_mask_key(tmp_path):
    args = _parse(
        ["mae_gen", "-vdf", "val.h5", "-tdf", "t.h5", "-mt", "base", "-mr", "0.6"]
    )
    cfg = launch_pretraining.build_config(args)
    cfg.to_ini(str(tmp_path / "mae_gen.ini"))
    loaded = load_config("mae_gen", str(tmp_path))
    assert loaded["TRAINING"].float("mask_ratio") == 0.6
    assert "max_mask_ratio" not in loaded["TRAINING"]

    from sky_embeddings_tpu.models.mim import build_mim_model

    model = build_mim_model(loaded)
    assert not model.simmim and model.mask_ratio == 0.6


def test_pretrain_launcher_fits_source(tmp_path):
    """Omitting -tdf switches the generated config to FITS tile paths."""
    args = _parse(
        [
            "fits_gen", "-vdf", "val.h5", "-tdp", "['/survey/tiles']",
            "-bands", "['G','R']", "-mb", "2",
        ]
    )
    cfg = launch_pretraining.build_config(args)
    cfg.to_ini(str(tmp_path / "fits_gen.ini"))
    loaded = load_config("fits_gen", str(tmp_path))
    assert loaded["DATA"].str("train_data_paths") == "['/survey/tiles']"
    assert loaded["DATA"].int("min_bands") == 2
    assert "train_data_file" not in loaded["DATA"]


def test_predictor_launcher_config_roundtrip(tmp_path):
    from sky_embeddings_tpu.cluster import launch_predictor

    import sys

    old = sys.argv
    sys.argv = [
        "launch_predictor.py", "z_gen", "-mae", "mim_gen",
        "-tdf", "train.h5", "-vdf", "val.h5",
        "-lk", "['zspec']", "-lm", "[0.64]", "-ls", "[0.64]",
        "-bs", "64", "-ti", "300",
    ]
    try:
        args = launch_predictor.parse_args()
    finally:
        sys.argv = old
    cfg = launch_predictor.build_config(args)
    cfg.to_ini(str(tmp_path / "z_gen.ini"))
    loaded = load_config("z_gen", str(tmp_path))
    # the reference key spelling ('pretained_mae', PARITY #8) is preserved
    assert loaded["TRAINING"].str("pretained_mae") == "mim_gen"
    assert loaded["DATA"].str("label_keys") == "['zspec']"
    assert loaded["TRAINING"].int("batch_size") == 64
