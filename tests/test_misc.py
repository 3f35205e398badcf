"""utils/misc protocol tests — the S/N estimator, central-patch selection,
and training-subset selection reproduce the reference's semantics
(reference ``utils/misc.py:9-180``)."""

import numpy as np
import pytest

from sky_embeddings_tpu.utils.misc import (
    build_train_argparser,
    calculate_snr,
    central_patch_indices,
    h5_snr,
    samples_per_class,
    select_centre,
    select_training_indices,
)


def test_calculate_snr_matches_direct_computation(rng):
    imgs = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)
    snr = calculate_snr(imgs, n_central_pix=8)
    assert snr.shape == (4, 3)
    # hand-computed for one (image, channel)
    im = imgs[2, 1]
    central = im[4:12, 4:12]
    mask = np.ones((16, 16), bool)
    mask[4:12, 4:12] = False
    expect = central.mean() / (im[mask].std() + 1e-8)
    np.testing.assert_allclose(snr[2, 1], expect, rtol=1e-6)


def test_calculate_snr_detects_bright_center():
    imgs = np.random.default_rng(0).normal(size=(2, 1, 16, 16)).astype(np.float32)
    imgs[1, 0, 4:12, 4:12] += 50.0  # bright source in the central window
    snr = calculate_snr(imgs, n_central_pix=8)
    assert snr[1, 0] > 10 * abs(snr[0, 0])


def test_calculate_snr_nan_propagates_like_reference():
    """The reference computes plain mean/std, so a NaN pixel yields NaN S/N
    (filtered downstream by the snr-range cut) — reproduce, don't 'fix'."""
    imgs = np.ones((1, 1, 16, 16), np.float32)
    imgs[0, 0, 8, 8] = np.nan
    assert np.isnan(calculate_snr(imgs, 8)[0, 0])


def test_h5_snr_streaming_matches_single_batch(tmp_path, rng):
    import h5py

    imgs = rng.normal(size=(30, 2, 16, 16)).astype(np.float32)
    p = tmp_path / "snr.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("cutouts", data=imgs)
    full = h5_snr(str(p), n_central_pix=8, batch_size=7)
    one = calculate_snr(imgs, 8)
    np.testing.assert_allclose(full, one, rtol=1e-6)
    # num_samples truncation
    assert h5_snr(str(p), batch_size=7, num_samples=10).shape == (10, 2)


def test_central_patch_indices_geometry():
    # 8x8 grid, central 2x2 block: rows/cols 3..4
    idx = central_patch_indices(8, 4)
    assert sorted(idx.tolist()) == [3 * 8 + 3, 3 * 8 + 4, 4 * 8 + 3, 4 * 8 + 4]
    with pytest.raises(ValueError):
        central_patch_indices(8, 5)  # not a perfect square


def test_select_centre_picks_central_tokens(rng):
    latent = rng.normal(size=(2, 64, 5)).astype(np.float32)
    out = select_centre(latent, 4)
    assert out.shape == (2, 4, 5)
    np.testing.assert_array_equal(out[:, 0], latent[:, 3 * 8 + 3])
    with pytest.raises(ValueError):
        select_centre(latent[:, :60], 4)  # 60 tokens is not a square grid


def test_samples_per_class_proportional_and_balanced():
    counts = {"STAR": 600, "GAL": 300, "QSO": 100}
    prop = samples_per_class(counts, 100)
    assert prop == {"STAR": 60, "GAL": 30, "QSO": 10}
    bal = samples_per_class(counts, 90, balanced=True)
    # floor(90/3)=30 per class, capped by the smallest class (100)
    assert bal == {"STAR": 30, "GAL": 30, "QSO": 30}
    bal_capped = samples_per_class(counts, 600, balanced=True)
    assert bal_capped == {c: 100 for c in counts}  # smallest class wins


def test_select_training_indices(tmp_path):
    import h5py

    classes = np.array([b"STAR"] * 6 + [b"GAL"] * 3 + [b"QSO"] * 1)
    p = tmp_path / "cls.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("class", data=classes)
    idx = select_training_indices(str(p), 5)
    got = classes[idx]
    # proportional: 3 STAR, 1 GAL, 0 QSO (int truncation, reference parity)
    assert (got == b"STAR").sum() == 3 and (got == b"GAL").sum() == 1
    # prefix selection: earliest rows of each class
    assert sorted(i for i in idx if classes[i] == b"STAR") == [0, 1, 2]


def test_build_train_argparser_surface():
    args = build_train_argparser().parse_args(
        ["mim_1", "-v", "500", "-ct", "10", "-dd", "/data"]
    )
    assert (args.model_name, args.verbose_iters, args.cp_time, args.data_dir) == (
        "mim_1", 500, 10.0, "/data",
    )
    defaults = build_train_argparser().parse_args(["m"])
    assert (defaults.verbose_iters, defaults.cp_time, defaults.data_dir) == (
        10000, 15.0, None,
    )


def test_step_timer_and_sync():
    """utils/profiling: StepTimer windows report steps/sec and img/s and
    sync on the provided result tree."""
    import jax.numpy as jnp

    from sky_embeddings_tpu.utils.profiling import StepTimer, sync

    t = StepTimer(batch_size=4)
    t.start()
    x = jnp.arange(8.0)
    for _ in range(3):
        x = x * 1.5
        t.step()
    stats = t.lap(x)
    assert stats["steps"] == 3
    assert stats["img_per_sec"] > 0
    assert len(t.history) == 1
    # a second window restarts cleanly
    t.step()
    assert t.lap()["steps"] == 1
    sync({"a": x})  # tree input, no error


def test_profiler_trace_writes_events(tmp_path):
    import jax
    import jax.numpy as jnp

    from sky_embeddings_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    # a plugins/profile/<ts>/ dir with at least one artifact appears
    hits = list(tmp_path.rglob("*.xplane.pb")) + list(tmp_path.rglob("*.trace.json*"))
    assert hits, list(tmp_path.rglob("*"))
