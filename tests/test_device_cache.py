"""Device-resident dataset cache (data/device_cache.py)."""

import h5py
import numpy as np
import pytest

from sky_embeddings_tpu.data.device_cache import DeviceDataset
from sky_embeddings_tpu.data.h5_loader import build_h5_batcher
from sky_embeddings_tpu.data.synthetic import write_synthetic_h5


@pytest.fixture(scope="module")
def h5file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dc") / "train.h5")
    return write_synthetic_h5(path, n=50, channels=3, img_size=16, seed=1)


def test_matches_streaming_batcher(h5file):
    """Unshuffled device batches must equal the streaming loader's (same
    clip, crop, schema) — it is a drop-in cache, not a different pipeline."""
    kw = dict(batch_size=16, img_size=16, shuffle=False, drop_remainder=False,
              label_keys=["zspec"])
    stream = list(build_h5_batcher(h5file, **kw))
    cached = list(DeviceDataset(h5file, **kw))
    assert len(stream) == len(cached)
    for bs, bd in zip(stream, cached):
        np.testing.assert_allclose(np.asarray(bd["cutouts"]), bs["cutouts"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(bd["ra_dec"]), bs["ra_dec"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(bd["labels"]), bs["labels"], atol=1e-6)


def test_epoch_shuffle_covers_and_reshuffles(h5file):
    ds = DeviceDataset(h5file, batch_size=10, img_size=16, shuffle=True,
                       drop_remainder=False, seed=3)
    with h5py.File(h5file, "r") as f:
        expect = np.sort(f["ra"][:])
    ra1 = np.concatenate([np.asarray(b["ra_dec"][:, 0]) for b in ds])
    ra2 = np.concatenate([np.asarray(b["ra_dec"][:, 0]) for b in ds])
    np.testing.assert_allclose(np.sort(ra1), expect, atol=1e-6)
    np.testing.assert_allclose(np.sort(ra2), expect, atol=1e-6)
    assert not np.allclose(ra1, ra2)  # epochs reshuffle


def test_indices_subset_and_class_labels(h5file):
    idx = [3, 7, 11, 20]
    ds = DeviceDataset(h5file, batch_size=4, img_size=16, shuffle=False,
                       indices=idx, label_keys=["class"])
    batch = next(iter(ds))
    assert batch["labels"].dtype == np.int32 or str(batch["labels"].dtype) == "int32"
    with h5py.File(h5file, "r") as f:
        np.testing.assert_allclose(
            np.asarray(batch["ra_dec"][:, 0]), f["ra"][idx], atol=1e-6
        )


def test_max_bytes_guard(h5file):
    with pytest.raises(ValueError, match="H5Batcher"):
        DeviceDataset(h5file, batch_size=8, img_size=16, max_bytes=1000)


@pytest.mark.slow
def test_probe_features_accepts_device_dataset(h5file):
    """probe_features(path) and probe_features(DeviceDataset) must agree —
    the zero-traffic probe path used by the semantic-validation loop."""
    import jax
    import jax.numpy as jnp

    from sky_embeddings_tpu.eval.linear_probe import probe_features
    from sky_embeddings_tpu.models.mim import SkyMIM

    model = SkyMIM(img_size=16, patch_size=4, in_chans=3, embed_dim=32,
                   depth=1, num_heads=4, simmim=True)
    imgs = jnp.zeros((1, 3, 16, 16), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs,
                                    mask=jnp.zeros_like(imgs))
    x_path, y_path = probe_features(
        model, variables, h5file, "class", combine="central", img_size=16,
        to_host=False,
    )
    ds = DeviceDataset(h5file, batch_size=64, img_size=16, shuffle=False,
                       drop_remainder=False, label_keys=["class"])
    x_ds, y_ds = probe_features(
        model, variables, ds, "class", combine="central", img_size=16,
        to_host=False,
    )
    np.testing.assert_allclose(np.asarray(x_ds), np.asarray(x_path),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_ds), np.asarray(y_path))


def test_indices_preserve_caller_order_and_duplicates(h5file):
    """Unsorted / duplicated index lists must come back in caller order —
    the same contract H5Batcher._read_rows keeps (h5py's fancy indexing
    wants sorted unique rows; the un-sort must be applied after)."""
    idx = [20, 3, 7, 3]
    ds = DeviceDataset(h5file, batch_size=4, img_size=16, shuffle=False,
                       indices=idx, label_keys=["zspec"])
    batch = next(iter(ds))
    with h5py.File(h5file, "r") as f:
        ra = f["ra"][:]
        z = f["zspec"][:]
    np.testing.assert_allclose(np.asarray(batch["ra_dec"][:, 0]), ra[idx], atol=1e-6)
    np.testing.assert_allclose(np.asarray(batch["labels"][:, 0]), z[idx], atol=1e-6)


def test_mixed_label_keys_rejected(h5file):
    """labels is one array with one dtype: mixing the int 'class' key with
    float keys would silently truncate the floats, so it must raise."""
    with pytest.raises(ValueError, match="mixes 'class'"):
        DeviceDataset(h5file, batch_size=8, img_size=16,
                      label_keys=["zspec", "class"])


def test_bf16_storage_preserves_nans_and_values(tmp_path):
    """bf16 storage path: dtype lands on device as bfloat16, NaN pixels
    (missing-band semantics, SURVEY §2.5) survive the host cast, and values
    round-trip within bf16 quantization (~0.4% relative)."""
    import jax.numpy as jnp

    from sky_embeddings_tpu.data.synthetic import write_synthetic_h5

    path = str(tmp_path / "bf16.h5")
    write_synthetic_h5(path, n=12, channels=3, img_size=16, seed=5)
    with h5py.File(path, "r+") as f:
        f["cutouts"][0, 1] = np.nan  # NaN out a whole band
        raw = f["cutouts"][:]
    ds = DeviceDataset(path, batch_size=12, img_size=16, shuffle=False,
                       pixel_min=None, dtype=jnp.bfloat16)
    assert ds.cutouts.dtype == jnp.bfloat16
    got = np.asarray(ds.cutouts, np.float32)
    assert np.isnan(got[0, 1]).all()
    mask = ~np.isnan(raw)
    np.testing.assert_allclose(got[mask], raw[mask], rtol=8e-3, atol=1e-6)


def _data_section(**kw):
    from sky_embeddings_tpu.configuration import Config

    return Config.from_dict({"DATA": {k: str(v) for k, v in kw.items()}}).data


def test_dispatch_auto_caches_small_and_matches_stream(h5file):
    """[DATA] device_cache = auto must cache a small corpus, and the cached
    stream must equal the streaming one batch-for-batch (shuffle off)."""
    from sky_embeddings_tpu.data.device_cache import (
        build_cached_or_streaming_batcher,
    )
    from sky_embeddings_tpu.data.h5_loader import H5Batcher

    kw = dict(batch_size=16, img_size=16, shuffle=False, label_keys=["zspec"])
    cached = build_cached_or_streaming_batcher(
        _data_section(), h5file, log_fn=lambda *_: None, **kw)
    assert isinstance(cached, DeviceDataset)
    streamed = build_cached_or_streaming_batcher(
        _data_section(device_cache=False), h5file, **kw)
    assert isinstance(streamed, H5Batcher)
    for bd, bs in zip(cached, streamed):
        np.testing.assert_allclose(
            np.asarray(bd["cutouts"]), np.asarray(bs["cutouts"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(bd["labels"]), np.asarray(bs["labels"]), atol=1e-6)


def test_dispatch_threshold_and_multiprocess(h5file):
    """auto over the byte threshold streams; device_cache=True over it
    raises; multi-process runs always stream (whole-corpus-per-host cache
    would waste the upload N-fold)."""
    from sky_embeddings_tpu.data.device_cache import (
        build_cached_or_streaming_batcher,
    )
    from sky_embeddings_tpu.data.h5_loader import H5Batcher

    kw = dict(batch_size=16, img_size=16, shuffle=False)
    small = _data_section(device_cache="auto", device_cache_bytes=100)
    assert isinstance(
        build_cached_or_streaming_batcher(small, h5file, **kw), H5Batcher)
    with pytest.raises(ValueError, match="device_cache_bytes"):
        build_cached_or_streaming_batcher(
            _data_section(device_cache=True, device_cache_bytes=100),
            h5file, **kw)
    multi = build_cached_or_streaming_batcher(
        _data_section(device_cache=True), h5file,
        process_count=2, process_index=0, log_fn=lambda *_: None, **kw)
    assert isinstance(multi, H5Batcher)


def test_dispatch_bf16_dtype_knob(h5file):
    """[DATA] device_cache_dtype = bfloat16 reaches the on-device storage."""
    import jax.numpy as jnp

    from sky_embeddings_tpu.data.device_cache import (
        build_cached_or_streaming_batcher,
    )

    ds = build_cached_or_streaming_batcher(
        _data_section(device_cache=True, device_cache_dtype="bfloat16"),
        h5file, batch_size=16, img_size=16, shuffle=False,
        log_fn=lambda *_: None)
    assert isinstance(ds, DeviceDataset)
    assert ds.cutouts.dtype == jnp.bfloat16
