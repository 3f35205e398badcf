"""Device-resident dataset cache for small corpora.

When the whole training set fits in HBM (e.g. 40k 64×64×5 cutouts ≈ 3.3 GB
fp32 / 1.6 GB bf16 on a 16 GB v5e), streaming it from the host every step
wastes the interconnect: the same bytes cross host→device once per epoch
forever. This cache pays the transfer ONCE and then serves every batch as an
on-device gather (~µs), which also removes the host loader from the step's
critical path entirely.

The reference has no equivalent (its DataLoader re-reads h5 rows per item,
``utils/dataloaders.py:221-328``); this is a TPU-native addition for
probe/validation-scale corpora. For survey-scale files use ``H5Batcher``.

Yields the same dict-batch schema as ``H5Batcher``:
``{"cutouts", "ra_dec"[, "labels"]}`` — drop-in for ``train_network`` /
``train_predictor_network`` / ``extract_latents``.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class DeviceDataset:
    """Full dataset resident in HBM; batches are on-device gathers."""

    def __init__(
        self,
        path: str,
        batch_size: int,
        img_size: int = 64,
        label_keys: Optional[Sequence[str]] = None,
        shuffle: bool = True,
        indices: Optional[Sequence[int]] = None,
        pixel_min: Optional[float] = -3.0,
        pixel_max: Optional[float] = None,
        drop_remainder: bool = True,
        seed: int = 0,
        dtype=jnp.float32,
        max_bytes: int = 8 << 30,
    ):
        """``dtype``: storage dtype on device (``jnp.bfloat16`` halves HBM;
        models cast inputs anyway). ``max_bytes`` guards against silently
        device-loading survey-scale files — raises with a pointer to
        ``H5Batcher`` instead."""
        if h5py is None:
            raise ImportError("h5py is required for the HDF5 data path")
        from sky_embeddings_tpu.data.h5_loader import central_crop

        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self._seed = seed
        self._epoch = 0
        self.label_keys = list(label_keys) if label_keys else None
        if (
            self.label_keys
            and "class" in self.label_keys
            and len(self.label_keys) > 1
        ):
            # the labels batch is one array with one dtype: mixing the int
            # 'class' key with float keys would silently truncate the floats
            raise ValueError(
                "label_keys mixes 'class' with float keys "
                f"({self.label_keys}); use separate datasets per task"
            )

        with h5py.File(path, "r") as f:
            n = f["cutouts"].shape[0] if indices is None else len(indices)
            bytes_needed = n * int(np.prod(f["cutouts"].shape[1:])) * np.dtype(dtype).itemsize
            if bytes_needed > max_bytes:
                raise ValueError(
                    f"{path} needs {bytes_needed / 2**30:.1f} GiB on device "
                    f"(> max_bytes={max_bytes / 2**30:.1f} GiB) — use the "
                    "streaming H5Batcher for survey-scale files"
                )
            if indices is not None:
                # h5py fancy indexing wants sorted unique rows; un-sort after
                # the gather so caller order is preserved (the contract
                # H5Batcher._read_rows keeps) and duplicates are served.
                req = np.asarray(indices)
                uniq, inv = np.unique(req, return_inverse=True)
                sel, unsort = uniq, inv
            else:
                sel, unsort = slice(None), slice(None)
            cutouts = f["cutouts"][sel][unsort]
            ra = f["ra"][sel][unsort]
            dec = f["dec"][sel][unsort]
            cols = (
                [f[k][sel][unsort] for k in self.label_keys]
                if self.label_keys else None
            )

        cutouts = np.asarray(cutouts, np.float32)
        if pixel_min is not None:
            np.maximum(cutouts, pixel_min, out=cutouts)
        if pixel_max is not None:
            np.minimum(cutouts, pixel_max, out=cutouts)
        if cutouts.shape[-1] > img_size or cutouts.shape[-2] > img_size:
            cutouts = np.ascontiguousarray(central_crop(cutouts, img_size))

        # the one-time transfers; cast on HOST first so the wire carries the
        # storage dtype's bytes (bf16 halves the upload vs shipping fp32 and
        # casting on device — this matters on tunneled harnesses)
        self.cutouts = jax.device_put(np.asarray(cutouts, np.dtype(dtype)))
        self.ra_dec = jax.device_put(
            jnp.stack([jnp.asarray(ra, jnp.float32), jnp.asarray(dec, jnp.float32)], axis=1)
        )
        self.labels = None
        if cols is not None:
            lab_dtype = jnp.int32 if "class" in self.label_keys else jnp.float32
            labels = np.stack(cols, axis=-1)
            if labels.ndim > 2:
                labels = labels.reshape(len(cutouts), -1)
            self.labels = jax.device_put(jnp.asarray(labels, lab_dtype))
        self.num_samples = int(self.cutouts.shape[0])
        self.shuffle = shuffle

    def __len__(self) -> int:
        if self.drop_remainder:
            return self.num_samples // self.batch_size
        return (self.num_samples + self.batch_size - 1) // self.batch_size

    def _gather(self, rows: np.ndarray) -> dict:
        idx = jnp.asarray(rows)
        batch = {
            "cutouts": jnp.take(self.cutouts, idx, axis=0),
            "ra_dec": jnp.take(self.ra_dec, idx, axis=0),
        }
        if self.labels is not None:
            batch["labels"] = jnp.take(self.labels, idx, axis=0)
        return batch

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        order = np.arange(self.num_samples)
        if self.shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(order)
        n_full = self.num_samples // self.batch_size
        for i in range(n_full):
            yield self._gather(order[i * self.batch_size : (i + 1) * self.batch_size])
        rest = order[n_full * self.batch_size :]
        if len(rest) and not self.drop_remainder:
            yield self._gather(rest)

    def take(self, n: int) -> Iterator[dict]:
        for i, batch in enumerate(self):
            if i >= n:
                return
            yield batch

    def forever(self) -> Iterator[dict]:
        while True:
            yield from self


def build_cached_or_streaming_batcher(
    data_cfg,
    path: str,
    batch_size: int,
    img_size: int = 64,
    label_keys: Optional[Sequence[str]] = None,
    shuffle: bool = True,
    indices: Optional[Sequence[int]] = None,
    process_count: int = 1,
    process_index: int = 0,
    num_workers: int = 0,
    log_fn=print,
):
    """Front-door dispatch between :class:`DeviceDataset` and ``H5Batcher``.

    Driven by the ``[DATA]`` config section (the reference's dataloader knobs
    live there too, ``configs/README.md``):

    - ``device_cache = True | False | auto`` (default ``auto``): ``True``
      caches the whole file in HBM; ``auto`` caches only when the corpus fits
      under ``device_cache_bytes`` (default 2 GiB — comfortably inside a
      16 GiB v5e alongside model + optimizer state); ``False`` always streams.
    - ``device_cache_dtype = float32 | bfloat16``: on-device storage dtype
      (bf16 halves HBM and the one-time upload; models cast inputs anyway).

    Multi-process runs always stream: the cache is whole-corpus-per-process,
    so sharded hosts would each upload the full file for a 1/N use of it.
    Both returned objects serve the same dict-batch schema
    (``{"cutouts", "ra_dec"[, "labels"]}``) with the pixel clip left to the
    jitted train step, so the choice is invisible to the training loops.
    """
    from sky_embeddings_tpu.data.h5_loader import build_h5_batcher

    mode = str(data_cfg.get("device_cache", "auto")).strip().lower()
    if mode not in ("true", "false", "auto", "1", "0"):
        raise ValueError(f"device_cache must be True/False/auto, got {mode!r}")
    want = mode in ("true", "1")
    max_bytes = int(data_cfg.int("device_cache_bytes", 2 << 30))
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        data_cfg.str("device_cache_dtype", "float32").strip().lower()
    ]

    if process_count == 1 and (want or mode == "auto"):
        with h5py.File(path, "r") as f:
            n = f["cutouts"].shape[0] if indices is None else len(indices)
            bytes_needed = (
                n * int(np.prod(f["cutouts"].shape[1:])) * np.dtype(dtype).itemsize
            )
        if bytes_needed <= max_bytes:
            log_fn(
                f"Device-caching {os.path.basename(path)} "
                f"({bytes_needed / 2**20:.0f} MiB as {np.dtype(dtype).name})."
            )
            return DeviceDataset(
                path, batch_size=batch_size, img_size=img_size,
                label_keys=label_keys, shuffle=shuffle, indices=indices,
                pixel_min=None, pixel_max=None,  # clip runs in the jitted step
                dtype=dtype, max_bytes=max_bytes,
            )
        if want:
            raise ValueError(
                f"device_cache = True but {path} needs "
                f"{bytes_needed / 2**30:.1f} GiB (> device_cache_bytes "
                f"{max_bytes / 2**30:.1f} GiB); raise the limit or stream"
            )
    elif want and process_count > 1:
        log_fn("device_cache requested but multi-process run — streaming instead.")

    return build_h5_batcher(
        path, batch_size=batch_size, img_size=img_size, label_keys=label_keys,
        shuffle=shuffle, indices=indices, pixel_min=None, pixel_max=None,
        num_workers=num_workers, process_count=process_count,
        process_index=process_index,
    )
