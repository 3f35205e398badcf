"""Streaming HDF5 batch loader, designed for a TPU host.

Counterpart of the reference ``H5Dataset``/``build_h5_dataloader``
(``utils/dataloaders.py:134-328``) re-designed for the TPU input model:

* The reference reads **one row per worker process per __getitem__** and
  collates on the host. Here a background thread reads **whole batches** with
  h5py fancy indexing (sorted row gathers, so HDF5 streams chunks), keeping
  the (often single-core) TPU host free.
* Per-sample work the reference does on the host — augmentation, SimMIM mask
  generation — moves onto the device (``data/augment.py``,
  ``ops/masking.py``), so a batch leaving this loader is raw: cutouts
  (clipped + center-cropped), ra/dec, optional labels.
* Batches are fixed-shape (remainder batch dropped when ``drop_remainder``)
  so every training step hits the same compiled program.

Yields dict batches of numpy arrays:
    ``{"cutouts": (B,C,S,S) f32, "ra_dec": (B,2) f32[, "labels": (B,k)]}``
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def central_crop(batch: np.ndarray, size: int) -> np.ndarray:
    """Central (size × size) crop of (..., H, W) arrays
    (reference ``extract_center``, ``dataloaders.py:656-672``)."""
    h, w = batch.shape[-2:]
    r0 = h // 2 - size // 2
    c0 = w // 2 - size // 2
    return batch[..., r0 : r0 + size, c0 : c0 + size]


class H5Batcher:
    """Iterable over fixed-size batches of an HDF5 cutout file.

    Parameters mirror the reference dataloader: ``pixel_min``/``pixel_max``
    clipping (defaults -3/None, ``dataloaders.py:256``), ``img_size`` central
    crop, ``label_keys`` (int64 ``class`` -> int32; floats otherwise),
    ``indices`` subset selection.
    """

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
        prefetch_batches: int = 4,
        read_chunk: int = 4096,
        shuffle_mode: str = "auto",
        buffer_batches: int = 8,
        transfer_dtype=None,
    ):
        """``shuffle_mode``: 'exact' gathers fully random rows per batch
        (reference semantics, slow on chunked files); 'buffer' reads
        contiguous slabs in random order and shuffles inside a
        ``buffer_batches``-batch reservoir — sequential-read speed (~9× here)
        with near-uniform mixing; 'auto' picks 'buffer' for whole-file
        training streams and 'exact' when an ``indices`` subset is given.
        ``transfer_dtype`` (e.g. np.float16) optionally narrows cutouts after
        clipping to halve host->device bytes on transfer-bound hosts."""
        if h5py is None:
            raise ImportError("h5py is required for the HDF5 data path")
        self.path = path
        self.batch_size = batch_size
        self.img_size = img_size
        self.label_keys = list(label_keys) if label_keys else None
        self.shuffle = shuffle
        self.pixel_min = pixel_min
        self.pixel_max = pixel_max
        self.drop_remainder = drop_remainder
        self.prefetch_batches = prefetch_batches
        self.read_chunk = read_chunk
        self.buffer_batches = max(buffer_batches, 2)
        self.transfer_dtype = transfer_dtype
        if shuffle_mode == "auto":
            shuffle_mode = "exact" if indices is not None else "buffer"
        if shuffle_mode not in ("exact", "buffer"):
            raise ValueError(f"unknown shuffle_mode {shuffle_mode!r}")
        self.shuffle_mode = shuffle_mode
        self._epoch = 0
        self._seed = seed

        with h5py.File(path, "r") as f:
            n_total = f["cutouts"].shape[0]
            self._raw_shape = f["cutouts"].shape[1:]
        if indices is not None:
            self.indices = np.asarray(indices, dtype=np.int64)
            self._full_range = False
        else:
            self.indices = np.arange(n_total, dtype=np.int64)
            self._full_range = True

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.indices)

    # ------------------------------------------------------------------
    def _read_rows(self, f, key: str, rows: np.ndarray) -> np.ndarray:
        """Gather rows with h5py's sorted fancy indexing, then un-sort."""
        order = np.argsort(rows, kind="stable")
        sorted_rows = rows[order]
        data = f[key][sorted_rows]
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return data[inv]

    def _finalize(self, cutouts: np.ndarray, ra, dec, label_cols) -> dict:
        """Clip, crop, and assemble the final batch dict.

        ``cutouts`` must be a freshly-gathered array (clipping is in-place).
        """
        cutouts = np.asarray(cutouts, dtype=np.float32)
        if self.pixel_min is not None:
            np.maximum(cutouts, self.pixel_min, out=cutouts)
        if self.pixel_max is not None:
            np.minimum(cutouts, self.pixel_max, out=cutouts)
        if cutouts.shape[-1] > self.img_size or cutouts.shape[-2] > self.img_size:
            cutouts = np.ascontiguousarray(central_crop(cutouts, self.img_size))
        if self.transfer_dtype is not None:
            cutouts = cutouts.astype(self.transfer_dtype)

        batch = {
            "cutouts": cutouts,
            "ra_dec": np.stack(
                [np.asarray(ra, np.float32), np.asarray(dec, np.float32)], axis=1
            ),
        }
        if label_cols is not None:
            if "class" in self.label_keys:
                labels = np.stack(label_cols, axis=-1).astype(np.int32)
            else:
                labels = np.stack(label_cols, axis=-1).astype(np.float32)
            if labels.ndim > 2:  # label columns that are already vectors
                labels = labels.reshape(len(cutouts), -1)
            batch["labels"] = labels
        return batch

    def _make_batch(self, f, rows: np.ndarray) -> dict:
        cutouts = self._read_rows(f, "cutouts", rows)
        ra = self._read_rows(f, "ra", rows)
        dec = self._read_rows(f, "dec", rows)
        cols = (
            [self._read_rows(f, k, rows) for k in self.label_keys]
            if self.label_keys
            else None
        )
        return self._finalize(cutouts, ra, dec, cols)

    def _buffered_batches(self, f, rng: np.random.Generator):
        """Sequential slab reads in random order + reservoir shuffle.

        Slabs are read with ``read_direct`` straight into a preallocated pool
        (no intermediate arrays); each emitted batch is a single permutation
        gather out of the pool. Disk-sequential, one copy per batch.
        """
        n = len(self.indices)
        starts = np.arange(0, n, self.read_chunk)
        rng.shuffle(starts)
        keys = ["cutouts", "ra", "dec"] + (list(self.label_keys) if self.label_keys else [])
        cap = self.buffer_batches * self.batch_size + self.read_chunk
        pool = {
            k: np.empty((cap,) + f[k].shape[1:], dtype=f[k].dtype) for k in keys
        }
        fill = 0

        def emit(final: bool):
            nonlocal fill
            perm = rng.permutation(fill)
            n_full = fill // self.batch_size
            for i in range(n_full):
                sel = perm[i * self.batch_size : (i + 1) * self.batch_size]
                cols = [pool[k][sel] for k in self.label_keys] if self.label_keys else None
                yield self._finalize(
                    pool["cutouts"][sel], pool["ra"][sel], pool["dec"][sel], cols
                )
            rest = perm[n_full * self.batch_size :]
            if final and len(rest) and not self.drop_remainder:
                cols = [pool[k][rest] for k in self.label_keys] if self.label_keys else None
                yield self._finalize(
                    pool["cutouts"][rest], pool["ra"][rest], pool["dec"][rest], cols
                )
                fill = 0
            else:
                for k in keys:  # compact leftovers to the front
                    pool[k][: len(rest)] = pool[k][rest]
                fill = len(rest)

        target_rows = self.buffer_batches * self.batch_size
        for s in starts:
            s = int(s)
            e = min(s + self.read_chunk, n)
            count = e - s
            for k in keys:
                f[k].read_direct(
                    pool[k], np.s_[s:e], np.s_[fill : fill + count]
                )
            fill += count
            if fill >= target_rows:
                yield from emit(final=False)
        if fill:
            yield from emit(final=True)

    def _batch_rows(self) -> list[np.ndarray]:
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            idx = rng.permutation(idx)
        n_full = len(idx) // self.batch_size
        rows = [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_full)]
        if not self.drop_remainder and len(idx) % self.batch_size:
            rows.append(idx[n_full * self.batch_size :])
        return rows

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[dict]:
        """One pass over the dataset, batches produced by a reader thread."""
        self._epoch += 1
        use_buffer = self.shuffle and self.shuffle_mode == "buffer" and self._full_range
        rng = np.random.default_rng(self._seed + self._epoch)
        row_groups = None if use_buffer else self._batch_rows()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        _SENTINEL = object()

        def reader():
            try:
                with h5py.File(self.path, "r") as f:
                    if use_buffer:
                        for batch in self._buffered_batches(f, rng):
                            q.put(batch)
                    else:
                        for rows in row_groups:
                            q.put(self._make_batch(f, rows))
            except BaseException as e:  # surface errors in the consumer
                q.put(e)
                return
            q.put(_SENTINEL)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def forever(self) -> Iterator[dict]:
        """Endless epoch-reshuffled stream (training loops count iters, not
        epochs — reference ``pretrain_mim.py:149``)."""
        while True:
            yield from self


def build_h5_batcher(
    filename: str,
    batch_size: int,
    img_size: int = 64,
    label_keys: Optional[Sequence[str]] = None,
    shuffle: bool = True,
    indices: Optional[Sequence[int]] = None,
    **kwargs,
) -> H5Batcher:
    """Convenience constructor mirroring ``build_h5_dataloader``
    (reference ``dataloaders.py:134-153``). Masking/augmentation parameters
    are intentionally absent — they are device-side concerns here."""
    return H5Batcher(
        filename,
        batch_size=batch_size,
        img_size=img_size,
        label_keys=label_keys,
        shuffle=shuffle,
        indices=indices,
        **kwargs,
    )
