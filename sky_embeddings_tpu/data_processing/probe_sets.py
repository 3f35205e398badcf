"""Balanced linear-probe datasets (reference ``4_linear_probe_datasets.ipynb``:
fixed per-class sample counts for the training-time probe canary)."""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def make_probe_set(
    in_path: str,
    out_path: str,
    per_class: int = 2000,
    class_key: str = "class",
    seed: int = 0,
) -> int:
    """Sample up to ``per_class`` rows per class; returns the output size."""
    if h5py is None:
        raise ImportError("h5py required")
    rng = np.random.default_rng(seed)
    with h5py.File(in_path, "r") as f:
        classes = np.asarray(f[class_key])
        chosen: list[int] = []
        for cls in np.unique(classes):
            rows = np.where(classes == cls)[0]
            take = min(per_class, len(rows))
            chosen.extend(rng.choice(rows, size=take, replace=False).tolist())
        idx = np.sort(np.asarray(chosen))
        with h5py.File(out_path, "w") as out:
            for k in f:
                out.create_dataset(k, data=f[k][:][idx])
    return len(idx)


def make_regression_probe_set(
    in_path: str, out_path: str, n_samples: int = 6000, seed: int = 0
) -> int:
    """Uniform random probe subset for the regression (zspec) probe."""
    if h5py is None:
        raise ImportError("h5py required")
    rng = np.random.default_rng(seed)
    with h5py.File(in_path, "r") as f:
        n = f["cutouts"].shape[0]
        idx = np.sort(rng.choice(n, size=min(n_samples, n), replace=False))
        with h5py.File(out_path, "w") as out:
            for k in f:
                out.create_dataset(k, data=f[k][:][idx])
    return len(idx)
