"""Concatenate HDF5 cutout files (reference ``3_combine_h5_files.py``)."""

from __future__ import annotations

from typing import Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def combine_h5_files(inputs: Sequence[str], out_path: str, batch: int = 4096) -> str:
    """Stream-concatenate the shared keys of all inputs into one file."""
    if h5py is None:
        raise ImportError("h5py required")
    with h5py.File(inputs[0], "r") as f:
        keys = [k for k in f.keys()]

    with h5py.File(out_path, "w") as out:
        for path in inputs:
            with h5py.File(path, "r") as f:
                n = f[keys[0]].shape[0]
                for start in range(0, n, batch):
                    end = min(n, start + batch)
                    for k in keys:
                        arr = f[k][start:end]
                        if k not in out:
                            out.create_dataset(
                                k, data=arr, maxshape=(None,) + arr.shape[1:],
                                chunks=(min(len(arr), 256),) + arr.shape[1:],
                            )
                        else:
                            ds = out[k]
                            n0 = ds.shape[0]
                            ds.resize(n0 + len(arr), axis=0)
                            ds[n0:] = arr
    return out_path


def main():  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser("Combine h5 cutout files")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--out_path", required=True)
    args = p.parse_args()
    combine_h5_files(args.inputs, args.out_path)


if __name__ == "__main__":  # pragma: no cover
    main()
