"""Training-time linear probes over frozen embeddings.

The pretraining loop periodically fits a quick classifier (star/QSO/galaxy)
and regressor (spec-z) on fixed probe sets to track embedding quality
(reference ``utils/pretrain_fns.py:52-159``). Protocol parity: 80/20 split,
LogisticRegression(C=0.01) accuracy, ElasticNet(alpha=1e-4, l1_ratio=0.9) R²,
feature pooling modes token/flatten/pool/centralpool/central/mean with
StandardScaler.

Two backends:

- ``backend="jax"`` (default): fully on-device — embeddings stay on the
  accelerator, pooling/standardization/fits run jit-compiled
  (``eval/probe_jax.py``: FISTA elastic net + L-BFGS logistic). No sklearn
  dependency and no host stall during the periodic probe.
- ``backend="sklearn"``: the reference-exact host path, kept as the parity
  oracle (``tests/test_probe_jax.py`` asserts both agree within tolerance).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from sky_embeddings_tpu.eval.eval_fns import extract_latents
from sky_embeddings_tpu.utils.misc import select_centre

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def pool_features(latents, combine: str = "central"):
    """(B, L, D) token features -> (B, F) probe features
    (reference ``get_embeddings`` pooling, ``pretrain_fns.py:136-153``).
    Works on numpy and jnp arrays alike."""
    if combine == "token":
        return latents[:, :1].reshape(latents.shape[0], -1)
    if combine == "flatten":
        return latents.reshape(latents.shape[0], -1)
    if combine == "pool":
        return latents.max(axis=1)
    if combine == "centralpool":
        return select_centre(latents, 16).max(axis=1)
    if combine == "central":
        return select_centre(latents, 4).reshape(latents.shape[0], -1)
    if combine == "mean":
        return latents.mean(axis=1)
    raise ValueError(f"unknown combine mode {combine!r}")


def probe_features(
    model,
    variables: dict,
    data_path,
    y_label: str,
    combine: str = "central",
    batch_size: int = 64,
    img_size: int = 64,
    to_host: bool = True,
):
    """Embed a probe set and pool features; returns (X, y).

    ``data_path``: an h5 file path, or any iterable of dict batches whose
    items carry ``labels`` for ``y_label`` (e.g. a device-resident
    ``DeviceDataset(label_keys=[y_label], shuffle=False)`` — then the probe
    runs with zero host↔device traffic).

    With ``to_host=False`` the pooled features stay on device (jnp) and
    standardization is left to the on-device fit.
    """
    remove_prefix = combine != "token"
    attn_pooled = getattr(model, "attn_pool", False) and getattr(model, "simmim", False)
    if attn_pooled:
        combine = "flatten"  # single pooled token (ref pretrain_fns.py:131-133)
    # pool inside the extraction loop: the probe only ever needs the pooled
    # (N, F) features, never the full (N, L, D) token set — per-batch pooling
    # keeps the footprint at the pooled size on device and host alike
    pool = lambda tokens: pool_features(tokens, combine)
    if isinstance(data_path, str):
        from sky_embeddings_tpu.data.h5_loader import build_h5_batcher

        if h5py is None:
            raise ImportError("h5py required")
        batcher = build_h5_batcher(
            data_path, batch_size=batch_size, img_size=img_size,
            shuffle=False, drop_remainder=False,
        )
        x = extract_latents(
            model, variables, batcher, remove_prefix=remove_prefix,
            to_host=to_host, batch_transform=pool,
        )
        with h5py.File(data_path, "r") as f:
            y = np.asarray(f[y_label][: x.shape[0]])
    else:
        ys = []
        def _collect(batches):
            for b in batches:
                ys.append(np.asarray(b["labels"]).reshape(len(b["cutouts"]), -1)[:, 0])
                yield b
        x = extract_latents(
            model, variables, _collect(data_path),
            remove_prefix=remove_prefix, to_host=to_host, batch_transform=pool,
        )
        y = np.concatenate(ys)[: x.shape[0]]
        if y_label == "class":
            y = y.astype(np.int64)

    if to_host:
        from sklearn.preprocessing import StandardScaler

        x = StandardScaler().fit_transform(np.asarray(x))
    return x, y


def _linear_probe_sklearn(x_cls, y_cls, x_reg, y_reg) -> dict[str, float]:
    from sklearn.linear_model import ElasticNet, LogisticRegression
    from sklearn.metrics import accuracy_score, r2_score
    from sklearn.model_selection import train_test_split

    metrics: dict[str, float] = {}
    if x_cls is not None:
        xtr, xte, ytr, yte = train_test_split(x_cls, y_cls, test_size=0.2, random_state=42)
        clf = LogisticRegression(max_iter=10000, C=0.01, random_state=42)
        clf.fit(xtr, ytr)
        metrics["train_lp_acc"] = float(accuracy_score(ytr, clf.predict(xtr)))
        metrics["val_lp_acc"] = float(accuracy_score(yte, clf.predict(xte)))
    if x_reg is not None:
        xtr, xte, ytr, yte = train_test_split(x_reg, y_reg, test_size=0.2, random_state=42)
        reg = ElasticNet(alpha=1e-4, l1_ratio=0.9, max_iter=10000, random_state=42)
        reg.fit(xtr, ytr)
        metrics["train_lp_r2"] = float(r2_score(ytr, reg.predict(xtr)))
        metrics["val_lp_r2"] = float(r2_score(yte, reg.predict(xte)))
    return metrics


def linear_probe(
    model,
    variables: dict,
    class_data_path: Optional[str] = None,
    regress_data_path: Optional[str] = None,
    combine: str = "central",
    img_size: int = 64,
    backend: str = "jax",
) -> dict[str, float]:
    """Fit the probes; returns a metrics dict
    {train_lp_acc, val_lp_acc, train_lp_r2, val_lp_r2} (subset by task)."""
    if backend == "jax":
        from sky_embeddings_tpu.eval.probe_jax import (
            probe_classification,
            probe_regression,
        )

        metrics: dict[str, float] = {}
        if class_data_path:
            x, y = probe_features(
                model, variables, class_data_path, "class", combine,
                img_size=img_size, to_host=False,
            )
            metrics.update(probe_classification(x, y))
        if regress_data_path:
            x, y = probe_features(
                model, variables, regress_data_path, "zspec", combine,
                img_size=img_size, to_host=False,
            )
            metrics.update(probe_regression(x, y))
        return metrics
    if backend != "sklearn":
        raise ValueError(f"unknown probe backend {backend!r}")

    x_cls = y_cls = x_reg = y_reg = None
    if class_data_path:
        x_cls, y_cls = probe_features(
            model, variables, class_data_path, "class", combine, img_size=img_size
        )
    if regress_data_path:
        x_reg, y_reg = probe_features(
            model, variables, regress_data_path, "zspec", combine, img_size=img_size
        )
    return _linear_probe_sklearn(x_cls, y_cls, x_reg, y_reg)
