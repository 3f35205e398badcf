"""Precomputed embedding banks for repeated survey retrieval.

The streaming search (``eval/simsearch.py``) re-encodes the survey for every
query sweep — right when targets change rarely. For the serving pattern
"embed the survey once, answer many queries" this module adds the
precomputed-bank path the reference approximates by re-running
``mae_simsearch`` per target (``utils/similarity.py:37-132``):

* :func:`build_bank` — stream batches through the encoder, pool each image
  to one feature row, standardize by the bank's own statistics, and store
  **bf16** rows (half the HBM bytes per query pass; top-300 agreement with
  fp32 ≥ 0.999 — ``tests/test_kernels.py``).
* :class:`EmbeddingBank` — query with weighted-cosine top-k. Survey-scale
  device-resident banks default to the two-stage int8 scorer
  (``ops/kernels/simscore.bank_topk_int8``: int8 dots-only cut via
  ``approx_max_k`` → exact rescore of the candidates; ~470 q/s on a
  1M×768 bank, top-300 agreement 1.0 vs fp32); ``exact=True`` forces the
  single-pass scorer (``bank_topk``). Banks larger than device memory
  stream through :func:`bank_topk_chunked` automatically. HDF5
  save/load for persistence.

Scoring semantics match the streaming path: target group → mean feature +
inverse-variance weights (``ops/similarity.target_features``), features
standardized before scoring (the bank uses its own global stats rather than
the reference's first-batch quirk — documented deviation, PARITY #6 covers
the streaming path which reproduces the quirk).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from sky_embeddings_tpu.models.mim import SkyMIM
from sky_embeddings_tpu.models.predictor import SkyViT
from sky_embeddings_tpu.ops.kernels.simscore import (
    bank_topk,
    bank_topk_chunked,
    bank_topk_int8,
    bank_topk_multi,
    bank_topk_multi_int8,
    quantize_bank_int8,
)
from sky_embeddings_tpu.ops.similarity import target_features

# rows above which queries stream host slabs instead of device-residing the
# bank (¼ of a 16 GB v5e at 768-d bf16 leaves headroom for the model)
DEVICE_ROWS_LIMIT = 2_500_000

# rows below which the single-pass scorer is used directly: the two-stage
# int8 cut only pays once the full-bank read dominates the candidate rescore
TWO_STAGE_MIN_ROWS = 1 << 16


class _DiskFeatures:
    """Row-sliceable view of an on-disk feature dataset (bf16 stored as raw
    uint16 bits); feeds ``bank_topk_chunked`` without loading the bank."""

    def __init__(self, dataset, feat_dtype: str):
        self._ds = dataset
        self._dtype = feat_dtype

    @property
    def shape(self):
        return self._ds.shape

    def __len__(self):
        return self._ds.shape[0]

    def __getitem__(self, sl):
        arr = self._ds[sl]
        if self._dtype == "bfloat16":
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        return arr


class EmbeddingBank:
    """(N, D) standardized pooled features + (N, 2) ra/dec + bank stats."""

    def __init__(self, features: np.ndarray, ra_decs: np.ndarray,
                 mean: np.ndarray, std: np.ndarray, pool: str = "mean",
                 n_extra: int = 1):
        self.features = features
        self.ra_decs = ra_decs
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.pool = pool
        # prefix-token count of the encoder that built the bank — needed to
        # apply the same pooling to query targets (central mode)
        self.n_extra = int(n_extra)
        self._device_bank = None
        self._device_int8_bank = None

    # -- persistence ---------------------------------------------------
    def save(self, path: str) -> None:
        import h5py

        feats = self.features
        feat_dtype = str(feats.dtype)
        if feat_dtype == "bfloat16":  # HDF5 has no bf16 — store the raw bits
            feats = feats.view(np.uint16)
        with h5py.File(path, "w") as f:
            # chunk by row groups so slab reads stream contiguously
            f.create_dataset(
                "features", data=feats,
                chunks=(min(len(feats), 1 << 14), feats.shape[1]),
            )
            f.create_dataset("ra_decs", data=self.ra_decs)
            f.create_dataset("mean", data=self.mean)
            f.create_dataset("std", data=self.std)
            f.attrs["pool"] = self.pool
            f.attrs["n_extra"] = self.n_extra
            f.attrs["feat_dtype"] = feat_dtype

    @classmethod
    def load(cls, path: str, lazy: bool = False) -> "EmbeddingBank":
        """``lazy=True`` keeps features as a slab-sliceable disk handle (for
        banks larger than host RAM — queries stream slabs straight from
        disk through the chunked scorer)."""
        import h5py

        f = h5py.File(path, "r")
        feat_dtype = str(f.attrs.get("feat_dtype", "float32"))
        if lazy:
            feats = _DiskFeatures(f["features"], feat_dtype)
        else:
            feats = f["features"][:]
            if feat_dtype == "bfloat16":
                import ml_dtypes

                feats = feats.view(ml_dtypes.bfloat16)
        bank = cls(feats, f["ra_decs"][:], f["mean"][:], f["std"][:],
                   pool=str(f.attrs.get("pool", "mean")),
                   n_extra=int(f.attrs.get("n_extra", 1)))
        if not lazy:
            f.close()
        return bank

    # -- queries -------------------------------------------------------
    def query(self, target_latent, k: int = 300, use_weights: bool = True,
              exact: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """(scores, indices) of the best-k rows for a target group.

        ``target_latent``: (Bt, Lt, D) token features of the target set
        (reference target semantics, ``similarity.py:134-147``).

        Device-resident banks above :data:`TWO_STAGE_MIN_ROWS` rows route
        through the two-stage int8 scorer by default (int8 dots-only cut →
        exact weighted-cosine rescore of the oversampled candidates against
        the stored-precision rows — ~2× the single-pass rate at 1M rows,
        measured top-300 agreement 1.0). ``exact=True`` forces the
        single-pass scorer at the bank's storage precision.
        """
        flat = self._pool_target(target_latent)
        # standardize the target tokens by the bank stats BEFORE the
        # mean/inverse-variance collapse — same order as the streaming path
        # (simsearch standardizes latents, then weights; similarity.py:98-147)
        flat = (flat - self.mean) / (self.std + 1e-8)
        tgt, w = target_features(flat)
        if not use_weights:
            w = jnp.ones_like(w) / w.shape[0]
        n = self.features.shape[0]
        if n <= DEVICE_ROWS_LIMIT and isinstance(self.features, np.ndarray):
            bank = self._device()
            if exact or n < TWO_STAGE_MIN_ROWS:
                vals, idx = bank_topk(bank, tgt, w, min(k, n))
            else:
                bank8, rnorm = self._device_int8()
                vals, idx = bank_topk_int8(
                    bank8, rnorm, bank, tgt, w, min(k, n),
                    oversample=min(max(8192, k), n),
                )
            return np.asarray(vals), np.asarray(idx)
        return bank_topk_chunked(self.features, tgt, w, k)

    def query_multi(self, target_latents, k: int = 300,
                    use_weights: bool = True,
                    exact: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """Batched :meth:`query`: Q independent target groups, one bank pass.

        ``target_latents``: sequence of Q target groups, each (Bt, Lt, D)
        token features (each group collapses to its own mean target +
        inverse-variance weights). Returns ``(Q, k)`` scores and indices.
        Device-resident banks above :data:`TWO_STAGE_MIN_ROWS` rows use the
        two-stage int8 scorer (one int8 bank pass for all Q queries);
        requires a device-resident bank (streaming multi-target survey
        search amortizes at the encoder level instead —
        ``eval/simsearch.mim_simsearch_multi``).
        """
        tgts, ws = [], []
        for latent in target_latents:
            flat = self._pool_target(latent)
            flat = (flat - self.mean) / (self.std + 1e-8)
            tgt, w = target_features(flat)
            if not use_weights:
                w = jnp.ones_like(w) / w.shape[0]
            tgts.append(tgt)
            ws.append(w)
        targets = jnp.stack(tgts)
        weights = jnp.stack(ws)
        n = self.features.shape[0]
        if not (n <= DEVICE_ROWS_LIMIT and isinstance(self.features, np.ndarray)):
            raise ValueError(
                "query_multi needs a device-resident bank; for out-of-HBM "
                "banks loop bank_topk_chunked per target"
            )
        bank = self._device()
        if exact or n < TWO_STAGE_MIN_ROWS:
            vals, idx = bank_topk_multi(bank, targets, weights, min(k, n))
        else:
            bank8, rnorm = self._device_int8()
            vals, idx = bank_topk_multi_int8(
                bank8, rnorm, bank, targets, weights, min(k, n),
                oversample=min(max(2048, k), n),
            )
        return np.asarray(vals), np.asarray(idx)

    def _pool_target(self, target_latent) -> jnp.ndarray:
        """Target token features in the bank's feature space.

        ``central`` banks store the central-4-patch flattened features (the
        probe's ``combine='central'`` space, ``eval/linear_probe.py``), so
        the (Bt, Lt, D) target tokens must collapse the same way — one
        (4·D,) row per target sample — before standardization;
        ``target_features`` then takes the mean + inverse-variance weights
        over the Bt rows. Other pool modes keep the reference's token-level
        collapse (``similarity.py:134-147``)."""
        flat = jnp.asarray(np.asarray(target_latent, np.float32))
        if self.pool == "central":
            from sky_embeddings_tpu.utils.misc import select_centre

            sel = select_centre(flat[:, self.n_extra:], 4)
            flat = sel.reshape(sel.shape[0], -1)
        return flat

    def _device(self):
        if self._device_bank is None:
            self._device_bank = jax.device_put(self.features)
        return self._device_bank

    def _device_int8(self):
        """Lazily quantize the device bank for the stage-1 int8 cut."""
        if self._device_int8_bank is None:
            self._device_int8_bank = jax.jit(quantize_bank_int8)(self._device())
        return self._device_int8_bank


def build_bank(
    model,
    variables: dict,
    batches: Iterable[dict],
    pool: str = "mean",
    dtype=jnp.bfloat16,
    n_batches: Optional[int] = None,
) -> EmbeddingBank:
    """Encode a survey stream into an :class:`EmbeddingBank`.

    ``pool``: 'mean' | 'max' over patch tokens, 'cls' for the cls token
    (mirrors ``eval/simsearch._select_tokens`` collapse modes), or
    'central' — the central-4-patch flattened features, i.e. the linear
    probe's ``combine='central'`` space (``eval/linear_probe.py``; 4·D
    feature rows). For compact point-like sources the central patches carry
    the class signal that mean pooling dilutes over the 64-patch grid.
    """
    n_extra = model.num_extra_tokens

    def encode(vs, imgs, ra_dec):
        kwargs = {"ra_dec": ra_dec} if model.ra_dec else {}
        if isinstance(model, SkyMIM):
            tokens, _, _ = model.apply(vs, imgs, method=SkyMIM.encode, **kwargs)
        else:
            tokens = model.apply(vs, imgs, method=SkyViT.encode, **kwargs)
        return tokens

    @jax.jit
    def pooled(vs, imgs, ra_dec):
        latent = encode(vs, imgs, ra_dec)
        if pool == "cls":
            return latent[:, 0]
        patches = latent[:, n_extra:]
        if pool == "central":
            from sky_embeddings_tpu.utils.misc import select_centre

            sel = select_centre(patches, 4)
            return sel.reshape(sel.shape[0], -1)
        return patches.max(axis=1) if pool == "max" else patches.mean(axis=1)

    rows, ra_decs = [], []
    for i, batch in enumerate(batches):
        if n_batches is not None and i >= n_batches:
            break
        imgs = jnp.asarray(batch["cutouts"])
        ra_dec = jnp.asarray(batch["ra_dec"])
        rows.append(np.asarray(pooled(variables, imgs, ra_dec), np.float32))
        ra_decs.append(np.asarray(batch["ra_dec"], np.float32))
    if not rows:
        raise ValueError("build_bank received no batches")
    feats = np.concatenate(rows, axis=0)
    mean = feats.mean(axis=0)
    std = feats.std(axis=0) + 1e-8
    feats = (feats - mean) / std
    from jax import dtypes as _d  # bf16 numpy dtype via ml_dtypes

    np_dtype = _d.canonicalize_dtype(dtype)
    return EmbeddingBank(
        feats.astype(np_dtype), np.concatenate(ra_decs, axis=0), mean, std,
        pool=pool, n_extra=n_extra,
    )
