"""Downstream predictor ViT (classification / regression heads).

Capability parity with the reference predictor (``utils/vit.py:258-393``, a
timm ``VisionTransformer`` subclass): the same token pipeline as the MIM
encoder (NaN fill, frozen pos embed, optional RA/Dec token), followed by a
pooling head — ``'avg'`` mean-pool over grid tokens, ``'token'`` cls token,
or ``'map'`` latent attention pooling with 2 heads — and a linear head over
(optionally normalized) labels.

Documented deviations from reference quirks (each restorable via a flag):
* The reference leaves the predictor ``pos_embed`` at zeros unless a
  checkpoint overwrites it (``vit.py:290-291``); we default to the sin-cos
  table (set ``zero_pos_embed=True`` for bit-parity with from-scratch runs).
* The reference's ``forward`` ignores the dataloader mask (``vit.py:390-393``);
  we reproduce that: ``mask`` is accepted and unused.

The norm/fc_norm placement follows timm semantics: with ``'avg'`` pooling the
pre-head LayerNorm is applied *after* pooling (fc_norm); otherwise before.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from sky_embeddings_tpu.models.layers import (
    AttentionPoolLatent,
    Encoder,
    PatchEmbed,
    token_init,
)
from sky_embeddings_tpu.models.location import LocationEncoder
from sky_embeddings_tpu.models.mim import MODEL_TYPES, _SIZES
from sky_embeddings_tpu.models.pos_embed import sincos_pos_embed_2d

Dtype = Any

head_init = nn.initializers.truncated_normal(stddev=2e-5)


class SkyViT(nn.Module):
    """ViT encoder + pooling + linear prediction head."""

    img_size: int = 64
    patch_size: int = 8
    in_chans: int = 5
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_labels: int = 1
    global_pool: str = "map"  # 'avg' | 'token' | 'map'
    label_means: Sequence[float] = (0.0,)
    label_stds: Sequence[float] = (1.0,)
    pixel_mean: float = 0.0
    pixel_std: float = 1.0
    dropout: float = 0.0
    ra_dec: bool = False
    zero_pos_embed: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False
    scan_blocks: bool = False  # see SkyMIM.scan_blocks / layers.Encoder

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_extra_tokens(self) -> int:
        return 2 if self.ra_dec else 1

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.cls_token = self.param("cls_token", token_init, (1, 1, self.embed_dim), jnp.float32)
        if self.zero_pos_embed:
            n_tok = self.grid_size ** 2 + self.num_extra_tokens
            self.pos_embed = jnp.zeros((n_tok, self.embed_dim), jnp.float32)
        else:
            self.pos_embed = jnp.asarray(
                sincos_pos_embed_2d(self.embed_dim, self.grid_size, self.num_extra_tokens)
            )
        if self.ra_dec:
            self.ra_dec_embed = LocationEncoder(out_dim=self.embed_dim)
        self.encoder = Encoder(
            self.depth, self.num_heads, self.mlp_ratio, dtype=self.dtype,
            remat=self.remat, scan=self.scan_blocks,
        )
        # timm-style norm/fc_norm split: 'avg' pooling normalizes after pooling.
        if self.global_pool != "avg":
            self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        else:
            self.fc_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.patch_mask_values = self.param(
            "patch_mask_values",
            nn.initializers.zeros,
            (self.in_chans, self.patch_size, self.patch_size),
            jnp.float32,
        )
        if self.global_pool == "map":
            # num_heads=2 matches the reference override (vit.py:303-308).
            self.pool = AttentionPoolLatent(num_heads=2, mlp_ratio=self.mlp_ratio, dtype=self.dtype)
        self.head_drop = nn.Dropout(self.dropout)
        self.head = nn.Dense(self.num_labels, kernel_init=head_init, dtype=self.dtype)

    # ------------------------------------------------------------------
    def norm_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.pixel_mean) / self.pixel_std

    def normalize_labels(self, labels: jnp.ndarray) -> jnp.ndarray:
        means = jnp.asarray(self.label_means, dtype=labels.dtype)
        stds = jnp.asarray(self.label_stds, dtype=labels.dtype)
        return (labels - means) / stds

    def denormalize_labels(self, labels: jnp.ndarray) -> jnp.ndarray:
        means = jnp.asarray(self.label_means, dtype=labels.dtype)
        stds = jnp.asarray(self.label_stds, dtype=labels.dtype)
        return labels * stds + means

    # ------------------------------------------------------------------
    def encode(self, imgs: jnp.ndarray, ra_dec: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Token pipeline; returns the full (B, extra+L, D) sequence.

        Note with ``'avg'`` pooling the sequence is *not* LayerNormed here
        (timm fc_norm semantics); use the pooled head output for features.
        """
        B = imgs.shape[0]
        x = self.norm_inputs(imgs)
        g = self.grid_size
        fill = jnp.tile(self.patch_mask_values, (1, g, g))
        fill = jnp.broadcast_to(fill, x.shape).astype(x.dtype)
        x = jnp.where(jnp.isnan(x), fill, x)

        tokens = self.patch_embed(x)
        tokens = tokens + self.pos_embed[self.num_extra_tokens:].astype(tokens.dtype)

        prefix = []
        if self.ra_dec:
            if ra_dec is None:
                raise ValueError("model was built with ra_dec=True but got ra_dec=None")
            loc = self.ra_dec_embed(ra_dec).astype(tokens.dtype)
            loc = loc + self.pos_embed[1].astype(tokens.dtype)
            prefix.append(loc[:, None, :])
        cls = (self.cls_token + self.pos_embed[:1]).astype(tokens.dtype)
        prefix.insert(0, jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(tokens.dtype))
        tokens = jnp.concatenate(prefix + [tokens], axis=1)

        tokens = self.encoder(tokens)
        if self.global_pool != "avg":
            tokens = self.norm(tokens)
        return tokens

    def forward_head(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.global_pool == "map":
            x = self.pool(tokens)
        elif self.global_pool == "avg":
            x = tokens[:, self.num_extra_tokens:].mean(axis=1)
            x = self.fc_norm(x)
        else:  # 'token'
            x = tokens[:, 0]
        x = self.head_drop(x, deterministic=deterministic)
        return self.head(x)

    def __call__(
        self,
        imgs: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,  # accepted and ignored (ref vit.py:390-393)
        ra_dec: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del mask
        tokens = self.encode(imgs, ra_dec=ra_dec)
        return self.forward_head(tokens, deterministic=deterministic)


def build_predictor_model(
    config,
    mae_config,
    dtype: Dtype = jnp.float32,
    remat: bool = False,
) -> SkyViT:
    """Construct a :class:`SkyViT` from predictor + pretraining configs
    (reference ``vit.build_model``, ``vit.py:21-124`` — architecture comes
    from the *pretraining* config, head/pooling from the predictor config)."""
    arch = mae_config["ARCHITECTURE"]
    p_arch = config["ARCHITECTURE"]
    data = config["DATA"]
    training = config["TRAINING"]

    model_type = arch.str("model_type")
    size_key, _ = MODEL_TYPES[model_type]
    size = _SIZES[size_key]

    if "num_classes" in data:
        num_labels = data.int("num_classes")
    else:
        num_labels = len(data.list("label_keys"))
        if training.bool("use_label_errs", False):
            num_labels //= 2

    return SkyViT(
        img_size=p_arch.int("img_size"),
        patch_size=arch.int("patch_size"),
        in_chans=arch.int("num_channels"),
        embed_dim=arch.int("embed_dim"),
        depth=size["depth"],
        num_heads=size["num_heads"],
        num_labels=num_labels,
        global_pool=p_arch.str("global_pool", "map"),
        label_means=tuple(float(x) for x in data.list("label_means")),
        label_stds=tuple(float(x) for x in data.list("label_stds")),
        pixel_mean=arch.float("pixel_mean", 0.0),
        pixel_std=arch.float("pixel_std", 1.0),
        dropout=float(p_arch.float("dropout", 0.0)),
        ra_dec=arch.bool("ra_dec", False),
        dtype=dtype,
        remat=remat,
        # unrolled compiles + runs faster through ViT-L; scan only where the
        # compiler needs it (see build_mim_model / layers.Encoder)
        scan_blocks=arch.bool("scan_blocks", size_key == "huge"),
    )
