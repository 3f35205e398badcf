"""I-JEPA: latent-prediction pretraining (Assran et al. 2023).

The reference snapshot contains only a config for this method
(``configs/jepa_1.ini`` — EMA momentum schedule, [MASK] block with
enc/pred mask scales, predictor depth/dim; SURVEY §2.11). This module
implements the full method, TPU-first:

* a context ViT encoder runs on a fixed-budget set of context tokens
  (gathered by index, static shapes — no dynamic sequence lengths);
* an EMA *target* encoder (same architecture; parameters live in the train
  state, updated with a linear-momentum schedule) encodes the full image;
* a narrow transformer predictor, fed the encoded context plus mask queries
  carrying the target positions' sin-cos embeddings, predicts the target
  tokens' representations;
* loss: mean L2 (optionally smooth-L1) between predictions and layer-normed
  EMA targets over the valid target slots.

NaN pixels are filled with the trainable per-pixel values like the MIM
models, so the missing-band semantics carry over.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sky_embeddings_tpu.models.layers import (
    Encoder,
    PatchEmbed,
    token_init,
    xavier_uniform,
)
from sky_embeddings_tpu.models.pos_embed import sincos_pos_embed_2d
from sky_embeddings_tpu.ops.jepa_masks import BlockMasks

Dtype = Any

_SIZES = {
    "tiny": dict(embed_dim=192, depth=12, num_heads=3),
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
}


class JEPAEncoder(nn.Module):
    """ViT encoder over either the full grid or a gathered token subset."""

    img_size: int = 64
    patch_size: int = 8
    in_chans: int = 5
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pixel_mean: float = 0.0
    pixel_std: float = 1.0
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.embed_dim, self.grid_size, 0)
        )
        self.patch_mask_values = self.param(
            "patch_mask_values",
            nn.initializers.zeros,
            (self.in_chans, self.patch_size, self.patch_size),
            jnp.float32,
        )
        self.encoder = Encoder(self.depth, self.num_heads, self.mlp_ratio, dtype=self.dtype)
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def _tokens(self, imgs: jnp.ndarray) -> jnp.ndarray:
        x = (imgs - self.pixel_mean) / self.pixel_std
        g = self.grid_size
        fill = jnp.tile(self.patch_mask_values, (1, g, g))
        fill = jnp.broadcast_to(fill, x.shape).astype(x.dtype)
        x = jnp.where(jnp.isnan(x), fill, x)
        tokens = self.patch_embed(x)
        return tokens + self.pos_embed.astype(tokens.dtype)

    def __call__(self, imgs: jnp.ndarray, token_idx: Optional[jnp.ndarray] = None):
        """token_idx (B, K): encode only those grid positions (context mode);
        None: encode the full grid (target mode)."""
        tokens = self._tokens(imgs)
        if token_idx is not None:
            tokens = jnp.take_along_axis(tokens, token_idx[:, :, None], axis=1)
        tokens = self.encoder(tokens)
        return self.norm(tokens)


class JEPAPredictor(nn.Module):
    """Narrow transformer predicting target-token representations."""

    embed_dim: int          # encoder width
    pred_embed_dim: int = 192
    depth: int = 4
    num_heads: int = 6
    mlp_ratio: float = 4.0
    grid_size: int = 8
    dtype: Dtype = jnp.float32

    def setup(self):
        self.proj_in = nn.Dense(self.pred_embed_dim, kernel_init=xavier_uniform, dtype=self.dtype)
        self.mask_token = self.param(
            "mask_token", token_init, (1, 1, self.pred_embed_dim), jnp.float32
        )
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.pred_embed_dim, self.grid_size, 0)
        )
        self.blocks = Encoder(self.depth, self.num_heads, self.mlp_ratio, dtype=self.dtype)
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.proj_out = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype)

    def __call__(
        self,
        ctx_repr: jnp.ndarray,   # (B, K_ctx, D_enc)
        ctx_idx: jnp.ndarray,    # (B, K_ctx)
        tgt_idx: jnp.ndarray,    # (B, K_tgt) — one target block
    ) -> jnp.ndarray:
        B, k_ctx, _ = ctx_repr.shape
        k_tgt = tgt_idx.shape[1]
        x_ctx = self.proj_in(ctx_repr)
        pos = self.pos_embed.astype(x_ctx.dtype)
        x_ctx = x_ctx + jnp.take(pos, ctx_idx, axis=0)
        queries = jnp.broadcast_to(
            self.mask_token.astype(x_ctx.dtype), (B, k_tgt, self.pred_embed_dim)
        ) + jnp.take(pos, tgt_idx, axis=0)
        x = jnp.concatenate([x_ctx, queries], axis=1)
        x = self.blocks(x)
        x = self.norm(x[:, k_ctx:])
        return self.proj_out(x)  # (B, K_tgt, D_enc)


class SkyJEPA(nn.Module):
    """Context encoder + predictor. (The EMA target encoder shares this
    module's ``encoder`` definition; its parameters are a separate tree
    owned by the trainer.)"""

    img_size: int = 64
    patch_size: int = 8
    in_chans: int = 5
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pred_embed_dim: int = 192
    pred_depth: int = 4
    pixel_mean: float = 0.0
    pixel_std: float = 1.0
    loss_fn: str = "l2"  # 'l2' | 'smooth_l1'
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    # interface parity with SkyMIM for embedding-extraction utilities
    num_extra_tokens: int = 0
    attn_pool: bool = False
    ra_dec: bool = False
    simmim: bool = False

    def setup(self):
        self.encoder = JEPAEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            in_chans=self.in_chans, embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            pixel_mean=self.pixel_mean, pixel_std=self.pixel_std, dtype=self.dtype,
        )
        self.predictor = JEPAPredictor(
            embed_dim=self.embed_dim, pred_embed_dim=self.pred_embed_dim,
            depth=self.pred_depth,
            num_heads=max(self.pred_embed_dim // 64, 1),
            mlp_ratio=self.mlp_ratio, grid_size=self.grid_size, dtype=self.dtype,
        )

    def encode(self, imgs: jnp.ndarray, token_idx: Optional[jnp.ndarray] = None):
        return self.encoder(imgs, token_idx)

    def predict(self, ctx_repr, ctx_idx, tgt_idx):
        return self.predictor(ctx_repr, ctx_idx, tgt_idx)

    def __call__(self, imgs: jnp.ndarray, masks: BlockMasks, target_repr: jnp.ndarray):
        """Training forward given precomputed EMA target representations
        (B, L, D). Returns the masked latent-prediction loss."""
        ctx = self.encoder(imgs, masks.ctx_idx)
        # zero out invalid context slots so they act as padding
        ctx = ctx * masks.ctx_valid[:, :, None].astype(ctx.dtype)

        # layer-normalized targets (paper: per-token LN without affine)
        tgt = jax.nn.standardize(target_repr, axis=-1, epsilon=1e-6)

        total = 0.0
        count = 0.0
        num_pred = masks.tgt_idx.shape[1]
        for t in range(num_pred):
            idx = masks.tgt_idx[:, t]
            valid = masks.tgt_valid[:, t]
            pred = self.predictor(ctx, masks.ctx_idx, idx)  # (B, K, D)
            want = jnp.take_along_axis(tgt, idx[:, :, None], axis=1)
            if self.loss_fn == "smooth_l1":
                diff = pred.astype(jnp.float32) - want.astype(jnp.float32)
                ad = jnp.abs(diff)
                per = jnp.where(ad < 1.0, 0.5 * diff ** 2, ad - 0.5).mean(axis=-1)
            else:
                per = ((pred.astype(jnp.float32) - want.astype(jnp.float32)) ** 2).mean(axis=-1)
            w = valid.astype(jnp.float32)
            total = total + (per * w).sum()
            count = count + w.sum()
        return total / (count + 1e-6)


def build_jepa_model(config, dtype: Dtype = jnp.float32) -> SkyJEPA:
    """Construct from the reference-schema jepa config (``configs/jepa_1.ini``)."""
    arch = config["ARCHITECTURE"]
    size = _SIZES[arch.str("model_type", "small")]
    return SkyJEPA(
        img_size=arch.int("img_size"),
        patch_size=arch.int("patch_size"),
        in_chans=arch.int("num_channels"),
        pred_embed_dim=arch.int("pred_emb_dim", 192),
        pred_depth=arch.int("pred_depth", 4),
        pixel_mean=arch.float("pixel_mean", 0.0),
        pixel_std=arch.float("pixel_std", 1.0),
        dtype=dtype,
        **size,
    )
