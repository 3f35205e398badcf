"""CosmicEmbeds: coordinate-conditioned generative model (prototype).

Counterpart of the reference's exploratory ``CosmicEmbeds.ipynb`` ("embed the
cosmos": predict imagery *from* RA/Dec + per-band wavelength metadata, via a
``meta`` token added to the MIM pipeline — SURVEY §2.15). Re-designed here as
a standalone conditional ViT:

* conditioning tokens: one sky-location token (spherical-harmonics SIREN over
  RA/Dec) + one token per band (sin-cos encoding of log-wavelength through a
  small MLP);
* grid queries: learned mask token + frozen 2-D sin-cos positions; when a
  context image is given, visible patches are patch-embedded instead
  (conditional inpainting — a SimMIM-style pixel mask selects visibility);
* decoder: linear head to p²·C pixels per query, NaN-aware masked L1/MSE
  against the target image.

Prototype status matches the reference (no CLI; trainable via the public
``loss`` method — see ``tests/test_cosmos.py`` for an end-to-end step).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sky_embeddings_tpu.models.layers import Encoder, PatchEmbed, token_init, xavier_uniform
from sky_embeddings_tpu.models.location import LocationEncoder
from sky_embeddings_tpu.models.pos_embed import sincos_pos_embed_1d, sincos_pos_embed_2d
from sky_embeddings_tpu.models.layers import unpatchify
from sky_embeddings_tpu.ops.losses import masked_recon_loss

Dtype = Any


class CosmicEmbeds(nn.Module):
    img_size: int = 64
    patch_size: int = 8
    in_chans: int = 5
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pixel_mean: float = 0.0
    pixel_std: float = 1.0
    loss_fn: str = "l1"
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.embed_dim, self.grid_size, 0)
        )
        self.loc_encoder = LocationEncoder(out_dim=self.embed_dim)
        # wavelength -> token: sin-cos frequency features of log10(λ) + MLP
        self.wave_table = jnp.asarray(sincos_pos_embed_1d(64, 1))  # basis dims
        self.wave_mlp = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype)
        self.mask_token = self.param("mask_token", token_init, (1, 1, self.embed_dim), jnp.float32)
        self.encoder = Encoder(self.depth, self.num_heads, self.mlp_ratio, dtype=self.dtype)
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.pred = nn.Dense(
            self.patch_size ** 2 * self.in_chans, kernel_init=xavier_uniform, dtype=self.dtype
        )

    def _wave_tokens(self, wavelengths: jnp.ndarray) -> jnp.ndarray:
        """(B, C) wavelengths in nm -> (B, C, D) band tokens."""
        logw = jnp.log10(jnp.maximum(wavelengths, 1.0))[..., None]  # (B, C, 1)
        half = 32
        freqs = 1.0 / (10000.0 ** (jnp.arange(half) / half))
        ang = logw * freqs * 100.0
        feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return self.wave_mlp(feats.astype(self.dtype))

    def generate(
        self,
        ra_dec: jnp.ndarray,                 # (B, 2) degrees
        wavelengths: jnp.ndarray,            # (B, C) nm
        context: Optional[jnp.ndarray] = None,   # (B, C, H, W) partial image
        context_mask: Optional[jnp.ndarray] = None,  # (B, C, H, W) 1=hidden
    ) -> jnp.ndarray:
        """Predict a (B, C, H, W) image from coordinates (+ optional context)."""
        B = ra_dec.shape[0]
        L = self.grid_size ** 2

        if context is None and self.is_initializing():
            # make sure the context branch's parameters exist even when the
            # first trace is unconditional generation
            self.patch_embed(
                jnp.zeros((1, self.in_chans, self.img_size, self.img_size), jnp.float32)
            )

        loc = self.loc_encoder(ra_dec).astype(self.dtype)[:, None, :]
        waves = self._wave_tokens(wavelengths)
        queries = jnp.broadcast_to(
            self.mask_token.astype(self.dtype), (B, L, self.embed_dim)
        ) + self.pos_embed.astype(self.dtype)

        if context is not None:
            x = (context - self.pixel_mean) / self.pixel_std
            x = jnp.nan_to_num(x)
            if context_mask is not None:
                x = x * (1.0 - context_mask)
            ctx_tokens = self.patch_embed(x) + self.pos_embed.astype(self.dtype)
            # visible patches (any unmasked pixel) keep their embedding
            if context_mask is not None:
                patch_hidden = context_mask.reshape(
                    B, self.in_chans, self.grid_size, self.patch_size,
                    self.grid_size, self.patch_size,
                ).min(axis=(1, 3, 5)).reshape(B, L)  # 1 iff fully hidden
                queries = jnp.where(
                    patch_hidden[:, :, None] > 0.5, queries, ctx_tokens
                )
            else:
                queries = ctx_tokens

        tokens = jnp.concatenate([loc, waves, queries], axis=1)
        tokens = self.encoder(tokens)
        tokens = self.norm(tokens)
        grid = tokens[:, 1 + waves.shape[1]:]
        patches = self.pred(grid)
        img = unpatchify(patches.astype(jnp.float32), self.patch_size, self.in_chans)
        return img * self.pixel_std + self.pixel_mean

    def loss(
        self,
        target: jnp.ndarray,
        ra_dec: jnp.ndarray,
        wavelengths: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """NaN-aware reconstruction loss over the (hidden part of the) image."""
        pred = self.generate(ra_dec, wavelengths, context, context_mask)
        norm_t = (target - self.pixel_mean) / self.pixel_std
        norm_p = (pred - self.pixel_mean) / self.pixel_std
        mask = context_mask if context_mask is not None else jnp.ones_like(target)
        return masked_recon_loss(norm_t, norm_p, mask, self.loss_fn)

    def __call__(self, target, ra_dec, wavelengths, context=None, context_mask=None):
        return self.loss(target, ra_dec, wavelengths, context, context_mask)
