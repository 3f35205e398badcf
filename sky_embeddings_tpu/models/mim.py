"""Masked-image-modelling ViT (MAE and SimMIM hybrids), TPU-native.

Capability parity with the reference ``MaskedAutoencoderViT``
(``utils/mim_vit.py:183-559``): one model family covers

* **SimMIM mode** (``simmim=True``): dense channel-wise pixel masks supplied
  by the caller (drawn on device, see ``ops/masking.simmim_batch_mask``);
  masked pixels are replaced by the trainable ``patch_mask_values``; a light
  linear decoder (1×1-conv + pixel-shuffle ≡ one Dense + reshape here)
  reconstructs the full image; optional latent attention pooling before
  decoding.
* **MAE mode** (``simmim=False``): per-sample random token dropping with a
  static keep count, a small transformer decoder over the restored sequence
  with a learned mask token.

Both share: NaN pixels -> trainable fill values, frozen 2-D sin-cos pos
embed, optional RA/Dec token from a spherical-harmonics SIREN encoder, and a
NaN-guarded masked L1/MSE loss (optionally per-patch normalized).

Functional API: ``model.apply(vars, imgs, ..., rngs={'mask': k})`` returns
``(loss, pred, mask)`` like the reference forward. Encoder-only embedding
extraction goes through ``method=SkyMIM.encode``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sky_embeddings_tpu.models.layers import (
    AttentionPoolLatent,
    Encoder,
    PatchEmbed,
    patchify,
    token_init,
    unpatchify,
    xavier_uniform,
)
from sky_embeddings_tpu.models.location import LocationEncoder
from sky_embeddings_tpu.models.pos_embed import sincos_pos_embed_2d
from sky_embeddings_tpu.ops.losses import masked_recon_loss, normalize_patches
from sky_embeddings_tpu.ops.masking import mae_random_masking, mae_unshuffle

Dtype = Any


class SkyMIM(nn.Module):
    """Masked autoencoder / SimMIM ViT over multi-band sky cutouts."""

    img_size: int = 64
    patch_size: int = 8
    in_chans: int = 5
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    simmim: bool = True
    loss_fn: str = "l1"
    pixel_mean: float = 0.0
    pixel_std: float = 1.0
    attn_pool: bool = False
    ra_dec: bool = False
    mask_ratio: float = 0.75  # MAE mode only; static per run (ref pretrain_mim.py:69)
    dtype: Dtype = jnp.float32
    remat: bool = False
    # Compile the encoder as a lax.scan over depth-stacked block params
    # (required for large/huge on compile-memory-limited hosts; see
    # layers.Encoder). Checkpoint layouts convert via
    # layers.stack_block_params / unstack_block_params.
    scan_blocks: bool = False
    # lax.scan unroll factor for the scan encoder (see layers.Encoder)
    scan_unroll: int = 1
    # Stashed-residual attention backward (bf16 qkv+probs saved in the fwd;
    # see ops/kernels/attn_block.py). A/B-validated for convergence by
    # tools/ab_stash_convergence.py (PARITY #17).
    stash: bool = True
    # MLP stash: loses at ViT-B (B=1024: the fc1-activation stash traffic
    # exceeds the recompute it saves) but wins at ViT-L (B=256: 6.34 vs
    # 6.74 ms/layer fwd+bwd, measured r3) — build_mim_model enables it for
    # 'large'-size models.
    stash_mlp: bool = False
    # Attn stash for the MAE decoder separately: its full-sequence probs+qkv
    # stash is ~1 GB/layer at B=2048 (the allocation that OOM'd the MAE
    # B=2048 attempt, BASELINE.md r4) while the token-dropped encoder's is
    # ~4x smaller — dropping only the decoder stash trades its recompute
    # for the batch-doubling headroom.
    stash_decoder: bool = True
    # MAE short-sequence packing: run the token-dropped encoder with
    # `pack_tokens` samples packed along the sequence axis (17+17=34 tokens
    # in one pad8→40-row tile instead of two 24-row ones; −17% sublane
    # padding) under a static block-diagonal attention mask
    # (ops/kernels/attn_block._seg_bias). Numerics are identical to the
    # unpacked encoder; applies only to the masked MAE training path.
    pack_tokens: int = 1

    # ------------------------------------------------------------------
    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def num_extra_tokens(self) -> int:
        return 2 if self.ra_dec else 1

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.cls_token = self.param("cls_token", token_init, (1, 1, self.embed_dim), jnp.float32)
        # Frozen sin-cos positional table — a deterministic constant, not a
        # parameter (the reference stores it as requires_grad=False data,
        # mim_vit.py:228).
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.embed_dim, self.grid_size, self.num_extra_tokens)
        )
        if self.ra_dec:
            self.ra_dec_embed = LocationEncoder(out_dim=self.embed_dim)
        self.encoder = Encoder(
            self.depth, self.num_heads, self.mlp_ratio, dtype=self.dtype,
            remat=self.remat, scan=self.scan_blocks, stash=self.stash,
            stash_mlp=self.stash_mlp, scan_unroll=self.scan_unroll,
        )
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        # Trainable per-pixel fill for NaN / masked pixels (ref mim_vit.py:239).
        self.patch_mask_values = self.param(
            "patch_mask_values",
            nn.initializers.zeros,
            (self.in_chans, self.patch_size, self.patch_size),
            jnp.float32,
        )
        if self.simmim:
            if self.attn_pool:
                self.pool = AttentionPoolLatent(self.num_heads, self.mlp_ratio, dtype=self.dtype)
                self.dec_upsample = self.img_size
            else:
                # PixelShuffle upsample = the encoder stride (each token
                # predicts its own patch_size² tile — ref mim_vit.py:244-264).
                # NOT grid_size: equal only at the shipped 64px/p8 geometry
                # (8×8 grid of 8px patches), which masked this for two rounds.
                self.dec_upsample = self.patch_size
            # 1×1 conv + PixelShuffle ≡ one Dense per token + block reshape.
            self.decoder_pred = nn.Dense(
                self.dec_upsample ** 2 * self.in_chans,
                kernel_init=xavier_uniform,
                dtype=self.dtype,
            )
            self.mask_token = self.param("mask_token", token_init, (1, 1, 1), jnp.float32)
        else:
            self.decoder_embed = nn.Dense(
                self.decoder_embed_dim, kernel_init=xavier_uniform, dtype=self.dtype
            )
            self.mask_token = self.param(
                "mask_token", token_init, (1, 1, self.decoder_embed_dim), jnp.float32
            )
            self.decoder_pos_embed = jnp.asarray(
                sincos_pos_embed_2d(self.decoder_embed_dim, self.grid_size, self.num_extra_tokens)
            )
            self.decoder = Encoder(
                self.decoder_depth, self.decoder_num_heads, self.mlp_ratio,
                dtype=self.dtype, scan=self.scan_blocks,
                stash=self.stash_decoder,
            )
            self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
            self.decoder_pred = nn.Dense(
                self.patch_size ** 2 * self.in_chans, kernel_init=xavier_uniform, dtype=self.dtype
            )

    # ------------------------------------------------------------------
    def norm_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.pixel_mean) / self.pixel_std

    def denorm_outputs(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.pixel_std + self.pixel_mean

    def _fill_values(self, batch: int) -> jnp.ndarray:
        """Tile (C, p, p) trainable fill values over the full image."""
        g = self.grid_size
        tiled = jnp.tile(self.patch_mask_values, (1, g, g))
        return jnp.broadcast_to(tiled, (batch, self.in_chans, self.img_size, self.img_size))

    # ------------------------------------------------------------------
    def encode(
        self,
        imgs: jnp.ndarray,
        ra_dec: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        apply_mae_masking: bool = False,
        mae_noise: Optional[jnp.ndarray] = None,
    ):
        """Tokenize + run the encoder stack.

        Returns ``(tokens, mae_mask, ids_restore)``; the last two are None
        unless ``apply_mae_masking``. ``tokens`` includes prefix tokens (cls
        [+ ra_dec]) unless attention pooling collapsed the sequence.
        Mirrors reference ``forward_features`` (``mim_vit.py:381-438``).
        """
        B = imgs.shape[0]
        x = self.norm_inputs(imgs)
        fill = self._fill_values(B).astype(x.dtype)
        x = jnp.where(jnp.isnan(x), fill, x)
        if self.simmim and mask is not None:
            x = x * (1.0 - mask) + fill * mask

        tokens = self.patch_embed(x)  # (B, L, D)
        tokens = tokens + self.pos_embed[self.num_extra_tokens:].astype(tokens.dtype)

        mae_mask = ids_restore = None
        if not self.simmim and apply_mae_masking:
            key = None if mae_noise is not None else self.make_rng("mask")
            masked = mae_random_masking(key, tokens, self.mask_ratio, noise=mae_noise)
            tokens, mae_mask, ids_restore = masked

        prefix = []
        if self.ra_dec:
            if ra_dec is None:
                raise ValueError("model was built with ra_dec=True but got ra_dec=None")
            loc = self.ra_dec_embed(ra_dec).astype(tokens.dtype)
            loc = loc + self.pos_embed[1].astype(tokens.dtype)
            prefix.append(loc[:, None, :])
        cls = (self.cls_token + self.pos_embed[:1]).astype(tokens.dtype)
        prefix.insert(0, jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(tokens.dtype))
        # Order matches the reference: [cls, ra_dec, patches...]
        tokens = jnp.concatenate(prefix + [tokens], axis=1)

        pack = self.pack_tokens
        packed = (
            pack > 1 and not self.simmim and apply_mae_masking
            and B % pack == 0
            # keep the packed sequence inside the fused kernels' tuned range
            # (the flagship's 65..72-token tiles; N<=256 dispatch bound)
            and pack * tokens.shape[1] <= 128
        )
        if packed:
            # (B, n, D) -> (B/pack, pack·n, D) is a free row-major reshape;
            # the encoder masks attention to the per-sample block diagonal,
            # so the packed output equals the unpacked one exactly.
            seg = tokens.shape[1]
            tokens = tokens.reshape(B // pack, pack * seg, self.embed_dim)
            tokens = self.encoder(tokens, seg_len=seg)
            tokens = tokens.reshape(B, seg, self.embed_dim)
        else:
            tokens = self.encoder(tokens)
        if self.simmim and self.attn_pool:
            tokens = self.pool(tokens)[:, None, :]
        tokens = self.norm(tokens)
        return tokens, mae_mask, ids_restore

    # ------------------------------------------------------------------
    def decode(self, tokens: jnp.ndarray, ids_restore: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Reconstruct pixels/patches from encoder tokens.

        SimMIM: (B, C, H, W) image. MAE: (B, L, p²·C) patch predictions.
        Mirrors reference ``forward_decoder`` (``mim_vit.py:440-471``).
        """
        if self.simmim:
            grid = tokens if self.attn_pool else tokens[:, self.num_extra_tokens:]
            B, L, _ = grid.shape
            h = w = int(round(L ** 0.5))
            pred = self.decoder_pred(grid)  # (B, L, S²·C)
            S = self.dec_upsample
            pred = pred.reshape(B, h, w, self.in_chans, S, S)
            pred = pred.transpose(0, 3, 1, 4, 2, 5)  # B, C, h, S, w, S
            return pred.reshape(B, self.in_chans, h * S, w * S)

        x = self.decoder_embed(tokens)
        n_extra = self.num_extra_tokens
        grid = mae_unshuffle(x[:, n_extra:], self.mask_token, ids_restore)
        x = jnp.concatenate([x[:, :n_extra], grid], axis=1)
        x = x + self.decoder_pos_embed.astype(x.dtype)
        x = self.decoder(x)
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, n_extra:]  # drop cls (and ra_dec) predictions

    # ------------------------------------------------------------------
    def loss(self, imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Masked NaN-guarded reconstruction loss on *normalized* targets
        (reference ``forward_loss``, ``mim_vit.py:473-521``)."""
        target = self.norm_inputs(imgs)
        if self.simmim:
            valid = (~jnp.isnan(target)).astype(target.dtype)
            eff_mask = valid * mask
            if self.norm_pix_loss:
                patches = patchify(target, self.patch_size)
                target = unpatchify(
                    normalize_patches(patches), self.patch_size, self.in_chans
                )
            return masked_recon_loss(target, pred.astype(jnp.float32), eff_mask, self.loss_fn)
        target = patchify(target, self.patch_size)
        if self.norm_pix_loss:
            target = normalize_patches(target)
        return masked_recon_loss(target, pred.astype(jnp.float32), mask, self.loss_fn)

    # ------------------------------------------------------------------
    def __call__(
        self,
        imgs: jnp.ndarray,
        ra_dec: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        mae_noise: Optional[jnp.ndarray] = None,
    ):
        """Full forward: returns ``(loss, pred, mask)``.

        SimMIM: ``mask`` is the (B, C, H, W) pixel mask. MAE: ``mask`` is
        ignored; token masking is drawn from the ``'mask'`` rng stream (or
        the injected ``mae_noise``) and the returned mask is the (B, L)
        token mask.
        """
        tokens, mae_mask, ids_restore = self.encode(
            imgs, ra_dec=ra_dec, mask=mask,
            apply_mae_masking=not self.simmim, mae_noise=mae_noise,
        )
        pred = self.decode(tokens, ids_restore)
        out_mask = mask if self.simmim else mae_mask
        if out_mask is None:
            out_mask = jnp.zeros_like(imgs)
        loss = self.loss(imgs, pred, out_mask)
        return loss, pred, out_mask


# ----------------------------------------------------------------------
# Model zoo (reference mim_vit.py:561-612)
# ----------------------------------------------------------------------

_SIZES = {
    "base": dict(depth=12, num_heads=12),
    "large": dict(depth=24, num_heads=16),
    "huge": dict(depth=32, num_heads=16),
}

# model_type -> (size key, simmim flag)
MODEL_TYPES = {
    "base": ("base", False),
    "large": ("large", False),
    "huge": ("huge", False),
    "simmim": ("base", True),
    "mimlarge": ("large", True),
    "mimhuge": ("huge", True),
    "maesimple": ("base", False),
}


def build_mim_model(config, dtype: Dtype = jnp.float32, remat: bool = False) -> SkyMIM:
    """Construct a :class:`SkyMIM` from an INI config
    (reference ``mim_vit.build_model``, ``mim_vit.py:19-112``)."""
    arch = config["ARCHITECTURE"]
    training = config["TRAINING"]
    model_type = arch.str("model_type")
    if model_type not in MODEL_TYPES:
        raise ValueError(f"unknown model_type {model_type!r}; options: {sorted(MODEL_TYPES)}")
    size_key, simmim = MODEL_TYPES[model_type]
    extra: dict = dict(_SIZES[size_key])
    if model_type == "maesimple":
        extra.update(decoder_depth=1, decoder_num_heads=1)

    mask_ratio = 0.75
    if not simmim and "mask_ratio" in training:
        mask_ratio = training.float("mask_ratio")

    embed_dim = arch.int("embed_dim")
    if embed_dim % extra["num_heads"]:
        raise ValueError(
            f"embed_dim={embed_dim} must be divisible by num_heads="
            f"{extra['num_heads']} for model_type={model_type!r}"
        )
    if arch.int("img_size") % arch.int("patch_size"):
        raise ValueError(
            f"img_size={arch.int('img_size')} must be divisible by "
            f"patch_size={arch.int('patch_size')}"
        )

    return SkyMIM(
        img_size=arch.int("img_size"),
        patch_size=arch.int("patch_size"),
        in_chans=arch.int("num_channels"),
        embed_dim=embed_dim,
        norm_pix_loss=training.bool("norm_pix_loss", False),
        simmim=simmim,
        loss_fn=training.str("loss_fn", "L1").lower(),
        pixel_mean=arch.float("pixel_mean", 0.0),
        pixel_std=arch.float("pixel_std", 1.0),
        attn_pool=arch.bool("attn_pool", False),
        ra_dec=arch.bool("ra_dec", False),
        mask_ratio=mask_ratio,
        dtype=dtype,
        remat=remat,
        # scan is a compile-memory fallback, not a perf feature: measured on
        # v5e (r3), unrolling ViT-L's 24 loop-heads layers compiles fine and
        # the scan backward costs ~47 ms/step of stacked-residual traffic
        # (745.6 -> 889 img/s at B=256). ViT-H unrolls too once its MLP
        # dispatches to XLA (the fused-mlp kernel's VMEM weight+grad term
        # was what exhausted the compiler at D=1280): loop + XLA-mlp
        # measures 409 img/s vs 371 scan/346.7 scan+remat at B=256, so all
        # sizes now default to the loop layout.
        # ([ARCHITECTURE] scan_blocks overrides either way.)
        scan_blocks=arch.bool("scan_blocks", False),
        stash_mlp=arch.bool("stash_mlp", size_key == "large"),
        # attn qkv+probs stash: wins at ViT-B/L; at ViT-H it costs
        # ~300 MB/layer x 32 layers (~9.6 GB HBM at B=256 -> OOM) and
        # measured slower even where it fits (309.6 vs 337.5 img/s at
        # B=128) — the write traffic no longer hides under the fwd.
        stash=arch.bool("stash", size_key != "huge"),
        # MAE decoder stash separately: dropping it (recompute backward)
        # frees the full-sequence probs+qkv stash that dominates MAE HBM at
        # large batches (~8 GB at B=2048, BASELINE.md r4) at ~zero cost.
        stash_decoder=arch.bool("stash_decoder", True),
        # MAE sequence packing (SkyMIM.pack_tokens). Measured r5 on v5e at
        # B=1024: pack=4 packs four 17-token samples into one 68-token
        # sequence — the same pad8->72-row tile geometry the kernels are
        # tuned for — and wins (5 030.8 img/s / 48.4% MFU vs 4 931.5 /
        # 47.5% unpacked); pack=2's 40-row tiles measured far slower
        # (2 953.7). Default 4 for MAE model types; exact-parity tested.
        pack_tokens=arch.int("pack_tokens", 1 if simmim else 4),
        **extra,
    )
