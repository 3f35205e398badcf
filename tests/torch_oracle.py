"""Independent PyTorch oracle for the ViT layer math.

Implements the standard pre-norm ViT block and latent attention pooling with
the same published semantics the reference model relies on (timm Block /
AttentionPoolLatent): LN(eps=1e-6) -> MHA(qkv bias) -> residual,
LN -> MLP(exact GELU) -> residual. Used only by tests to cross-check the JAX
implementation with shared weights.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.unbind(2)  # (B, N, H, hd)
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, D)
        return self.proj(out)


class OracleMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class OracleBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class OracleAttentionPoolLatent(nn.Module):
    """Latent-query pooling: q from a learned latent, kv from the sequence,
    proj, then residual MLP over a LayerNorm; returns the pooled token."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.latent = nn.Parameter(torch.zeros(1, 1, dim))
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        B, N, D = x.shape
        q = self.q(self.latent.expand(B, -1, -1)).reshape(
            B, 1, self.num_heads, self.head_dim
        ).permute(0, 2, 1, 3)
        kv = self.kv(x).reshape(B, N, 2, self.num_heads, self.head_dim)
        k, v = kv.unbind(2)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).permute(0, 2, 1, 3).reshape(B, 1, D)
        y = self.proj(y)
        y = y + self.mlp(self.norm(y))
        return y[:, 0]


def t2n(t):
    return t.detach().numpy()


def set_linear(linear: nn.Linear, kernel, bias=None):
    """Load a flax Dense kernel (in, out) into a torch Linear."""
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(kernel.T.copy()))
        if bias is not None:
            linear.bias.copy_(torch.from_numpy(bias.copy()))


def set_layernorm(ln: nn.LayerNorm, scale, bias):
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale.copy()))
        ln.bias.copy_(torch.from_numpy(bias.copy()))


# ----------------------------------------------------------------------
# Full-model oracles (round 2): independent torch implementations of the
# reference MaskedAutoencoderViT (mim_vit.py:183-559) and predictor
# VisionTransformer (vit.py:258-393) semantics. Module names follow the
# reference state-dict layout so tools/port_torch_checkpoint.py maps these
# weights onto SkyMIM/SkyViT directly. RA/Dec token support is exercised
# separately at the LocationEncoder level (tests/test_location.py); these
# oracles cover ra_dec=False.
# ----------------------------------------------------------------------


class OraclePatchEmbed(nn.Module):
    """Stride-p conv patch projection (timm PatchEmbed semantics)."""

    def __init__(self, img_size, patch_size, in_chans, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        self.num_patches = (img_size // patch_size) ** 2

    def forward(self, x):
        x = self.proj(x)                       # (B, D, h, w)
        return x.flatten(2).transpose(1, 2)    # (B, L, D)


def oracle_patch_mean_and_var(patches):
    """NaN-aware per-patch mean/var (reference mim_vit.py:614-627)."""
    ok = ~torch.isnan(patches)
    n = ok.sum(dim=-1, keepdim=True)
    mean = torch.where(ok, patches, torch.zeros(())).sum(dim=-1, keepdim=True) / n
    var = (torch.where(ok, patches - mean, torch.zeros(())) ** 2).sum(
        dim=-1, keepdim=True
    ) / n
    return mean, var


class OracleMaskedAutoencoderViT(nn.Module):
    """MAE/SimMIM hybrid with the reference's exact forward semantics."""

    def __init__(self, img_size=16, patch_size=4, in_chans=3, embed_dim=48,
                 depth=2, num_heads=4, decoder_embed_dim=32, decoder_depth=1,
                 decoder_num_heads=4, mlp_ratio=4.0, norm_pix_loss=False,
                 simmim=True, loss_fn="l1", pixel_mean=0.0, pixel_std=1.0,
                 attn_pool=False):
        super().__init__()
        self.simmim = simmim
        self.loss_fn = loss_fn
        self.pixel_mean = pixel_mean
        self.pixel_std = pixel_std
        self.norm_pix_loss = norm_pix_loss
        self.in_chans = in_chans
        self.patch_size = patch_size
        self.tile_size = img_size // patch_size
        self.num_extra_tokens = 1

        self.patch_embed = OraclePatchEmbed(img_size, patch_size, in_chans, embed_dim)
        L = self.patch_embed.num_patches
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.register_buffer("pos_embed", torch.zeros(1, L + 1, embed_dim))
        self.blocks = nn.ModuleList(
            [OracleBlock(embed_dim, num_heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
        self.patch_mask_values = nn.Parameter(
            torch.zeros(in_chans, patch_size, patch_size)
        )
        if simmim:
            if attn_pool:
                self.attn_pool = OracleAttentionPoolLatent(embed_dim, num_heads, mlp_ratio)
                up = img_size
            else:
                self.attn_pool = None
                up = self.tile_size
            self.decoder = nn.Sequential(
                nn.Conv2d(embed_dim, up ** 2 * in_chans, kernel_size=1),
                nn.PixelShuffle(up),
            )
            self.mask_token = nn.Parameter(torch.zeros(1, 1, 1))
        else:
            self.attn_pool = None
            self.decoder_embed = nn.Linear(embed_dim, decoder_embed_dim)
            self.mask_token = nn.Parameter(torch.zeros(1, 1, decoder_embed_dim))
            self.register_buffer(
                "decoder_pos_embed", torch.zeros(1, L + 1, decoder_embed_dim)
            )
            self.decoder_blocks = nn.ModuleList(
                [OracleBlock(decoder_embed_dim, decoder_num_heads, mlp_ratio)
                 for _ in range(decoder_depth)]
            )
            self.decoder_norm = nn.LayerNorm(decoder_embed_dim, eps=1e-6)
            self.decoder_pred = nn.Linear(decoder_embed_dim, patch_size ** 2 * in_chans)

    # -- helpers ---------------------------------------------------------
    def norm_inputs(self, x):
        return (x - self.pixel_mean) / self.pixel_std

    def patchify(self, imgs):
        B, C, H, W = imgs.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = imgs.reshape(B, C, h, p, w, p)
        x = torch.einsum("nchpwq->nhwpqc", x)
        return x.reshape(B, h * w, p * p * C)

    def unpatchify(self, x):
        B, L, _ = x.shape
        p = self.patch_size
        h = w = int(L ** 0.5)
        x = x.reshape(B, h, w, p, p, self.in_chans)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(B, self.in_chans, h * p, w * p)

    # -- forward ---------------------------------------------------------
    def forward_features(self, x, mask=None, noise=None, mask_ratio=0.75):
        B = x.shape[0]
        x = self.norm_inputs(x)
        fill = self.patch_mask_values.repeat(1, self.tile_size, self.tile_size)
        fill = fill.expand(B, -1, -1, -1)
        x = torch.where(torch.isnan(x), fill, x)

        ids_restore = None
        if self.simmim and mask is not None:
            x = x * (1 - mask) + fill * mask

        x = self.patch_embed(x)
        x = x + self.pos_embed[:, 1:, :]

        if not self.simmim:
            # per-sample shuffle-and-keep driven by injected noise
            N, L, D = x.shape
            len_keep = int(L * (1 - mask_ratio))
            ids_shuffle = torch.argsort(noise, dim=1)
            ids_restore = torch.argsort(ids_shuffle, dim=1)
            ids_keep = ids_shuffle[:, :len_keep]
            x = torch.gather(x, 1, ids_keep.unsqueeze(-1).expand(-1, -1, D))
            mask = torch.ones(N, L)
            mask[:, :len_keep] = 0
            mask = torch.gather(mask, 1, ids_restore)

        cls = (self.cls_token + self.pos_embed[:, :1, :]).expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        if self.attn_pool is not None:
            x = self.attn_pool(x).unsqueeze(1)
        x = self.norm(x)

        if self.simmim:
            if self.attn_pool is None:
                x = x[:, self.num_extra_tokens:]
            B, L, D = x.shape
            side = int(L ** 0.5)
            grid = x.permute(0, 2, 1).reshape(B, D, side, side)
            return grid, mask, ids_restore
        return x, mask, ids_restore

    def forward_decoder(self, x, ids_restore):
        if self.simmim:
            return self.decoder(x)
        x = self.decoder_embed(x)
        n_miss = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = self.mask_token.repeat(x.shape[0], n_miss, 1)
        grid = torch.cat([x[:, 1:, :], mask_tokens], dim=1)
        grid = torch.gather(
            grid, 1, ids_restore.unsqueeze(-1).expand(-1, -1, x.shape[2])
        )
        x = torch.cat([x[:, :1, :], grid], dim=1)
        x = x + self.decoder_pos_embed
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, 1:, :]

    def forward_loss(self, imgs, pred, mask):
        """Reference loss semantics incl. the avg_scale_factor form
        (mim_vit.py:473-521)."""
        if self.simmim:
            valid = (~torch.isnan(imgs)).to(imgs.dtype)
            mask = valid * mask
            if self.norm_pix_loss:
                p = self.patchify(imgs)
                mean, var = oracle_patch_mean_and_var(p)
                imgs = self.unpatchify((p - mean) / (var + 1e-6) ** 0.5)
        else:
            imgs = self.patchify(imgs)
            if self.norm_pix_loss:
                mean, var = oracle_patch_mean_and_var(imgs)
                imgs = (imgs - mean) / (var + 1e-6) ** 0.5
        if self.loss_fn == "mse":
            loss = F.mse_loss(imgs, pred, reduction="none")
        else:
            loss = F.l1_loss(imgs, pred, reduction="none")
        nan_mask = torch.where(torch.isnan(loss), 0.0, 1.0)
        if nan_mask.shape != mask.shape:
            mask = mask.unsqueeze(2)
        mask = nan_mask * mask
        loss = torch.nan_to_num(loss, nan=0.0)
        scale = mask.sum() / mask.numel() * loss.numel()
        return (loss * mask).sum() / (scale + 1e-5)

    def forward(self, imgs, mask=None, noise=None, mask_ratio=0.75):
        latent, mask, ids_restore = self.forward_features(
            imgs, mask=mask, noise=noise, mask_ratio=mask_ratio
        )
        pred = self.forward_decoder(latent, ids_restore)
        imgs = self.norm_inputs(imgs)
        return self.forward_loss(imgs.detach(), pred, mask), pred, mask


class OracleVisionTransformer(nn.Module):
    """Predictor ViT with the reference's quirks: pos_embed stays zeros,
    'avg' pooling normalizes after pooling (fc_norm), 'map' pools with a
    2-head latent attention pool (vit.py:258-393 + timm forward_head)."""

    def __init__(self, img_size=16, patch_size=4, in_chans=3, embed_dim=48,
                 depth=2, num_heads=4, mlp_ratio=4.0, num_classes=1,
                 global_pool="map", label_means=(0.0,), label_stds=(1.0,),
                 pixel_mean=0.0, pixel_std=1.0):
        super().__init__()
        self.global_pool = global_pool
        self.pixel_mean = pixel_mean
        self.pixel_std = pixel_std
        self.label_means = torch.tensor(label_means)
        self.label_stds = torch.tensor(label_stds)
        self.patch_size = patch_size

        self.patch_embed = OraclePatchEmbed(img_size, patch_size, in_chans, embed_dim)
        L = self.patch_embed.num_patches
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.register_buffer("pos_embed", torch.zeros(1, L + 1, embed_dim))
        self.patch_mask_values = nn.Parameter(
            torch.zeros(in_chans, patch_size, patch_size)
        )
        self.blocks = nn.ModuleList(
            [OracleBlock(embed_dim, num_heads, mlp_ratio) for _ in range(depth)]
        )
        # timm split: 'avg' -> norm=Identity, fc_norm=LN; else norm=LN
        if global_pool == "avg":
            self.norm = nn.Identity()
            self.fc_norm = nn.LayerNorm(embed_dim, eps=1e-6)
        else:
            self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
            self.fc_norm = nn.Identity()
        self.attn_pool = (
            OracleAttentionPoolLatent(embed_dim, num_heads=2, mlp_ratio=mlp_ratio)
            if global_pool == "map" else None
        )
        self.head = nn.Linear(embed_dim, num_classes)

    def forward(self, x, mask=None, ra_dec=None):
        del mask, ra_dec  # reference forward ignores both (vit.py:390-393)
        B, C, H, W = x.shape
        x = (x - self.pixel_mean) / self.pixel_std
        fill = self.patch_mask_values.repeat(
            1, H // self.patch_size, W // self.patch_size
        ).expand(B, -1, -1, -1)
        x = torch.where(torch.isnan(x), fill, x)
        x = self.patch_embed(x)
        x = x + self.pos_embed[:, 1:, :]
        cls = (self.cls_token + self.pos_embed[:, :1, :]).expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        if self.attn_pool is not None:
            x = self.attn_pool(x)
        elif self.global_pool == "avg":
            x = x[:, 1:].mean(dim=1)
        else:
            x = x[:, 0]
        x = self.fc_norm(x)
        return self.head(x)
