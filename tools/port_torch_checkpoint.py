#!/usr/bin/env python
"""Port a reference PyTorch checkpoint (.pth.tar) into this framework.

The reference saves ``{batch_iters, losses, optimizer, lr_scheduler, model}``
with timm-style module names (``utils/mim_vit.py``/``utils/vit.py``). This
tool maps the ``model`` state dict onto the SkyMIM/SkyViT parameter tree:

* ``nn.Linear`` weights transpose (out, in) -> (in, out);
* the patch-embed conv kernel (D, C, p, p) permutes to the patchify flatten
  order ((p, p, C), D);
* ``blocks.N.{norm1,attn.qkv,attn.proj}`` -> ``encoder/blockN/...``;
  ``blocks.N.{norm2,mlp.fc1,mlp.fc2}`` -> the fused ``ffn`` flat names;
* the SimMIM conv1×1 decoder maps onto ``decoder_pred`` (pixel-shuffle
  channel order matches the kernel's reshape);
* frozen sin-cos positional tables are skipped (recomputed exactly);
* optimizer/scheduler state is NOT ported (torch AdamW moments don't map
  onto the optax chain) — resume of a ported checkpoint restarts optimization.

Semantic caveats are listed in PARITY.md (predictor label normalization and
zero-pos-embed quirks).

Usage:
    python tools/port_torch_checkpoint.py <ckpt.pth.tar> <config_name> <out.ckpt.msgpack> [--predictor]
"""

from __future__ import annotations

import os
import sys
from typing import Mapping

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _linear(sd, name):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _norm(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _block(sd, prefix):
    """One transformer block -> {norm1, attn{qkv,proj}, ffn{...}}."""
    n2 = _norm(sd, f"{prefix}.norm2")
    fc1 = _linear(sd, f"{prefix}.mlp.fc1")
    fc2 = _linear(sd, f"{prefix}.mlp.fc2")
    return {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "ffn": {
            "norm_scale": n2["scale"],
            "norm_bias": n2["bias"],
            "fc1_kernel": fc1["kernel"],
            "fc1_bias": fc1["bias"],
            "fc2_kernel": fc2["kernel"],
            "fc2_bias": fc2["bias"],
        },
    }


def _patch_embed(sd, name="patch_embed.proj"):
    w = np.asarray(sd[f"{name}.weight"])  # (D, C, p, p)
    kernel = np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))
    return {"proj": {"kernel": kernel, "bias": np.asarray(sd[f"{name}.bias"])}}


def _siren(sd, prefix="ra_dec_embed.neural_network"):
    out = {}
    i = 0
    while f"{prefix}.layers.{i}.weight" in sd:
        out[f"SirenLayer_{i}"] = {
            "Dense_0": {
                "kernel": np.asarray(sd[f"{prefix}.layers.{i}.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}.layers.{i}.bias"]),
            }
        }
        i += 1
    out[f"SirenLayer_{i}"] = {
        "Dense_0": {
            "kernel": np.asarray(sd[f"{prefix}.last_layer.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.last_layer.bias"]),
        }
    }
    return {"SirenNet_0": out}


def _attn_pool(sd, prefix="attn_pool"):
    return {
        "latent": np.asarray(sd[f"{prefix}.latent"]),
        "xattn": {
            "q": _linear(sd, f"{prefix}.q"),
            "kv": _linear(sd, f"{prefix}.kv"),
            "proj": _linear(sd, f"{prefix}.proj"),
        },
        "norm": _norm(sd, f"{prefix}.norm"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def port_mim_state_dict(sd: Mapping[str, np.ndarray], simmim: bool) -> dict:
    """Reference MaskedAutoencoderViT state dict -> SkyMIM params dict."""
    params: dict = {
        "patch_embed": _patch_embed(sd),
        "cls_token": np.asarray(sd["cls_token"]),
        "patch_mask_values": np.asarray(sd["patch_mask_values"]),
        "norm": _norm(sd, "norm"),
        "encoder": {},
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        params["encoder"][f"block{i}"] = _block(sd, f"blocks.{i}")
        i += 1

    if "ra_dec_embed.neural_network.last_layer.weight" in sd:
        params["ra_dec_embed"] = _siren(sd)
    if "attn_pool.latent" in sd:
        params["pool"] = _attn_pool(sd)

    if simmim:
        w = np.asarray(sd["decoder.0.weight"])  # (S²C, D, 1, 1) conv1x1
        params["decoder_pred"] = {
            "kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
            "bias": np.asarray(sd["decoder.0.bias"]),
        }
        params["mask_token"] = np.asarray(sd["mask_token"])
    else:
        params["decoder_embed"] = _linear(sd, "decoder_embed")
        params["mask_token"] = np.asarray(sd["mask_token"])
        params["decoder"] = {}
        i = 0
        while f"decoder_blocks.{i}.norm1.weight" in sd:
            params["decoder"][f"block{i}"] = _block(sd, f"decoder_blocks.{i}")
            i += 1
        params["decoder_norm"] = _norm(sd, "decoder_norm")
        params["decoder_pred"] = _linear(sd, "decoder_pred")
    return params


def port_vit_state_dict(sd: Mapping[str, np.ndarray], global_pool: str) -> dict:
    """Reference predictor VisionTransformer state dict -> SkyViT params."""
    params: dict = {
        "patch_embed": _patch_embed(sd),
        "cls_token": np.asarray(sd["cls_token"]),
        "patch_mask_values": np.asarray(sd["patch_mask_values"]),
        "encoder": {},
        "head": _linear(sd, "head"),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        params["encoder"][f"block{i}"] = _block(sd, f"blocks.{i}")
        i += 1
    if global_pool != "avg":
        params["norm"] = _norm(sd, "norm")
    elif "fc_norm.weight" in sd:
        params["fc_norm"] = _norm(sd, "fc_norm")
    if "ra_dec_embed.neural_network.last_layer.weight" in sd:
        params["ra_dec_embed"] = _siren(sd)
    if global_pool == "map" and "attn_pool.latent" in sd:
        params["pool"] = _attn_pool(sd)
    return params


def main():  # pragma: no cover - CLI wrapper (needs torch + a real checkpoint)
    import argparse

    import torch

    from sky_embeddings_tpu.configuration import load_config
    from sky_embeddings_tpu.utils.checkpoint import save_checkpoint

    p = argparse.ArgumentParser("Port a reference .pth.tar checkpoint")
    p.add_argument("torch_ckpt")
    p.add_argument("config_name")
    p.add_argument("out_path")
    p.add_argument("--predictor", action="store_true")
    p.add_argument("--config_dir", default=os.path.join(os.path.dirname(__file__), "..", "configs"))
    args = p.parse_args()

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = {k: v.numpy() for k, v in ckpt["model"].items()}
    config = load_config(args.config_name, args.config_dir)

    if args.predictor:
        params = port_vit_state_dict(
            sd, config["ARCHITECTURE"].str("global_pool", "map")
        )
    else:
        model_type = config["ARCHITECTURE"].str("model_type")
        params = port_mim_state_dict(sd, simmim="mim" in model_type)

    losses = {
        str(k): [float(x) for x in np.atleast_1d(np.asarray(v, dtype=np.float64))]
        for k, v in dict(ckpt.get("losses", {})).items()
    }
    save_checkpoint(
        args.out_path,
        {
            "step": np.asarray(int(ckpt.get("batch_iters", 0)), np.int32),
            "params": params,
            "losses": losses,
        },
    )
    print(f"Ported {len(sd)} tensors -> {args.out_path}")
    print("NOTE: optimizer state is not ported; training resumes with a fresh optimizer.")


if __name__ == "__main__":  # pragma: no cover
    main()
