"""Torch-format weight interop: reference ``.pt`` checkpoints <-> flax params.

The reference saves/loads plain torch state dicts of the Cruller module
(``app/train.py:64-67``, ``app/eval.py:108-136`` in /root/reference) with
names like ``image_encoder.trunk.blocks.0.attn.qkv.weight`` (timm ViT) and
``text_decoder.trunk.model.decoder.layers.0.self_attn.q_proj.weight`` (HF
BartForCausalLM). This module maps those to/from our flax param tree so

- reference pretrain checkpoints finetune in this stack (import),
- checkpoints trained here can be evaluated by the reference (export),
- timm/HF-format encoder/decoder checkpoints import standalone.

Conventions handled:
- torch ``nn.Linear`` stores ``weight`` as (out, in) and computes
  ``x @ W.T + b``; flax ``Dense`` kernel is (in, out) -> transpose.
- timm patch-embed is a stride-p Conv2d with weight (D, C, p, p); our
  patchify flattens pixels as (ph, pw, C) -> kernel = W.transpose(2,3,1,0)
  .reshape(p*p*C, D). Identical math (SURVEY.md §7 "weight import fidelity").
- ``module.`` DDP prefixes stripped, ``{"model": sd}`` wrappers unwrapped
  (parity: ``app/train.py:152-155``, ``app/eval.py:135``).
- in_chans adaptation (3->1 grayscale) by channel-sum, matching timm's
  ``adapt_input_conv``.
- pos_embed grid resize by bilinear interpolation for img_size changes.
- vocab-resize replay: :func:`resize_token_embeddings` grows the tied
  embedding table like HF ``resize_token_embeddings`` (normal(0.02) init),
  so the pretrain-tokens -> resize -> load -> finetune-tokens -> resize
  ordering protocol (SURVEY.md §5.4) reproduces shapes exactly.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixparse_tpu.models.bart import BartDecoderCfg
from pixparse_tpu.models.vit import ViTCfg

_logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# state-dict plumbing
# --------------------------------------------------------------------------

def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu) — avoid importing torch unless values need it
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def normalize_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Unwrap ``{"model": sd}``, strip ``module.`` prefixes, convert to numpy
    (parity: ``app/train.py:152-155``, ``app/eval.py:133-135``)."""
    if "model" in state_dict and isinstance(state_dict["model"], Mapping):
        state_dict = state_dict["model"]
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _to_numpy(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a ``.pt`` checkpoint -> normalized numpy state dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return normalize_state_dict(sd)


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray]):
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()}
    torch.save(sd, path)


# --------------------------------------------------------------------------
# ViT (timm layout) <-> flax
# --------------------------------------------------------------------------

def _patch_kernel_from_torch(w: np.ndarray, in_chans: int) -> np.ndarray:
    """(D, C, p, p) conv weight -> (p*p*C', D) dense kernel, adapting
    channel count (3->1 by sum, timm ``adapt_input_conv``)."""
    d, c, ph, pw = w.shape
    if c != in_chans:
        if in_chans == 1:
            w = w.sum(axis=1, keepdims=True)
        elif c == 1:
            w = np.repeat(w, in_chans, axis=1) / in_chans
        else:
            raise ValueError(f"cannot adapt patch-embed from {c} to {in_chans} channels")
    return w.transpose(2, 3, 1, 0).reshape(ph * pw * w.shape[1], d)


def _patch_kernel_to_torch(k: np.ndarray, patch_size: int, in_chans: int) -> np.ndarray:
    pin, d = k.shape
    assert pin == patch_size * patch_size * in_chans
    return (
        k.reshape(patch_size, patch_size, in_chans, d).transpose(3, 2, 0, 1)
    )


def resize_pos_embed(
    pos: np.ndarray,  # (1, N_old, D), may include cls token at index 0
    new_grid: Tuple[int, int],
    old_grid: Optional[Tuple[int, int]] = None,
    has_cls: bool = True,
) -> np.ndarray:
    """Bilinear grid interpolation of ViT position embeddings (the first-party
    analog of timm ``resample_abs_pos_embed``, needed because the reference
    instantiates 224px checkpoints at 576x448 — ``image_encoder_timm.py:19``)."""
    num_prefix = 1 if has_cls else 0
    prefix, grid_pos = pos[:, :num_prefix], pos[:, num_prefix:]
    n_old = grid_pos.shape[1]
    if old_grid is None:
        side = int(round(n_old ** 0.5))
        old_grid = (side, side)
    if old_grid == tuple(new_grid):
        return pos
    d = pos.shape[-1]
    grid = grid_pos.reshape(1, *old_grid, d)
    resized = jax.image.resize(
        jnp.asarray(grid), (1, new_grid[0], new_grid[1], d), method="bilinear"
    )
    resized = np.asarray(resized).reshape(1, new_grid[0] * new_grid[1], d)
    return np.concatenate([prefix, resized], axis=1)


def vit_params_from_torch(
    sd: Dict[str, np.ndarray],
    cfg: ViTCfg,
    prefix: str = "",
) -> Dict[str, Any]:
    """timm ViT state dict (optionally under ``prefix``) -> flax ViT params."""
    g = lambda k: sd[prefix + k]
    p: Dict[str, Any] = {}
    p["patch_embed"] = {
        "kernel": _patch_kernel_from_torch(g("patch_embed.proj.weight"), cfg.in_chans),
        "bias": g("patch_embed.proj.bias"),
    }
    if cfg.use_cls_token:
        p["cls_token"] = g("cls_token")
    pos = g("pos_embed")
    expected = cfg.num_tokens
    if pos.shape[1] != expected:
        pos = resize_pos_embed(pos, cfg.grid_size, has_cls=cfg.use_cls_token)
    p["pos_embed"] = pos
    if cfg.pre_norm and prefix + "norm_pre.weight" in sd:
        p["norm_pre"] = {"scale": g("norm_pre.weight"), "bias": g("norm_pre.bias")}
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")},
            "attn": {
                "qkv": {
                    "kernel": g(b + "attn.qkv.weight").T,
                    "bias": g(b + "attn.qkv.bias"),
                },
                "proj": {
                    "kernel": g(b + "attn.proj.weight").T,
                    "bias": g(b + "attn.proj.bias"),
                },
            },
            "norm2": {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")},
            "mlp": {
                "fc1": {"kernel": g(b + "mlp.fc1.weight").T, "bias": g(b + "mlp.fc1.bias")},
                "fc2": {"kernel": g(b + "mlp.fc2.weight").T, "bias": g(b + "mlp.fc2.bias")},
            },
        }
    p["norm"] = {"scale": g("norm.weight"), "bias": g("norm.bias")}
    return p


def vit_params_to_torch(
    params: Dict[str, Any], cfg: ViTCfg, prefix: str = ""
) -> Dict[str, np.ndarray]:
    q = lambda x: np.asarray(x)
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "patch_embed.proj.weight"] = _patch_kernel_to_torch(
        q(params["patch_embed"]["kernel"]), cfg.patch_size, cfg.in_chans
    )
    sd[prefix + "patch_embed.proj.bias"] = q(params["patch_embed"]["bias"])
    if cfg.use_cls_token:
        sd[prefix + "cls_token"] = q(params["cls_token"])
    sd[prefix + "pos_embed"] = q(params["pos_embed"])
    if "norm_pre" in params:
        sd[prefix + "norm_pre.weight"] = q(params["norm_pre"]["scale"])
        sd[prefix + "norm_pre.bias"] = q(params["norm_pre"]["bias"])
    for i in range(cfg.depth):
        blk = params[f"blocks_{i}"]
        b = f"{prefix}blocks.{i}."
        sd[b + "norm1.weight"] = q(blk["norm1"]["scale"])
        sd[b + "norm1.bias"] = q(blk["norm1"]["bias"])
        sd[b + "attn.qkv.weight"] = q(blk["attn"]["qkv"]["kernel"]).T
        sd[b + "attn.qkv.bias"] = q(blk["attn"]["qkv"]["bias"])
        sd[b + "attn.proj.weight"] = q(blk["attn"]["proj"]["kernel"]).T
        sd[b + "attn.proj.bias"] = q(blk["attn"]["proj"]["bias"])
        sd[b + "norm2.weight"] = q(blk["norm2"]["scale"])
        sd[b + "norm2.bias"] = q(blk["norm2"]["bias"])
        sd[b + "mlp.fc1.weight"] = q(blk["mlp"]["fc1"]["kernel"]).T
        sd[b + "mlp.fc1.bias"] = q(blk["mlp"]["fc1"]["bias"])
        sd[b + "mlp.fc2.weight"] = q(blk["mlp"]["fc2"]["kernel"]).T
        sd[b + "mlp.fc2.bias"] = q(blk["mlp"]["fc2"]["bias"])
    sd[prefix + "norm.weight"] = q(params["norm"]["scale"])
    sd[prefix + "norm.bias"] = q(params["norm"]["bias"])
    return sd


# --------------------------------------------------------------------------
# BART decoder (HF BartForCausalLM layout) <-> flax
# --------------------------------------------------------------------------

def _attn_from_torch(sd, base: str) -> Dict[str, Any]:
    return {
        name: {
            "kernel": sd[f"{base}.{name}.weight"].T,
            "bias": sd[f"{base}.{name}.bias"],
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


def _ln_from_torch(sd, base: str) -> Dict[str, Any]:
    return {"scale": sd[base + ".weight"], "bias": sd[base + ".bias"]}


def bart_params_from_torch(
    sd: Dict[str, np.ndarray],
    cfg: BartDecoderCfg,
    prefix: str = "model.decoder.",
) -> Dict[str, Any]:
    """HF BartForCausalLM decoder state dict -> flax BartCausalDecoder params.
    The LM head is tied to ``embed_tokens`` in both (no separate import)."""
    g = lambda k: sd[prefix + k]
    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": g("embed_tokens.weight")},
        "embed_positions": {"embedding": g("embed_positions.weight")},
    }
    if cfg.layernorm_embedding:
        p["layernorm_embedding"] = _ln_from_torch(sd, prefix + "layernorm_embedding")
    if cfg.add_final_layer_norm and prefix + "layer_norm.weight" in sd:
        p["final_norm"] = _ln_from_torch(sd, prefix + "layer_norm")
    for i in range(cfg.decoder_layers):
        b = f"{prefix}layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": _attn_from_torch(sd, b + ".self_attn"),
            "self_attn_layer_norm": _ln_from_torch(sd, b + ".self_attn_layer_norm"),
            "encoder_attn": _attn_from_torch(sd, b + ".encoder_attn"),
            "encoder_attn_layer_norm": _ln_from_torch(sd, b + ".encoder_attn_layer_norm"),
            "fc1": {"kernel": sd[b + ".fc1.weight"].T, "bias": sd[b + ".fc1.bias"]},
            "fc2": {"kernel": sd[b + ".fc2.weight"].T, "bias": sd[b + ".fc2.bias"]},
            "final_layer_norm": _ln_from_torch(sd, b + ".final_layer_norm"),
        }
    return p


def _attn_to_torch(sd, base: str, attn: Dict[str, Any]):
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        sd[f"{base}.{name}.weight"] = np.asarray(attn[name]["kernel"]).T
        sd[f"{base}.{name}.bias"] = np.asarray(attn[name]["bias"])


def _ln_to_torch(sd, base: str, ln: Dict[str, Any]):
    sd[base + ".weight"] = np.asarray(ln["scale"])
    sd[base + ".bias"] = np.asarray(ln["bias"])


def bart_params_to_torch(
    params: Dict[str, Any],
    cfg: BartDecoderCfg,
    prefix: str = "model.decoder.",
    lm_head_key: Optional[str] = "lm_head.weight",
) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    emb = np.asarray(params["embed_tokens"]["embedding"])
    sd[prefix + "embed_tokens.weight"] = emb
    sd[prefix + "embed_positions.weight"] = np.asarray(
        params["embed_positions"]["embedding"]
    )
    if "layernorm_embedding" in params:
        _ln_to_torch(sd, prefix + "layernorm_embedding", params["layernorm_embedding"])
    if "final_norm" in params:
        _ln_to_torch(sd, prefix + "layer_norm", params["final_norm"])
    for i in range(cfg.decoder_layers):
        layer = params[f"layers_{i}"]
        b = f"{prefix}layers.{i}"
        _attn_to_torch(sd, b + ".self_attn", layer["self_attn"])
        _ln_to_torch(sd, b + ".self_attn_layer_norm", layer["self_attn_layer_norm"])
        _attn_to_torch(sd, b + ".encoder_attn", layer["encoder_attn"])
        _ln_to_torch(sd, b + ".encoder_attn_layer_norm", layer["encoder_attn_layer_norm"])
        sd[b + ".fc1.weight"] = np.asarray(layer["fc1"]["kernel"]).T
        sd[b + ".fc1.bias"] = np.asarray(layer["fc1"]["bias"])
        sd[b + ".fc2.weight"] = np.asarray(layer["fc2"]["kernel"]).T
        sd[b + ".fc2.bias"] = np.asarray(layer["fc2"]["bias"])
        _ln_to_torch(sd, b + ".final_layer_norm", layer["final_layer_norm"])
    if lm_head_key:
        sd[lm_head_key] = emb  # tied head, emitted for HF-shape compatibility
    return sd


# --------------------------------------------------------------------------
# Cruller (reference checkpoint layout) <-> flax
# --------------------------------------------------------------------------

_ENC_PREFIX = "image_encoder.trunk."
_DEC_PREFIX = "text_decoder.trunk.model.decoder."


def cruller_params_from_torch(
    state_dict: Mapping[str, Any],
    vit_cfg: ViTCfg,
    bart_cfg: BartDecoderCfg,
) -> Dict[str, Any]:
    """Reference Cruller ``.pt`` state dict -> flax Cruller params
    (``{"image_encoder": ..., "text_decoder": ...}``)."""
    from pixparse_tpu.models.swin import SwinCfg

    sd = normalize_state_dict(state_dict)
    if isinstance(vit_cfg, SwinCfg):
        enc = swin_params_from_torch(sd, vit_cfg, prefix=_ENC_PREFIX)
    else:
        enc = vit_params_from_torch(sd, vit_cfg, prefix=_ENC_PREFIX)
    return {
        "image_encoder": enc,
        "text_decoder": bart_params_from_torch(sd, bart_cfg, prefix=_DEC_PREFIX),
    }


def cruller_params_to_torch(
    params: Dict[str, Any],
    vit_cfg: ViTCfg,
    bart_cfg: BartDecoderCfg,
) -> Dict[str, np.ndarray]:
    from pixparse_tpu.models.swin import SwinCfg

    if isinstance(vit_cfg, SwinCfg):
        sd = swin_params_to_torch(params["image_encoder"], vit_cfg, prefix=_ENC_PREFIX)
    else:
        sd = vit_params_to_torch(params["image_encoder"], vit_cfg, prefix=_ENC_PREFIX)
    sd.update(
        bart_params_to_torch(
            params["text_decoder"],
            bart_cfg,
            prefix=_DEC_PREFIX,
            lm_head_key="text_decoder.trunk.lm_head.weight",
        )
    )
    return sd


# --------------------------------------------------------------------------
# vocab resize (HF resize_token_embeddings equivalent)
# --------------------------------------------------------------------------

def resize_token_embeddings(
    decoder_params: Dict[str, Any],
    new_vocab_size: int,
    seed: int = 0,
    init_std: float = 0.02,
) -> Dict[str, Any]:
    """Grow/shrink the tied token embedding table. New rows are
    normal(0, 0.02)-initialized, matching HF ``_init_weights`` for BART
    (``models/text_decoder_hf.py`` resize calls in every task,
    e.g. ``task_cruller_pretrain.py:115-116``)."""
    emb = np.asarray(decoder_params["embed_tokens"]["embedding"])
    old_vocab, d = emb.shape
    if new_vocab_size == old_vocab:
        return decoder_params
    if new_vocab_size < old_vocab:
        new_emb = emb[:new_vocab_size]
    else:
        rng = np.random.RandomState(seed)
        extra = rng.normal(0.0, init_std, size=(new_vocab_size - old_vocab, d)).astype(
            emb.dtype
        )
        new_emb = np.concatenate([emb, extra], axis=0)
    out = dict(decoder_params)
    out["embed_tokens"] = {"embedding": new_emb}
    return out


# --------------------------------------------------------------------------
# Swin (timm layout) <-> flax
# --------------------------------------------------------------------------

def swin_params_from_torch(
    sd: Dict[str, np.ndarray],
    cfg,  # SwinCfg
    prefix: str = "",
) -> Dict[str, Any]:
    """timm Swin state dict -> flax Swin params. ``relative_position_index``
    buffers are static in our module and skipped."""
    g = lambda k: sd[prefix + k]
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _patch_kernel_from_torch(
                g("patch_embed.proj.weight"), cfg.in_chans
            ),
            "bias": g("patch_embed.proj.bias"),
        },
        "patch_norm": {
            "scale": g("patch_embed.norm.weight"),
            "bias": g("patch_embed.norm.bias"),
        },
    }
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            base = f"layers.{s}.blocks.{b}."
            p[f"layers_{s}_blocks_{b}"] = {
                "norm1": _ln_from_torch(sd, prefix + base + "norm1"),
                "attn": {
                    "qkv": {
                        "kernel": g(base + "attn.qkv.weight").T,
                        "bias": g(base + "attn.qkv.bias"),
                    },
                    "proj": {
                        "kernel": g(base + "attn.proj.weight").T,
                        "bias": g(base + "attn.proj.bias"),
                    },
                    "relative_position_bias_table": g(
                        base + "attn.relative_position_bias_table"
                    ),
                },
                "norm2": _ln_from_torch(sd, prefix + base + "norm2"),
                "mlp_fc1": {
                    "kernel": g(base + "mlp.fc1.weight").T,
                    "bias": g(base + "mlp.fc1.bias"),
                },
                "mlp_fc2": {
                    "kernel": g(base + "mlp.fc2.weight").T,
                    "bias": g(base + "mlp.fc2.bias"),
                },
            }
        if s < cfg.num_stages - 1:
            dbase = f"layers.{s}.downsample."
            p[f"layers_{s}_downsample"] = {
                "norm": _ln_from_torch(sd, prefix + dbase + "norm"),
                "reduction": {"kernel": g(dbase + "reduction.weight").T},
            }
    if cfg.final_norm:
        p["norm"] = _ln_from_torch(sd, prefix + "norm")
    return p


def swin_params_to_torch(
    params: Dict[str, Any],
    cfg,  # SwinCfg
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    q = lambda x: np.asarray(x)
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "patch_embed.proj.weight"] = _patch_kernel_to_torch(
        q(params["patch_embed"]["kernel"]), cfg.patch_size, cfg.in_chans
    )
    sd[prefix + "patch_embed.proj.bias"] = q(params["patch_embed"]["bias"])
    _ln_to_torch(sd, prefix + "patch_embed.norm", params["patch_norm"])
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            blk = params[f"layers_{s}_blocks_{b}"]
            base = f"{prefix}layers.{s}.blocks.{b}."
            _ln_to_torch(sd, base + "norm1", blk["norm1"])
            sd[base + "attn.qkv.weight"] = q(blk["attn"]["qkv"]["kernel"]).T
            sd[base + "attn.qkv.bias"] = q(blk["attn"]["qkv"]["bias"])
            sd[base + "attn.proj.weight"] = q(blk["attn"]["proj"]["kernel"]).T
            sd[base + "attn.proj.bias"] = q(blk["attn"]["proj"]["bias"])
            sd[base + "attn.relative_position_bias_table"] = q(
                blk["attn"]["relative_position_bias_table"]
            )
            _ln_to_torch(sd, base + "norm2", blk["norm2"])
            sd[base + "mlp.fc1.weight"] = q(blk["mlp_fc1"]["kernel"]).T
            sd[base + "mlp.fc1.bias"] = q(blk["mlp_fc1"]["bias"])
            sd[base + "mlp.fc2.weight"] = q(blk["mlp_fc2"]["kernel"]).T
            sd[base + "mlp.fc2.bias"] = q(blk["mlp_fc2"]["bias"])
        if s < cfg.num_stages - 1:
            ds = params[f"layers_{s}_downsample"]
            dbase = f"{prefix}layers.{s}.downsample."
            _ln_to_torch(sd, dbase + "norm", ds["norm"])
            sd[dbase + "reduction.weight"] = q(ds["reduction"]["kernel"]).T
    if "norm" in params:
        _ln_to_torch(sd, prefix + "norm", params["norm"])
    return sd


def swin_params_from_hf_donut(
    sd: Dict[str, np.ndarray],
    cfg,  # SwinCfg
    prefix: str = "",
) -> Dict[str, Any]:
    """HF ``DonutSwinModel`` state dict -> flax Swin params (the published
    naver-clova-ix/donut-base encoder; reference wraps it in
    ``task_donut_eval_ocr.py:44-47``). HF stores separate q/k/v Linears —
    fused here into our qkv kernel in (q, k, v) column order."""
    g = lambda k: sd[prefix + k]
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _patch_kernel_from_torch(
                g("embeddings.patch_embeddings.projection.weight"), cfg.in_chans
            ),
            "bias": g("embeddings.patch_embeddings.projection.bias"),
        },
        "patch_norm": _ln_from_torch(sd, prefix + "embeddings.norm"),
    }
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            base = f"encoder.layers.{s}.blocks.{b}."
            qkv_w = np.concatenate(
                [
                    g(base + "attention.self.query.weight").T,
                    g(base + "attention.self.key.weight").T,
                    g(base + "attention.self.value.weight").T,
                ],
                axis=1,
            )
            qkv_b = np.concatenate(
                [
                    g(base + "attention.self.query.bias"),
                    g(base + "attention.self.key.bias"),
                    g(base + "attention.self.value.bias"),
                ]
            )
            p[f"layers_{s}_blocks_{b}"] = {
                "norm1": _ln_from_torch(sd, prefix + base + "layernorm_before"),
                "attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "proj": {
                        "kernel": g(base + "attention.output.dense.weight").T,
                        "bias": g(base + "attention.output.dense.bias"),
                    },
                    "relative_position_bias_table": g(
                        base + "attention.self.relative_position_bias_table"
                    ),
                },
                "norm2": _ln_from_torch(sd, prefix + base + "layernorm_after"),
                "mlp_fc1": {
                    "kernel": g(base + "intermediate.dense.weight").T,
                    "bias": g(base + "intermediate.dense.bias"),
                },
                "mlp_fc2": {
                    "kernel": g(base + "output.dense.weight").T,
                    "bias": g(base + "output.dense.bias"),
                },
            }
        if s < cfg.num_stages - 1:
            dbase = f"encoder.layers.{s}.downsample."
            p[f"layers_{s}_downsample"] = {
                "norm": _ln_from_torch(sd, prefix + dbase + "norm"),
                "reduction": {"kernel": g(dbase + "reduction.weight").T},
            }
    if cfg.final_norm and prefix + "layernorm.weight" in sd:
        p["norm"] = _ln_from_torch(sd, prefix + "layernorm")
    return p
