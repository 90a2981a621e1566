"""Pretrained-backbone initialization.

Reference parity: the reference *defaults* to pretrained init
(``models/config.py:20,26`` in /root/reference sets ``pretrained: bool =
True``) — the encoder comes from ``timm.create_model(name, pretrained=...)``
(``models/image_encoder_timm.py:13-20``) and the decoder from
``AutoModelForCausalLM.from_pretrained(name)`` with layer-count /
max-position overrides (``models/text_decoder_hf.py:10-33``). Tasks then add
special tokens and resize the embedding table.

TPU training hosts are typically offline, so weights resolve in order:

1. an explicit ``pretrained_path`` on the cfg (``.pt``/``.bin``/
   ``.safetensors``/``.npz`` state dict in timm / HF layout),
2. ``$PIXPARSE_PRETRAINED_DIR/<cleaned-name>.<ext>``,
3. a live ``timm`` / ``transformers`` load (works offline iff the hub cache
   already holds the weights).

``pretrained=True`` with no resolvable weights RAISES: silently training from
scratch when the user asked for pretrained init is a correctness bug (the
round-1 behavior this module replaces).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from pixparse_tpu.models.bart import BartDecoderCfg
from pixparse_tpu.models.config import ImageEncoderCfg, ModelCfg, TextDecoderCfg
from pixparse_tpu.models.torch_interop import (
    bart_params_from_torch,
    normalize_state_dict,
    resize_token_embeddings,
    swin_params_from_torch,
    vit_params_from_torch,
)

_logger = logging.getLogger(__name__)

_STATE_DICT_EXTS = (".pt", ".pth", ".bin", ".safetensors", ".npz")


def _clean_name(name: str) -> str:
    """'facebook/bart-base' -> 'facebook_bart-base' (filesystem-safe)."""
    return re.sub(r"[/\\:]", "_", name)


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a state dict from disk (torch .pt/.pth/.bin, safetensors, npz)."""
    p = Path(path)
    if p.suffix == ".npz":
        with np.load(p) as z:
            return {k: z[k] for k in z.files}
    if p.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(p))
    import torch

    sd = torch.load(str(p), map_location="cpu", weights_only=True)
    return normalize_state_dict(sd)


def _resolve_state_dict(
    name: str, pretrained_path: Optional[str], kind: str
) -> Dict[str, np.ndarray]:
    """Resolve a pretrained state dict for ``name`` (see module docstring).

    ``kind`` is 'timm' (image encoder) or 'hf' (text decoder) and selects the
    live-load fallback. Raises RuntimeError listing everything tried.
    """
    tried = []
    if pretrained_path:
        if Path(pretrained_path).exists():
            _logger.info("loading pretrained %s weights from %s", kind, pretrained_path)
            return normalize_state_dict(load_state_dict_file(pretrained_path))
        tried.append(f"pretrained_path={pretrained_path!r} (not found)")

    env_dir = os.environ.get("PIXPARSE_PRETRAINED_DIR")
    if env_dir:
        for ext in _STATE_DICT_EXTS:
            cand = Path(env_dir) / (_clean_name(name) + ext)
            if cand.exists():
                _logger.info("loading pretrained %s weights from %s", kind, cand)
                return normalize_state_dict(load_state_dict_file(str(cand)))
        tried.append(f"$PIXPARSE_PRETRAINED_DIR/{_clean_name(name)}.*")
    else:
        tried.append("$PIXPARSE_PRETRAINED_DIR (unset)")

    try:
        if kind == "timm":
            import timm

            model = timm.create_model(name, pretrained=True, num_classes=0)
            return normalize_state_dict(model.state_dict())
        import transformers

        model = transformers.AutoModelForCausalLM.from_pretrained(name)
        return normalize_state_dict(model.state_dict())
    except Exception as e:
        tried.append(f"live {kind} load ({type(e).__name__}: {e})")

    raise RuntimeError(
        f"pretrained=True for {name!r} but no weights could be resolved. "
        f"Tried: {'; '.join(tried)}. Provide cfg.pretrained_path or set "
        f"$PIXPARSE_PRETRAINED_DIR to a directory of local state dicts."
    )


def _fit_rows(table: np.ndarray, rows: int, init_std: float = 0.02) -> np.ndarray:
    """Truncate or normal(0.02)-extend a (rows, D) table (position tables when
    cfg.max_length differs from the checkpoint's — HF would need
    ``ignore_mismatched_sizes``; we keep the overlapping prefix)."""
    if table.shape[0] == rows:
        return table
    if table.shape[0] > rows:
        return table[:rows]
    rng = np.random.RandomState(0)
    extra = rng.normal(0.0, init_std, size=(rows - table.shape[0], table.shape[1]))
    return np.concatenate([table, extra.astype(table.dtype)], axis=0)


def load_pretrained_encoder_params(
    enc_cfg: ImageEncoderCfg, resolved_cfg: Any
) -> Dict[str, Any]:
    """timm-layout state dict -> flax encoder params for ``resolved_cfg``
    (ViTCfg or SwinCfg). in_chans adaptation (3->1 sum) and pos-embed grid
    resize happen inside the interop mappers."""
    from pixparse_tpu.models.swin import SwinCfg
    from pixparse_tpu.models.vit import ViTCfg

    sd = _resolve_state_dict(enc_cfg.name, getattr(enc_cfg, "pretrained_path", None), "timm")
    if isinstance(resolved_cfg, SwinCfg):
        return swin_params_from_torch(sd, resolved_cfg)
    if isinstance(resolved_cfg, ViTCfg):
        return vit_params_from_torch(sd, resolved_cfg)
    raise NotImplementedError(
        f"pretrained init not implemented for encoder cfg {type(resolved_cfg).__name__} "
        f"({enc_cfg.name!r}) — pass an explicit checkpoint via --train.initial-checkpoint"
    )


def _detect_decoder_prefix(sd: Dict[str, np.ndarray]) -> str:
    for prefix in ("model.decoder.", "decoder.", ""):
        if prefix + "embed_tokens.weight" in sd:
            return prefix
    raise RuntimeError(
        "state dict does not look like an HF BART decoder "
        f"(no *embed_tokens.weight among {len(sd)} keys)"
    )


def load_pretrained_decoder_params(
    dec_cfg: TextDecoderCfg, bart_cfg: BartDecoderCfg
) -> Dict[str, Any]:
    """HF BartForCausalLM-layout state dict -> flax decoder params at
    ``bart_cfg.vocab_size``.

    Reference semantics reproduced (``text_decoder_hf.py:19-33``):
    - layers beyond ``num_decoder_layers`` in the checkpoint are dropped
      (HF builds the truncated config and ignores unexpected keys),
    - the position table is fitted to ``max_position_embeddings``,
    - the vocab is resized AFTER import (tasks add special tokens then call
      ``resize_token_embeddings`` — the §5.4 replay protocol).
    """
    sd = _resolve_state_dict(dec_cfg.name, getattr(dec_cfg, "pretrained_path", None), "hf")
    prefix = _detect_decoder_prefix(sd)

    ckpt_vocab = int(sd[prefix + "embed_tokens.weight"].shape[0])
    ckpt_layers = 0
    while f"{prefix}layers.{ckpt_layers}.self_attn.q_proj.weight" in sd:
        ckpt_layers += 1
    if ckpt_layers < bart_cfg.decoder_layers:
        raise RuntimeError(
            f"pretrained decoder {dec_cfg.name!r} has {ckpt_layers} layers, "
            f"config needs {bart_cfg.decoder_layers}"
        )

    pos_rows = bart_cfg.max_position_embeddings + bart_cfg.pos_offset
    sd = dict(sd)
    sd[prefix + "embed_positions.weight"] = _fit_rows(
        sd[prefix + "embed_positions.weight"], pos_rows
    )

    load_cfg = dataclasses.replace(bart_cfg, vocab_size=ckpt_vocab)
    params = bart_params_from_torch(sd, load_cfg, prefix=prefix)
    if ckpt_vocab != bart_cfg.vocab_size:
        params = resize_token_embeddings(params, bart_cfg.vocab_size)
    return params


def maybe_load_pretrained(
    model_cfg: ModelCfg, resolved_enc_cfg: Any, bart_cfg: BartDecoderCfg
) -> Dict[str, Dict[str, Any]]:
    """Honor the ``pretrained`` flags: return the param subtrees to overwrite
    ({} when both flags are off). Raises when a flag is set but weights can't
    be resolved — never silently falls back to random init."""
    out: Dict[str, Dict[str, Any]] = {}
    if model_cfg.image_encoder.pretrained:
        out["image_encoder"] = load_pretrained_encoder_params(
            model_cfg.image_encoder, resolved_enc_cfg
        )
    if model_cfg.text_decoder.pretrained:
        out["text_decoder"] = load_pretrained_decoder_params(
            model_cfg.text_decoder, bart_cfg
        )
    return out
