"""Cruller: ViT image encoder + BART-style causal text decoder.

Parity: reference ``models/cruller.py:8-21`` (timm encoder + HF decoder with
cross-attention). Here both halves are first-party flax modules; the
composition is one jittable module whose forward is
``encode image -> decoder cross-attends -> logits``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixparse_tpu.models.bart import BartCausalDecoder, BartDecoderCfg, resolve_bart_cfg
from pixparse_tpu.models.config import ModelCfg
from pixparse_tpu.models.swin import Swin, SwinCfg, resolve_swin_cfg
from pixparse_tpu.models.vit import ViT, resolve_vit_cfg


def resolve_image_encoder_cfg(name: str, image_size, in_chans: int):
    """Dispatch an encoder name to its family (ViT | Swin | Pix2Struct)."""
    base = name.split(".")[0]
    if base.startswith("swin") or base.startswith("donut_swin"):
        return resolve_swin_cfg(name, tuple(image_size), in_chans)
    if base.startswith("pix2struct"):
        from pixparse_tpu.models.pix2struct import resolve_pix2struct_cfg

        return resolve_pix2struct_cfg(name, image_size, in_chans)
    return resolve_vit_cfg(name, tuple(image_size), in_chans)


def resolve_cruller_cfgs(cfg: ModelCfg, vocab_size: Optional[int] = None):
    """ModelCfg (registry JSON) -> concrete (encoder cfg, BartDecoderCfg,
    img stats). Encoder cfg is a ViTCfg or SwinCfg by encoder name."""
    in_chans = 1 if cfg.image_encoder.image_fmt == "L" else 3
    vit_cfg, stats = resolve_image_encoder_cfg(
        cfg.image_encoder.name, tuple(cfg.image_encoder.image_size), in_chans
    )
    bart_cfg = resolve_bart_cfg(
        cfg.text_decoder.name,
        num_decoder_layers=cfg.text_decoder.num_decoder_layers,
        max_length=cfg.text_decoder.max_length,
        vocab_size=vocab_size,
    )
    return vit_cfg, bart_cfg, stats


class Cruller(nn.Module):
    vit_cfg: Any  # ViTCfg | SwinCfg (field name kept for checkpoint/test compat)
    bart_cfg: BartDecoderCfg
    dtype: jnp.dtype = jnp.float32
    max_cache_len: int = 0
    attn_impl: str = "xla"
    remat: Any = False  # False | True/"full" | "dots" (see vit._remat_policy)
    kv_cache_dtype: str = "bf16"  # 'int8': quantized cross-KV decode cache
    lm_head_dtype: str = "bf16"  # 'int8': generate() pre-quantizes the tied head

    def setup(self):
        if isinstance(self.vit_cfg, SwinCfg):
            self.image_encoder = Swin(
                self.vit_cfg, dtype=self.dtype, remat=self.remat,
                attn_impl=self.attn_impl,
            )
        else:
            self.image_encoder = ViT(
                self.vit_cfg, dtype=self.dtype, attn_impl=self.attn_impl,
                remat=self.remat,
            )
        self.text_decoder = BartCausalDecoder(
            self.bart_cfg, max_cache_len=self.max_cache_len, dtype=self.dtype,
            remat=self.remat, attn_impl=self.attn_impl,
            kv_cache_dtype=self.kv_cache_dtype,
        )

    def __call__(
        self,
        image_input: jax.Array,  # (B, H, W, C) normalized
        text_input: jax.Array,  # (B, L) token ids
        attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        encoder_output = self.image_encoder(image_input, deterministic=deterministic)
        return self.text_decoder(
            text_input,
            encoder_output,
            attention_mask=attention_mask,
            deterministic=deterministic,
        )

    def encode(self, image_input: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.image_encoder(image_input, deterministic=deterministic)

    def forward_hidden(
        self,
        image_input: jax.Array,
        text_input: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Training fast path: full forward returning pre-head decoder hidden
        states (B, L, D) for the chunked tied-head CE (ops/loss.py)."""
        encoder_output = self.image_encoder(image_input, deterministic=deterministic)
        return self.text_decoder(
            text_input,
            encoder_output,
            attention_mask=attention_mask,
            deterministic=deterministic,
            return_hidden=True,
        )

    def decode(
        self,
        input_ids: jax.Array,
        encoder_output: jax.Array,
        key_pad_mask: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        mode: str = "decode",
        positions: Optional[jax.Array] = None,
        encoder_pad_mask: Optional[jax.Array] = None,
        return_hidden: bool = False,
    ) -> jax.Array:
        """Cached decode step / prefill (see BartCausalDecoder modes); with
        ``mode='train'`` this is a cache-free teacher-forced decoder pass.
        ``return_hidden``: pre-head hidden states — the generate loop uses
        this to apply a pre-quantized int8 tied head outside the model (the
        quantized table must be a while_loop constant; see ops/generation)."""
        return self.text_decoder(
            input_ids,
            encoder_output,
            attention_mask=attention_mask,
            key_pad_mask=key_pad_mask,
            mode=mode,
            deterministic=True,
            positions=positions,
            encoder_pad_mask=encoder_pad_mask,
            return_hidden=return_hidden,
        )
