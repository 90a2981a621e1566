"""Pix2Struct-style variable-resolution patch encoder.

Consumes the output of :mod:`pixparse_tpu.ops.pix2struct` (a fixed
``max_patches`` budget of normalized patches + (row, col) grid coordinates +
validity mask) instead of a fixed canvas: documents keep their native aspect
ratio and the sequence budget is spent where the pixels are. The reference
describes its models as "Donut/Pix2Struct style" but only ships the
fixed-canvas ViT (``README.md:3-12`` in /root/reference); this makes the
Pix2Struct half real, TPU-first:

- static shapes: every input is (B, max_patches, ...) regardless of source
  resolution — one XLA program for all aspect ratios,
- learned 2D position embeddings (separate row + column tables, summed — the
  published parameterization),
- padding patches are masked out of attention (additive key bias) and zeroed
  at the output so downstream cross-attention sees clean keys,
- same logical axis names as the ViT, so mesh sharding rules apply unchanged.

Weight layout intentionally mirrors :class:`pixparse_tpu.models.vit.ViT`
blocks (``blocks_{i}`` with qkv/proj/mlp) so the timm-interop mapping covers
the transformer stack.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixparse_tpu.models.vit import ViTBlock, ViTCfg

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class Pix2StructCfg:
    max_patches: int = 2048
    patch_size: int = 16
    in_chans: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    max_rows: int = 128  # row/col position-table sizes
    max_cols: int = 128
    ln_eps: float = 1e-6

    @property
    def num_tokens(self) -> int:
        return self.max_patches

    @property
    def img_size(self) -> Tuple[int, int]:
        # nominal square canvas with the same patch budget (FLOP accounting)
        side = int(self.max_patches ** 0.5) * self.patch_size
        return (side, side)

    def vit_block_cfg(self) -> ViTCfg:
        return ViTCfg(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            use_cls_token=False,
            ln_eps=self.ln_eps,
        )


def _mask_lens(mask):
    """Contiguous (B, N) validity mask -> per-sample valid-key counts."""
    import jax.numpy as jnp

    return mask.sum(-1).astype(jnp.int32) if mask is not None else None


class Pix2StructEncoder(nn.Module):
    """(patches, rows, cols, mask) -> (B, max_patches, D) token sequence."""

    cfg: Pix2StructCfg
    dtype: Dtype = jnp.float32
    remat: "bool | str" = False  # False | True/'full' | 'dots' | 'mlp' | 'gelu'
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        patches: jax.Array,  # (B, N, p*p*C) normalized
        rows: jax.Array,  # (B, N) int32 grid row per patch
        cols: jax.Array,  # (B, N) int32 grid col per patch
        mask: Optional[jax.Array] = None,  # (B, N) True = real patch
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        x = nn.Dense(
            c.embed_dim,
            dtype=self.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("patch", "embed")
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("embed",)
            ),
            name="patch_embed",
        )(patches.astype(self.dtype))

        row_table = nn.Embed(
            c.max_rows, c.embed_dim, dtype=self.dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), (None, "embed")
            ),
            name="row_embed",
        )
        col_table = nn.Embed(
            c.max_cols, c.embed_dim, dtype=self.dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), (None, "embed")
            ),
            name="col_embed",
        )
        x = x + row_table(jnp.clip(rows, 0, c.max_rows - 1))
        x = x + col_table(jnp.clip(cols, 0, c.max_cols - 1))

        # the patchifier packs real patches first, so the (B, N) mask is
        # contiguous and collapses to per-sample valid lengths — the form
        # the flash kernel consumes natively (the XLA path rebuilds the
        # additive bias from it)
        kv_lens = _mask_lens(mask)
        x = nn.with_logical_constraint(x, ("batch", "image_length", None))
        block_cfg = self.cfg.vit_block_cfg()
        block_cls = ViTBlock
        mlp_remat = self.remat if self.remat in ("mlp", "gelu") else False
        if self.remat and not mlp_remat:
            # 2048-token fp32 attention scores don't fit HBM on the XLA
            # path at practical batch sizes (measured OOM at B=8 on v5e)
            from pixparse_tpu.models.vit import _remat_policy

            block_cls = nn.remat(
                ViTBlock, static_argnums=(2,), policy=_remat_policy(self.remat)
            )
        for i in range(c.depth):
            x = block_cls(
                block_cfg, dtype=self.dtype, attn_impl=self.attn_impl,
                mlp_remat=mlp_remat, name=f"blocks_{i}"
            )(x, deterministic, None, kv_lens)
        from pixparse_tpu.ops.layer_norm import FusedLayerNorm

        x = FusedLayerNorm(
            epsilon=c.ln_eps, dtype=self.dtype, name="norm",
        )(x)
        if mask is not None:
            # zero out pad tokens so downstream cross-attention key padding
            # can be derived from the sequence itself if the mask is dropped
            x = x * mask[..., None].astype(x.dtype)
        return x


# encoder-name -> architecture table (framework config registry dispatch)
PIX2STRUCT_ARCH_TABLE = {
    # row/col tables sized to max_patches (HF Pix2Struct convention): a
    # 452x4 extreme-aspect grid must not alias rows past a smaller table
    "pix2struct_base": dict(
        max_patches=2048, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        max_rows=2048, max_cols=2048,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    ),
    "pix2struct_test": dict(
        max_patches=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        max_rows=64, max_cols=64,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    ),
}


def resolve_pix2struct_cfg(name: str, image_size, in_chans: int):
    """Resolve a pix2struct encoder name. ``image_size`` is reinterpreted as
    ``(max_patches, patch_size)`` when given (the family has no fixed canvas);
    None keeps table defaults."""
    base = name.split(".")[0]
    if base not in PIX2STRUCT_ARCH_TABLE:
        raise ValueError(
            f"unknown pix2struct encoder '{name}' (known: {sorted(PIX2STRUCT_ARCH_TABLE)})"
        )
    arch = dict(PIX2STRUCT_ARCH_TABLE[base])
    stats = dict(mean=arch.pop("mean"), std=arch.pop("std"))
    if image_size:
        arch["max_patches"], arch["patch_size"] = int(image_size[0]), int(image_size[1])
    cfg = Pix2StructCfg(in_chans=in_chans, **arch)
    return cfg, stats



class Pix2StructCruller(nn.Module):
    """Variable-resolution Cruller: Pix2Struct patch encoder + BART-style
    decoder with cross-attention over real (unmasked) patches only.

    Same method surface as :class:`pixparse_tpu.models.cruller.Cruller`
    (``__call__`` / ``forward_hidden`` / ``encode`` / ``decode``) so the task
    machinery and the jitted generation loop apply unchanged; image input is
    the (patches, rows, cols, mask) dict from
    :mod:`pixparse_tpu.ops.pix2struct` instead of a fixed canvas.
    """

    enc_cfg: Pix2StructCfg
    bart_cfg: "BartDecoderCfg"  # noqa: F821 - import below
    dtype: Dtype = jnp.float32
    max_cache_len: int = 0
    remat: "bool | str" = False  # False | True/'full' | 'dots' | 'mlp' | 'gelu'
    attn_impl: str = "xla"  # train attention impl (encoder + decoder)

    def setup(self):
        from pixparse_tpu.models.bart import BartCausalDecoder

        self.image_encoder = Pix2StructEncoder(
            self.enc_cfg, dtype=self.dtype, remat=self.remat,
            attn_impl=self.attn_impl,
        )
        self.text_decoder = BartCausalDecoder(
            self.bart_cfg, max_cache_len=self.max_cache_len, dtype=self.dtype,
            remat=self.remat, attn_impl=self.attn_impl,
        )

    def encode(self, image_input, deterministic: bool = True) -> jax.Array:
        return self.image_encoder(
            image_input["patches"],
            image_input["rows"],
            image_input["cols"],
            image_input.get("mask"),
            deterministic=deterministic,
        )

    def __call__(
        self,
        image_input,  # dict(patches, rows, cols, mask)
        text_input: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        enc = self.encode(image_input, deterministic)
        return self.text_decoder(
            text_input,
            enc,
            attention_mask=attention_mask,
            deterministic=deterministic,
            encoder_pad_mask=image_input.get("mask"),
            encoder_kv_lens=_mask_lens(image_input.get("mask")),
        )

    def forward_hidden(
        self,
        image_input,
        text_input: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        enc = self.encode(image_input, deterministic)
        return self.text_decoder(
            text_input,
            enc,
            attention_mask=attention_mask,
            deterministic=deterministic,
            return_hidden=True,
            encoder_pad_mask=image_input.get("mask"),
            encoder_kv_lens=_mask_lens(image_input.get("mask")),
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
        return self.text_decoder(
            input_ids,
            encoder_output,
            attention_mask=attention_mask,
            key_pad_mask=key_pad_mask,
            mode=mode,
            deterministic=True,
            positions=positions,
            encoder_pad_mask=encoder_pad_mask,
            encoder_kv_lens=_mask_lens(encoder_pad_mask),
            return_hidden=return_hidden,
        )
