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
from pixparse_tpu.ops.attention import make_attention_bias

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


class Pix2StructEncoder(nn.Module):
    """(patches, rows, cols, mask) -> (B, max_patches, D) token sequence."""

    cfg: Pix2StructCfg
    dtype: Dtype = jnp.float32

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

        bias = make_attention_bias(mask) if mask is not None else None
        x = nn.with_logical_constraint(x, ("batch", "image_length", None))
        block_cfg = self.cfg.vit_block_cfg()
        for i in range(c.depth):
            x = ViTBlock(
                block_cfg, dtype=self.dtype, name=f"blocks_{i}"
            )(x, deterministic, pad_bias=bias)
        x = nn.LayerNorm(
            epsilon=c.ln_eps, dtype=self.dtype, name="norm",
            scale_init=nn.with_logical_partitioning(nn.initializers.ones_init(), ("embed",)),
            bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), ("embed",)),
        )(x)
        if mask is not None:
            # zero out pad tokens so downstream cross-attention key padding
            # can be derived from the sequence itself if the mask is dropped
            x = x * mask[..., None].astype(x.dtype)
        return x
