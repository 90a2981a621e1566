"""First-party flax Vision Transformer encoder.

Replaces the reference's timm-constructed encoder
(``models/image_encoder_timm.py:7-42`` in /root/reference): same architecture
family (``vit_base_patch16_224`` / ``vit_large_patch14_clip_224`` layouts,
grayscale ``in_chans=1``, arbitrary ``img_size``, ``num_classes=0`` /
``global_pool=''`` token-sequence output) but built TPU-first:

- NHWC image layout; patch embedding as reshape + one MXU matmul (identical
  math to the stride-p conv, no conv lowering needed),
- static token count per config -> one fused XLA program,
- params carry logical axis names (``embed``/``heads``/``mlp``/...) so the
  mesh layer can shard them (fsdp/tensor-parallel) without touching this file,
- bf16 compute / fp32 param policy via ``dtype``/``param_dtype``.

Weight import from timm checkpoints is in
:mod:`pixparse_tpu.models.torch_interop`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixparse_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class ViTCfg:
    img_size: Tuple[int, int] = (576, 448)
    patch_size: int = 16
    in_chans: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_cls_token: bool = True
    pre_norm: bool = False  # CLIP-style LN after patch+pos embed
    ln_eps: float = 1e-6
    drop_rate: float = 0.0

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @property
    def num_tokens(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)


def _dense_init(logical_axes):
    return nn.with_logical_partitioning(
        nn.initializers.xavier_uniform(), logical_axes
    )


class DenseParams(nn.Module):
    """Declares a Dense-layout param pair (``kernel``, ``bias``) WITHOUT
    applying it — identical param-tree paths/shapes/init to ``nn.Dense``, but
    the caller owns the matmul. Lets the MLP run as a PURE function under
    ``jax.checkpoint`` (remat='mlp': residual = the MLP input only; backward
    recomputes fc1+gelu). Wrapping whole blocks in ``nn.remat`` with a
    save-everything-except policy was measured to *triple* peak HBM on
    cruller_large: every policy-saveable intermediate becomes an explicit
    residual, defeating XLA's fusion-level memory elision."""

    in_features: int
    features: int
    logical: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _dense_init(self.logical),
            (self.in_features, self.features),
        )
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (self.logical[-1],)
            ),
            (self.features,),
        )
        return kernel, bias


def mlp_forward(x, w1, b1, w2, b2, dt, remat=False):
    """fc1 -> gelu -> fc2 with a selectable checkpoint cut (shared by the
    ViT / Swin / pix2struct encoders).

    remat == 'mlp':  checkpoint the WHOLE MLP as a pure function — residual
        is the MLP input only; backward recomputes fc1+gelu, freeing both
        (tokens, 4*D) wide activations at ~1/3 of a block-forward's FLOPs.
    remat == 'gelu': checkpoint gelu+fc2 — residual is the fc1 OUTPUT;
        backward recomputes only the elementwise gelu (fc2's recomputed
        output is dead code and DCE'd), freeing the gelu output at near-zero
        recompute cost. Half of 'mlp''s memory win, none of its matmul
        recompute — the sweet spot when the no-remat config misses HBM by
        less than one wide activation per block (cruller_large B=8,
        docs/PERF.md).

    Checkpointing gelu ALONE would save nothing: its output is still the
    fc2 matmul's residual — the cut must include the consuming matmul.
    """

    def head(x, w1, b1):
        return x.astype(dt) @ w1.astype(dt) + b1.astype(dt)

    def tail(h, w2, b2):
        g = nn.gelu(h, approximate=False)
        return g @ w2.astype(dt) + b2.astype(dt)

    if remat == "gelu":
        return jax.checkpoint(tail)(head(x, w1, b1), w2, b2)

    def mlp_fn(x, w1, b1, w2, b2):
        return tail(head(x, w1, b1), w2, b2)

    if remat:  # 'mlp' (or legacy truthy)
        mlp_fn = jax.checkpoint(mlp_fn)
    return mlp_fn(x, w1, b1, w2, b2)


class ViTAttention(nn.Module):
    cfg: ViTCfg
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True, pad_bias=None,
                 kv_lens=None):
        c = self.cfg
        head_dim = c.embed_dim // c.num_heads
        qkv = nn.Dense(
            3 * c.embed_dim,
            dtype=self.dtype,
            kernel_init=_dense_init(("embed", "heads")),
            bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), ("heads",)),
            name="qkv",
        )(x)
        B, L, _ = qkv.shape
        qkv = qkv.reshape(B, L, 3, c.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = dot_product_attention(
            q, k, v, bias=pad_bias, impl=self.attn_impl, dtype=self.dtype,
            kv_lens=kv_lens,
        )
        out = out.reshape(B, L, c.embed_dim)
        out = nn.Dense(
            c.embed_dim,
            dtype=self.dtype,
            kernel_init=_dense_init(("heads", "embed")),
            bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), ("embed",)),
            name="proj",
        )(out)
        return out


class ViTMlp(nn.Module):
    cfg: ViTCfg
    dtype: Dtype = jnp.float32
    # False | 'mlp' | 'gelu' — selective checkpoint cut (see mlp_forward)
    remat: Any = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        hidden = int(c.embed_dim * c.mlp_ratio)
        w1, b1 = DenseParams(c.embed_dim, hidden, ("embed", "mlp"), name="fc1")()
        w2, b2 = DenseParams(hidden, c.embed_dim, ("mlp", "embed"), name="fc2")()
        return mlp_forward(x, w1, b1, w2, b2, self.dtype, remat=self.remat)


class ViTBlock(nn.Module):
    cfg: ViTCfg
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    mlp_remat: Any = False  # False | 'mlp' | 'gelu'

    @nn.compact
    def __call__(self, x, deterministic: bool = True, pad_bias=None,
                 kv_lens=None):
        from pixparse_tpu.ops.layer_norm import FusedLayerNorm

        c = self.cfg
        # Pallas LN on TPU, fp32-stats XLA elsewhere; nn.LayerNorm-compatible
        # param names + ("embed",) logical axes (see models/bart.py::_ln)
        ln = lambda name: FusedLayerNorm(
            epsilon=c.ln_eps, dtype=self.dtype, name=name,
        )
        x = x + ViTAttention(c, dtype=self.dtype, attn_impl=self.attn_impl, name="attn")(
            ln("norm1")(x), deterministic, pad_bias, kv_lens
        )
        x = x + ViTMlp(c, dtype=self.dtype, remat=self.mlp_remat, name="mlp")(
            ln("norm2")(x), deterministic
        )
        return x


def _remat_policy(remat):
    """None for full remat; the dots-saveable policy for remat='dots'.
    remat='mlp' is NOT a block-level policy: it checkpoints only the MLP as
    a pure function (see :class:`DenseParams` / :class:`ViTMlp`) — a
    block-level save-everything-except-names policy was measured to
    *triple* peak HBM (every saveable intermediate materializes)."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None


class ViT(nn.Module):
    """Token-sequence ViT encoder (no pooling, no head)."""

    cfg: ViTCfg
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    # False | True/"full" (recompute everything) | "dots" (save matmul
    # outputs, recompute elementwise — jax dots_with_no_batch_dims policy:
    # most of full remat's memory win at a fraction of the recompute)
    # | "mlp" / "gelu" (selective per-MLP checkpoint cuts, see mlp_forward)
    remat: Any = False

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        """images: (B, H, W, C) float, already normalized. Returns (B, N, D)."""
        c = self.cfg
        B, H, W, C = images.shape
        p = c.patch_size
        gh, gw = H // p, W // p

        # Patchify: reshape + matmul == stride-p conv, but lowers directly to
        # one MXU matmul over (p*p*C, D).
        x = images.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = nn.Dense(
            c.embed_dim,
            dtype=self.dtype,
            kernel_init=_dense_init(("patch", "embed")),
            bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), ("embed",)),
            name="patch_embed",
        )(x.astype(self.dtype))

        if c.use_cls_token:
            cls = self.param(
                "cls_token",
                nn.with_logical_partitioning(nn.initializers.zeros_init(), (None, None, "embed")),
                (1, 1, c.embed_dim),
                jnp.float32,
            )
            x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (B, 1, 1)), x], axis=1)

        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (None, "image_length", "embed")
            ),
            (1, c.num_tokens, c.embed_dim),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)

        from pixparse_tpu.ops.layer_norm import FusedLayerNorm

        if c.pre_norm:
            x = FusedLayerNorm(
                epsilon=c.ln_eps, dtype=self.dtype, name="norm_pre",
            )(x)

        x = nn.with_logical_constraint(x, ("batch", "image_length", None))
        block_cls = ViTBlock
        mlp_remat = self.remat if self.remat in ("mlp", "gelu") else False
        if self.remat and not mlp_remat:
            # static_argnums index __call__ args with self at 0
            block_cls = nn.remat(
                ViTBlock, static_argnums=(2,), policy=_remat_policy(self.remat)
            )
        for i in range(c.depth):
            x = block_cls(
                c, dtype=self.dtype, attn_impl=self.attn_impl,
                mlp_remat=mlp_remat, name=f"blocks_{i}",
            )(x, deterministic)
        x = FusedLayerNorm(
            epsilon=c.ln_eps, dtype=self.dtype, name="norm",
        )(x)
        return x


# timm-name -> architecture + default normalization stats. Only the families
# the reference configs use, plus small variants for tests/dev.
VIT_ARCH_TABLE = {
    "vit_tiny_patch16_224": dict(embed_dim=192, depth=12, num_heads=3, patch_size=16,
                                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    "vit_small_patch16_224": dict(embed_dim=384, depth=12, num_heads=6, patch_size=16,
                                  mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    "vit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16,
                                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    "vit_large_patch14_clip_224": dict(
        embed_dim=1024, depth=24, num_heads=16, patch_size=14, pre_norm=True,
        mean=(0.48145466, 0.4578275, 0.40821073),
        std=(0.26862954, 0.26130258, 0.27577711),
    ),
    # test-size model, not a timm name
    "vit_test_patch16": dict(embed_dim=64, depth=2, num_heads=2, patch_size=16,
                             mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
}


def resolve_vit_cfg(
    name: str,
    image_size: Tuple[int, int],
    in_chans: int,
) -> Tuple[ViTCfg, dict]:
    """Resolve a timm-style encoder name (tag suffixes like '.datacompxl' are
    stripped, mirroring timm) to a ViTCfg + pretrained stats."""
    base = name.split(".")[0]
    if base not in VIT_ARCH_TABLE:
        raise ValueError(f"unknown image encoder '{name}' (known: {sorted(VIT_ARCH_TABLE)})")
    arch = dict(VIT_ARCH_TABLE[base])
    stats = dict(mean=arch.pop("mean"), std=arch.pop("std"))
    cfg = ViTCfg(img_size=tuple(image_size), in_chans=in_chans, **arch)
    if image_size[0] % cfg.patch_size or image_size[1] % cfg.patch_size:
        raise ValueError(f"image_size {image_size} not divisible by patch {cfg.patch_size}")
    return cfg, stats
