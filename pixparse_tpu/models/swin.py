"""First-party flax Swin Transformer encoder (Donut parity).

The reference constructs its encoder through timm and explicitly plans Swin
for Donut-style models but never finishes it ("FIXME need to add support for
changing input resolution / attn window sizes for models like swin",
``models/image_encoder_timm.py:22-23`` in /root/reference; the Donut baseline
task wraps the HF Donut Swin). This module provides the Swin family
first-party, TPU-first:

- NHWC throughout; window partition/reverse are pure reshapes (no gathers),
  cyclic shift via ``jnp.roll`` — all static-shape, fusible XLA ops,
- relative-position bias via a static index buffer into a learned table
  (computed with numpy at trace time),
- shifted-window attention masks are trace-time constants per config,
- arbitrary input sizes as long as each stage's feature map divides the
  window (Donut's 2560x1920 / window 10 satisfies this; smaller windows are
  clamped per-stage like timm when the feature map is tiny),
- token-sequence output (final stage, flattened) for decoder cross-attention,
  matching how Donut feeds its BART decoder.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype

_logger = logging.getLogger(__name__)


def _flash_window_unvalidated(batch: int, num_stages: int) -> bool:
    """True when (batch, stages) is OUTSIDE the on-chip-validated envelope of
    the fused Pallas window-attention kernel.

    KNOWN FAULT (docs/PERF.md "Fused Swin window attention"): the kernel
    kills the TPU worker in some compiled compositions — the full >=3-stage
    donut encode at B=8 1280x960 faults, while B<=4 full train steps run
    clean and correct. The bug is context-sensitive (ruled out: shapes, call
    count, HBM pressure, program size) so containment is by composition:
    full multi-stage encodes above B=4 fall back to the XLA window attention
    rather than risking a worker crash. CPU/interpret is unaffected.

    Round-5 finding (jax 0.9.0): the fault's envelope MOVES across compiler
    versions but the bug is alive — every round-3/4 faulting repro
    composition (encoder-only grad B=4, depths-(2,2,2) B=8, full-depth
    fwd+bwd B=8, full-depth fwd B=16) now passes on chip, yet the B=16
    eval-decode composition (jitted encode + KV-cache decode program)
    crashed the worker the same way. Shape-based envelopes cannot be
    trusted across pins; this conservative guard stays until the kernel
    survives an upstream-fixed compiler.

    ``PIXPARSE_UNSAFE_FLASH_WINDOW=1`` disables the guard — ONLY for
    fault-reproduction / root-cause work (docs/repro_window_fault.py);
    it can and will crash the TPU worker on affected compositions.
    """
    import os

    from pixparse_tpu.ops.flash_attention import _interpret

    if _interpret():
        return False
    if os.environ.get("PIXPARSE_UNSAFE_FLASH_WINDOW") == "1":
        return False
    return batch > 4 and num_stages >= 3


@dataclasses.dataclass(frozen=True)
class SwinCfg:
    img_size: Tuple[int, int] = (2560, 1920)
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 14, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 10
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5
    drop_rate: float = 0.0
    final_norm: bool = True  # timm applies a final LN; HF DonutSwin does not

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    @property
    def depth(self) -> int:
        """Total block count (layer-decay / FLOP accounting parity with ViT)."""
        return sum(self.depths)

    @property
    def out_dim(self) -> int:
        return self.embed_dim * (2 ** (self.num_stages - 1))

    def stage_resolution(self, stage: int) -> Tuple[int, int]:
        h = self.img_size[0] // self.patch_size // (2 ** stage)
        w = self.img_size[1] // self.patch_size // (2 ** stage)
        return h, w

    @property
    def num_tokens(self) -> int:
        h, w = self.stage_resolution(self.num_stages - 1)
        return h * w


def _rel_pos_index(window: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative bias table (standard
    Swin construction)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, ww, ww)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (ww, ww)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, ww, ww) additive mask for shifted windows (0 / -inf)."""
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(h // window, window, w // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mw[:, None, :] != mw[:, :, None]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


def _window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ww, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _window_reverse(x: jax.Array, window: int, B: int, H: int, W: int) -> jax.Array:
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _init(logical):
    return nn.with_logical_partitioning(nn.initializers.xavier_uniform(), logical)


def _zeros(logical):
    return nn.with_logical_partitioning(nn.initializers.zeros_init(), logical)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: Dtype = jnp.float32
    # 'xla' (default) | 'flash' (fused Pallas window kernel, +32% measured
    # donut train throughput). CAUTION: 'flash' hits a context-sensitive
    # Mosaic/XLA fault in SOME compiled compositions (e.g. the full donut
    # encode at B=8 1280x960, or an encoder-only grad at B=4) while others
    # (the full B=4 train step) run clean and correct — validate any new
    # (config, program) pair on the chip before relying on it; see
    # docs/PERF.md "Fused Swin window attention".
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        """x: (nB, ww, C); mask: (nW, ww, ww) broadcast over batch tiles."""
        nB, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        qkv = nn.Dense(
            3 * C, dtype=self.dtype,
            kernel_init=_init(("embed", "heads")), bias_init=_zeros(("heads",)),
            name="qkv",
        )(x)

        table = self.param(
            "relative_position_bias_table",
            nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02), (None, "heads")
            ),
            ((2 * self.window - 1) ** 2, H),
            jnp.float32,
        )
        index = jnp.asarray(_rel_pos_index(self.window).reshape(-1))
        # head-major gather (no trailing transpose): the Pallas kernel reads
        # bias as a (H, ww, ww) block and a transposed layout feeding the
        # custom call is a DMA hazard
        bias = table.T[:, index].reshape(H, N, N)  # (H, ww, ww)

        if self.attn_impl == "flash":
            # fused Pallas kernel: scores never round-trip HBM. The Dense
            # output feature order is (3, H, Dh), so q/k/v are contiguous
            # head-major (nB, ww, C) slices — the kernel's flat layout.
            from pixparse_tpu.ops.window_attention import window_attention

            out = window_attention(
                qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:], bias, mask
            )
        else:
            qkv = qkv.reshape(nB, N, 3, H, Dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (Dh ** -0.5)
            scores = scores + bias[None]
            if mask is not None:
                nW = mask.shape[0]
                scores = scores.reshape(nB // nW, nW, H, N, N) + mask[None, :, None]
                scores = scores.reshape(nB, H, N, N)
            attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nB, N, C)
        return nn.Dense(
            C, dtype=self.dtype,
            kernel_init=_init(("heads", "embed")), bias_init=_zeros(("embed",)),
            name="proj",
        )(out)


class SwinBlock(nn.Module):
    cfg: SwinCfg
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    shift: int
    dtype: Dtype = jnp.float32
    mlp_remat: "bool | str" = False  # False | 'mlp' | 'gelu' (vit.mlp_forward)
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        """x: (B, H, W, C)."""
        c = self.cfg
        B, H, W, C = x.shape
        window = min(c.window_size, H, W)
        # timm: no shifting when one window covers the feature map
        shift = self.shift if window < min(H, W) else 0
        from pixparse_tpu.ops.layer_norm import FusedLayerNorm

        # Pallas LN on TPU, fp32-stats XLA elsewhere (models/bart.py::_ln)
        ln = lambda name: FusedLayerNorm(
            epsilon=c.ln_eps, dtype=self.dtype, name=name,
        )

        shortcut = x
        h = ln("norm1")(x)
        # pad feature map to window multiples (timm pads per block, slices after)
        pad_h = (window - H % window) % window
        pad_w = (window - W % window) % window
        Hp, Wp = H + pad_h, W + pad_w
        if pad_h or pad_w:
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(h, window)
        mask = None
        if shift:
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, window, shift))
        attn_out = WindowAttention(
            self.dim, self.num_heads, window, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn",
        )(windows, mask)
        h = _window_reverse(attn_out, window, B, Hp, Wp)
        if shift:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            h = h[:, :H, :W]
        x = shortcut + h

        shortcut = x
        h = ln("norm2")(x)
        hidden = int(self.dim * c.mlp_ratio)
        # declare-only params so the MLP can run as a pure checkpointed fn
        # under remat='mlp'/'gelu' (see vit.DenseParams / vit.mlp_forward)
        from pixparse_tpu.models.vit import DenseParams, mlp_forward

        w1, b1 = DenseParams(self.dim, hidden, ("embed", "mlp"), name="mlp_fc1")()
        w2, b2 = DenseParams(hidden, self.dim, ("mlp", "embed"), name="mlp_fc2")()
        return shortcut + mlp_forward(
            h, w1, b1, w2, b2, self.dtype, remat=self.mlp_remat
        )


class PatchMerging(nn.Module):
    cfg: SwinCfg
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        """(B, H, W, C) -> (B, H/2, W/2, 2C). timm order: [0::2,0::2],
        [1::2,0::2], [0::2,1::2], [1::2,1::2]."""
        B, H, W, C = x.shape
        x = jnp.concatenate(
            [
                x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                x[:, 0::2, 1::2], x[:, 1::2, 1::2],
            ],
            axis=-1,
        )
        from pixparse_tpu.ops.layer_norm import FusedLayerNorm

        x = FusedLayerNorm(
            epsilon=self.cfg.ln_eps, dtype=self.dtype, name="norm",
        )(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype,
            # in/out are both model-width dims; only one may map to a mesh
            # axis (duplicate-axis specs are invalid), keep output replicated
            kernel_init=_init(("embed", None)),
            name="reduction",
        )(x)


class Swin(nn.Module):
    """Token-sequence Swin encoder: (B, H, W, C) image -> (B, N, out_dim)."""

    cfg: SwinCfg
    dtype: Dtype = jnp.float32
    remat: "bool | str" = False  # False | True/'full' | 'dots' | 'mlp' | 'gelu'
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        B, H, W, _ = images.shape
        attn_impl = self.attn_impl
        if attn_impl == "flash" and _flash_window_unvalidated(B, c.num_stages):
            _logger.warning(
                "Swin attn_impl='flash' requested for an UNVALIDATED "
                "composition (batch=%d > 4, %d-stage encode on TPU) that is "
                "known to crash the TPU worker — falling back to XLA window "
                "attention for this encode. See docs/PERF.md 'Fused Swin "
                "window attention'.",
                B, c.num_stages,
            )
            attn_impl = "xla"
        p = c.patch_size
        gh, gw = H // p, W // p
        x = images.reshape(B, gh, p, gw, p, c.in_chans)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh, gw, p * p * c.in_chans)
        x = nn.Dense(
            c.embed_dim, dtype=self.dtype,
            kernel_init=_init(("patch", "embed")), bias_init=_zeros(("embed",)),
            name="patch_embed",
        )(x.astype(self.dtype))
        from pixparse_tpu.ops.layer_norm import FusedLayerNorm

        x = FusedLayerNorm(
            epsilon=c.ln_eps, dtype=self.dtype, name="patch_norm",
        )(x)

        block_cls = SwinBlock
        mlp_remat = self.remat if self.remat in ("mlp", "gelu") else False
        if self.remat and not mlp_remat:
            # static_argnums index __call__ args with self at 0
            from pixparse_tpu.models.vit import _remat_policy

            block_cls = nn.remat(
                SwinBlock, static_argnums=(2,), policy=_remat_policy(self.remat)
            )
        dim = c.embed_dim
        for stage in range(c.num_stages):
            res = (gh // (2 ** stage), gw // (2 ** stage))
            for block in range(c.depths[stage]):
                shift = 0 if block % 2 == 0 else min(c.window_size, *res) // 2
                x = block_cls(
                    c, dim, c.num_heads[stage], res, shift,
                    dtype=self.dtype, mlp_remat=mlp_remat,
                    attn_impl=attn_impl,
                    name=f"layers_{stage}_blocks_{block}",
                )(x, deterministic)
            if stage < c.num_stages - 1:
                x = PatchMerging(c, dim, dtype=self.dtype, name=f"layers_{stage}_downsample")(x)
                dim *= 2

        if c.final_norm:
            x = FusedLayerNorm(
                epsilon=c.ln_eps, dtype=self.dtype, name="norm",
            )(x)
        Bh, Hh, Wh, Ch = x.shape
        return x.reshape(Bh, Hh * Wh, Ch)


# timm-style names -> architecture (+ normalization stats)
SWIN_ARCH_TABLE = {
    "swin_base_patch4_window7_224": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=7, patch_size=4,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
    ),
    "swin_base_patch4_window12_384": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=12, patch_size=4,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
    ),
    # Donut encoder (HF naver-clova-ix/donut-base layout; no final LN)
    "donut_swin_base": dict(
        embed_dim=128, depths=(2, 2, 14, 2), num_heads=(4, 8, 16, 32),
        window_size=10, patch_size=4, final_norm=False,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    ),
    # test-size model
    "swin_test": dict(
        embed_dim=32, depths=(1, 1), num_heads=(2, 4), window_size=4, patch_size=4,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
    ),
}


def resolve_swin_cfg(
    name: str, image_size: Tuple[int, int], in_chans: int
) -> Tuple[SwinCfg, dict]:
    base = name.split(".")[0]
    if base not in SWIN_ARCH_TABLE:
        raise ValueError(f"unknown swin encoder '{name}' (known: {sorted(SWIN_ARCH_TABLE)})")
    arch = dict(SWIN_ARCH_TABLE[base])
    stats = dict(mean=arch.pop("mean"), std=arch.pop("std"))
    cfg = SwinCfg(img_size=tuple(image_size), in_chans=in_chans, **arch)
    # each stage's feature map must divide its (possibly clamped) window
    p = cfg.patch_size
    if image_size[0] % (p * 2 ** (cfg.num_stages - 1)) or image_size[1] % (
        p * 2 ** (cfg.num_stages - 1)
    ):
        raise ValueError(
            f"image_size {image_size} must be divisible by "
            f"{p * 2 ** (cfg.num_stages - 1)} for {name}"
        )
    return cfg, stats
