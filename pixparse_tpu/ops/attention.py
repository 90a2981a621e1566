"""Attention compute kernels.

One attention entry point for the whole framework. Layout is
``(batch, length, heads, head_dim)`` throughout (TPU-friendly: keeps the
contraction dims adjacent for the MXU and avoids transposes in the decoder
cache update path).

Implementations:

- ``xla``: einsum + softmax, fp32 accumulation. XLA fuses the softmax chain;
  for the model sizes here (<=2508 tokens) this is already MXU-bound.
- ``flash``: Pallas TPU flash-attention for long encoder sequences
  (tiled online-softmax kernel in :mod:`pixparse_tpu.ops.flash_attention`),
  used when no additive bias/cache-style masking is required.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

_logger = logging.getLogger(__name__)


def dot_product_attention(
    q: jax.Array,  # (B, Lq, H, D)
    k: jax.Array,  # (B, Lk, H, D)
    v: jax.Array,  # (B, Lk, H, D)
    bias: Optional[jax.Array] = None,  # broadcastable to (B, H, Lq, Lk)
    causal: bool = False,
    dtype=None,
    impl: str = "xla",
    kv_lens: Optional[jax.Array] = None,  # (B,) leading valid key count
) -> jax.Array:
    """Scaled dot-product attention, softmax in fp32.

    ``kv_lens`` masks trailing (packed-padding) key positions per sample —
    the flash kernel handles it natively; the XLA path lowers it to an
    additive bias. Mutually exclusive with ``bias``."""
    if bias is not None and kv_lens is not None:
        raise ValueError("bias and kv_lens are mutually exclusive")
    if impl == "flash":
        if bias is None:
            from pixparse_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v, causal=causal, kv_lens=kv_lens)
        # arbitrary additive biases have no flash path — fall through to XLA,
        # loudly: callers wanting flash should express masking as kv_lens
        _logger.warning(
            "impl='flash' requested but an additive bias forces the XLA "
            "attention path (shape q=%s bias=%s); pass kv_lens for "
            "flash-compatible masking", q.shape, bias.shape,
        )
    if kv_lens is not None and bias is None:
        valid = jnp.arange(k.shape[1])[None, :] < kv_lens[:, None]  # (B, Lk)
        bias = jnp.where(valid[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)

    out_dtype = dtype or q.dtype
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # (B, H, Lq, Lk)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if causal:
        lq, lk = scores.shape[-2], scores.shape[-1]
        # offset supports cached decode where Lq < Lk (query i sits at
        # absolute position i + lk - lq)
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        causal_mask = row + (lk - lq) >= col
        scores = jnp.where(causal_mask, scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def make_attention_bias(
    pad_mask: Optional[jax.Array],  # (B, Lk) True = attend
    dtype=jnp.float32,
) -> Optional[jax.Array]:
    """Additive key-padding bias (B, 1, 1, Lk)."""
    if pad_mask is None:
        return None
    neg = jnp.finfo(jnp.float32).min
    return jnp.where(pad_mask[:, None, None, :], 0.0, neg).astype(dtype)
