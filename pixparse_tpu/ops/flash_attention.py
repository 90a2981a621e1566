"""Pallas TPU flash attention (tiled online-softmax).

Used by :func:`pixparse_tpu.ops.attention.dot_product_attention` with
``impl='flash'`` for the encoder's long token sequences (1008 tokens for
cruller_base at 576x448/16, 2508 for cruller_large at 798x616/14): attention
scores never materialize in HBM — each (block_q, block_k) score tile lives in
VMEM, with running row-max/denominator rescaling (the standard online-softmax
recurrence).

Kernel design (per pallas_guide.md):
- grid = (batch*heads, q_blocks, k_blocks); the k dimension is minor, so each
  (bh, qi) accumulates across k iterations in VMEM scratch and writes the
  output tile once on the last k step.
- head_dim is zero-padded to the 128 lane width (ViT/BART head_dim is 64);
  padded lanes contribute zeros to QK^T and are sliced off the output.
- sequence lengths are zero-padded to block multiples; padded key positions
  are masked to -inf before the softmax, padded query rows are discarded on
  the host side.
- fp32 accumulation throughout (MXU ``preferred_element_type``).
- runs in interpreter mode automatically on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
LANES = 128


def _attn_kernel(
    q_ref,  # (1, block_q, Dp)
    k_ref,  # (1, block_k, Dp)
    v_ref,  # (1, block_k, Dp)
    o_ref,  # (1, block_q, Dp)
    m_scratch,  # (block_q, LANES) f32
    l_scratch,  # (block_q, LANES) f32
    acc_scratch,  # (block_q, Dp) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    kv_len: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (block_q, Dp)
    k = k_ref[0]  # (block_k, Dp)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (block_q, block_k)

    # mask: key padding + causal
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        mask = mask & (col <= row)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scratch[:, :1]  # (block_q, 1)
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)  # (block_q, block_k)
    l_cur = jnp.sum(p, axis=1, keepdims=True)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + l_cur

    acc = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
    acc_scratch[:] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        # guard fully-masked rows (padded queries): l == 0 -> output 0
        l = l_scratch[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def flash_attention(
    q: jax.Array,  # (B, Lq, H, D)
    k: jax.Array,  # (B, Lk, H, D)
    v: jax.Array,  # (B, Lk, H, D)
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
) -> jax.Array:
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    scale = D ** -0.5
    out_dtype = q.dtype

    block_q = min(block_q, max(LANES, Lq))
    block_k = min(block_k, max(LANES, Lk))
    Dp = max(LANES, ((D + LANES - 1) // LANES) * LANES)
    Lq_p = ((Lq + block_q - 1) // block_q) * block_q
    Lk_p = ((Lk + block_k - 1) // block_k) * block_k

    def to_bh(x, L_p):
        x = _pad_to(_pad_to(x, L_p, 1), Dp, 3)
        return x.transpose(0, 2, 1, 3).reshape(B * H, L_p, Dp)

    qb, kb, vb = to_bh(q, Lq_p), to_bh(k, Lk_p), to_bh(v, Lk_p)

    grid = (B * H, Lq_p // block_q, Lk_p // block_k)
    kernel = functools.partial(
        _attn_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        kv_len=Lk,
    )
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.devices()[0].platform == "cpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, Dp), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb)

    out = out.reshape(B, H, Lq_p, Dp).transpose(0, 2, 1, 3)
    return out[:, :Lq, :, :D]
