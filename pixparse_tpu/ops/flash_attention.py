"""Pallas TPU flash attention (tiled online-softmax), differentiable.

Used by :func:`pixparse_tpu.ops.attention.dot_product_attention` with
``impl='flash'``. Scores never materialize in HBM — each (block_q, block_k)
tile lives in VMEM with running row-max/denominator rescaling. A custom VJP
implements the standard flash backward (recompute p from the saved
logsumexp), so the kernel serves BOTH the decode/serving path and training:
the fp32 (B, H, L, L) score tensors the XLA path writes are the dominant
non-logits allocation of a cruller train step at L=1023 (measured via an XLA
OOM dump on v5e).

Kernel design (per pallas_guide.md):
- forward: grid (batch*heads, q_blocks, k_blocks), k minor; each (bh, qi)
  accumulates in VMEM scratch, writes its output tile + logsumexp row on the
  last k step.
- backward dq: same grid; recomputes p tile from q, k and the saved lse.
- backward dk/dv: grid (batch*heads, k_blocks, q_blocks), q minor, so each
  (bh, ki) accumulates dk/dv across q tiles.
- head_dim zero-padded to the 128 lane width; sequence lengths padded to
  block multiples with -inf key masking; fp32 accumulation on the MXU.
- runs in interpreter mode automatically on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref, k_ref, v_ref,  # (1, block, Dp)
    o_ref,  # (1, block_q, Dp)
    lse_ref,  # (1, block_q, LANES) lane-broadcast (TPU tile constraints)
    m_scratch, l_scratch,  # (block_q, LANES) f32
    acc_scratch,  # (block_q, Dp) f32
    *, scale, causal, block_q, block_k, kv_len, q_len,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < kv_len
    if causal:
        # bottom-right alignment for Lq != Lk (matches the XLA path: query i
        # sits at absolute key position i + kv_len - q_len)
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask = mask & (col <= row + (kv_len - q_len))
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scratch[:, :1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
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
        l = l_scratch[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)
        # lse = m + log(l); fully-masked rows keep NEG_INF
        lse = jnp.where(
            l > 0.0, m_scratch[:, :1] + jnp.log(safe_l), NEG_INF
        )  # (block_q, 1)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_flat(qb, kb, vb, *, scale, causal, block_q, block_k, kv_len, q_len, out_dtype):
    """(BH, Lq_p, Dp) inputs -> (o, lse)."""
    from jax.experimental.pallas import tpu as pltpu

    BH, Lq_p, Dp = qb.shape
    Lk_p = kb.shape[1]
    grid = (BH, Lq_p // block_q, Lk_p // block_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=kv_len, q_len=q_len,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BH, Lq_p, Dp), out_dtype),
            jax.ShapeDtypeStruct((BH, Lq_p, LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
        interpret=_interpret(),
    )(qb, kb, vb)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
    dq_ref,
    dq_scratch,  # (block_q, Dp) f32
    *, scale, causal, block_q, block_k, kv_len, q_len,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask = mask & (col <= row + (kv_len - q_len))
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])  # (block_q, block_k)

    do = do_ref[0].astype(jnp.float32)
    delta = jnp.sum(do * o_ref[0].astype(jnp.float32), axis=1, keepdims=True)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale
    dq_scratch[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,  # (block_k, Dp) f32
    *, scale, causal, block_q, block_k, kv_len, q_len,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0]  # (block_q, Dp)
    k = k_ref[0]  # (block_k, Dp)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask = mask & (col <= row + (kv_len - q_len))
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])  # (block_q, block_k)

    do = do_ref[0].astype(jnp.float32)
    delta = jnp.sum(do * o_ref[0].astype(jnp.float32), axis=1, keepdims=True)
    dv_scratch[:] += jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale  # (block_q, block_k)
    dk_scratch[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_flat(qb, kb, vb, ob, do, lse, *, scale, causal, block_q, block_k, kv_len, q_len):
    from jax.experimental.pallas import tpu as pltpu

    BH, Lq_p, Dp = qb.shape
    Lk_p = kb.shape[1]

    grid_q = (BH, Lq_p // block_q, Lk_p // block_k)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len, q_len=q_len,
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_p, Dp), qb.dtype),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda bh, qi, ki: (bh, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda bh, qi, ki: (bh, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, Dp), jnp.float32)],
        interpret=_interpret(),
    )(qb, kb, vb, do, ob, lse)

    grid_k = (BH, Lk_p // block_k, Lq_p // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len, q_len=q_len,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Lk_p, Dp), kb.dtype),
            jax.ShapeDtypeStruct((BH, Lk_p, Dp), vb.dtype),
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda bh, ki, qi: (bh, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, Dp), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda bh, ki, qi: (bh, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, Dp), jnp.float32),
            pltpu.VMEM((block_k, Dp), jnp.float32),
        ],
        interpret=_interpret(),
    )(qb, kb, vb, do, ob, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry (custom VJP over flat (BH, L, Dp) layout)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_flat(qb, kb, vb, scale, causal, block_q, block_k, kv_len, q_len):
    o, _ = _fwd_flat(
        qb, kb, vb, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=kv_len, q_len=q_len, out_dtype=qb.dtype,
    )
    return o


def _flash_flat_fwd(qb, kb, vb, scale, causal, block_q, block_k, kv_len, q_len):
    o, lse = _fwd_flat(
        qb, kb, vb, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=kv_len, q_len=q_len, out_dtype=qb.dtype,
    )
    return o, (qb, kb, vb, o, lse)


def _flash_flat_bwd(scale, causal, block_q, block_k, kv_len, q_len, res, do):
    qb, kb, vb, o, lse = res
    dq, dk, dv = _bwd_flat(
        qb, kb, vb, o, do, lse,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, q_len=q_len,
    )
    return dq, dk, dv


_flash_flat.defvjp(_flash_flat_fwd, _flash_flat_bwd)


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

    block_q = min(block_q, max(LANES, Lq))
    block_k = min(block_k, max(LANES, Lk))
    Dp = max(LANES, ((D + LANES - 1) // LANES) * LANES)
    Lq_p = ((Lq + block_q - 1) // block_q) * block_q
    Lk_p = ((Lk + block_k - 1) // block_k) * block_k

    def to_bh(x, L_p):
        x = _pad_to(_pad_to(x, L_p, 1), Dp, 3)
        return x.transpose(0, 2, 1, 3).reshape(B * H, L_p, Dp)

    qb, kb, vb = to_bh(q, Lq_p), to_bh(k, Lk_p), to_bh(v, Lk_p)
    out = _flash_flat(qb, kb, vb, scale, causal, block_q, block_k, Lk, Lq)
    out = out.reshape(B, H, Lq_p, Dp).transpose(0, 2, 1, 3)
    return out[:, :Lq, :, :D]
