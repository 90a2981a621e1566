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
- backward dq: same grid; recomputes p from q, k and the saved lse.
- backward dk/dv: grid (batch*heads, k_blocks, q_blocks), q minor, so each
  (bh, ki) accumulates dk/dv across q tiles.
- head_dim is NOT padded: a block lane dim equal to the array dim is legal
  Mosaic tiling, and padding 64 -> 128 would double both the QK~PV matmul
  work and the HBM traffic (measured 2x kernel time at cruller head_dim 64).
- every matmul takes bf16 operands with fp32 MXU accumulation
  (``preferred_element_type``); fp32 operands would fall off the bf16 MXU
  fast path (measured ~2x backward cost).
- causal tiles are classified per grid step: fully-masked tiles skip all
  compute, fully-visible tiles skip the mask, only diagonal-crossing tiles
  pay the 2D iota+select. Key-padding masking is a lane-broadcast bias row,
  applied only when the padded length differs (static).
- when one k-block covers the whole key length (every cruller/donut site:
  L <= 1024), a single-block fast path skips the online-softmax machinery
  entirely — no m/l/acc scratch round trips, softmax normalization applied
  to the (block_q, D) output instead of the (block_q, block_k) p tile
  (measured ~25% kernel-time saving; the tiles are VMEM-bandwidth-bound).
- ``delta = sum(do * o)`` is precomputed once outside (XLA fuses it), not
  per k-tile inside the kernels; lse/delta ride in 8-lane arrays rather than
  broadcast across a full 128-lane tile.
- batch*heads and the non-accumulating sequence dim are declared
  ``parallel`` so Mosaic may reorder/pipeline them.
- per-sample key lengths (``kv_lens``) support packed/padded variable-
  length keys (pix2struct variable-resolution patches): a (B,) length vector
  replaces the (B, H, Lq, Lk) additive bias the XLA path needs, keeping the
  masked-encoder train path on the flash kernels.
- runs in interpreter mode automatically on CPU (tests).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_logger = logging.getLogger(__name__)

NEG_INF = -1e30
LANES = 128
STAT_LANES = 8  # lse/delta lane width (sublane-aligned, 16x less traffic than 128)


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _compiler_params(*semantics):
    from jax.experimental.pallas import tpu as pltpu

    # raise the default 16 MB scoped-vmem limit: single-k-block tiles at
    # long sequence lengths (s/p tiles up to (512, 2560) f32) need more
    return pltpu.CompilerParams(
        dimension_semantics=tuple(semantics),
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _tail_bias(ki, block_q, block_k, kv_len):
    """(1, block_k) additive 0/-inf row masking key positions >= kv_len."""
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    return jnp.where(col < kv_len, 0.0, NEG_INF)


def _pow2(x: float) -> bool:
    """Exact power of two (multiplying any float array by it is bit-exact —
    a pure exponent shift). head_dim 64 -> scale = 2**-3 at every current
    call site."""
    import math

    m, _ = math.frexp(x)
    return x > 0 and m == 0.5


def _scaled(x, scale):
    """x * scale, elided statically when the scale was folded into q
    (see _flash_local) — saves a full VPU pass over the f32 score tile."""
    return x if scale == 1.0 else x * scale


def _causal_mask(qi, ki, block_q, block_k, off):
    """Bottom-right-aligned causal tile mask: query i at absolute key
    position i + off (matches the XLA path for Lq != Lk)."""
    row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    return col <= row + off


def _tile_classes(qi, ki, block_q, block_k, off):
    """(fully_masked, fully_visible) for the causal pattern."""
    first_col = ki * block_k
    last_col = first_col + block_k - 1
    first_row_limit = qi * block_q + off
    last_row_limit = qi * block_q + block_q - 1 + off
    return first_col > last_row_limit, last_col <= first_row_limit


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel_single(
    q_ref, k_ref, v_ref,  # (1, block, D)
    klen_ref,  # (1, 1) int32 per-sample key length (varlen only)
    o_ref,  # (1, block_q, D)
    lse_ref,  # (1, block_q, STAT_LANES)
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    """One k-block covers the full key length: plain softmax, no scratch."""
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    s = _scaled(jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ), scale)
    if varlen:
        s = s + _tail_bias(0, block_q, block_k, klen_ref[pl.program_id(0), 0])
    elif kv_pad:
        s = s + _tail_bias(0, block_q, block_k, kv_len)
    if causal:
        s = jnp.where(
            _causal_mask(qi, 0, block_q, block_k, kv_len - q_len), s, NEG_INF
        )
    m = jnp.max(s, axis=1, keepdims=True)
    # fully-masked rows (klen=0 / causal rows with no visible keys): every
    # s is ~NEG_INF so exp(s - m) would peak at 1 and emit a spurious
    # average of v — zero them instead, matching the multi-block kernel's
    # l == 0 semantics
    dead = m <= NEG_INF * 0.5
    p = jnp.exp(s - m).astype(v_ref.dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    live = (l > 0.0) & ~dead
    safe_l = jnp.where(live, l, 1.0)
    o = jax.lax.dot_general(
        p, v_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = jnp.where(live, o / safe_l, 0.0).astype(o_ref.dtype)
    lse = jnp.where(live, m + jnp.log(safe_l), NEG_INF)
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_kernel(
    q_ref, k_ref, v_ref,  # (1, block, D)
    klen_ref,  # (1, 1) int32 per-sample key length (varlen only)
    o_ref,  # (1, block_q, D)
    lse_ref,  # (1, block_q, STAT_LANES)
    m_scratch, l_scratch,  # (block_q, STAT_LANES) f32
    acc_scratch,  # (block_q, D) f32
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def body(masked):
        q = q_ref[0]
        k = k_ref[0]
        s = _scaled(jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), scale)
        if varlen:
            s = s + _tail_bias(ki, block_q, block_k, klen_ref[pl.program_id(0), 0])
        elif kv_pad:
            s = s + _tail_bias(ki, block_q, block_k, kv_len)
        if masked:
            s = jnp.where(
                _causal_mask(qi, ki, block_q, block_k, kv_len - q_len), s, NEG_INF
            )
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

    if causal:
        fully_masked, fully_visible = _tile_classes(
            qi, ki, block_q, block_k, kv_len - q_len
        )

        @pl.when(fully_visible)
        def _clear():
            body(False)

        @pl.when(~fully_masked & ~fully_visible)
        def _diag():
            body(True)
    else:
        body(False)

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


def _fwd_flat(qb, kb, vb, klen, *, scale, causal, block_q, block_k, kv_len,
              q_len, varlen, out_dtype):
    """(BH, Lq_p, D) inputs + (BH, 1) key lengths -> (o, lse)."""
    from jax.experimental.pallas import tpu as pltpu

    BH, Lq_p, D = qb.shape
    Lk_p = kb.shape[1]
    kwargs = dict(
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, q_len=q_len, kv_pad=Lk_p != kv_len, varlen=varlen,
    )
    out_shape = (
        jax.ShapeDtypeStruct((BH, Lq_p, D), out_dtype),
        jax.ShapeDtypeStruct((BH, Lq_p, STAT_LANES), jnp.float32),
    )
    if Lk_p == block_k:
        return pl.pallas_call(
            functools.partial(_fwd_kernel_single, **kwargs),
            out_shape=out_shape,
            grid=(BH, Lq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, qi: (bh, qi, 0)),
            ),
            compiler_params=_compiler_params("parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, klen)
    grid = (BH, Lq_p // block_q, Lk_p // block_k)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, **kwargs),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, STAT_LANES), jnp.float32),
            pltpu.VMEM((block_q, STAT_LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=_compiler_params("parallel", "parallel", "arbitrary"),
        interpret=_interpret(),
    )(qb, kb, vb, klen)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel_single(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    """nq == nk == 1 (every cruller/donut training site): one kernel for all
    three grads — s/p/dp are computed once instead of once per dq and dk/dv
    kernel (5 matmul passes vs 7, and q/k/v/do stream from HBM once)."""
    q = q_ref[0]
    k = k_ref[0]
    s = _scaled(jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ), scale)
    if varlen:
        s = s + _tail_bias(0, block_q, block_k, klen_ref[pl.program_id(0), 0])
    elif kv_pad:
        s = s + _tail_bias(0, block_q, block_k, kv_len)
    if causal:
        s = jnp.where(
            _causal_mask(0, 0, block_q, block_k, kv_len - q_len), s, NEG_INF
        )
    lse = jnp.maximum(lse_ref[0][:, :1], NEG_INF * 0.5)
    p = jnp.exp(s - lse).astype(do_ref.dtype)  # (block_q, block_k)
    do = do_ref[0]
    dv_ref[0] = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = _scaled(p.astype(jnp.float32) * (dp - delta_ref[0][:, :1]), scale).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _bwd_dq_kernel_single(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dq_ref,
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    """nk == 1: recompute p once and write dq directly, no accumulator."""
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    s = _scaled(jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ), scale)
    if varlen:
        s = s + _tail_bias(0, block_q, block_k, klen_ref[pl.program_id(0), 0])
    elif kv_pad:
        s = s + _tail_bias(0, block_q, block_k, kv_len)
    if causal:
        s = jnp.where(
            _causal_mask(qi, 0, block_q, block_k, kv_len - q_len), s, NEG_INF
        )
    lse = jnp.maximum(lse_ref[0][:, :1], NEG_INF * 0.5)
    p = jnp.exp(s - lse)
    do = do_ref[0]
    dp = jax.lax.dot_general(
        do, v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = _scaled(p * (dp - delta_ref[0][:, :1]), scale)
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _bwd_dkv_kernel_single(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dk_ref, dv_ref,
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    """nq == 1: single q block, write dk/dv directly, no accumulators."""
    ki = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    s = _scaled(jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ), scale)
    if varlen:
        s = s + _tail_bias(ki, block_q, block_k, klen_ref[pl.program_id(0), 0])
    elif kv_pad:
        s = s + _tail_bias(ki, block_q, block_k, kv_len)
    if causal:
        s = jnp.where(
            _causal_mask(0, ki, block_q, block_k, kv_len - q_len), s, NEG_INF
        )
    lse = jnp.maximum(lse_ref[0][:, :1], NEG_INF * 0.5)
    p = jnp.exp(s - lse).astype(do_ref.dtype)
    do = do_ref[0]
    dv_ref[0] = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = _scaled(p.astype(jnp.float32) * (dp - delta_ref[0][:, :1]), scale).astype(q.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dq_ref,
    dq_scratch,  # (block_q, D) f32
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def body(masked):
        q = q_ref[0]
        k = k_ref[0]
        s = _scaled(jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), scale)
        if varlen:
            s = s + _tail_bias(ki, block_q, block_k, klen_ref[pl.program_id(0), 0])
        elif kv_pad:
            s = s + _tail_bias(ki, block_q, block_k, kv_len)
        if masked:
            s = jnp.where(
                _causal_mask(qi, ki, block_q, block_k, kv_len - q_len), s, NEG_INF
            )
        # clamp keeps fully-masked rows (lse == NEG_INF) at p == 0 instead of
        # inf, so padding can never leak NaNs into the grads
        lse = jnp.maximum(lse_ref[0][:, :1], NEG_INF * 0.5)
        p = jnp.exp(s - lse)  # (block_q, block_k)
        do = do_ref[0]
        dp = jax.lax.dot_general(
            do, v_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = _scaled(p * (dp - delta_ref[0][:, :1]), scale)
        dq_scratch[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        fully_masked, fully_visible = _tile_classes(
            qi, ki, block_q, block_k, kv_len - q_len
        )

        @pl.when(fully_visible)
        def _clear():
            body(False)

        @pl.when(~fully_masked & ~fully_visible)
        def _diag():
            body(True)
    else:
        body(False)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,  # (block_k, D) f32
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def body(masked):
        q = q_ref[0]  # (block_q, D)
        k = k_ref[0]  # (block_k, D)
        s = _scaled(jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), scale)
        if varlen:
            s = s + _tail_bias(ki, block_q, block_k, klen_ref[pl.program_id(0), 0])
        elif kv_pad:
            s = s + _tail_bias(ki, block_q, block_k, kv_len)
        if masked:
            s = jnp.where(
                _causal_mask(qi, ki, block_q, block_k, kv_len - q_len), s, NEG_INF
            )
        lse = jnp.maximum(lse_ref[0][:, :1], NEG_INF * 0.5)
        p = jnp.exp(s - lse).astype(do_ref.dtype)  # (block_q, block_k)
        do = do_ref[0]
        dv_scratch[:] += jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = _scaled(p.astype(jnp.float32) * (dp - delta_ref[0][:, :1]), scale).astype(
            q.dtype
        )  # (block_q, block_k)
        dk_scratch[:] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        fully_masked, fully_visible = _tile_classes(
            qi, ki, block_q, block_k, kv_len - q_len
        )

        @pl.when(fully_visible)
        def _clear():
            body(False)

        @pl.when(~fully_masked & ~fully_visible)
        def _diag():
            body(True)
    else:
        body(False)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_flat(qb, kb, vb, do, lse, delta, klen, *, scale, causal, block_q,
              block_k, kv_len, q_len, varlen):
    from jax.experimental.pallas import tpu as pltpu

    BH, Lq_p, D = qb.shape
    Lk_p = kb.shape[1]
    kwargs = dict(
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, q_len=q_len, kv_pad=Lk_p != kv_len, varlen=varlen,
    )

    if Lq_p == block_q and Lk_p == block_k:
        return pl.pallas_call(
            functools.partial(_bwd_kernel_single, **kwargs),
            out_shape=(
                jax.ShapeDtypeStruct((BH, Lq_p, D), qb.dtype),
                jax.ShapeDtypeStruct((BH, Lk_p, D), kb.dtype),
                jax.ShapeDtypeStruct((BH, Lk_p, D), vb.dtype),
            ),
            grid=(BH,),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, D), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh: (bh, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, D), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh: (bh, 0, 0)),
            ),
            compiler_params=_compiler_params("parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)

    if Lk_p == block_k:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel_single, **kwargs),
            out_shape=jax.ShapeDtypeStruct((BH, Lq_p, D), qb.dtype),
            grid=(BH, Lq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
            compiler_params=_compiler_params("parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)
    else:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, **kwargs),
            out_shape=jax.ShapeDtypeStruct((BH, Lq_p, D), qb.dtype),
            grid=(BH, Lq_p // block_q, Lk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, qi, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, qi, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
            compiler_params=_compiler_params("parallel", "parallel", "arbitrary"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)

    dkv_out_shape = (
        jax.ShapeDtypeStruct((BH, Lk_p, D), kb.dtype),
        jax.ShapeDtypeStruct((BH, Lk_p, D), vb.dtype),
    )
    if Lq_p == block_q:
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel_single, **kwargs),
            out_shape=dkv_out_shape,
            grid=(BH, Lk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_q, D), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0)),
            ),
            compiler_params=_compiler_params("parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)
    else:
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel, **kwargs),
            out_shape=dkv_out_shape,
            grid=(BH, Lk_p // block_k, Lq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, ki, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0)),
                pl.BlockSpec((1, block_q, D), lambda bh, ki, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, ki, qi: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda bh, ki, qi: (bh, qi, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, D), lambda bh, ki, qi: (bh, ki, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
            compiler_params=_compiler_params("parallel", "parallel", "arbitrary"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry. The custom VJP boundary sits at the flat (B, L, H*D) level
# so autodiff residuals are the unpadded packed arrays: saving the kernel
# operands in (B*H, L, D) head-split form costs 2x HBM at head_dim 64 (the
# minor dim pads to the 128-lane tile — seen in an HBM OOM dump at
# cruller_large scale) and similarly 16x for 8-lane lse rows. The backward
# redoes the cheap head-split transposes instead.
# ---------------------------------------------------------------------------


def _split_heads(xf, H, L_p):
    """(B, L, H*D) -> padded (B*H, L_p, D)."""
    B, L, HD = xf.shape
    D = HD // H
    x = _pad_to(xf.reshape(B, L, H, D), L_p, 1)
    return x.transpose(0, 2, 1, 3).reshape(B * H, L_p, D)


def _merge_heads(xb, B, H, Lq):
    """(B*H, L_p, D) -> (B, Lq, H*D)."""
    BH, L_p, D = xb.shape
    x = xb.reshape(B, H, L_p, D).transpose(0, 2, 1, 3)[:, :Lq]
    return x.reshape(B, Lq, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_packed(qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen):
    o, *_ = _flash_packed_fwd(
        qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen
    )
    return o


def _expand_klen(kv_lens, B, H):
    """(B,) int32 -> (B*H, 1) per-grid-row key lengths."""
    return jnp.repeat(kv_lens.astype(jnp.int32), H)[:, None]


def _flash_packed_fwd(qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen):
    B, Lq, HD = qf.shape
    Lk = kf.shape[1]
    Lq_p = ((Lq + block_q - 1) // block_q) * block_q
    Lk_p = ((Lk + block_k - 1) // block_k) * block_k
    qb = _split_heads(qf, H, Lq_p)
    kb = _split_heads(kf, H, Lk_p)
    vb = _split_heads(vf, H, Lk_p)
    o, lse = _fwd_flat(
        qb, kb, vb, _expand_klen(kv_lens, B, H),
        scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=Lk, q_len=Lq, varlen=varlen,
        out_dtype=qb.dtype,
    )
    of = _merge_heads(o, B, H, Lq)
    return of, (qf, kf, vf, kv_lens, of, lse[:, :, 0])


def _flash_packed_vjp_fwd(qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen):
    of, res = _flash_packed_fwd(
        qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen
    )
    return of, res


def _flash_packed_vjp_bwd(H, scale, causal, block_q, block_k, varlen, res, dof):
    import numpy as np

    qf, kf, vf, kv_lens, of, lse2 = res
    B, Lq, HD = qf.shape
    D = HD // H
    Lk = kf.shape[1]
    Lq_p = ((Lq + block_q - 1) // block_q) * block_q
    Lk_p = ((Lk + block_k - 1) // block_k) * block_k

    qb = _split_heads(qf, H, Lq_p)
    kb = _split_heads(kf, H, Lk_p)
    vb = _split_heads(vf, H, Lk_p)
    dob = _split_heads(dof, H, Lq_p)
    # delta in the packed layout (one fused XLA pass), then head-split
    d = (dof.astype(jnp.float32) * of.astype(jnp.float32)).reshape(
        B, Lq, H, D
    ).sum(-1)  # (B, Lq, H)
    d = _pad_to(d, Lq_p, 1).transpose(0, 2, 1).reshape(B * H, Lq_p)
    delta = jnp.broadcast_to(d[:, :, None], (B * H, Lq_p, STAT_LANES))
    lse = jnp.broadcast_to(lse2[:, :, None], (*lse2.shape, STAT_LANES))
    dq, dk, dv = _bwd_flat(
        qb, kb, vb, dob, lse, delta, _expand_klen(kv_lens, B, H),
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, q_len=Lq, varlen=varlen,
    )
    d_lens = np.zeros(kv_lens.shape, dtype=jax.dtypes.float0)
    return (
        _merge_heads(dq, B, H, Lq),
        _merge_heads(dk, B, H, Lk),
        _merge_heads(dv, B, H, Lk),
        d_lens,
    )


_flash_packed.defvjp(_flash_packed_vjp_fwd, _flash_packed_vjp_bwd)


def _flash_local(q, k, v, kv_lens=None, *, causal, block_q, block_k):
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    scale = D ** -0.5

    block_q = min(block_q, max(LANES, Lq))
    block_k = min(block_k, max(LANES, Lk))
    # prefer the single-k-block fast path when the key length would
    # otherwise span multiple blocks (it skips the online-softmax machinery
    # and the padded tail tiles: L=2509 over 3 x 1024 blocks pads 22%); cap
    # the q block so the (block_q, block_k) fp32 score tile stays in VMEM.
    # Lengths already covered by one block (every cruller_base site) are
    # left untouched.
    Lk_r = ((Lk + LANES - 1) // LANES) * LANES
    if -(-Lk // block_k) > 1 and Lk_r <= 2560:
        block_k = Lk_r
        block_q = min(block_q, 512)
        # a 640-row q block measured ~5% faster than 512 at the ViT-L shape
        # (fewer grid steps, same VMEM residency) — take it when it pads Lq
        # no worse than 512 does (2509 -> 2560 either way)
        if block_q == 512 and -(-Lq // 640) * 640 <= -(-Lq // 512) * 512:
            block_q = 640

    # fold a power-of-two softmax scale into q before the kernels: bit-exact
    # (exponent shift; head_dim 64 -> scale 2**-3 everywhere today), removes
    # a full VPU pass over the f32 score tile in fwd AND both backwards, and
    # autodiff scales the dq cotangent back for free since the multiply sits
    # outside the custom_vjp
    if scale != 1.0 and _pow2(scale):
        q = q * jnp.asarray(scale, q.dtype)
        scale = 1.0

    varlen = kv_lens is not None
    if not varlen:
        kv_lens = jnp.zeros((B,), jnp.int32)  # unused operand placeholder
    out = _flash_packed(
        q.reshape(B, Lq, H * D), k.reshape(B, Lk, H * D),
        v.reshape(B, Lk, H * D), kv_lens, H, scale, causal, block_q, block_k,
        varlen,
    )
    return out.reshape(B, Lq, H, D)


def ambient_mesh():
    """The mesh installed by the enclosing ``with mesh:`` block, if any —
    visible during jit tracing, which is when kernels are dispatched."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty and m.size > 1:
            return m
    except Exception:  # pragma: no cover - jax internals moved
        # a silent None here would push >1-device dispatch onto the bare
        # pallas-under-pjit path, which the SPMD partitioner REPLICATES
        # (full-batch all-gather per chip) — surface it instead
        if len(jax.devices()) > 1:
            _logger.warning(
                "flash attention mesh detection failed (jax internals moved?) "
                "with %d devices visible; kernels may run replicated under "
                "pjit — check jax._src.mesh.thread_resources",
                len(jax.devices()),
            )
        return None
    return None


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def flash_attention(
    q: jax.Array,  # (B, Lq, H, D)
    k: jax.Array,  # (B, Lk, H, D)
    v: jax.Array,  # (B, Lk, H, D)
    causal: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    kv_lens: "jax.Array | None" = None,  # (B,) valid key count per sample
) -> jax.Array:
    """Flash attention; under a multi-device mesh the kernel runs per-shard
    via shard_map (batch over (data, fsdp), heads over model). XLA's SPMD
    partitioner cannot see inside a custom call, so a bare pallas_call under
    pjit is replicated: every chip all-gathers the full batch and computes
    redundantly (verified in compiled HLO on an 8-device mesh).

    ``kv_lens``: per-sample count of valid (leading) key positions — packed
    variable-length keys as produced by the pix2struct patchifier; positions
    >= the length are masked out of the softmax."""
    B, _, H, _ = q.shape
    if causal and kv_lens is not None and q.shape[1] != k.shape[1]:
        # the causal diagonal composes with the GLOBAL offset Lk - Lq, not
        # per-sample lengths; with varlen keys and Lq != Lk the bottom-right
        # alignment would diverge from a per-sample-aligned reference
        raise ValueError(
            "causal=True with kv_lens requires Lq == Lk "
            f"(got Lq={q.shape[1]}, Lk={k.shape[1]})"
        )
    mesh = ambient_mesh()
    fn = functools.partial(
        _flash_local, causal=causal, block_q=block_q, block_k=block_k
    )
    if mesh is not None and {"data", "fsdp", "model"} <= set(mesh.axis_names):
        from jax.sharding import PartitionSpec as P

        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_batch = sizes["data"] * sizes["fsdp"]
        if B % n_batch == 0 and H % sizes["model"] == 0:
            spec = P(("data", "fsdp"), None, "model", None)
            if kv_lens is None:
                return jax.shard_map(
                    fn, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec,
                    check_vma=False,  # pallas outputs carry no vma metadata
                )(q, k, v)
            return jax.shard_map(
                fn, mesh=mesh,
                in_specs=(spec, spec, spec, P(("data", "fsdp"))),
                out_specs=spec,
                check_vma=False,
            )(q, k, v, kv_lens)
    return fn(q, k, v, kv_lens)
