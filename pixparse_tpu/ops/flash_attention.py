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
    q_ref, k_ref, v_ref,  # (1, block, hp*d) — hp heads packed in the lanes
    klen_ref,  # (Bg, 1) int32 per-sample key length (varlen only, SMEM)
    o_ref,  # (1, block_q, hp*d)
    lse_ref,  # (1, 1, block_q, hp*STAT_LANES)
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    """One k-block covers the full key length: plain softmax, no scratch.

    Packed layout: q/k/v stay in the projection's natural (B, L, H*D) form;
    each block carries ``hp = 128 // D`` whole heads side by side in the
    lanes (grid dim 1 walks head groups), so NO head-split transpose ever
    materializes in HBM (at head_dim 64 those copies were ~16% of the eval
    encode). ``hp == 1`` with a (B*H, L, D) array is the legacy split
    layout for head dims that don't pack into 128 lanes."""
    qi = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(hp):
        hs = slice(h * d, (h + 1) * d)
        s = _scaled(jax.lax.dot_general(
            q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
        p = jnp.exp(s - m).astype(v.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        live = (l > 0.0) & ~dead
        safe_l = jnp.where(live, l, 1.0)
        o = jax.lax.dot_general(
            p, v[:, hs], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, hs] = jnp.where(live, o / safe_l, 0.0).astype(o_ref.dtype)
        lse = jnp.where(live, m + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0, :, h * STAT_LANES:(h + 1) * STAT_LANES] = (
            jnp.broadcast_to(lse, (block_q, STAT_LANES))
        )


def _fwd_kernel(
    q_ref, k_ref, v_ref,  # (1, block, hp*d)
    klen_ref,  # (Bg, 1) int32 per-sample key length (varlen only, SMEM)
    o_ref,  # (1, block_q, hp*d)
    lse_ref,  # (1, 1, block_q, hp*STAT_LANES)
    m_scratch, l_scratch,  # (block_q, hp*STAT_LANES) f32
    acc_scratch,  # (block_q, hp*d) f32
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def body(masked):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        for h in range(hp):
            hs = slice(h * d, (h + 1) * d)
            ss = slice(h * STAT_LANES, (h + 1) * STAT_LANES)
            s = _scaled(jax.lax.dot_general(
                q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
            m_prev = m_scratch[:, h * STAT_LANES:h * STAT_LANES + 1]
            l_prev = l_scratch[:, h * STAT_LANES:h * STAT_LANES + 1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            l_cur = jnp.sum(p, axis=1, keepdims=True)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + l_cur
            acc = acc_scratch[:, hs] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v[:, hs],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scratch[:, ss] = jnp.broadcast_to(m_new, (block_q, STAT_LANES))
            l_scratch[:, ss] = jnp.broadcast_to(l_new, (block_q, STAT_LANES))
            acc_scratch[:, hs] = acc

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
        for h in range(hp):
            hs = slice(h * d, (h + 1) * d)
            ss = slice(h * STAT_LANES, (h + 1) * STAT_LANES)
            l = l_scratch[:, h * STAT_LANES:h * STAT_LANES + 1]
            safe_l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, :, hs] = (acc_scratch[:, hs] / safe_l).astype(o_ref.dtype)
            # lse = m + log(l); fully-masked rows keep NEG_INF
            lse = jnp.where(
                l > 0.0,
                m_scratch[:, h * STAT_LANES:h * STAT_LANES + 1] + jnp.log(safe_l),
                NEG_INF,
            )  # (block_q, 1)
            lse_ref[0, 0, :, ss] = jnp.broadcast_to(lse, (block_q, STAT_LANES))


def _fwd_flat(qb, kb, vb, klen, *, scale, causal, block_q, block_k, kv_len,
              q_len, varlen, out_dtype, hp, d):
    """(Bg, Lq_p, G*hp*d) inputs + (Bg, 1) key lengths -> (o, lse4).

    ``Bg`` is the batch (packed layout) or batch*heads (legacy split);
    grid dim 1 walks the G head groups of hp heads each; lse rides in a
    4-D (Bg, G, Lq_p, hp*STAT_LANES) array (last dim equals the block —
    legal Mosaic tiling for the non-128 stat width)."""
    from jax.experimental.pallas import tpu as pltpu

    Bg, Lq_p, GW = qb.shape
    W = hp * d
    G = GW // W
    Lk_p = kb.shape[1]
    SLh = hp * STAT_LANES
    kwargs = dict(
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, q_len=q_len, kv_pad=Lk_p != kv_len, varlen=varlen,
        hp=hp, d=d,
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bg, Lq_p, GW), out_dtype),
        jax.ShapeDtypeStruct((Bg, G, Lq_p, SLh), jnp.float32),
    )
    if Lk_p == block_k:
        return pl.pallas_call(
            functools.partial(_fwd_kernel_single, **kwargs),
            out_shape=out_shape,
            grid=(Bg, G, Lq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, W), lambda b, g, qi: (b, qi, g)),
                pl.BlockSpec((1, block_k, W), lambda b, g, qi: (b, 0, g)),
                pl.BlockSpec((1, block_k, W), lambda b, g, qi: (b, 0, g)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, W), lambda b, g, qi: (b, qi, g)),
                pl.BlockSpec((1, 1, block_q, SLh), lambda b, g, qi: (b, g, qi, 0)),
            ),
            compiler_params=_compiler_params("parallel", "parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, klen)
    grid = (Bg, G, Lq_p // block_q, Lk_p // block_k)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, **kwargs),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, W), lambda b, g, qi, ki: (b, qi, g)),
            pl.BlockSpec((1, block_k, W), lambda b, g, qi, ki: (b, ki, g)),
            pl.BlockSpec((1, block_k, W), lambda b, g, qi, ki: (b, ki, g)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, W), lambda b, g, qi, ki: (b, qi, g)),
            pl.BlockSpec((1, 1, block_q, SLh), lambda b, g, qi, ki: (b, g, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, SLh), jnp.float32),
            pltpu.VMEM((block_q, SLh), jnp.float32),
            pltpu.VMEM((block_q, W), jnp.float32),
        ],
        compiler_params=_compiler_params(
            "parallel", "parallel", "parallel", "arbitrary"
        ),
        interpret=_interpret(),
    )(qb, kb, vb, klen)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel_single(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    """nq == nk == 1 (every cruller/donut training site): one kernel for all
    three grads — s/p/dp are computed once instead of once per dq and dk/dv
    kernel (5 matmul passes vs 7, and q/k/v/do stream from HBM once)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    for h in range(hp):
        hs = slice(h * d, (h + 1) * d)
        s = _scaled(jax.lax.dot_general(
            q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
        lse = jnp.maximum(
            lse_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1], NEG_INF * 0.5
        )
        p = jnp.exp(s - lse).astype(do.dtype)  # (block_q, block_k)
        dv_ref[0, :, hs] = jax.lax.dot_general(
            p, do[:, hs], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do[:, hs], v[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1]
        ds = _scaled(p.astype(jnp.float32) * (dp - delta), scale).astype(q.dtype)
        dq_ref[0, :, hs] = jax.lax.dot_general(
            ds, k[:, hs], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, hs] = jax.lax.dot_general(
            ds, q[:, hs], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _bwd_dq_kernel_single(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dq_ref,
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    """nk == 1: recompute p once and write dq directly, no accumulator."""
    qi = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    for h in range(hp):
        hs = slice(h * d, (h + 1) * d)
        s = _scaled(jax.lax.dot_general(
            q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
        lse = jnp.maximum(
            lse_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1], NEG_INF * 0.5
        )
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do[:, hs], v[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1]
        ds = _scaled(p * (dp - delta), scale)
        dq_ref[0, :, hs] = jax.lax.dot_general(
            ds.astype(k.dtype), k[:, hs],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)


def _bwd_dkv_kernel_single(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dk_ref, dv_ref,
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    """nq == 1: single q block, write dk/dv directly, no accumulators."""
    ki = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    for h in range(hp):
        hs = slice(h * d, (h + 1) * d)
        s = _scaled(jax.lax.dot_general(
            q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
        lse = jnp.maximum(
            lse_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1], NEG_INF * 0.5
        )
        p = jnp.exp(s - lse).astype(do.dtype)
        dv_ref[0, :, hs] = jax.lax.dot_general(
            p, do[:, hs], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do[:, hs], v[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1]
        ds = _scaled(p.astype(jnp.float32) * (dp - delta), scale).astype(q.dtype)
        dk_ref[0, :, hs] = jax.lax.dot_general(
            ds, q[:, hs], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, klen_ref,
    dq_ref,
    dq_scratch,  # (block_q, hp*d) f32
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def body(masked):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        for h in range(hp):
            hs = slice(h * d, (h + 1) * d)
            s = _scaled(jax.lax.dot_general(
                q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
            # clamp keeps fully-masked rows (lse == NEG_INF) at p == 0 instead
            # of inf, so padding can never leak NaNs into the grads
            lse = jnp.maximum(
                lse_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1], NEG_INF * 0.5
            )
            p = jnp.exp(s - lse)  # (block_q, block_k)
            dp = jax.lax.dot_general(
                do[:, hs], v[:, hs],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = delta_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1]
            ds = _scaled(p * (dp - delta), scale)
            dq_scratch[:, hs] += jax.lax.dot_general(
                ds.astype(k.dtype), k[:, hs],
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
    dk_scratch, dv_scratch,  # (block_k, hp*d) f32
    *, scale, causal, block_q, block_k, kv_len, q_len, kv_pad, varlen, hp, d,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def body(masked):
        q = q_ref[0]  # (block_q, hp*d)
        k = k_ref[0]  # (block_k, hp*d)
        v = v_ref[0]
        do = do_ref[0]
        for h in range(hp):
            hs = slice(h * d, (h + 1) * d)
            s = _scaled(jax.lax.dot_general(
                q[:, hs], k[:, hs], dimension_numbers=(((1,), (1,)), ((), ())),
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
            lse = jnp.maximum(
                lse_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1], NEG_INF * 0.5
            )
            p = jnp.exp(s - lse).astype(do.dtype)  # (block_q, block_k)
            dv_scratch[:, hs] += jax.lax.dot_general(
                p, do[:, hs], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do[:, hs], v[:, hs],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = delta_ref[0, 0][:, h * STAT_LANES:h * STAT_LANES + 1]
            ds = _scaled(p.astype(jnp.float32) * (dp - delta), scale).astype(
                q.dtype
            )  # (block_q, block_k)
            dk_scratch[:, hs] += jax.lax.dot_general(
                ds, q[:, hs], dimension_numbers=(((0,), (0,)), ((), ())),
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
              block_k, kv_len, q_len, varlen, hp, d):
    from jax.experimental.pallas import tpu as pltpu

    Bg, Lq_p, GW = qb.shape
    W = hp * d
    G = GW // W
    Lk_p = kb.shape[1]
    SLh = hp * STAT_LANES
    kwargs = dict(
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, q_len=q_len, kv_pad=Lk_p != kv_len, varlen=varlen,
        hp=hp, d=d,
    )
    qspec3 = lambda idx: pl.BlockSpec((1, block_q, W), idx)
    kspec3 = lambda idx: pl.BlockSpec((1, block_k, W), idx)
    sspec3 = lambda idx: pl.BlockSpec((1, 1, block_q, SLh), idx)

    if Lq_p == block_q and Lk_p == block_k:
        return pl.pallas_call(
            functools.partial(_bwd_kernel_single, **kwargs),
            out_shape=(
                jax.ShapeDtypeStruct((Bg, Lq_p, GW), qb.dtype),
                jax.ShapeDtypeStruct((Bg, Lk_p, GW), kb.dtype),
                jax.ShapeDtypeStruct((Bg, Lk_p, GW), vb.dtype),
            ),
            grid=(Bg, G),
            in_specs=[
                qspec3(lambda b, g: (b, 0, g)),
                kspec3(lambda b, g: (b, 0, g)),
                kspec3(lambda b, g: (b, 0, g)),
                qspec3(lambda b, g: (b, 0, g)),
                sspec3(lambda b, g: (b, g, 0, 0)),
                sspec3(lambda b, g: (b, g, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                qspec3(lambda b, g: (b, 0, g)),
                kspec3(lambda b, g: (b, 0, g)),
                kspec3(lambda b, g: (b, 0, g)),
            ),
            compiler_params=_compiler_params("parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)

    if Lk_p == block_k:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel_single, **kwargs),
            out_shape=jax.ShapeDtypeStruct((Bg, Lq_p, GW), qb.dtype),
            grid=(Bg, G, Lq_p // block_q),
            in_specs=[
                qspec3(lambda b, g, qi: (b, qi, g)),
                kspec3(lambda b, g, qi: (b, 0, g)),
                kspec3(lambda b, g, qi: (b, 0, g)),
                qspec3(lambda b, g, qi: (b, qi, g)),
                sspec3(lambda b, g, qi: (b, g, qi, 0)),
                sspec3(lambda b, g, qi: (b, g, qi, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=qspec3(lambda b, g, qi: (b, qi, g)),
            compiler_params=_compiler_params("parallel", "parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)
    else:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, **kwargs),
            out_shape=jax.ShapeDtypeStruct((Bg, Lq_p, GW), qb.dtype),
            grid=(Bg, G, Lq_p // block_q, Lk_p // block_k),
            in_specs=[
                qspec3(lambda b, g, qi, ki: (b, qi, g)),
                kspec3(lambda b, g, qi, ki: (b, ki, g)),
                kspec3(lambda b, g, qi, ki: (b, ki, g)),
                qspec3(lambda b, g, qi, ki: (b, qi, g)),
                sspec3(lambda b, g, qi, ki: (b, g, qi, 0)),
                sspec3(lambda b, g, qi, ki: (b, g, qi, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=qspec3(lambda b, g, qi, ki: (b, qi, g)),
            scratch_shapes=[pltpu.VMEM((block_q, W), jnp.float32)],
            compiler_params=_compiler_params(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)

    dkv_out_shape = (
        jax.ShapeDtypeStruct((Bg, Lk_p, GW), kb.dtype),
        jax.ShapeDtypeStruct((Bg, Lk_p, GW), vb.dtype),
    )
    if Lq_p == block_q:
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel_single, **kwargs),
            out_shape=dkv_out_shape,
            grid=(Bg, G, Lk_p // block_k),
            in_specs=[
                qspec3(lambda b, g, ki: (b, 0, g)),
                kspec3(lambda b, g, ki: (b, ki, g)),
                kspec3(lambda b, g, ki: (b, ki, g)),
                qspec3(lambda b, g, ki: (b, 0, g)),
                sspec3(lambda b, g, ki: (b, g, 0, 0)),
                sspec3(lambda b, g, ki: (b, g, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                kspec3(lambda b, g, ki: (b, ki, g)),
                kspec3(lambda b, g, ki: (b, ki, g)),
            ),
            compiler_params=_compiler_params("parallel", "parallel", "parallel"),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)
    else:
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel, **kwargs),
            out_shape=dkv_out_shape,
            grid=(Bg, G, Lk_p // block_k, Lq_p // block_q),
            in_specs=[
                qspec3(lambda b, g, ki, qi: (b, qi, g)),
                kspec3(lambda b, g, ki, qi: (b, ki, g)),
                kspec3(lambda b, g, ki, qi: (b, ki, g)),
                qspec3(lambda b, g, ki, qi: (b, qi, g)),
                sspec3(lambda b, g, ki, qi: (b, g, qi, 0)),
                sspec3(lambda b, g, ki, qi: (b, g, qi, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                kspec3(lambda b, g, ki, qi: (b, ki, g)),
                kspec3(lambda b, g, ki, qi: (b, ki, g)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, W), jnp.float32),
                pltpu.VMEM((block_k, W), jnp.float32),
            ],
            compiler_params=_compiler_params(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
            interpret=_interpret(),
        )(qb, kb, vb, do, lse, delta, klen)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry. The custom VJP boundary sits at the flat (B, L, H*D) level
# so autodiff residuals are the unpadded packed arrays. When 128 % head_dim
# == 0 and the heads divide evenly (every current model: head_dim 64), the
# kernels read hp = 128 // D whole heads per 128-lane block straight from
# the (B, L, H*D) projection layout — the head-split transpose that used to
# materialize (B*H, L, D) copies in HBM (measured ~16% of the eval encode at
# B=32) no longer exists. Other head dims fall back to the split layout.
# ---------------------------------------------------------------------------


def _heads_per_block(H: int, D: int) -> int:
    """hp = heads per 128-lane kernel block for the packed (no-transpose)
    layout; 0 when the shape can't pack (legacy split layout)."""
    if D <= LANES and LANES % D == 0 and H % (LANES // D) == 0:
        return LANES // D
    return 0


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
    D = HD // H
    Lk = kf.shape[1]
    Lq_p = ((Lq + block_q - 1) // block_q) * block_q
    Lk_p = ((Lk + block_k - 1) // block_k) * block_k
    hpb = _heads_per_block(H, D)
    if hpb:
        qb = _pad_to(qf, Lq_p, 1)
        kb = _pad_to(kf, Lk_p, 1)
        vb = _pad_to(vf, Lk_p, 1)
        klen = kv_lens.astype(jnp.int32)[:, None]
    else:
        qb = _split_heads(qf, H, Lq_p)
        kb = _split_heads(kf, H, Lk_p)
        vb = _split_heads(vf, H, Lk_p)
        klen = _expand_klen(kv_lens, B, H)
    o, lse = _fwd_flat(
        qb, kb, vb, klen,
        scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=Lk, q_len=Lq, varlen=varlen,
        out_dtype=qb.dtype, hp=max(hpb, 1), d=D,
    )
    of = o[:, :Lq] if hpb else _merge_heads(o, B, H, Lq)
    # compact per-head lse residual: (Bg, G, Lq_p, hp)
    return of, (qf, kf, vf, kv_lens, of, lse[..., ::STAT_LANES])


def _flash_packed_vjp_fwd(qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen):
    of, res = _flash_packed_fwd(
        qf, kf, vf, kv_lens, H, scale, causal, block_q, block_k, varlen
    )
    return of, res


def _flash_packed_vjp_bwd(H, scale, causal, block_q, block_k, varlen, res, dof):
    import numpy as np

    qf, kf, vf, kv_lens, of, lse4c = res
    B, Lq, HD = qf.shape
    D = HD // H
    Lk = kf.shape[1]
    Lq_p = ((Lq + block_q - 1) // block_q) * block_q
    Lk_p = ((Lk + block_k - 1) // block_k) * block_k
    hpb = _heads_per_block(H, D)

    # delta = sum(do * o) per (row, head) in one fused XLA pass
    dh = (dof.astype(jnp.float32) * of.astype(jnp.float32)).reshape(
        B, Lq, H, D
    ).sum(-1)  # (B, Lq, H)
    if hpb:
        qb = _pad_to(qf, Lq_p, 1)
        kb = _pad_to(kf, Lk_p, 1)
        vb = _pad_to(vf, Lk_p, 1)
        dob = _pad_to(dof, Lq_p, 1)
        klen = kv_lens.astype(jnp.int32)[:, None]
        # lanes pack head h = g*hp + j at [g*128 + j*D : ...], so the H axis
        # folds (G, hp) in head order; the (B, Lq, H) -> (B, G, Lq, hp) move
        # is tiny (H lanes) compared to the head-split it replaces
        d4 = _pad_to(dh, Lq_p, 1).reshape(B, Lq_p, H // hpb, hpb).transpose(0, 2, 1, 3)
    else:
        qb = _split_heads(qf, H, Lq_p)
        kb = _split_heads(kf, H, Lk_p)
        vb = _split_heads(vf, H, Lk_p)
        dob = _split_heads(dof, H, Lq_p)
        klen = _expand_klen(kv_lens, B, H)
        d4 = _pad_to(dh, Lq_p, 1).transpose(0, 2, 1).reshape(B * H, 1, Lq_p, 1)
    delta = jnp.repeat(d4, STAT_LANES, axis=-1)
    lse = jnp.repeat(lse4c, STAT_LANES, axis=-1)
    dq, dk, dv = _bwd_flat(
        qb, kb, vb, dob, lse, delta, klen,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, q_len=Lq, varlen=varlen, hp=max(hpb, 1), d=D,
    )
    d_lens = np.zeros(kv_lens.shape, dtype=jax.dtypes.float0)
    if hpb:
        out = (dq[:, :Lq], dk[:, :Lk], dv[:, :Lk], d_lens)
    else:
        out = (
            _merge_heads(dq, B, H, Lq),
            _merge_heads(dk, B, H, Lk),
            _merge_heads(dv, B, H, Lk),
            d_lens,
        )
    return out


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
