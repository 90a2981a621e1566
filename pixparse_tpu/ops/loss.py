"""Loss functions.

Parity: the reference trains with ``nn.CrossEntropyLoss(ignore_index=-100)``
over flattened logits (``task_cruller_pretrain.py:247-257``); here the same
mean-over-valid-tokens cross entropy, computed in fp32 regardless of compute
dtype.

Three implementations of the tied-head CE from decoder hidden states:

- :func:`cross_entropy_loss` — plain XLA over materialized logits (tests,
  tiny models).
- :func:`chunked_cross_entropy_from_hidden` — XLA scan over sequence chunks
  under remat; logits never exist at full (B, L, V).
- :func:`fused_cross_entropy_from_hidden` — Pallas TPU kernels: the logits
  never exist in HBM at ALL. The forward streams vocab blocks through VMEM
  keeping only running (max, sumexp, target-logit) rows; the backward
  recomputes each logits tile once and feeds both grad matmuls in-kernel.
  On a v5e cruller_base step this replaced ~72 ms of chunked-scan time
  (dominated by 411 MB fp32 logit-chunk HBM round trips) with ~30 ms.

:func:`cross_entropy_from_hidden` dispatches: fused on TPU, chunked
elsewhere (the Pallas interpreter is too slow for the vocab loop on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pixparse_tpu.ops.flash_attention import (  # shared kernel conventions
    NEG_INF,
    STAT_LANES as _STAT_LANES,
    _interpret,
)

IGNORE_ID = -100


def cross_entropy_loss(
    logits: jax.Array,  # (..., V)
    targets: jax.Array,  # (...), int ids with IGNORE_ID masked out
    ignore_id: int = IGNORE_ID,
):
    """Mean CE over non-ignored targets. Returns (loss, num_valid)."""
    logits = logits.astype(jnp.float32)
    valid = targets != ignore_id
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    ).squeeze(-1)
    nll = (logz - true_logit) * valid
    num_valid = jnp.maximum(valid.sum(), 1)
    return nll.sum() / num_valid, valid.sum()


def chunked_cross_entropy_from_hidden(
    hidden: jax.Array,  # (B, L, D) decoder output (pre-head)
    embedding: jax.Array,  # (V, D) tied LM-head table
    targets: jax.Array,  # (B, L) int ids with IGNORE_ID masked out
    ignore_id: int = IGNORE_ID,
    chunk_size: int = 128,
):
    """Memory-frugal tied-head CE: logits are computed per sequence chunk
    under rematerialization, so the full (B, L, V) logits tensor never
    exists in HBM.

    Motivation: at cruller_base scale the fp32 logits for (B=32, L=1023,
    V=50265) alone are 6+ GB — the dominant train-step allocation (measured
    via an XLA OOM dump on v5e). Chunking trades one extra head matmul in the
    backward pass (the chunk recompute) for an L/chunk_size memory reduction.

    Returns (loss, num_valid) like :func:`cross_entropy_loss`.
    """
    B, L, D = hidden.shape
    pad = (-L) % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)), constant_values=ignore_id)
    n_chunks = (L + pad) // chunk_size
    hidden = hidden.reshape(B, n_chunks, chunk_size, D).swapaxes(0, 1)
    targets = targets.reshape(B, n_chunks, chunk_size).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_nll(h, t):
        logits = jax.lax.dot_general(
            h, embedding,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, chunk, V) fp32 — lives only inside this chunk
        valid = t != ignore_id
        safe_t = jnp.where(valid, t, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        true_logit = jnp.take_along_axis(logits, safe_t[..., None], axis=-1)[..., 0]
        return ((logz - true_logit) * valid).sum(), valid.sum()

    def scan_body(carry, xs):
        nll_sum, n_valid = carry
        h, t = xs
        s, v = chunk_nll(h, t)
        return (nll_sum + s, n_valid + v), None

    (nll_sum, n_valid), _ = jax.lax.scan(
        scan_body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hidden, targets),
    )
    return nll_sum / jnp.maximum(n_valid, 1), n_valid


# ---------------------------------------------------------------------------
# Pallas fused tied-head CE (TPU)
# ---------------------------------------------------------------------------
#
# Layout: tokens flattened to (T, D); vocab-block loop is the OUTER grid dim
# so the embedding table streams through VMEM exactly once per pass while the
# per-token softmax stats (running max / sumexp / target logit) persist in a
# small (T, 8) scratch. A token-inner loop with vocab outer would instead
# re-stream the whole table once per token block (~5 GB of HBM traffic at
# cruller_base scale).


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    # both grid dims carry cross-step scratch state -> sequential; the
    # default 16 MB scoped-vmem limit is too small for the double-buffered
    # embedding blocks + dh accumulator (v5e has 128 MB VMEM)
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _ce_fwd_kernel(
    h_ref,  # (block_t, D)
    e_ref,  # (block_v, D)
    t_ref,  # (block_t, 1) int32
    vlim_ref,  # (1, 1) int32: local count of valid vocab rows
    lse_ref,  # (block_t, STAT)
    tgt_ref,  # (block_t, STAT)
    m_scr, l_scr, tl_scr,  # (T_p, STAT) f32 — persist across vocab blocks
    *, block_t, block_v, v_pad,
):
    from jax.experimental import pallas as pl

    vi = pl.program_id(0)
    ti = pl.program_id(1)
    nv = pl.num_programs(0)
    rows = pl.ds(ti * block_t, block_t)

    @pl.when(vi == 0)
    def _init():
        m_scr[rows] = jnp.full((block_t, _STAT_LANES), NEG_INF, jnp.float32)
        l_scr[rows] = jnp.zeros((block_t, _STAT_LANES), jnp.float32)
        tl_scr[rows] = jnp.zeros((block_t, _STAT_LANES), jnp.float32)

    s = jax.lax.dot_general(
        h_ref[...], e_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_t, block_v)
    if v_pad:
        tail = vi * block_v + jax.lax.broadcasted_iota(jnp.int32, (1, block_v), 1)
        s = s + jnp.where(tail < vlim_ref[0, 0], 0.0, NEG_INF)

    m_prev = m_scr[rows][:, :1]
    l_prev = l_scr[rows][:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p_sum = jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p_sum

    # target logit: the target falls in exactly one vocab block
    col = vi * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_t, block_v), 1)
    hit = col == t_ref[...][:, :1]
    tl_cur = jnp.sum(jnp.where(hit, s, 0.0), axis=1, keepdims=True)
    tl_new = tl_scr[rows][:, :1] + tl_cur

    m_scr[rows] = jnp.broadcast_to(m_new, (block_t, _STAT_LANES))
    l_scr[rows] = jnp.broadcast_to(l_new, (block_t, _STAT_LANES))
    tl_scr[rows] = jnp.broadcast_to(tl_new, (block_t, _STAT_LANES))

    @pl.when(vi == nv - 1)
    def _finalize():
        l = l_new
        safe_l = jnp.where(l == 0.0, 1.0, l)
        lse = jnp.where(l > 0.0, m_new + jnp.log(safe_l), NEG_INF)
        lse_ref[...] = jnp.broadcast_to(lse, (block_t, _STAT_LANES))
        tgt_ref[...] = jnp.broadcast_to(tl_new, (block_t, _STAT_LANES))


def _ce_fwd_pallas(h2, e, t2, vlim, *, v_pad, block_t, block_v):
    """h2 (T_p, D) bf16, e (V_p, D), t2 (T_p, 1) int32, vlim (1, 1) int32
    -> lse, tgt (T_p, STAT) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T_p, D = h2.shape
    V_p = e.shape[0]
    grid = (V_p // block_v, T_p // block_t)
    return pl.pallas_call(
        functools.partial(
            _ce_fwd_kernel, block_t=block_t, block_v=block_v, v_pad=v_pad,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_p, _STAT_LANES), jnp.float32),
            jax.ShapeDtypeStruct((T_p, _STAT_LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, D), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((block_v, D), lambda vi, ti: (vi, 0)),
            pl.BlockSpec((block_t, 1), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((1, 1), lambda vi, ti: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_t, _STAT_LANES), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((block_t, _STAT_LANES), lambda vi, ti: (ti, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((T_p, _STAT_LANES), jnp.float32),
            pltpu.VMEM((T_p, _STAT_LANES), jnp.float32),
            pltpu.VMEM((T_p, _STAT_LANES), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(h2, e, t2, vlim)


def _ce_bwd_kernel(
    h_ref,  # (block_t, D)
    e_ref,  # (block_v, D)
    t_ref,  # (block_t, 1) int32
    lse_ref,  # (block_t, STAT) f32
    coef_ref,  # (block_t, STAT) f32: d(loss)/d(nll_token), 0 for invalid
    vlim_ref,  # (1, 1) int32: local count of valid vocab rows
    dh_ref,  # (block_t, D)
    de_ref,  # (block_v, D)
    dh_scr,  # (C, D) f32 — persists across vocab blocks
    de_scr,  # (block_v, D) f32 — per vocab block, accumulated over tokens
    *, block_t, block_v, v_pad,
):
    from jax.experimental import pallas as pl

    vi = pl.program_id(0)
    ti = pl.program_id(1)
    nv = pl.num_programs(0)
    nt = pl.num_programs(1)
    rows = pl.ds(ti * block_t, block_t)

    @pl.when(vi == 0)
    def _init_dh():
        dh_scr[rows] = jnp.zeros((block_t, dh_scr.shape[1]), jnp.float32)

    @pl.when(ti == 0)
    def _init_de():
        de_scr[...] = jnp.zeros_like(de_scr)

    h = h_ref[...]
    e = e_ref[...]
    s = jax.lax.dot_general(
        h, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if v_pad:
        tail = vi * block_v + jax.lax.broadcasted_iota(jnp.int32, (1, block_v), 1)
        s = s + jnp.where(tail < vlim_ref[0, 0], 0.0, NEG_INF)
    # clamp keeps padded/fully-masked rows at p == 0 instead of inf
    lse = jnp.maximum(lse_ref[...][:, :1], NEG_INF * 0.5)
    p = jnp.exp(s - lse)
    col = vi * block_v + jax.lax.broadcasted_iota(jnp.int32, (block_t, block_v), 1)
    onehot = (col == t_ref[...][:, :1]).astype(jnp.float32)
    g = ((p - onehot) * coef_ref[...][:, :1]).astype(h.dtype)  # (block_t, block_v)

    dh_scr[rows] += jax.lax.dot_general(
        g, e, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    de_scr[...] += jax.lax.dot_general(
        g, h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(vi == nv - 1)
    def _write_dh():
        dh_ref[...] = dh_scr[rows].astype(dh_ref.dtype)

    @pl.when(ti == nt - 1)
    def _write_de():
        de_ref[...] = de_scr[...].astype(de_ref.dtype)


def _ce_bwd_pallas(h2, e, t2, lse, coef, vlim, *, v_pad, block_t, block_v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T_p, D = h2.shape
    V_p = e.shape[0]
    grid = (V_p // block_v, T_p // block_t)
    return pl.pallas_call(
        functools.partial(
            _ce_bwd_kernel, block_t=block_t, block_v=block_v, v_pad=v_pad,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_p, D), h2.dtype),
            jax.ShapeDtypeStruct((V_p, D), e.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, D), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((block_v, D), lambda vi, ti: (vi, 0)),
            pl.BlockSpec((block_t, 1), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((block_t, _STAT_LANES), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((block_t, _STAT_LANES), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((1, 1), lambda vi, ti: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_t, D), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((block_v, D), lambda vi, ti: (vi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((T_p, D), jnp.float32),
            pltpu.VMEM((block_v, D), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(h2, e, t2, lse, coef, vlim)


# backward dh scratch budget: (T_chunk, D) f32 must stay well under VMEM;
# chunk the token dim at the XLA level when T is large (a python loop of
# kernel calls — dE partials are summed in fp32 outside). Each extra chunk
# costs one full embedding re-stream plus one (V, D) f32 dE partial
# write+read, so LONGER chunks trade VMEM pressure for HBM traffic:
# PIXPARSE_CE_BWD_CHUNK overrides the default (opt-in; the fp32 dE partial
# summation order changes, so grads move at reassociation noise —
# tests/test_fused_ce.py pins the delta).
_BWD_TOKEN_CHUNK = 4096


def _bwd_token_chunk() -> int:
    import os

    return int(os.environ.get("PIXPARSE_CE_BWD_CHUNK", _BWD_TOKEN_CHUNK))



# The custom_vjp sits OUTSIDE shard_map: its forward and backward each invoke
# shard_map as a plain (non-differentiated) computation, so only shard_map's
# well-defined forward assembly semantics are relied on — differentiating
# THROUGH a check_vma=False shard_map hands each shard ambiguous fractions of
# replicated cotangents (measured 1/n_devices scaling). Inside each shard the
# math is Megatron-style vocab-parallel: local kernels produce per-shard
# (lse, target logit), two small collectives over the model axis combine
# them; the backward psums dh over the model axis (partial vocab
# contributions) and de over the batch axes (partial token contributions).

_BATCH_AXES = ("data", "fsdp")
_VOCAB_AXIS = "model"


def _fused_ce_shapes(T, V, D, block_t, block_v):
    block_t = min(block_t, _round_up(T, 8))
    block_v = min(block_v, _round_up(V, 128))
    return _round_up(T, block_t), _round_up(V, block_v), block_t, block_v


def _pad_vocab(embedding, V_p):
    V = embedding.shape[0]
    if V_p != V:
        return jnp.pad(embedding, ((0, V_p - V), (0, 0)))
    return embedding


def _prep_tokens(hidden, targets, ignore_id, block_t, block_v, Vs):
    """Flatten/pad tokens; returns (h2, t2, valid_p, T_p, block_t, block_v)."""
    B, L, D = hidden.shape
    T = B * L
    T_p, _, block_t, block_v = _fused_ce_shapes(T, Vs, D, block_t, block_v)
    h2 = hidden.reshape(T, D)
    t1 = targets.reshape(T)
    valid = t1 != ignore_id
    # padded/ignored rows get target -1: matches no vocab column
    t_safe = jnp.where(valid, t1, -1).astype(jnp.int32)
    if T_p != T:
        h2 = jnp.pad(h2, ((0, T_p - T), (0, 0)))
        t_safe = jnp.pad(t_safe, (0, T_p - T), constant_values=-1)
        valid_p = jnp.pad(valid, (0, T_p - T))
    else:
        valid_p = valid
    return h2, t_safe[:, None], valid_p, T_p, block_t, block_v


def _local_vocab(embedding, vocab_total, sharded):
    """Per-shard vocab limit + shifted targets offset; embedding already
    padded to the block grid."""
    Vs = embedding.shape[0]
    if sharded:
        offset = jax.lax.axis_index(_VOCAB_AXIS).astype(jnp.int32) * Vs
        vlim = jnp.clip(vocab_total - offset, 0, Vs)
        v_pad = True  # per-shard limit is dynamic
    else:
        offset = jnp.int32(0)
        vlim = jnp.asarray(min(vocab_total, Vs), jnp.int32)
        v_pad = Vs != vocab_total
    return offset, jnp.reshape(vlim, (1, 1)), v_pad


def _ce_fwd_local(hidden, embedding, targets, *, vocab_total, ignore_id,
                  block_t, block_v, sharded):
    """Per-shard forward: (nll (B, L), lse (B, L, STAT)). embedding must
    already be padded to a block_v multiple."""
    B, L, D = hidden.shape
    h2, t2, valid_p, T_p, block_t, block_v = _prep_tokens(
        hidden, targets, ignore_id, block_t, block_v, embedding.shape[0]
    )
    offset, vlim2, v_pad = _local_vocab(embedding, vocab_total, sharded)
    t2 = jnp.where(t2 >= 0, t2 - offset, t2)
    lse, tgt = _ce_fwd_pallas(
        h2, embedding, t2, vlim2, v_pad=v_pad, block_t=block_t, block_v=block_v
    )
    if sharded:
        # combine per-shard softmax stats: global lse and target logit
        m = jax.lax.pmax(lse, _VOCAB_AXIS)
        contrib = jnp.where(lse > NEG_INF * 0.5, jnp.exp(lse - m), 0.0)
        lse = m + jnp.log(jax.lax.psum(contrib, _VOCAB_AXIS))
        tgt = jax.lax.psum(tgt, _VOCAB_AXIS)
    T = B * L
    nll = ((lse[:, 0] - tgt[:, 0]) * valid_p)[:T].reshape(B, L)
    lse_out = lse[:T].reshape(B, L, _STAT_LANES)
    return nll, lse_out


def _ce_bwd_local(hidden, embedding, targets, lse, g_nll, *, vocab_total,
                  ignore_id, block_t, block_v, sharded):
    """Per-shard backward: (dh (B, L, D), de (Vs, D))."""
    B, L, D = hidden.shape
    h2, t2, valid_p, T_p, block_t, block_v = _prep_tokens(
        hidden, targets, ignore_id, block_t, block_v, embedding.shape[0]
    )
    offset, vlim2, v_pad = _local_vocab(embedding, vocab_total, sharded)
    t2 = jnp.where(t2 >= 0, t2 - offset, t2)

    T = B * L
    lse2 = lse.reshape(T, _STAT_LANES)
    g1 = g_nll.reshape(T).astype(jnp.float32)
    if T_p != T:
        # pad lse with 0 (NOT -inf): padded rows have h == 0 so s == 0 and
        # p = exp(0) stays finite; their coef is 0 so they contribute nothing.
        # A -inf pad would make p = exp(+inf) and 0 * inf = NaN in de.
        lse2 = jnp.pad(lse2, ((0, T_p - T), (0, 0)))
        g1 = jnp.pad(g1, (0, T_p - T))
    coef1 = jnp.where(valid_p, g1, 0.0)
    coef = jnp.broadcast_to(coef1[:, None], (T_p, _STAT_LANES))

    chunk = _round_up(min(_bwd_token_chunk(), T_p), block_t)
    dh_parts, de_acc = [], None
    for lo in range(0, T_p, chunk):
        hi = min(lo + chunk, T_p)
        dh_c, de_c = _ce_bwd_pallas(
            h2[lo:hi], embedding, t2[lo:hi], lse2[lo:hi], coef[lo:hi], vlim2,
            v_pad=v_pad, block_t=block_t, block_v=block_v,
        )
        dh_parts.append(dh_c)
        de_c = de_c.astype(jnp.float32)
        de_acc = de_c if de_acc is None else de_acc + de_c

    dh = jnp.concatenate(dh_parts, axis=0) if len(dh_parts) > 1 else dh_parts[0]
    dh = dh[:T].reshape(B, L, D)
    de = de_acc.astype(embedding.dtype)
    if sharded:
        # dh: partial over this vocab shard; de: partial over this batch shard
        dh = jax.lax.psum(dh, _VOCAB_AXIS)
        de = jax.lax.psum(de, _BATCH_AXES)
    return dh, de


def _ce_mesh():
    """(mesh, n_batch_shards, n_vocab_shards) when a usable mesh is ambient."""
    from pixparse_tpu.ops.flash_attention import ambient_mesh

    mesh = ambient_mesh()
    if mesh is None or not ({"data", "fsdp", "model"} <= set(mesh.axis_names)):
        return None, 1, 1
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return mesh, sizes["data"] * sizes["fsdp"], sizes["model"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_ce_tokens(hidden, embedding, targets, ignore_id, block_t, block_v):
    """Per-token nll (B, L) f32; embedding is the raw (V, D) table."""
    nll, _ = _fused_ce_tokens_fwd(
        hidden, embedding, targets, ignore_id, block_t, block_v
    )[0]
    return nll


def _fused_ce_tokens_fwd(hidden, embedding, targets, ignore_id, block_t, block_v):
    from jax.sharding import PartitionSpec as P

    B, L, D = hidden.shape
    V = embedding.shape[0]
    mesh, n_batch, n_vocab = _ce_mesh()
    sharded = mesh is not None and B % n_batch == 0
    if sharded:
        vs_raw = -(-V // n_vocab)
        block_v_eff = min(block_v, _round_up(vs_raw, 128))
        e = _pad_vocab(embedding, _round_up(vs_raw, block_v_eff) * n_vocab)
        fn = functools.partial(
            _ce_fwd_local, vocab_total=V, ignore_id=ignore_id,
            block_t=block_t, block_v=block_v, sharded=True,
        )
        nll, lse = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(
                P(_BATCH_AXES, None, None),
                P(_VOCAB_AXIS, None),
                P(_BATCH_AXES, None),
            ),
            out_specs=(P(_BATCH_AXES, None), P(_BATCH_AXES, None, None)),
            check_vma=False,  # pallas outputs carry no vma metadata
        )(hidden, e, targets)
    else:
        Vs_p = _fused_ce_shapes(B * L, V, D, block_t, block_v)[1]
        e = _pad_vocab(embedding, Vs_p)
        nll, lse = _ce_fwd_local(
            hidden, e, targets, vocab_total=V, ignore_id=ignore_id,
            block_t=block_t, block_v=block_v, sharded=False,
        )
    return (nll, lse), (hidden, embedding, targets, lse)


def _fused_ce_tokens_vjp_fwd(hidden, embedding, targets, ignore_id, block_t, block_v):
    (nll, lse), res = _fused_ce_tokens_fwd(
        hidden, embedding, targets, ignore_id, block_t, block_v
    )
    return nll, res


def _fused_ce_tokens_vjp_bwd(ignore_id, block_t, block_v, res, g_nll):
    from jax.sharding import PartitionSpec as P

    hidden, embedding, targets, lse = res
    B, L, D = hidden.shape
    V = embedding.shape[0]
    mesh, n_batch, n_vocab = _ce_mesh()
    sharded = mesh is not None and B % n_batch == 0
    if sharded:
        vs_raw = -(-V // n_vocab)
        block_v_eff = min(block_v, _round_up(vs_raw, 128))
        V_p = _round_up(vs_raw, block_v_eff) * n_vocab
        e = _pad_vocab(embedding, V_p)
        fn = functools.partial(
            _ce_bwd_local, vocab_total=V, ignore_id=ignore_id,
            block_t=block_t, block_v=block_v, sharded=True,
        )
        dh, de = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(
                P(_BATCH_AXES, None, None),
                P(_VOCAB_AXIS, None),
                P(_BATCH_AXES, None),
                P(_BATCH_AXES, None, None),
                P(_BATCH_AXES, None),
            ),
            out_specs=(P(_BATCH_AXES, None, None), P(_VOCAB_AXIS, None)),
            check_vma=False,
        )(hidden, e, targets, lse, g_nll)
        de = de[:V]
    else:
        Vs_p = _fused_ce_shapes(B * L, V, D, block_t, block_v)[1]
        e = _pad_vocab(embedding, Vs_p)
        dh, de = _ce_bwd_local(
            hidden, e, targets, lse, g_nll, vocab_total=V, ignore_id=ignore_id,
            block_t=block_t, block_v=block_v, sharded=False,
        )
        de = de[:V]
    d_targets = np.zeros((B, L), dtype=jax.dtypes.float0)
    return dh.astype(hidden.dtype), de, d_targets


_fused_ce_tokens.defvjp(_fused_ce_tokens_vjp_fwd, _fused_ce_tokens_vjp_bwd)


def fused_cross_entropy_from_hidden(
    hidden: jax.Array,  # (B, L, D)
    embedding: jax.Array,  # (V, D) tied LM-head table
    targets: jax.Array,  # (B, L) int ids with IGNORE_ID masked out
    ignore_id: int = IGNORE_ID,
    block_t: int = 256,
    block_v: int = 4096,
):
    """Pallas fused tied-head CE. Returns (loss, num_valid) like
    :func:`cross_entropy_loss`; logits never reach HBM.

    Under a multi-device mesh the computation runs vocab-parallel per shard
    via shard_map (batch over (data, fsdp), vocab over model): a bare
    pallas_call under pjit would be replicated by the SPMD partitioner —
    every chip all-gathers the full batch and computes the full vocab."""
    nll = _fused_ce_tokens(hidden, embedding, targets, ignore_id, block_t, block_v)
    n_valid = (targets != ignore_id).sum()
    return nll.sum() / jnp.maximum(n_valid, 1), n_valid


def cross_entropy_from_hidden(
    hidden: jax.Array,
    embedding: jax.Array,
    targets: jax.Array,
    ignore_id: int = IGNORE_ID,
):
    """Tied-head CE from hidden states: fused Pallas kernels on TPU, chunked
    XLA scan elsewhere (the interpreter is too slow for a real vocab loop)."""
    if jax.devices()[0].platform == "tpu":
        return fused_cross_entropy_from_hidden(hidden, embedding, targets, ignore_id)
    return chunked_cross_entropy_from_hidden(hidden, embedding, targets, ignore_id)
