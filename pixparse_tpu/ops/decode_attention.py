"""Pallas TPU kernel for single-token (GEMV-shaped) decode attention.

The autoregressive decode loop is HBM-bandwidth-bound on reading the KV
caches every step — for cruller_base eval decode the cross-attention caches
alone are ~200 MB/step (4 layers x K+V x (16, 1009, 768) bf16). The XLA
lowering of the same computation keeps the caches in a head-split
``(B, L, H=12, D=64)`` layout whose TPU tiling pads ``(12, 64)`` sublane x
lane tiles to ``(16, 128)`` — a measured 2.67x bandwidth/footprint inflation
— and lowers QK^T to VPU multiply-reduce fusions (profiled at ~215 GB/s
effective; docs/PERF.md eval-decode section).

This kernel owns the layout instead: caches are stored flat ``(B, L, H*D)``
(768 lanes — no padding), and one grid cell per sample streams its K/V once,
computing all heads' scores, a batched softmax, and the PV reduction
in-kernel. Forward-only (decode is inference; no VJP needed).

Replaces the reference's per-step full-prefix recompute
(``utils/ocr_utils.py:165-197`` in /root/reference) at the kernel level; the
loop structure lives in :mod:`pixparse_tpu.ops.generation`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
LANES = 128


def _masked_softmax_rows(s, mask_row, Lk, Lk_pad):
    """(H, Lk_pad) scores + (1, Lk_pad) validity -> normalized probs with
    fully-masked rows emitting zeros (shared by the bf16 and int8 kernels
    so their masking/dead-row semantics cannot drift)."""
    valid = mask_row > 0
    if Lk < Lk_pad:  # static tail padding
        col = jax.lax.broadcasted_iota(jnp.int32, (1, Lk_pad), 1)
        valid = valid & (col < Lk)
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    # fully-masked rows would softmax over uniform NEG_INF — emit zeros
    dead = m <= NEG_INF * 0.5
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    return jnp.where(dead, 0.0, p / jnp.where(l == 0.0, 1.0, l))


def quantize_int8_rows(x, axis):
    """Symmetric absmax int8 quantization along ``axis``: returns
    (x_i8, scales) with all-zero rows mapping to scale 1 (payload zeros).
    The single quantization idiom shared by the caches, the in-kernel
    query/probability rows and the generate() tied-head table."""
    am = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scales = jnp.where(am > 0, am, 127.0) / 127.0
    x_i8 = jnp.clip(jnp.round(x / scales), -127, 127).astype(jnp.int8)
    return x_i8, scales


def _decode_attn_kernel(
    q_ref,      # (1, 1, HD) block per sample
    k_ref,      # (1, Lk_pad, HD) block per sample
    v_ref,      # (1, Lk_pad, HD)
    mask_ref,   # (1, 1, Lk_pad) int32, >0 = attend
    o_ref,      # (1, 1, HD)
    *, H, D, Lk, scale,
):
    Lk_pad = k_ref.shape[1]
    k = k_ref[0]  # (Lk_pad, HD)
    q = q_ref[0]  # (1, HD)

    # all-head scores (H, Lk_pad): per-head (1, D) x (Lk_pad, D)^T rows,
    # stacked so the softmax runs across sublanes at full VPU width
    rows = []
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D]            # (1, D)
        kh = k[:, h * D:(h + 1) * D]            # (Lk_pad, D)
        rows.append(
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, Lk_pad)
        )
    s = jnp.concatenate(rows, axis=0) * scale   # (H, Lk_pad) f32
    p = _masked_softmax_rows(s, mask_ref[0], Lk, Lk_pad)
    pb = p.astype(v_ref.dtype)                  # (H, Lk_pad)

    v = v_ref[0]  # (Lk_pad, HD)
    outs = []
    for h in range(H):
        vh = v[:, h * D:(h + 1) * D]            # (Lk_pad, D)
        outs.append(
            jax.lax.dot_general(
                pb[h:h + 1], vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, D)
        )
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)  # (1, HD)


def _decode_attention_local(q, k, v, mask, *, num_heads, interpret=False):
    """q (B, 1, HD), k/v (B, Lk, HD) flat caches, mask (B, Lk) bool/int.
    Returns (B, 1, HD)."""
    B, Lk, HD = k.shape
    D = HD // num_heads
    scale = D ** -0.5
    Lk_pad = ((Lk + LANES - 1) // LANES) * LANES
    if Lk_pad != Lk:
        widths = ((0, 0), (0, Lk_pad - Lk), (0, 0))
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        mask = jnp.pad(mask, ((0, 0), (0, Lk_pad - Lk)))

    kernel = functools.partial(
        _decode_attn_kernel, H=num_heads, D=D, Lk=Lk, scale=scale
    )
    # all operands 3-D with per-sample (1, ., .) blocks — the Mosaic
    # (8, 128)-divisibility rule on the last two dims is satisfied by the
    # "equals the array dim" clause; K/V stream through the grid pipeline
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Lk_pad, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Lk_pad, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lk_pad), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, HD), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, HD), q.dtype),
        interpret=interpret,
    )(q, k, v, mask.astype(jnp.int32)[:, None, :])
    return out


def _decode_attn_q8_kernel(
    q_ref,      # (1, 1, HD) block per sample (compute dtype)
    k_ref,      # (1, Lk_pad, HD) int8
    v_ref,      # (1, Lk_pad, HD) int8
    ks_ref,     # (1, Hp, Lk_pad) f32 per-(head, position) key scales
    vs_ref,     # (1, Hp, Lk_pad) f32 value scales
    mask_ref,   # (1, 1, Lk_pad) int32, >0 = attend
    o_ref,      # (1, 1, HD)
    *, H, D, Lk, scale, out_dtype,
):
    """int8 cross-KV decode attention: the caches stream from HBM at HALF
    the bytes of bf16 (the decode loop's dominant traffic) and the dots run
    on the MXU's native int8 path — NO per-element dequantization of the
    (Lk, D) tiles ever happens (a bf16-convert variant measured the VPU
    converts eating ~80% of the DMA savings). The query and the probability
    rows are quantized in-kernel (tiny (1, D)/(H, Lk) work); all scales fold
    into the (H, Lk) score/probability tiles."""
    Lk_pad = k_ref.shape[1]
    k = k_ref[0]  # (Lk_pad, HD) int8
    q = q_ref[0]  # (1, HD) compute dtype

    rows = []
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D].astype(jnp.float32)  # (1, D)
        q_i8, qscale = quantize_int8_rows(qh, axis=1)     # (1, D), (1, 1)
        kh = k[:, h * D:(h + 1) * D]                      # (Lk_pad, D) int8
        raw = jax.lax.dot_general(
            q_i8, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (1, Lk_pad) exact int32
        rows.append(raw.astype(jnp.float32) * qscale)
    # fold per-(head, position) key scales + the softmax scale into the
    # (H, Lk) score tile — one elementwise pass over H*Lk, not Lk*HD
    s = jnp.concatenate(rows, axis=0) * (ks_ref[0, :H] * scale)
    p = _masked_softmax_rows(s, mask_ref[0], Lk, Lk_pad)
    # value scales fold into the probability rows, which are then themselves
    # int8-quantized per head so the PV reduction also runs int8 on the MXU
    pv = p * vs_ref[0, :H]                                # (H, Lk_pad) f32
    pv_i8, pscale = quantize_int8_rows(pv, axis=1)        # (H, Lk_pad), (H, 1)

    v = v_ref[0]  # (Lk_pad, HD) int8
    outs = []
    for h in range(H):
        vh = v[:, h * D:(h + 1) * D]
        raw = jax.lax.dot_general(
            pv_i8[h:h + 1], vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (1, D) exact int32
        outs.append(raw.astype(jnp.float32) * pscale[h:h + 1])
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(out_dtype)


def quantize_kv_rows(x: jax.Array, num_heads: int):
    """Per-(sample, position, head) symmetric int8 quantization of a flat
    (B, L, H*D) cache tensor.

    Returns ``(x_i8 (B, L, H*D) int8, scales (B, Hp, L) f32)`` with Hp = H
    rounded up to a sublane multiple (8) so the scale tensor tiles cleanly
    as a kernel operand. Scales are absmax/127 per head-row; zero rows get
    scale 1 (their int8 payload is all zeros)."""
    B, L, HD = x.shape
    D = HD // num_heads
    xf = x.astype(jnp.float32).reshape(B, L, num_heads, D)
    x_i8, scales = quantize_int8_rows(xf, axis=-1)
    x_i8 = x_i8.reshape(B, L, HD)
    Hp = -(-num_heads // 8) * 8
    scales_t = jnp.pad(
        scales[..., 0].transpose(0, 2, 1), ((0, 0), (0, Hp - num_heads), (0, 0)),
        constant_values=1.0,
    )  # (B, Hp, L)
    return x_i8, scales_t


def _decode_attention_q8_local(
    q, k_i8, v_i8, k_scale, v_scale, mask, *, num_heads, interpret=False,
):
    B, Lk, HD = k_i8.shape
    D = HD // num_heads
    scale = D ** -0.5
    Hp = k_scale.shape[1]
    Lk_pad = ((Lk + LANES - 1) // LANES) * LANES
    if Lk_pad != Lk:
        widths = ((0, 0), (0, Lk_pad - Lk), (0, 0))
        k_i8 = jnp.pad(k_i8, widths)
        v_i8 = jnp.pad(v_i8, widths)
        swidths = ((0, 0), (0, 0), (0, Lk_pad - Lk))
        k_scale = jnp.pad(k_scale, swidths, constant_values=1.0)
        v_scale = jnp.pad(v_scale, swidths, constant_values=1.0)
        mask = jnp.pad(mask, ((0, 0), (0, Lk_pad - Lk)))

    kernel = functools.partial(
        _decode_attn_q8_kernel, H=num_heads, D=D, Lk=Lk, scale=scale,
        out_dtype=q.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Lk_pad, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Lk_pad, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Hp, Lk_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Hp, Lk_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, Lk_pad), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, HD), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, HD), q.dtype),
        interpret=interpret,
    )(q, k_i8, v_i8, k_scale, v_scale, mask.astype(jnp.int32)[:, None, :])
    return out


def decode_attention_q8(
    q: jax.Array,        # (B, 1, HD) single-position queries, heads flat
    k_i8: jax.Array,     # (B, Lk, HD) int8 key cache
    v_i8: jax.Array,     # (B, Lk, HD) int8 value cache
    k_scale: jax.Array,  # (B, Hp, Lk) f32 per-(head, position) key scales
    v_scale: jax.Array,  # (B, Hp, Lk) f32 value scales
    mask: jax.Array,     # (B, Lk) True/nonzero = attend
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-token decode attention over int8-quantized flat KV caches
    (see ``quantize_kv_rows``). Under a >1-device mesh the kernel dispatches
    through shard_map over the batch axes (CLAUDE.md invariant: a bare
    pallas_call under pjit is REPLICATED by the SPMD partitioner); the
    per-(head, position) scale layout pads heads to a sublane multiple, so
    it does NOT split on whole-head boundaries — a ``model`` axis > 1 is
    rejected (use the bf16 caches for tensor-parallel decode)."""
    from pixparse_tpu.ops.flash_attention import ambient_mesh

    B = q.shape[0]
    fn = functools.partial(
        _decode_attention_q8_local, num_heads=num_heads, interpret=interpret
    )
    mesh = ambient_mesh()
    if mesh is not None and {"data", "fsdp", "model"} <= set(mesh.axis_names):
        from jax.sharding import PartitionSpec as P

        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if sizes["model"] > 1:
            raise ValueError(
                "kv_cache_dtype='int8' does not support a model-parallel "
                "mesh axis (the padded per-head scale rows don't shard on "
                "whole-head boundaries); use bf16 caches"
            )
        n_batch = sizes["data"] * sizes["fsdp"]
        if B % n_batch == 0:
            bspec = P(("data", "fsdp"), None, None)
            return jax.shard_map(
                fn, mesh=mesh,
                in_specs=(bspec, bspec, bspec, bspec, bspec,
                          P(("data", "fsdp"), None)),
                out_specs=bspec,
                check_vma=False,
            )(q, k_i8, v_i8, k_scale, v_scale, mask)
    return fn(q, k_i8, v_i8, k_scale, v_scale, mask)


def decode_attention(
    q: jax.Array,      # (B, 1, HD) single-position queries, heads flat
    k: jax.Array,      # (B, Lk, HD) flat key cache
    v: jax.Array,      # (B, Lk, HD) flat value cache
    mask: jax.Array,   # (B, Lk) True/nonzero = attend
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-token decode attention over flat KV caches; under a >1-device
    mesh dispatches through shard_map (batch over (data, fsdp), heads over
    model) — a bare pallas_call under pjit would be replicated by the SPMD
    partitioner (see ops/flash_attention.py)."""
    from pixparse_tpu.ops.flash_attention import ambient_mesh

    B, _, HD = q.shape
    fn = functools.partial(
        _decode_attention_local, num_heads=num_heads, interpret=interpret
    )
    mesh = ambient_mesh()
    if mesh is not None and {"data", "fsdp", "model"} <= set(mesh.axis_names):
        from jax.sharding import PartitionSpec as P

        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_batch = sizes["data"] * sizes["fsdp"]
        n_model = sizes["model"]
        # heads stay flat: the model axis may split HD only on whole-head
        # boundaries
        if B % n_batch == 0 and num_heads % n_model == 0:
            spec = P(("data", "fsdp"), None, "model")
            local_heads = num_heads // n_model
            return jax.shard_map(
                functools.partial(
                    _decode_attention_local,
                    num_heads=local_heads,
                    interpret=interpret,
                ),
                mesh=mesh,
                in_specs=(spec, spec, spec, P(("data", "fsdp"), None)),
                out_specs=spec,
                check_vma=False,
            )(q, k, v, mask)
    return fn(q, k, v, mask)
