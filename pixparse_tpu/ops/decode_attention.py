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

    valid = mask_ref[0] > 0                     # (1, Lk_pad)
    if Lk < Lk_pad:  # static tail padding
        col = jax.lax.broadcasted_iota(jnp.int32, (1, Lk_pad), 1)
        valid = valid & (col < Lk)
    s = jnp.where(valid, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)       # (H, 1)
    # fully-masked rows would softmax over uniform NEG_INF — emit zeros
    dead = m <= NEG_INF * 0.5
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = jnp.where(dead, 0.0, p / jnp.where(l == 0.0, 1.0, l))
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
