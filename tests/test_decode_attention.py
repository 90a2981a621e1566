"""Pallas decode-attention kernel vs XLA reference (interpret mode on CPU).

The kernel serves single-token decode steps over FLAT (B, L, H*D) KV caches
(models/bart.py CachedSelfAttention / CachedCrossAttention decode mode);
reference semantics are the masked XLA attention those modules fall back to
on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixparse_tpu.ops.attention import dot_product_attention
from pixparse_tpu.ops.decode_attention import _decode_attention_local


def _ref(q, k, v, mask, H):
    """XLA reference on head-split views of the flat operands."""
    B, _, HD = q.shape
    Lk = k.shape[1]
    D = HD // H
    bias = jnp.where(mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
    out = dot_product_attention(
        q.reshape(B, 1, H, D),
        k.reshape(B, Lk, H, D),
        v.reshape(B, Lk, H, D),
        bias=bias,
    )
    return out.reshape(B, 1, HD)


def _rand(B, Lk, H, D, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, 1, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("Lk", [128, 100, 1009])
def test_decode_attention_matches_xla(Lk):
    B, H, D = 3, 4, 64
    q, k, v = _rand(B, Lk, H, D, seed=Lk)
    mask = jnp.ones((B, Lk), bool)
    out = _decode_attention_local(q, k, v, mask, num_heads=H, interpret=True)
    ref = _ref(q, k, v, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_decode_attention_ragged_mask():
    """Per-sample prefix masks (the self-attn cache pattern: keys <= index,
    finished rows padded)."""
    B, Lk, H, D = 4, 160, 2, 32
    q, k, v = _rand(B, Lk, H, D, seed=7)
    rng = np.random.RandomState(7)
    mask = np.zeros((B, Lk), bool)
    for b, n in enumerate([1, 17, 100, 160]):
        mask[b, :n] = True
        # punch interior holes (pad-written finished positions)
        if n > 4:
            mask[b, rng.randint(1, n, 3)] = False
    mask = jnp.asarray(mask)
    out = _decode_attention_local(q, k, v, mask, num_heads=H, interpret=True)
    ref = _ref(q, k, v, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_decode_attention_fully_masked_row_zeros():
    """A row with zero visible keys must emit zeros (not an average of v)."""
    B, Lk, H, D = 2, 128, 2, 64
    q, k, v = _rand(B, Lk, H, D, seed=3)
    mask = np.ones((B, Lk), bool)
    mask[1, :] = False
    out = _decode_attention_local(
        q, k, v, jnp.asarray(mask), num_heads=H, interpret=True
    )
    assert np.all(np.asarray(out[1]) == 0.0)
    ref = _ref(q[:1], k[:1], v[:1], jnp.asarray(mask[:1]), H)  # row 0 unaffected
    np.testing.assert_allclose(np.asarray(out[:1]), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_decode_attention_shard_map_parity():
    """The >1-device mesh dispatch (shard_map: batch over (data, fsdp),
    whole-head chunks over model) must equal the single-shard kernel."""
    from pixparse_tpu.ops.decode_attention import decode_attention
    from pixparse_tpu.parallel.mesh import create_mesh

    B, Lk, H, D = 8, 128, 4, 64
    q, k, v = _rand(B, Lk, H, D, seed=5)
    mask = np.ones((B, Lk), bool)
    mask[2, 40:] = False
    mask = jnp.asarray(mask)
    ref = _ref(q, k, v, mask, H)

    mesh = create_mesh(data=2, fsdp=2, model=2)
    with mesh:
        out = decode_attention(q, k, v, mask, num_heads=H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_decode_attention_sharded_no_allgather():
    """Compiled HLO under a 2x2x2 mesh must not all-gather the batch-sharded
    caches — a bare pallas_call under pjit would be replicated by the SPMD
    partitioner (full-batch all-gather per chip)."""
    import re

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pixparse_tpu.ops.decode_attention import decode_attention
    from pixparse_tpu.parallel.mesh import create_mesh

    B, Lk, H, D = 8, 256, 4, 64
    q, k, v = _rand(B, Lk, H, D, seed=9)
    mask = jnp.ones((B, Lk), bool)
    mesh = create_mesh(data=2, fsdp=2, model=2)
    spec = NamedSharding(mesh, P(("data", "fsdp"), None, "model"))
    q = jax.device_put(q, spec)
    k = jax.device_put(k, spec)
    v = jax.device_put(v, spec)
    mask = jax.device_put(mask, NamedSharding(mesh, P(("data", "fsdp"), None)))
    with mesh:
        hlo = (
            jax.jit(
                lambda q, k, v, m: decode_attention(
                    q, k, v, m, num_heads=H, interpret=True
                )
            )
            .lower(q, k, v, mask).compile().as_text()
        )
    for m in re.finditer(r"all-gather[^\n]*", hlo):
        assert str(B * Lk) not in m.group(0), m.group(0)


def test_decode_attention_bf16():
    B, Lk, H, D = 2, 256, 4, 64
    q, k, v = _rand(B, Lk, H, D, seed=11)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    mask = jnp.ones((B, Lk), bool)
    out = _decode_attention_local(q, k, v, mask, num_heads=H, interpret=True)
    ref = _ref(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), mask, H
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
