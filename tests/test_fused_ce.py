"""Fused Pallas tied-head CE: correctness vs the dense/chunked paths and
mesh-sharded execution (vocab-parallel, Megatron-style).

The sharded assertions also pin the NON-replication property: a bare
pallas_call under pjit is replicated by the SPMD partitioner (all-gathers in
the compiled HLO); the shard_map wrappers must keep the compiled module free
of all-gathers for batch-sharded operands.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pixparse_tpu.ops.loss import (
    chunked_cross_entropy_from_hidden,
    cross_entropy_loss,
    fused_cross_entropy_from_hidden,
)

B, L, D, V = 8, 37, 48, 307


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.float32)
    emb = jnp.asarray(rng.randn(V, D) * 0.2, jnp.float32)
    tgt = rng.randint(0, V, (B, L))
    tgt[0, :5] = -100
    tgt[1, -3:] = -100
    return hidden, emb, jnp.asarray(tgt, jnp.int32)


def _dense(h, e, t):
    return cross_entropy_loss(h @ e.T, t)[0]


def _fused(h, e, t):
    return fused_cross_entropy_from_hidden(h, e, t)[0]


def test_fused_ce_matches_dense(data):
    hidden, emb, tgt = data
    ld = _dense(hidden, emb, tgt)
    lf, n = fused_cross_entropy_from_hidden(hidden, emb, tgt)
    assert np.isclose(float(ld), float(lf), atol=1e-5)
    assert int(n) == int((np.asarray(tgt) != -100).sum())
    gd = jax.grad(_dense, argnums=(0, 1))(hidden, emb, tgt)
    gf = jax.grad(_fused, argnums=(0, 1))(hidden, emb, tgt)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_ce_bwd_chunk_env(data, monkeypatch):
    """PIXPARSE_CE_BWD_CHUNK (longer/shorter backward token chunks — the
    HBM-vs-VMEM trade, docs/PERF.md) only reassociates the fp32 dE partial
    sum: grads must match the single-chunk result at fp32 noise."""
    hidden, emb, tgt = data
    g_default = jax.grad(_fused, argnums=(0, 1))(hidden, emb, tgt)
    monkeypatch.setenv("PIXPARSE_CE_BWD_CHUNK", "8")  # forces many chunks
    g_chunked = jax.grad(_fused, argnums=(0, 1))(hidden, emb, tgt)
    for a, b in zip(g_default, g_chunked):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_ce_all_ignored():
    hidden = jnp.zeros((2, 4, 16), jnp.float32)
    emb = jnp.ones((33, 16), jnp.float32)
    tgt = jnp.full((2, 4), -100, jnp.int32)
    loss, n = fused_cross_entropy_from_hidden(hidden, emb, tgt)
    assert float(loss) == 0.0 and int(n) == 0
    g = jax.grad(_fused, argnums=(0, 1))(hidden, emb, tgt)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 1, 2), (8, 1, 1)])
def test_fused_ce_sharded_matches_replicated(data, mesh_shape):
    hidden, emb, tgt = data
    g_ref = jax.grad(_fused, argnums=(0, 1))(hidden, emb, tgt)
    l_ref = _fused(hidden, emb, tgt)
    mesh = Mesh(np.array(jax.devices()).reshape(*mesh_shape),
                ("data", "fsdp", "model"))
    with mesh:
        l_sh, g_sh = jax.jit(jax.value_and_grad(_fused, argnums=(0, 1)))(
            hidden, emb, tgt
        )
    assert np.isclose(float(l_ref), float(l_sh), atol=1e-5)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_ce_sharded_no_allgather(data):
    hidden, emb, tgt = data
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "fsdp", "model"))
    with mesh:
        hlo = (
            jax.jit(jax.value_and_grad(_fused, argnums=(0, 1)))
            .lower(hidden, emb, tgt).compile().as_text()
        )
    # the (V, D) table may all-gather once (it is model-sharded and small);
    # the batch-sharded (B, L, *) operands must never be gathered
    for m in re.finditer(r"all-gather[^\n]*", hlo):
        assert f"{B * L}" not in m.group(0), m.group(0)


def test_flash_attention_sharded_no_allgather():
    from pixparse_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(8, 256, 4, 64), jnp.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "fsdp", "model"))

    def f(q):
        return jnp.sum(flash_attention(q, q, q).astype(jnp.float32))

    with mesh:
        hlo = jax.jit(jax.grad(f)).lower(q).compile().as_text()
        out = jax.jit(jax.grad(f))(q)
    assert "all-gather" not in hlo
    assert np.isfinite(np.asarray(out)).all()


def test_flash_attention_sharded_matches_replicated():
    from pixparse_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(8, 130, 4, 64) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(8, 130, 4, 64) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(8, 130, 4, 64) * 0.3, jnp.float32)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2)

    o_ref = flash_attention(q, k, v, causal=True)
    g_ref = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "fsdp", "model"))
    with mesh:
        o_sh = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))(q, k, v)
        g_sh = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_sh), atol=1e-6)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_ce_matches_chunked_bf16(data):
    hidden, emb, tgt = data
    h16, e16 = hidden.astype(jnp.bfloat16), emb.astype(jnp.bfloat16)
    lc = chunked_cross_entropy_from_hidden(h16, e16, tgt)[0]
    lf = fused_cross_entropy_from_hidden(h16, e16, tgt)[0]
    assert np.isclose(float(lc), float(lf), rtol=1e-3)
    g = jax.grad(_fused, argnums=(0, 1))(h16, e16, tgt)
    assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16
