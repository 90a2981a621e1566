"""Fused Pallas LayerNorm: forward/grad parity vs the fp32-stats reference
math, flax nn.LayerNorm parity, mesh-sharded execution (no-replication
invariant), and the unshardable-mesh XLA fallback.

Reference parity target: the reference normalizes with torch nn.LayerNorm
everywhere (timm ViT blocks / HF BART stacks); ``_ln_ref`` is the fp32-stats
oracle.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import Mesh

from pixparse_tpu.ops.layer_norm import (
    FusedLayerNorm,
    _ln_ref,
    layer_norm,
)

B, L, D = 8, 37, 256


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, D) * 2.0 + 0.5, jnp.float32)
    scale = jnp.asarray(1.0 + 0.3 * rng.randn(D), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    return x, scale, bias


def _loss_pallas(x, s, b):
    return jnp.sum(layer_norm(x, s, b, impl="pallas").astype(jnp.float32) ** 2)


def _loss_ref(x, s, b):
    return jnp.sum(_ln_ref(x, s, b, 1e-6).astype(jnp.float32) ** 2)


def test_forward_matches_ref(data):
    x, s, b = data
    y_ref = _ln_ref(x, s, b, 1e-6)
    y = layer_norm(x, s, b, impl="pallas")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_forward_matches_flax_layernorm(data):
    x, s, b = data
    mod = nn.LayerNorm(epsilon=1e-6)
    y_flax = mod.apply({"params": {"scale": s, "bias": b}}, x)
    y = layer_norm(x, s, b, impl="pallas")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_flax), atol=1e-5)


def test_grads_match_ref(data):
    x, s, b = data
    g_ref = jax.grad(_loss_ref, argnums=(0, 1, 2))(x, s, b)
    g = jax.grad(_loss_pallas, argnums=(0, 1, 2))(x, s, b)
    # dx is O(1) per element; dscale/dbias accumulate over B*L rows
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]),
                               atol=1e-4)
    for a, r in zip(g[1:], g_ref[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-3)


def test_bf16_forward_close(data):
    x, s, b = data
    xb = x.astype(jnp.bfloat16)
    y = layer_norm(xb, s, b, impl="pallas")
    assert y.dtype == jnp.bfloat16
    y_ref = _ln_ref(xb, s, b, 1e-6)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=0.04
    )


def test_odd_row_counts_padded(data):
    # R not a multiple of the row block: zero-padded tail must not corrupt
    # dscale/dbias accumulation
    x, s, b = data
    x5 = x[:5, :3]  # R = 15
    g_ref = jax.grad(_loss_ref, argnums=(0, 1, 2))(x5, s, b)
    g = jax.grad(_loss_pallas, argnums=(0, 1, 2))(x5, s, b)
    for a, r in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (8, 1, 1)])
def test_sharded_matches_replicated(data, mesh_shape):
    x, s, b = data
    l_ref = float(_loss_pallas(x, s, b))
    g_ref = jax.grad(_loss_pallas, argnums=(0, 1, 2))(x, s, b)
    mesh = Mesh(np.array(jax.devices()).reshape(*mesh_shape),
                ("data", "fsdp", "model"))
    with mesh:
        l_sh, g_sh = jax.jit(
            jax.value_and_grad(_loss_pallas, argnums=(0, 1, 2))
        )(x, s, b)
    assert np.isclose(l_ref, float(l_sh), rtol=1e-5)
    for a, r in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-3)


def test_sharded_no_allgather(data):
    x, s, b = data
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "fsdp", "model"))
    with mesh:
        hlo = (
            jax.jit(jax.value_and_grad(_loss_pallas, argnums=(0, 1, 2)))
            .lower(x, s, b).compile().as_text()
        )
    # batch-sharded rows (B*L) must never be gathered; (1, D) param grads may
    for m in re.finditer(r"all-gather[^\n]*", hlo):
        assert f"{B * L}" not in m.group(0), m.group(0)


def test_unshardable_mesh_falls_back_to_xla():
    # rows (3*7=21) not divisible by data*fsdp (4): the pallas path must NOT
    # run bare under the mesh (SPMD replication); layer_norm falls back to
    # the XLA math, which pjit shards fine — result must still be exact
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 7, D), jnp.float32)
    s = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    y_ref = _ln_ref(x, s, b, 1e-6)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "fsdp", "model"))
    with mesh:
        y = jax.jit(lambda x, s, b: layer_norm(x, s, b, impl="pallas"))(x, s, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_fused_layer_norm_module(data):
    x, s, b = data
    mod = FusedLayerNorm(epsilon=1e-6, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    params = nn.unbox(variables["params"])
    assert set(params) == {"scale", "bias"}  # nn.LayerNorm-compatible names
    # logical axis names must be attached (mesh invariant: params carry
    # logical axes for the sharding rules)
    boxed = variables["params"]
    assert boxed["scale"].names == ("embed",)
    assert boxed["bias"].names == ("embed",)
    y = mod.apply({"params": {"scale": s, "bias": b}}, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ln_ref(x, s, b, 1e-6)), atol=1e-5
    )
