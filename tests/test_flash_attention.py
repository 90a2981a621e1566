"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixparse_tpu.ops.attention import dot_product_attention
from pixparse_tpu.ops.flash_attention import flash_attention


def _rand_qkv(B, Lq, Lk, H, D, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, Lq, H, D).astype(np.float32)
    k = rng.randn(B, Lk, H, D).astype(np.float32)
    v = rng.randn(B, Lk, H, D).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(causal):
    q, k, v = _rand_qkv(2, 160, 160, 2, 64)
    ref = dot_product_attention(q, k, v, causal=causal, impl="xla")
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_unpadded_unaligned_lengths():
    # Lq=100, Lk=75: exercises both query and key padding paths
    q, k, v = _rand_qkv(1, 100, 75, 3, 32, seed=1)
    ref = dot_product_attention(q, k, v, impl="xla")
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_cross_attention_shape():
    # decoder->encoder cross shape (Lq != Lk)
    q, k, v = _rand_qkv(2, 64, 256, 2, 64, seed=2)
    ref = dot_product_attention(q, k, v, impl="xla")
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_attention_entry_point_flash_impl():
    q, k, v = _rand_qkv(1, 128, 128, 2, 64, seed=3)
    out = dot_product_attention(q, k, v, impl="flash")
    ref = dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_match_xla(causal):
    q, k, v = _rand_qkv(2, 160, 160, 2, 64, seed=4)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, block_q=128, block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, causal=causal, impl="xla") ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_flash_gradients_cross_attention_unaligned():
    q, k, v = _rand_qkv(1, 100, 75, 3, 32, seed=5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, impl="xla") ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_flash_causal_bottom_right_alignment():
    """causal with Lq < Lk (cached-decode shape): flash == XLA bottom-right."""
    q, k, v = _rand_qkv(1, 32, 96, 2, 64, seed=6)
    ref = dot_product_attention(q, k, v, causal=True, impl="xla")
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_varlen_matches_xla_bias():
    """Per-sample kv_lens (packed variable-length keys, pix2struct) must
    match the XLA additive-bias path in values and grads."""
    import numpy as np
    from pixparse_tpu.ops.attention import dot_product_attention
    from pixparse_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    B, Lq, Lk, H, D = 4, 37, 53, 4, 64
    q = jnp.asarray(rng.randn(B, Lq, H, D) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(B, Lk, H, D) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(B, Lk, H, D) * 0.3, jnp.float32)
    lens = jnp.asarray([53, 20, 1, 40], jnp.int32)
    mask = jnp.arange(Lk)[None, :] < lens[:, None]
    bias = jnp.where(mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)

    of = flash_attention(q, k, v, kv_lens=lens)
    ox = dot_product_attention(q, k, v, bias=bias, impl="xla")
    np.testing.assert_allclose(np.asarray(of), np.asarray(ox), atol=1e-5)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lens=lens).astype(jnp.float32) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, bias=bias, impl="xla").astype(jnp.float32) ** 2
        )

    gf = jax.jit(jax.grad(f_flash, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dot_product_attention_kv_lens_xla_path():
    """kv_lens lowers to an additive bias on the XLA impl."""
    import numpy as np
    from pixparse_tpu.ops.attention import dot_product_attention

    rng = np.random.RandomState(1)
    B, L, H, D = 2, 9, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    lens = jnp.asarray([9, 4], jnp.int32)
    mask = jnp.arange(L)[None, :] < lens[:, None]
    bias = jnp.where(mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
    a = dot_product_attention(q, q, q, kv_lens=lens, impl="xla")
    b = dot_product_attention(q, q, q, bias=bias, impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flash_varlen_causal_combo():
    """kv_lens composes with causal masking (both restrict the key set)."""
    import numpy as np
    from pixparse_tpu.ops.attention import dot_product_attention
    from pixparse_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(2)
    B, L, H, D = 3, 41, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D) * 0.3, jnp.float32)
    lens = jnp.asarray([41, 17, 5], jnp.int32)
    mask = jnp.arange(L)[None, :] < lens[:, None]
    bias = jnp.where(mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)

    of = flash_attention(q, k, v, causal=True, kv_lens=lens)
    ox = dot_product_attention(q, k, v, bias=bias, causal=True, impl="xla")
    # rows whose whole causal window is masked (row >= len, in-sample) are
    # degenerate (uniform weights in the xla path); compare valid rows
    valid_rows = jnp.arange(L)[None, :] < lens[:, None]
    sel = np.asarray(valid_rows)
    np.testing.assert_allclose(
        np.asarray(of)[sel], np.asarray(ox)[sel], atol=1e-5
    )
