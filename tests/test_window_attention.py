"""Fused Pallas window-attention kernel (ops/window_attention.py).

Parity vs the Swin XLA attention path (same math, scores resident in VMEM),
gradient parity including the learned relative-position bias, and the
multi-device shard_map dispatch (sharded == replicated, no all-gather of the
window-batch operands in the compiled HLO).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pixparse_tpu.ops.window_attention import window_attention


def _xla_ref(q, k, v, bias, mask=None):
    """The models/swin.py XLA attention path, inlined."""
    nB, N, C = q.shape
    H = bias.shape[0]
    Dh = C // H
    qh = q.reshape(nB, N, H, Dh)
    kh = k.reshape(nB, N, H, Dh)
    vh = v.reshape(nB, N, H, Dh)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (Dh ** -0.5)
    s = s + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        s = s.reshape(nB // nW, nW, H, N, N) + mask[None, :, None]
        s = s.reshape(nB, H, N, N)
    p = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(nB, N, C)


def _data(nB=8, N=16, C=64, H=4, nW=4, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((nB, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((nB, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nB, N, C)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    # a Swin-like shift mask: 0 on block diagonal, -1e9 across regions
    region = rng.integers(0, 3, (nW, N))
    diff = region[:, None, :] != region[:, :, None]
    mask = jnp.asarray(np.where(diff, -1e9, 0.0), jnp.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("use_mask", [True, False])
def test_window_attention_forward_parity(use_mask):
    q, k, v, bias, mask = _data()
    m = mask if use_mask else None
    out = window_attention(q, k, v, bias, m)
    ref = _xla_ref(q, k, v, bias, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("use_mask", [True, False])
def test_window_attention_grad_parity(use_mask):
    q, k, v, bias, mask = _data(nB=12, N=25, C=96, H=3, nW=6, seed=1)
    m = mask if use_mask else None

    def loss(fn, q, k, v, bias):
        return jnp.sum(fn(q, k, v, bias, m).astype(jnp.float32) ** 2)

    g_k = jax.grad(lambda *a: loss(window_attention, *a), argnums=(0, 1, 2, 3))(
        q, k, v, bias
    )
    g_r = jax.grad(lambda *a: loss(_xla_ref, *a), argnums=(0, 1, 2, 3))(
        q, k, v, bias
    )
    for name, a, b in zip("qkvb", g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_window_attention_rejects_bad_shapes():
    q, k, v, bias, mask = _data()
    with pytest.raises(ValueError, match="mask period"):
        window_attention(q[:6], k[:6], v[:6], bias, mask)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="divisible by heads"):
        window_attention(q[..., :62], k[..., :62], v[..., :62], bias, mask)


def test_window_attention_sharded_matches_replicated():
    # 8 windows/image so each (data, fsdp) shard holds whole images
    q, k, v, bias, mask = _data(nB=32, N=16, C=64, H=4, nW=8, seed=2)

    def f(q, k, v, bias):
        return jnp.sum(window_attention(q, k, v, bias, mask) ** 2)

    o_ref = window_attention(q, k, v, bias, mask)
    g_ref = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    mesh = Mesh(
        np.array(jax.devices()).reshape(2, 2, 2), ("data", "fsdp", "model")
    )
    with mesh:
        o_sh = jax.jit(
            lambda *a: window_attention(*a, mask)
        )(q, k, v, bias)
        g_sh = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(o_sh), np.asarray(o_ref), atol=2e-5)
    for name, a, b in zip("qkvb", g_sh, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_window_attention_sharded_no_allgather():
    q, k, v, bias, mask = _data(nB=32, N=16, C=64, H=4, nW=8, seed=3)

    def f(q, k, v, bias):
        return jnp.sum(window_attention(q, k, v, bias, mask) ** 2)

    mesh = Mesh(
        np.array(jax.devices()).reshape(2, 2, 2), ("data", "fsdp", "model")
    )
    with mesh:
        hlo = (
            jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))
            .lower(q, k, v, bias).compile().as_text()
        )
    # batch-sharded (nB, N, C) operands must never be gathered; the tiny
    # replicated mask and the model-sharded bias psum are fine
    for m in re.finditer(r"all-gather[^\n]*", hlo):
        assert "32,16,64" not in m.group(0), m.group(0)


def test_swin_module_flash_matches_xla():
    """WindowAttention module end-to-end: attn_impl='flash' == 'xla' with
    identical params (kernel consumes the same qkv Dense + bias table)."""
    from pixparse_tpu.models.swin import SwinBlock, SwinCfg

    cfg = SwinCfg(
        img_size=(32, 32), patch_size=4, in_chans=1, embed_dim=32,
        depths=(1, 1), num_heads=(2, 4), window_size=4,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    # shift=2 exercises the mask path at resolution 8 with window 4
    block = SwinBlock(cfg, 32, 2, (8, 8), 2, attn_impl="xla")
    params = block.init(jax.random.PRNGKey(0), x)
    out_x = block.apply(params, x)
    block_f = SwinBlock(cfg, 32, 2, (8, 8), 2, attn_impl="flash")
    out_f = block_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=3e-5
    )
    # and gradients through the module agree (bias table included)
    def loss(mod, p):
        return jnp.sum(mod.apply(p, x) ** 2)

    g_x = jax.grad(lambda p: loss(block, p))(params)
    g_f = jax.grad(lambda p: loss(block_f, p))(params)
    fx = jax.tree_util.tree_leaves_with_path(g_x)
    ff = jax.tree_util.tree_leaves_with_path(g_f)
    for (pa, a), (pb, b) in zip(fx, ff):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=jax.tree_util.keystr(pa),
        )
