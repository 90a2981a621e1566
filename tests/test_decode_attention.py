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


def test_decode_attention_q8_close_to_bf16():
    """int8 cross-KV path: per-(row, head) quantization keeps the attention
    output within quantization noise of the exact path."""
    from pixparse_tpu.ops.decode_attention import (
        decode_attention_q8, quantize_kv_rows,
    )

    B, Lk, H, D = 3, 1009, 4, 64
    q, k, v = _rand(B, Lk, H, D, seed=13)
    mask = np.ones((B, Lk), bool)
    mask[1, 700:] = False
    mask = jnp.asarray(mask)
    ref = _ref(q, k, v, mask, H)

    k_i8, ks = quantize_kv_rows(k, H)
    v_i8, vs = quantize_kv_rows(v, H)
    assert k_i8.dtype == jnp.int8 and ks.shape == (B, 8, Lk)
    out = decode_attention_q8(
        q, k_i8, v_i8, ks, vs, mask, num_heads=H, interpret=True
    )
    # int8 with per-head-row scales: ~0.4% per-element noise on k and v,
    # softmax keeps the output the same magnitude as v
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_q8_roundtrip_exact_for_representable():
    """Values already on the int8 grid round-trip exactly."""
    from pixparse_tpu.ops.decode_attention import quantize_kv_rows

    rng = np.random.RandomState(0)
    x = rng.randint(-127, 128, (2, 64, 128)).astype(np.float32)
    x[:, :, 0] = 127.0  # pin per-head-row absmax so scale is exactly 1/127
    x[:, :, 64] = -127.0
    x = jnp.asarray(x / 127.0)
    x_i8, s = quantize_kv_rows(x, num_heads=2)
    D = 64
    recon = np.asarray(x_i8, np.float32).reshape(2, 64, 2, D) * np.asarray(
        s[:, :2]
    ).transpose(0, 2, 1)[..., None]
    np.testing.assert_allclose(recon.reshape(2, 64, 128), np.asarray(x),
                               atol=1e-6, rtol=1e-5)


def test_cross_attention_int8_cache_generate_parity():
    """Greedy generation with kv_cache_dtype='int8' produces the same tokens
    as bf16 on the tiny model (quantization noise ~0.4% is far below the
    logit margins of a random-init model's argmax in most positions; assert
    a high agreement rate and identical shapes)."""
    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
    from pixparse_tpu.ops.generation import generate

    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(2, *vit_cfg.img_size, vit_cfg.in_chans).astype(np.float32)
    )
    prompts = jnp.asarray([[0, 5], [0, 9]], jnp.int32)

    outs = {}
    for kv_dtype in ("bf16", "int8"):
        model = Cruller(
            vit_cfg, bart_cfg, max_cache_len=24, kv_cache_dtype=kv_dtype,
            lm_head_dtype=kv_dtype,
        )
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *vit_cfg.img_size, vit_cfg.in_chans)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
        import flax.linen as nn

        params = nn.unbox(params)
        enc = model.apply({"params": params}, images, method="encode")
        res = generate(
            model, params, enc, prompts, max_length=20,
            eos_token_id=bart_cfg.eos_token_id,
            pad_token_id=bart_cfg.pad_token_id,
        )
        outs[kv_dtype] = np.asarray(res.tokens)
    assert outs["bf16"].shape == outs["int8"].shape
    agree = (outs["bf16"] == outs["int8"]).mean()
    assert agree >= 0.9, (agree, outs)


def test_decode_attention_q8_shard_map_parity():
    """int8 kernel under a >1-device mesh (batch sharded over (data, fsdp),
    model=1) must match the single-shard kernel; model>1 is rejected."""
    import pytest as _pytest

    from pixparse_tpu.ops.decode_attention import (
        decode_attention_q8, quantize_kv_rows,
    )
    from pixparse_tpu.parallel.mesh import create_mesh

    B, Lk, H, D = 8, 128, 4, 64
    q, k, v = _rand(B, Lk, H, D, seed=21)
    mask = np.ones((B, Lk), bool)
    mask[3, 60:] = False
    mask = jnp.asarray(mask)
    k_i8, ks = quantize_kv_rows(k, H)
    v_i8, vs = quantize_kv_rows(v, H)
    ref = decode_attention_q8(q, k_i8, v_i8, ks, vs, mask, num_heads=H,
                              interpret=True)

    mesh = create_mesh(data=2, fsdp=4, model=1)
    with mesh:
        out = decode_attention_q8(q, k_i8, v_i8, ks, vs, mask, num_heads=H,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    mesh2 = create_mesh(data=2, fsdp=2, model=2)
    with mesh2:
        with _pytest.raises(ValueError, match="model-parallel"):
            decode_attention_q8(q, k_i8, v_i8, ks, vs, mask, num_heads=H,
                                interpret=True)
