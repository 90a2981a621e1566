"""Model tests: shapes, dtype policy, decode-cache vs parallel consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixparse_tpu.models import Cruller, get_model_config, list_models, resolve_cruller_cfgs
from pixparse_tpu.ops.generation import generate, generate_naive
from pixparse_tpu.ops.loss import cross_entropy_loss


@pytest.fixture(scope="module")
def tiny():
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg, vocab_size=512)
    model = Cruller(vit_cfg, bart_cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 64, 48, 1))
    txt = jax.random.randint(rng, (2, 16), 3, 500)
    variables = model.init(rng, img, txt)
    return model, variables, img, txt


def test_registry():
    assert "cruller_base" in list_models()
    assert get_model_config("nope") is None
    # deep copy: mutating a returned config must not corrupt the registry
    c = get_model_config("cruller_base")
    c.text_decoder.num_decoder_layers = 999
    assert get_model_config("cruller_base").text_decoder.num_decoder_layers == 4


def test_forward_shapes(tiny):
    model, variables, img, txt = tiny
    logits = model.apply(variables, img, txt)
    assert logits.shape == (2, 16, 512)
    assert logits.dtype == jnp.float32


def test_bf16_policy():
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg, vocab_size=512)
    model = Cruller(vit_cfg, bart_cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 48, 1))
    txt = jnp.ones((1, 8), jnp.int32)
    variables = model.init(rng, img, txt)
    # params stay fp32, logits come back fp32 (head computed in fp32)
    assert all(
        p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"])
    )
    logits = model.apply(variables, img, txt)
    assert logits.dtype == jnp.float32


def test_loss_ignore_index(tiny):
    model, variables, img, txt = tiny
    logits = model.apply(variables, img, txt)
    targets = np.array(txt)
    targets[:, :4] = -100
    loss, nvalid = cross_entropy_loss(logits, jnp.asarray(targets))
    assert np.isfinite(float(loss))
    assert int(nvalid) == targets.size - 8
    all_ignored = jnp.full_like(txt, -100)
    loss0, n0 = cross_entropy_loss(logits, all_ignored)
    assert float(loss0) == 0.0 and int(n0) == 0


def test_cached_decode_matches_parallel(tiny):
    """Prefill + N cached single-token steps == teacher-forced forward."""
    model, variables, img, txt = tiny
    params = variables["params"]
    enc = model.apply({"params": params}, img, method="encode")

    # teacher-forced logits over the full sequence
    full_logits = model.apply(
        {"params": params}, txt, enc, mode="train", method="decode"
    )

    # prefill on first 4 tokens, then cached steps for the rest
    decode_model = model.clone(max_cache_len=32)
    cache = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda: decode_model.init(
                jax.random.PRNGKey(0), txt[:, :4], enc, mode="prefill", method="decode"
            )["cache"]
        ),
    )
    buf = jnp.full((2, 32), -1, jnp.int32).at[:, :4].set(txt[:, :4])
    key_mask = buf != -1
    logits_p, mut = decode_model.apply(
        {"params": params, "cache": cache},
        txt[:, :4], enc, key_pad_mask=key_mask, mode="prefill", method="decode",
        mutable=["cache"],
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :4]), rtol=2e-4, atol=2e-4
    )
    cache = mut["cache"]
    for i in range(4, 8):
        buf = buf.at[:, i].set(txt[:, i])
        key_mask = buf != -1
        step_logits, mut = decode_model.apply(
            {"params": params, "cache": cache},
            txt[:, i:i + 1], enc, key_pad_mask=key_mask, mode="decode", method="decode",
            mutable=["cache"],
        )
        cache = mut["cache"]
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, i]),
            rtol=2e-4, atol=2e-4,
        )


def test_generate_matches_naive(tiny):
    """Jitted KV-cache greedy decode == reference-algorithm decode, token for token."""
    model, variables, img, txt = tiny
    params = variables["params"]
    enc = model.apply({"params": params}, img, method="encode")
    prompt = txt[:, :1]
    pad_id = 1
    eos_id = 2
    out = generate(
        model, params, enc, prompt,
        max_length=12, eos_token_id=eos_id, pad_token_id=pad_id,
    )
    ref = generate_naive(
        model, params, enc, prompt,
        max_length=12, eos_token_id=eos_id, pad_token_id=pad_id,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref))
    assert out.tokens.shape == (2, 12)


def test_generate_stops_on_eos(tiny):
    """Force EOS as the argmax via a doctored embedding: all rows finish early
    and post-EOS positions are pad."""
    model, variables, img, txt = tiny
    params = variables["params"]
    enc = model.apply({"params": params}, img, method="encode")
    out = generate(
        model, params, enc, txt[:, :1],
        max_length=64, eos_token_id=2, pad_token_id=1,
    )
    tokens = np.asarray(out.tokens)
    for row, n in zip(tokens, np.asarray(out.lengths)):
        # everything after the valid length is pad
        assert (row[n:] == 1).all()


def test_pre_norm_decoder_cached_decode_matches_parallel():
    """mBART (pre-LN) layout: KV-cached decode == teacher-forced forward."""
    import jax
    import jax.numpy as jnp

    from pixparse_tpu.models.bart import BartCausalDecoder, BartDecoderCfg

    cfg = BartDecoderCfg(
        vocab_size=64, d_model=32, decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=64, max_position_embeddings=32,
        pre_norm=True, add_final_layer_norm=True, scale_embedding=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    model = BartCausalDecoder(cfg)
    rng = np.random.RandomState(0)
    B, L, Lk = 2, 6, 5
    ids = jnp.asarray(rng.randint(4, 64, (B, L)), jnp.int32)
    enc = jnp.asarray(rng.randn(B, Lk, 32), jnp.float32)
    import flax.linen as nn

    params = nn.unbox(model.init(jax.random.PRNGKey(0), ids, enc))["params"]
    ref = model.apply({"params": params}, ids, enc, mode="train")

    decode_model = model.clone(max_cache_len=L)
    cache_shapes = jax.eval_shape(
        lambda: decode_model.init(jax.random.PRNGKey(0), ids[:, :1], enc, mode="prefill")["cache"]
    )
    cache = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)
    outs = []
    for t in range(L):
        mode = "prefill" if t == 0 else "decode"
        mask = jnp.arange(L)[None, :] <= t
        logits, mut = decode_model.apply(
            {"params": params, "cache": cache}, ids[:, t:t + 1], enc,
            key_pad_mask=mask.astype(bool).repeat(B, 0), mode=mode,
            mutable=["cache"],
        )
        cache = mut["cache"]
        outs.append(logits[:, -1])
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("remat", [True, "dots", "mlp", "gelu"])
def test_remat_modes_match_no_remat_grads(remat):
    """Full remat and the dots-saveable policy must be numerically identical
    to no remat (they change memory/recompute, never values)."""
    cfg = get_model_config("cruller_test")
    vit_cfg, bart_cfg, _ = resolve_cruller_cfgs(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, *vit_cfg.img_size, vit_cfg.in_chans), jnp.float32)
    txt = jnp.asarray(rng.randint(4, bart_cfg.vocab_size, (2, 16)), jnp.int32)

    def grads(remat_mode):
        model = Cruller(vit_cfg, bart_cfg, dtype="float32", remat=remat_mode)
        params = model.init(jax.random.PRNGKey(0), img, txt)["params"]

        def loss(p):
            h = model.apply(
                {"params": p}, img, txt, method="forward_hidden"
            )
            return jnp.sum(h.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss))(params)

    g_ref = grads(False)
    g = grads(remat)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )
