"""Weight-import fidelity tests (SURVEY.md §7 "hard parts": gate with
logit-parity tests).

The decoder parity test is the gold check: a real HF ``BartForCausalLM``
(random-initialized tiny config, no network) is exported to its torch state
dict, mapped into our flax decoder, and logits must match to fp32 tolerance
on random inputs with cross-attention.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixparse_tpu.models.bart import BartCausalDecoder, BartDecoderCfg
from pixparse_tpu.models.vit import ViT, ViTCfg
from pixparse_tpu.models.torch_interop import (
    bart_params_from_torch,
    bart_params_to_torch,
    cruller_params_from_torch,
    cruller_params_to_torch,
    normalize_state_dict,
    resize_pos_embed,
    resize_token_embeddings,
    vit_params_from_torch,
    vit_params_to_torch,
)

torch = pytest.importorskip("torch")


# ------------------------------------------------------------------ HF BART

def _tiny_hf_bart():
    from transformers import BartConfig, BartForCausalLM

    config = BartConfig(
        vocab_size=128,
        d_model=32,
        decoder_layers=2,
        decoder_attention_heads=4,
        decoder_ffn_dim=64,
        max_position_embeddings=64,
        add_cross_attention=True,
        is_decoder=True,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        scale_embedding=False,
    )
    torch.manual_seed(0)
    return BartForCausalLM(config), config


def test_bart_decoder_logits_match_hf():
    hf_model, config = _tiny_hf_bart()
    hf_model.eval()
    cfg = BartDecoderCfg(
        vocab_size=config.vocab_size,
        d_model=config.d_model,
        decoder_layers=config.decoder_layers,
        decoder_attention_heads=config.decoder_attention_heads,
        decoder_ffn_dim=config.decoder_ffn_dim,
        max_position_embeddings=config.max_position_embeddings,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    sd = normalize_state_dict(hf_model.state_dict())
    params = bart_params_from_torch(sd, cfg)

    B, L, Lk = 2, 10, 7
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (B, L)).astype(np.int64)
    enc = rng.randn(B, Lk, cfg.d_model).astype(np.float32)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states=torch.from_numpy(enc),
        ).logits.numpy()

    model = BartCausalDecoder(cfg)
    ours = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(enc), mode="train"
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-4, rtol=2e-4)


def test_bart_roundtrip_export_import():
    cfg = BartDecoderCfg(
        vocab_size=64, d_model=16, decoder_layers=2,
        decoder_attention_heads=2, decoder_ffn_dim=32, max_position_embeddings=32,
    )
    model = BartCausalDecoder(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    enc = jnp.zeros((1, 3, 16))
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x),
        __import__("flax").linen.unbox(model.init(jax.random.PRNGKey(0), ids, enc))["params"],
    )
    sd = bart_params_to_torch(params, cfg)
    back = bart_params_from_torch(sd, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )


# ------------------------------------------------------------------ ViT

def _vit_cfg():
    return ViTCfg(
        img_size=(32, 32), patch_size=16, in_chans=1,
        embed_dim=32, depth=2, num_heads=2,
    )


def test_vit_roundtrip_and_torch_linear_convention():
    cfg = _vit_cfg()
    model = ViT(cfg)
    import flax.linen as nn

    img = jnp.zeros((1, *cfg.img_size, cfg.in_chans))
    params = jax.tree_util.tree_map(
        np.asarray, nn.unbox(model.init(jax.random.PRNGKey(0), img))["params"]
    )
    sd = vit_params_to_torch(params, cfg)
    # exported weights follow torch Linear (out, in): y = x @ W.T + b
    x = np.random.RandomState(0).randn(5, cfg.embed_dim).astype(np.float32)
    w = sd["blocks.0.attn.qkv.weight"]
    ours = x @ np.asarray(params["blocks_0"]["attn"]["qkv"]["kernel"])
    theirs = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w),
    ).numpy()
    np.testing.assert_allclose(ours + sd["blocks.0.attn.qkv.bias"], theirs + sd["blocks.0.attn.qkv.bias"], atol=1e-5)

    back = vit_params_from_torch(sd, cfg)
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_patch_embed_conv_equivalence():
    """timm conv patch-embed == our reshape+matmul after weight mapping."""
    cfg = _vit_cfg()
    rng = np.random.RandomState(0)
    D, C, p = cfg.embed_dim, cfg.in_chans, cfg.patch_size
    conv_w = rng.randn(D, C, p, p).astype(np.float32)
    conv_b = rng.randn(D).astype(np.float32)
    img = rng.randn(2, C, 32, 32).astype(np.float32)  # NCHW for torch

    out_torch = torch.nn.functional.conv2d(
        torch.from_numpy(img), torch.from_numpy(conv_w),
        torch.from_numpy(conv_b), stride=p,
    ).numpy()  # (B, D, gh, gw)
    out_torch = out_torch.reshape(2, D, -1).transpose(0, 2, 1)  # (B, N, D)

    from pixparse_tpu.models.torch_interop import _patch_kernel_from_torch

    kernel = _patch_kernel_from_torch(conv_w, C)
    nhwc = img.transpose(0, 2, 3, 1)
    B, H, W, _ = nhwc.shape
    gh, gw = H // p, W // p
    x = nhwc.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
    ours = x @ kernel + conv_b
    np.testing.assert_allclose(ours, out_torch, atol=1e-4)


def test_in_chans_adaptation_3_to_1():
    cfg = _vit_cfg()
    rng = np.random.RandomState(0)
    conv_w3 = rng.randn(cfg.embed_dim, 3, 16, 16).astype(np.float32)
    from pixparse_tpu.models.torch_interop import _patch_kernel_from_torch

    k1 = _patch_kernel_from_torch(conv_w3, 1)
    assert k1.shape == (16 * 16 * 1, cfg.embed_dim)
    # channel-sum semantics (timm adapt_input_conv)
    np.testing.assert_allclose(
        k1, _patch_kernel_from_torch(conv_w3.sum(1, keepdims=True), 1), atol=1e-6
    )


def test_resize_pos_embed():
    pos = np.random.RandomState(0).randn(1, 1 + 4, 8).astype(np.float32)  # 2x2 grid + cls
    out = resize_pos_embed(pos, (4, 4), old_grid=(2, 2), has_cls=True)
    assert out.shape == (1, 17, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls untouched


# ------------------------------------------------------------- Cruller + misc

def test_cruller_roundtrip_with_ddp_prefix_and_model_wrapper():
    vit_cfg = _vit_cfg()
    bart_cfg = BartDecoderCfg(
        vocab_size=64, d_model=32, decoder_layers=2,
        decoder_attention_heads=2, decoder_ffn_dim=64, max_position_embeddings=32,
    )
    from pixparse_tpu.models.cruller import Cruller
    import flax.linen as nn

    model = Cruller(vit_cfg, bart_cfg)
    img = jnp.zeros((1, *vit_cfg.img_size, vit_cfg.in_chans))
    txt = jnp.zeros((1, 4), jnp.int32)
    params = jax.tree_util.tree_map(
        np.asarray, nn.unbox(model.init(jax.random.PRNGKey(0), img, txt))["params"]
    )
    sd = cruller_params_to_torch(params, vit_cfg, bart_cfg)
    assert "image_encoder.trunk.blocks.0.attn.qkv.weight" in sd
    assert "text_decoder.trunk.model.decoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_decoder.trunk.lm_head.weight" in sd

    # simulate DDP-saved wrapper: module. prefixes + {"model": sd}
    wrapped = {"model": {f"module.{k}": v for k, v in sd.items()}}
    back = cruller_params_from_torch(wrapped, vit_cfg, bart_cfg)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_pt_file_roundtrip(tmp_path):
    from pixparse_tpu.models.torch_interop import (
        load_torch_checkpoint,
        save_torch_checkpoint,
    )

    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = str(tmp_path / "ckpt.pt")
    save_torch_checkpoint(path, sd)
    back = load_torch_checkpoint(path)
    np.testing.assert_array_equal(back["a.weight"], sd["a.weight"])


def test_resize_token_embeddings_replay():
    params = {"embed_tokens": {"embedding": np.zeros((10, 4), np.float32)}}
    grown = resize_token_embeddings(params, 14, seed=0)
    assert grown["embed_tokens"]["embedding"].shape == (14, 4)
    np.testing.assert_array_equal(grown["embed_tokens"]["embedding"][:10], 0)
    assert grown["embed_tokens"]["embedding"][10:].std() > 0
    # deterministic replay
    again = resize_token_embeddings(params, 14, seed=0)
    np.testing.assert_array_equal(
        grown["embed_tokens"]["embedding"], again["embed_tokens"]["embedding"]
    )
    shrunk = resize_token_embeddings(grown, 10, seed=0)
    assert shrunk["embed_tokens"]["embedding"].shape == (10, 4)


def test_swin_roundtrip_export_import():
    import flax.linen as nn
    import jax.numpy as jnp

    from pixparse_tpu.models.swin import Swin, resolve_swin_cfg
    from pixparse_tpu.models.torch_interop import (
        swin_params_from_torch,
        swin_params_to_torch,
    )

    cfg, _ = resolve_swin_cfg("swin_test", (64, 64), 1)
    model = Swin(cfg)
    params = jax.tree_util.tree_map(
        np.asarray,
        nn.unbox(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))))["params"],
    )
    sd = swin_params_to_torch(params, cfg)
    assert "layers.0.blocks.0.attn.relative_position_bias_table" in sd
    assert "layers.0.downsample.reduction.weight" in sd
    back = swin_params_from_torch(sd, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back,
    )


def test_mbart_decoder_logits_match_hf():
    """Pre-LN (mBART/Donut) decoder parity vs a real HF MBartForCausalLM."""
    from transformers import MBartConfig, MBartForCausalLM

    config = MBartConfig(
        vocab_size=128, d_model=32, decoder_layers=2,
        decoder_attention_heads=4, decoder_ffn_dim=64,
        max_position_embeddings=64, add_cross_attention=True, is_decoder=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        scale_embedding=True, activation_function="gelu",
    )
    torch.manual_seed(0)
    hf_model = MBartForCausalLM(config)
    hf_model.eval()

    cfg = BartDecoderCfg(
        vocab_size=config.vocab_size, d_model=config.d_model,
        decoder_layers=config.decoder_layers,
        decoder_attention_heads=config.decoder_attention_heads,
        decoder_ffn_dim=config.decoder_ffn_dim,
        max_position_embeddings=config.max_position_embeddings,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pre_norm=True, add_final_layer_norm=True, scale_embedding=True,
    )
    sd = normalize_state_dict(hf_model.state_dict())
    params = bart_params_from_torch(sd, cfg)

    B, L, Lk = 2, 10, 7
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (B, L)).astype(np.int64)
    enc = rng.randn(B, Lk, cfg.d_model).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states=torch.from_numpy(enc),
        ).logits.numpy()

    from pixparse_tpu.models.bart import BartCausalDecoder

    model = BartCausalDecoder(cfg)
    ours = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(enc), mode="train"
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-4, rtol=2e-4)
