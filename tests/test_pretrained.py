"""Pretrained-backbone initialization (models/pretrained.py).

Reference parity: pretrained init is the reference's *default* workflow
(``models/config.py:20,26``, ``image_encoder_timm.py:13-20``,
``text_decoder_hf.py:25-33`` in /root/reference). These tests build tiny
timm-format / HF-format state dicts on disk (no hub) and assert the config
flag wires them into flax params with logit fidelity — plus the loud-error
contract when weights can't be resolved.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixparse_tpu.models.bart import BartCausalDecoder, BartDecoderCfg
from pixparse_tpu.models.config import ImageEncoderCfg, ModelCfg, TextDecoderCfg
from pixparse_tpu.models.cruller import Cruller
from pixparse_tpu.models.pretrained import (
    load_pretrained_decoder_params,
    load_pretrained_encoder_params,
    maybe_load_pretrained,
)
from pixparse_tpu.models.torch_interop import (
    save_torch_checkpoint,
    vit_params_to_torch,
)
from pixparse_tpu.models.vit import ViT, ViTCfg

torch = pytest.importorskip("torch")


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


def _bart_cfg(config, **over):
    base = dict(
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
    base.update(over)
    return BartDecoderCfg(**base)


def _vit_cfg():
    return ViTCfg(
        img_size=(32, 32), patch_size=16, in_chans=1,
        embed_dim=32, depth=2, num_heads=2,
    )


def test_pretrained_decoder_logits_match_hf(tmp_path):
    """pretrained_path -> HF .pt file -> flax params, logits identical."""
    hf_model, config = _tiny_hf_bart()
    hf_model.eval()
    path = tmp_path / "bart.pt"
    save_torch_checkpoint(
        str(path),
        {k: v.numpy() for k, v in hf_model.state_dict().items()},
    )

    dec_cfg = TextDecoderCfg(name="tiny-bart", pretrained=True, pretrained_path=str(path))
    cfg = _bart_cfg(config)
    params = load_pretrained_decoder_params(dec_cfg, cfg)

    B, L, Lk = 2, 10, 7
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (B, L)).astype(np.int64)
    enc = rng.randn(B, Lk, cfg.d_model).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states=torch.from_numpy(enc),
        ).logits.numpy()
    ours = BartCausalDecoder(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(enc), mode="train"
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-4, rtol=2e-4)


def test_pretrained_decoder_layer_truncation_and_vocab_resize(tmp_path):
    """Reference semantics: num_decoder_layers truncates the checkpoint
    (text_decoder_hf.py:19-21) and added task tokens grow the vocab after
    import (the §5.4 replay protocol)."""
    hf_model, config = _tiny_hf_bart()
    path = tmp_path / "bart.pt"
    save_torch_checkpoint(
        str(path), {k: v.numpy() for k, v in hf_model.state_dict().items()}
    )
    dec_cfg = TextDecoderCfg(name="tiny-bart", pretrained=True, pretrained_path=str(path))
    cfg = _bart_cfg(config, decoder_layers=1, vocab_size=config.vocab_size + 7)
    params = load_pretrained_decoder_params(dec_cfg, cfg)

    emb = np.asarray(params["embed_tokens"]["embedding"])
    assert emb.shape == (config.vocab_size + 7, config.d_model)
    np.testing.assert_array_equal(
        emb[: config.vocab_size],
        hf_model.state_dict()["model.decoder.embed_tokens.weight"].numpy(),
    )
    assert "layers_0" in params and "layers_1" not in params
    np.testing.assert_array_equal(
        np.asarray(params["layers_0"]["self_attn"]["q_proj"]["kernel"]),
        hf_model.state_dict()["model.decoder.layers.0.self_attn.q_proj.weight"].numpy().T,
    )

    # more layers than the checkpoint has is a hard error, not silent init
    too_deep = _bart_cfg(config, decoder_layers=5)
    with pytest.raises(RuntimeError, match="layers"):
        load_pretrained_decoder_params(dec_cfg, too_deep)


def test_pretrained_decoder_position_table_fit(tmp_path):
    """cfg.max_length != checkpoint positions: overlap kept, tail truncated."""
    hf_model, config = _tiny_hf_bart()
    path = tmp_path / "bart.pt"
    save_torch_checkpoint(
        str(path), {k: v.numpy() for k, v in hf_model.state_dict().items()}
    )
    dec_cfg = TextDecoderCfg(name="tiny-bart", pretrained=True, pretrained_path=str(path))
    cfg = _bart_cfg(config, max_position_embeddings=32)
    params = load_pretrained_decoder_params(dec_cfg, cfg)
    pos = np.asarray(params["embed_positions"]["embedding"])
    src = hf_model.state_dict()["model.decoder.embed_positions.weight"].numpy()
    assert pos.shape[0] == 32 + cfg.pos_offset
    np.testing.assert_array_equal(pos, src[: pos.shape[0]])


def test_pretrained_encoder_roundtrip(tmp_path):
    """timm-layout .pt on disk -> flag -> flax ViT params, bit-identical."""
    cfg = _vit_cfg()
    import flax.linen as nn

    img = jnp.zeros((1, *cfg.img_size, cfg.in_chans))
    params = jax.tree_util.tree_map(
        np.asarray, nn.unbox(ViT(cfg).init(jax.random.PRNGKey(0), img))["params"]
    )
    path = tmp_path / "vit.pt"
    save_torch_checkpoint(str(path), vit_params_to_torch(params, cfg))

    enc_cfg = ImageEncoderCfg(
        name="vit_tiny_test", pretrained=True, pretrained_path=str(path)
    )
    loaded = load_pretrained_encoder_params(enc_cfg, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        loaded,
    )


def test_pretrained_missing_weights_raises(monkeypatch):
    monkeypatch.delenv("PIXPARSE_PRETRAINED_DIR", raising=False)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    enc_cfg = ImageEncoderCfg(name="vit_base_patch16_224", pretrained=True)
    with pytest.raises(RuntimeError, match="pretrained=True"):
        load_pretrained_encoder_params(enc_cfg, _vit_cfg())
    dec_cfg = TextDecoderCfg(name="nonexistent/model-xyz", pretrained=True)
    with pytest.raises(RuntimeError, match="pretrained=True"):
        load_pretrained_decoder_params(dec_cfg, _bart_cfg(_tiny_hf_bart()[1]))


def test_pretrained_env_dir_resolution(tmp_path, monkeypatch):
    """$PIXPARSE_PRETRAINED_DIR/<cleaned-name>.pt resolves by model name."""
    hf_model, config = _tiny_hf_bart()
    save_torch_checkpoint(
        str(tmp_path / "facebook_tiny-bart.pt"),
        {k: v.numpy() for k, v in hf_model.state_dict().items()},
    )
    monkeypatch.setenv("PIXPARSE_PRETRAINED_DIR", str(tmp_path))
    dec_cfg = TextDecoderCfg(name="facebook/tiny-bart", pretrained=True)
    params = load_pretrained_decoder_params(dec_cfg, _bart_cfg(config))
    np.testing.assert_array_equal(
        np.asarray(params["embed_tokens"]["embedding"]),
        hf_model.state_dict()["model.decoder.embed_tokens.weight"].numpy(),
    )


def test_maybe_load_pretrained_matches_cruller_init_structure(tmp_path):
    """The subtrees returned by maybe_load_pretrained tree_map cleanly onto a
    freshly-initialized Cruller param tree (the exact train_setup merge)."""
    import flax.linen as nn

    vit_cfg = _vit_cfg()
    hf_model, config = _tiny_hf_bart()
    bart_cfg = _bart_cfg(config)  # d_model 32 == vit embed_dim 32

    # encoder weights: export a second, differently-seeded ViT
    donor = jax.tree_util.tree_map(
        np.asarray,
        nn.unbox(
            ViT(vit_cfg).init(
                jax.random.PRNGKey(7), jnp.zeros((1, *vit_cfg.img_size, vit_cfg.in_chans))
            )
        )["params"],
    )
    save_torch_checkpoint(str(tmp_path / "enc.pt"), vit_params_to_torch(donor, vit_cfg))
    save_torch_checkpoint(
        str(tmp_path / "dec.pt"),
        {k: v.numpy() for k, v in hf_model.state_dict().items()},
    )

    model_cfg = ModelCfg(
        image_encoder=ImageEncoderCfg(
            name="vit_tiny_test", pretrained=True,
            pretrained_path=str(tmp_path / "enc.pt"),
        ),
        text_decoder=TextDecoderCfg(
            name="tiny-bart", pretrained=True,
            pretrained_path=str(tmp_path / "dec.pt"),
        ),
    )
    pre = maybe_load_pretrained(model_cfg, vit_cfg, bart_cfg)
    assert set(pre) == {"image_encoder", "text_decoder"}

    model = Cruller(vit_cfg, bart_cfg)
    init = nn.unbox(
        model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *vit_cfg.img_size, vit_cfg.in_chans)),
            jnp.zeros((1, 4), jnp.int32),
        )
    )["params"]
    for key, subtree in pre.items():
        merged = jax.tree_util.tree_map(
            lambda t, p: np.asarray(p, dtype=np.asarray(t).dtype), init[key], subtree
        )
        assert (
            jax.tree_util.tree_structure(merged)
            == jax.tree_util.tree_structure(init[key])
        )

    # flags off -> no-op
    assert maybe_load_pretrained(
        dataclasses.replace(
            model_cfg,
            image_encoder=ImageEncoderCfg(pretrained=False),
            text_decoder=TextDecoderCfg(pretrained=False),
        ),
        vit_cfg,
        bart_cfg,
    ) == {}


def test_pretrained_flag_wires_into_task_train_setup(tmp_path):
    """Full wiring: cfg.model.*.pretrained=True -> task.train_setup loads the
    donor weights into the sharded train state (replaying the vocab resize)
    and the merged state trains a finite step on the 8-device mesh."""
    import flax.linen as nn

    from pixparse_tpu.framework.config import OptimizationCfg
    from pixparse_tpu.models.torch_interop import bart_params_to_torch
    from pixparse_tpu.parallel.mesh import MeshEnv
    from pixparse_tpu.task import TaskCrullerPretrain, TaskCrullerPretrainCfg
    from pixparse_tpu.tokenizers import TokenizerCfg

    env = MeshEnv.initialize()
    cfg = TaskCrullerPretrainCfg(
        model_name="cruller_test",
        tokenizer=TokenizerCfg(name="pixparse_bytelevel"),
        opt=OptimizationCfg(learning_rate=1e-3),
    )
    task = TaskCrullerPretrain(cfg, env, None)

    # donor weights at a SMALLER vocab than the task's (forces the resize
    # replay), exported in timm / HF layouts through our own exporters
    donor_vocab = task.vocab_size - 5
    donor_bart = dataclasses.replace(task.bart_cfg, vocab_size=donor_vocab)
    dec = BartCausalDecoder(donor_bart)
    dec_params = jax.tree_util.tree_map(
        np.asarray,
        nn.unbox(
            dec.init(
                jax.random.PRNGKey(3),
                jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, 3, donor_bart.d_model)),
            )
        )["params"],
    )
    save_torch_checkpoint(
        str(tmp_path / "dec.pt"), bart_params_to_torch(dec_params, donor_bart)
    )
    enc_params = jax.tree_util.tree_map(
        np.asarray,
        nn.unbox(
            ViT(task.vit_cfg).init(
                jax.random.PRNGKey(4),
                jnp.zeros((1, *task.vit_cfg.img_size, task.vit_cfg.in_chans)),
            )
        )["params"],
    )
    save_torch_checkpoint(
        str(tmp_path / "enc.pt"), vit_params_to_torch(enc_params, task.vit_cfg)
    )

    cfg.model.image_encoder.pretrained = True
    cfg.model.image_encoder.pretrained_path = str(tmp_path / "enc.pt")
    cfg.model.text_decoder.pretrained = True
    cfg.model.text_decoder.pretrained_path = str(tmp_path / "dec.pt")
    task.train_setup(num_batches_per_interval=2)

    emb = np.asarray(task.state.params["text_decoder"]["embed_tokens"]["embedding"])
    assert emb.shape[0] == task.vocab_size
    np.testing.assert_allclose(
        emb[:donor_vocab], dec_params["embed_tokens"]["embedding"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(task.state.params["image_encoder"]["patch_embed"]["kernel"]),
        enc_params["patch_embed"]["kernel"],
        atol=1e-6,
    )

    rng = np.random.RandomState(0)
    L = task.max_position_embeddings
    batch = {
        "image": rng.rand(8, 64, 48, 1).astype(np.float32),
        "text": rng.randint(4, 200, (8, L)).astype(np.int64),
        "target": rng.randint(4, 200, (8, L)).astype(np.int64),
    }
    assert np.isfinite(float(task.train_step(batch)["loss"]))
