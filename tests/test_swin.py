"""Swin encoder tests: window ops, shapes, Cruller integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixparse_tpu.models.swin import (
    Swin,
    SwinCfg,
    _rel_pos_index,
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
    resolve_swin_cfg,
)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    w = 4
    windows = _window_partition(x, w)
    assert windows.shape == (2 * 2 * 3, 16, 5)
    back = _window_reverse(windows, w, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_rel_pos_index_properties():
    idx = _rel_pos_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 7 * 7
    # symmetric pairs map to mirrored offsets; diagonal is the center index
    center = (4 - 1) * (2 * 4 - 1) + (4 - 1)
    assert (np.diag(idx) == center).all()


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask < -1e8).any()
    # unshifted top-left window has no masking
    np.testing.assert_array_equal(mask[0], 0)


def test_swin_forward_shapes():
    cfg, stats = resolve_swin_cfg("swin_test", (64, 48), 1)
    model = Swin(cfg)
    x = jnp.zeros((2, 64, 48, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # 2 stages: 64/4/2 x 48/4/2 = 8x6 = 48 tokens, dim 32*2
    assert out.shape == (2, 48, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_shifted_blocks_change_output():
    """Depth-2 stages use shifted windows in block 1 — different from a
    reshuffled input (sanity that shift path is active)."""
    cfg, _ = resolve_swin_cfg("swin_test", (64, 64), 1)
    model = Swin(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    out_shifted_input = model.apply(variables, jnp.roll(x, 8, axis=1))
    assert not np.allclose(np.asarray(out), np.asarray(out_shifted_input))


def test_cruller_with_swin_encoder():
    from pixparse_tpu.models.config import get_model_config
    from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs

    cfg = get_model_config("cruller_swin_test")
    enc_cfg, bart_cfg, stats = resolve_cruller_cfgs(cfg)
    assert isinstance(enc_cfg, SwinCfg)
    model = Cruller(enc_cfg, bart_cfg)
    img = jnp.zeros((1, 64, 64, 1))
    txt = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    logits = model.apply(variables, img, txt)
    assert logits.shape == (1, 8, bart_cfg.vocab_size)


def test_donut_swin_base_resolution():
    cfg, _ = resolve_swin_cfg("donut_swin_base", (2560, 1920), 3)
    assert cfg.stage_resolution(3) == (80, 60)
    assert cfg.num_tokens == 4800
    assert cfg.out_dim == 1024
    with pytest.raises(ValueError):
        resolve_swin_cfg("donut_swin_base", (100, 100), 3)


def test_swin_logits_match_hf_donut():
    """Gold parity: tiny random HF DonutSwinModel mapped into our Swin must
    produce the same hidden states (window attention, shift masks, rel-pos
    bias, patch merging all validated at once)."""
    torch = pytest.importorskip("torch")
    from transformers import DonutSwinConfig, DonutSwinModel

    from pixparse_tpu.models.torch_interop import (
        normalize_state_dict,
        swin_params_from_hf_donut,
    )

    hf_cfg = DonutSwinConfig(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=[1, 2], num_heads=[2, 4], window_size=4,
        use_absolute_embeddings=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = DonutSwinModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = SwinCfg(
        img_size=(32, 32), patch_size=4, in_chans=3, embed_dim=16,
        depths=(1, 2), num_heads=(2, 4), window_size=4, final_norm=False,
    )
    params = swin_params_from_hf_donut(normalize_state_dict(hf.state_dict()), cfg)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)  # NCHW for HF
    with torch.no_grad():
        ref = hf(torch.from_numpy(img)).last_hidden_state.numpy()

    model = Swin(cfg)
    ours = model.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=3e-5)


# ------------------------------------------------------------ pix2struct enc

def test_pix2struct_encoder_forward_and_mask():
    import jax
    import jax.numpy as jnp

    from pixparse_tpu.models.pix2struct import Pix2StructCfg, Pix2StructEncoder
    from pixparse_tpu.ops.pix2struct import patchify_variable

    cfg = Pix2StructCfg(
        max_patches=64, patch_size=16, in_chans=1,
        embed_dim=32, depth=2, num_heads=2, max_rows=32, max_cols=32,
    )
    model = Pix2StructEncoder(cfg)
    rng = np.random.RandomState(0)
    sample = patchify_variable(
        rng.randint(0, 255, (120, 90, 1), np.uint8), 16, cfg.max_patches
    )
    batch = {
        k: jnp.asarray(np.stack([v, v]))
        for k, v in sample.items()
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["patches"], batch["rows"],
        batch["cols"], batch["mask"],
    )
    out = model.apply(
        variables, batch["patches"], batch["rows"], batch["cols"], batch["mask"]
    )
    assert out.shape == (2, cfg.max_patches, cfg.embed_dim)
    n = int(sample["mask"].sum())
    out_np = np.asarray(out)
    # pad tokens zeroed; real tokens nonzero
    np.testing.assert_array_equal(out_np[:, n:], 0)
    assert np.abs(out_np[:, :n]).max() > 0

    # changing PAD patch content must not affect real-token outputs
    patches2 = np.asarray(batch["patches"]).copy()
    patches2[:, n:] = 123.0
    out2 = model.apply(
        variables, jnp.asarray(patches2), batch["rows"], batch["cols"], batch["mask"]
    )
    np.testing.assert_allclose(out_np[:, :n], np.asarray(out2)[:, :n], atol=1e-5)


def test_pix2struct_cruller_composition():
    """Pix2Struct encoder output feeds the BART decoder cross-attention."""
    import jax
    import jax.numpy as jnp

    from pixparse_tpu.models.bart import BartCausalDecoder, BartDecoderCfg
    from pixparse_tpu.models.pix2struct import Pix2StructCfg, Pix2StructEncoder
    from pixparse_tpu.ops.pix2struct import patchify_variable

    enc_cfg = Pix2StructCfg(
        max_patches=32, patch_size=16, in_chans=1,
        embed_dim=32, depth=1, num_heads=2, max_rows=16, max_cols=16,
    )
    dec_cfg = BartDecoderCfg(
        vocab_size=64, d_model=32, decoder_layers=1,
        decoder_attention_heads=2, decoder_ffn_dim=64, max_position_embeddings=32,
    )
    enc = Pix2StructEncoder(enc_cfg)
    dec = BartCausalDecoder(dec_cfg)
    rng = np.random.RandomState(0)
    s = patchify_variable(rng.randint(0, 255, (100, 70, 1), np.uint8), 16, 32)
    b = {k: jnp.asarray(v[None]) for k, v in s.items()}
    ev = enc.init(jax.random.PRNGKey(0), b["patches"], b["rows"], b["cols"], b["mask"])
    hidden = enc.apply(ev, b["patches"], b["rows"], b["cols"], b["mask"])
    ids = jnp.zeros((1, 4), jnp.int32)
    dv = dec.init(jax.random.PRNGKey(1), ids, hidden)
    logits = dec.apply(dv, ids, hidden, mode="train")
    assert logits.shape == (1, 4, 64)


def test_flash_window_guard_predicate(monkeypatch):
    """Containment for the known context-sensitive Mosaic fault: the
    unvalidated envelope is batch>4 AND >=3-stage encode on real TPU
    (docs/PERF.md 'Fused Swin window attention'); CPU/interpret never
    guards."""
    from pixparse_tpu.models import swin as swin_mod
    from pixparse_tpu.ops import flash_attention as fa

    # on CPU (interpret) the kernel is safe: guard must stay off
    assert not swin_mod._flash_window_unvalidated(8, 3)

    monkeypatch.setattr(fa, "_interpret", lambda: False)  # pretend real TPU
    assert swin_mod._flash_window_unvalidated(8, 3)   # the faulting case
    assert swin_mod._flash_window_unvalidated(5, 4)
    assert not swin_mod._flash_window_unvalidated(4, 3)  # validated on chip
    assert not swin_mod._flash_window_unvalidated(8, 2)  # sub-3-stage


def test_flash_window_guard_falls_back_to_xla(monkeypatch, caplog):
    """attn_impl='flash' at an unvalidated composition must run the XLA
    window path (same numerics as attn_impl='xla') and log a warning, not
    dispatch the Pallas kernel."""
    import logging

    from pixparse_tpu.models import swin as swin_mod
    from pixparse_tpu.ops import flash_attention as fa
    from pixparse_tpu.ops import window_attention as wa

    monkeypatch.setattr(fa, "_interpret", lambda: False)  # pretend real TPU

    def _boom(*a, **k):  # the kernel must never be reached
        raise AssertionError("Pallas window kernel dispatched under guard")

    monkeypatch.setattr(wa, "window_attention", _boom)

    cfg = SwinCfg(
        img_size=(64, 48), patch_size=4, in_chans=1, embed_dim=16,
        depths=(1, 1, 1), num_heads=(2, 2, 2), window_size=4,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(8, 64, 48, 1), jnp.float32)
    flash = Swin(cfg, attn_impl="flash")
    variables = flash.init(jax.random.PRNGKey(0), x)
    with caplog.at_level(logging.WARNING, logger="pixparse_tpu.models.swin"):
        out = flash.apply(variables, x)
    assert any("UNVALIDATED" in r.message for r in caplog.records)
    ref = Swin(cfg, attn_impl="xla").apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
