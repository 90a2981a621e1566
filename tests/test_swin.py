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
