"""Fused device preprocessing vs host pipeline + ViT patchify parity."""

import numpy as np
import jax.numpy as jnp

from pixparse_tpu.ops.preprocess import patchify, preprocess_patchify, resize_pad_normalize


def test_resize_pad_normalize_shapes_and_range():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (4, 100, 60, 1), np.uint8)
    out = resize_pad_normalize(jnp.asarray(imgs), (64, 48), mean=(0.5,), std=(0.5,))
    assert out.shape == (4, 64, 48, 1)
    out = np.asarray(out)
    assert out.min() >= -1.001 and out.max() <= 1.001
    # aspect preserved: 100x60 scaled by min(64/100, 48/60)=0.64 -> 64x38(ish);
    # right columns are fill=255 -> normalized to +1
    np.testing.assert_allclose(out[:, :, -1, :], 1.0, atol=1e-5)


def test_patchify_matches_vit_input_stage():
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 64, 48, 1).astype(np.float32)
    p = 16
    out = np.asarray(patchify(jnp.asarray(imgs), p))
    B, H, W, C = imgs.shape
    gh, gw = H // p, W // p
    ref = imgs.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, gh * gw, p * p * C
    )
    np.testing.assert_array_equal(out, ref)


def test_fused_pipeline_end_to_end():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (2, 80, 60, 1), np.uint8)
    patches = preprocess_patchify(jnp.asarray(imgs), (64, 48), 16)
    assert patches.shape == (2, (64 // 16) * (48 // 16), 16 * 16 * 1)
    assert np.isfinite(np.asarray(patches)).all()
