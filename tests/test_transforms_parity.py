"""Augmentation-distribution parity vs the reference pipelines.

The reference 'better' pipeline (``/root/reference/src/pixparse/data/
transforms.py:100-158``) and 'nougat' pipeline (``:196-243``) define exact op
sets, probabilities, and magnitudes. These tests pin (a) op semantics the
round-1 code got wrong (Bitmap keeps bright values, ResizeKeepRatio doesn't
clamp, torchvision affine matrix) and (b) the per-op apply-rate distribution
over seeded runs.
"""

import numpy as np
import pytest

from pixparse_tpu.data.transforms import (
    bitmap,
    create_transforms,
    grid_distortion,
    resize_keep_ratio,
    shift_scale_rotate,
    tv_affine,
)


def _img(h=100, w=80, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w), np.uint8)


# ------------------------------------------------------------- op semantics

def test_bitmap_keeps_bright_values():
    """Reference Bitmap LUT: ``0 if i < 200 else i`` — bright pixels keep
    their value (transforms.py:419-429), they are NOT forced to 255."""
    x = np.array([[0, 199, 200, 230, 255]], np.uint8)
    np.testing.assert_array_equal(bitmap(x), [[0, 0, 200, 230, 255]])


def test_resize_keep_ratio_reference_arithmetic():
    """size = round(src * factor / ratio) with ratio = max(h/th, w/tw),
    aspect dividing the h factor and multiplying the w factor, NO clamping
    (ResizeKeepRatio.get_params, transforms.py:362-387)."""
    x = _img(100, 80)
    th, tw = 64, 48
    ratio = max(100 / th, 80 / tw)  # 80/48
    out = resize_keep_ratio(x, (th, tw), scale=1.0, ratio=1.0)
    assert out.shape == (round(100 / ratio), round(80 / ratio))

    out = resize_keep_ratio(x, (th, tw), scale=1.04, ratio=1.11)
    nh = round(100 * (1.04 / 1.11) / ratio)
    nw = round(80 * (1.04 * 1.11) / ratio)
    assert out.shape == (nh, nw)
    assert nw > tw  # jitter may overshoot the canvas; CenterCrop handles it


def test_tv_affine_identity_and_translation():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    x = _img(40, 30)
    np.testing.assert_array_equal(tv_affine(x), x)

    # positive translate moves content right/down (torchvision convention)
    dot = np.zeros((21, 21), np.uint8)
    dot[10, 10] = 255
    out = tv_affine(dot, translate=(3, 2), fill=0, interpolation=0)  # nearest
    assert out[12, 13] == 255
    assert out[10, 10] == 0


def test_tv_affine_rotation_direction_matches_torchvision():
    """torchvision F.affine (used by RandomAffine): positive angle rotates
    CLOCKWISE on screen (content right of center moves down) — unlike
    F.rotate, which is counter-clockwise."""
    pytest.importorskip("cv2")
    dot = np.zeros((41, 41), np.uint8)
    dot[20, 30] = 255  # right of center
    out = tv_affine(dot, angle=90.0, fill=0, interpolation=0)
    ys, xs = np.nonzero(out)
    assert ys[0] > 25 and abs(int(xs[0]) - 20) <= 1  # moved to the bottom


def test_tv_affine_fill_background():
    pytest.importorskip("cv2")
    x = np.zeros((20, 20), np.uint8)
    out = tv_affine(x, angle=10.0, fill=255)
    assert (out == 255).any()  # revealed border uses fill


def test_shift_scale_rotate_identity_when_zero():
    pytest.importorskip("cv2")
    x = _img(32, 24)
    rng = np.random.RandomState(0)
    out = shift_scale_rotate(
        x, rng, shift_x=(0, 0), shift_y=(0, 0), scale_limit=(0, 0),
        rotate_limit=0.0, interpolation=0,
    )
    np.testing.assert_array_equal(out, x)


def test_grid_distortion_shape_and_determinism():
    pytest.importorskip("cv2")
    x = _img(50, 40)
    a = grid_distortion(x, np.random.RandomState(7))
    b = grid_distortion(x, np.random.RandomState(7))
    assert a.shape == x.shape
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, x)


# ------------------------------------------------- apply-rate distributions

# (op name -> reference probability)
BETTER_PROBS = {
    "bitmap": 0.05, "morph": 0.02, "shear": 0.05, "rotate_translate": 0.05,
    "elastic": 0.05, "color_jitter": 0.05, "blur": 0.05,
}
NOUGAT_PROBS = {
    "bitmap": 0.05, "morph": 0.02, "shear": 0.03, "shift_scale_rotate": 0.03,
    "grid_distortion": 0.04, "elastic": 0.04, "brightness_contrast": 0.03,
    "jpeg": 0.07, "noise": 0.08, "blur": 0.03,
}


@pytest.mark.parametrize(
    "name,probs", [("better", BETTER_PROBS), ("nougat", NOUGAT_PROBS)]
)
def test_train_aug_apply_rates_match_reference(name, probs):
    """Seeded apply-counts over N samples within 4 sigma of the reference
    probabilities (RandomApply/OneOf gates, transforms.py:108-158,196-243)."""
    n = 2500
    tr = create_transforms(
        name, (32, 24), training=True, image_mean=0.5, image_std=0.5, seed=123
    )
    img = _img(40, 30)
    for _ in range(n):
        out = tr(img)
    assert out.shape == (32, 24, 1)
    for op, p in probs.items():
        rate = tr.op_counts[op] / n
        tol = 4 * np.sqrt(p * (1 - p) / n)
        assert abs(rate - p) < tol, f"{name}/{op}: rate {rate:.4f} vs p {p}"
    assert set(tr.op_counts) <= set(probs)  # no extra ops fire


def test_better_train_output_static_shape_under_jitter():
    """Scale/aspect jitter can overshoot the canvas; RandomPad + CenterCrop
    must still produce the exact static shape every time."""
    tr = create_transforms(
        "better", (64, 48), training=True, image_mean=0.5, image_std=0.5, seed=0
    )
    for seed in range(40):
        out = tr(_img(130, 70, seed=seed))
        assert out.shape == (64, 48, 1)
