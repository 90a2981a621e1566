"""Native data-plane library tests (decode, resize PIL-parity, fused path).

Skipped entirely when the toolchain can't build ``libpixparse_native.so`` —
every native entry point has a PIL fallback in the loaders.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixparse_tpu.native import (
    choose_jpeg_scale,
    decode_image,
    native_available,
    resize_bilinear,
    resize_pad_normalize,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def _gray_image(h=200, w=160, seed=0):
    rng = np.random.RandomState(seed)
    # smooth-ish synthetic document: low-frequency background + lines
    base = np.full((h, w), 235, np.uint8)
    for y in range(10, h, 20):
        base[y:y + 2, 10:-10] = rng.randint(0, 80)
    return base


def test_png_decode_exact():
    arr = _gray_image()
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, format="PNG")
    out = decode_image(buf.getvalue(), gray=True)
    assert out.shape == (200, 160, 1)
    np.testing.assert_array_equal(out[:, :, 0], arr)


def test_jpeg_decode_close_and_scaled():
    arr = _gray_image()
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, format="JPEG", quality=95)
    out = decode_image(buf.getvalue(), gray=True)
    assert out.shape == (200, 160, 1)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("L"))
    assert np.abs(out[:, :, 0].astype(int) - pil.astype(int)).mean() < 2.0

    scaled = decode_image(buf.getvalue(), gray=True, target_size=(100, 80))
    assert scaled.shape == (100, 80, 1)  # 1/2 DCT scale


def test_choose_jpeg_scale():
    assert choose_jpeg_scale(2000, 1600, 576, 448) == 2
    assert choose_jpeg_scale(4800, 3600, 576, 448) == 8
    assert choose_jpeg_scale(600, 500, 576, 448) == 1


def test_resize_matches_pil_bilinear():
    arr = np.random.RandomState(0).randint(0, 255, (300, 220), np.uint8)
    for size in [(64, 48), (576, 448)]:
        ours = resize_bilinear(arr[:, :, None], size)[:, :, 0]
        pil = np.asarray(
            Image.fromarray(arr, "L").resize((size[1], size[0]), Image.BILINEAR)
        )
        assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_fused_resize_pad_normalize():
    arr = _gray_image()
    out = resize_pad_normalize(arr[:, :, None], (128, 100), (120, 96), (0.5,), (0.5,))
    assert out.shape == (128, 100, 1)
    # padding area = (255/255 - 0.5)/0.5 = 1.0
    np.testing.assert_allclose(out[125, 98, 0], 1.0, atol=1e-5)
    # image area reproduces the plain resize+normalize
    ref = resize_bilinear(arr[:, :, None], (120, 96)).astype(np.float32) / 255.0
    ref = (ref - 0.5) / 0.5
    np.testing.assert_allclose(out[:120, :96], ref, atol=1e-5)


def test_wds_decode_uses_native_path():
    from pixparse_tpu.data.wds import decode_image_bytes

    arr = _gray_image()
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, format="PNG")
    out = decode_image_bytes(buf.getvalue(), "png", image_fmt="L")
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out[:, :, 0], arr)


def test_jpeg_gray_source_rgb_request_gives_3_channels():
    arr = _gray_image()
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, format="JPEG", quality=95)
    out = decode_image(buf.getvalue(), gray=False)
    assert out.shape == (200, 160, 3)
