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


def test_resize_filter_bit_exact_with_pil():
    """resize_filter's contract is BIT-exactness with PIL (same taps,
    fixed-point coefficients, pass order, uint8 intermediate, clip8)."""
    from pixparse_tpu.native import resize_filter

    rng = np.random.RandomState(0)
    cases = [
        # (src h, w, c) -> (dst h, w), filter — down, up, mixed, single-axis
        ((640, 500, 1), (576, 445), "bicubic"),
        ((640, 500, 1), (576, 445), "bilinear"),
        ((1650, 1275, 1), (576, 445), "bicubic"),
        ((200, 300, 1), (576, 445), "bicubic"),
        ((240, 100, 3), (60, 200), "bicubic"),
        ((5, 7, 1), (3, 2), "bicubic"),
        ((2, 2, 1), (9, 9), "bilinear"),
        ((300, 200, 1), (300, 120), "bicubic"),
        ((300, 200, 1), (120, 200), "bicubic"),
    ]
    flags = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR}
    for (sh, sw, c), (dh, dw), interp in cases:
        x = rng.randint(0, 256, (sh, sw, c), np.uint8)
        x2 = x[:, :, 0] if c == 1 else x
        ref = np.asarray(Image.fromarray(x2).resize((dw, dh), flags[interp]))
        got = resize_filter(x2, (dh, dw), interp)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(
            got, ref, err_msg=f"{(sh, sw, c)}->{(dh, dw)} {interp}"
        )


def test_resize_filter_document_structure_exact():
    """Hard-edge document structure (line grids) is where intermediate
    rounding/clamping deviations would show; still bit-exact."""
    from pixparse_tpu.native import resize_filter

    doc = np.full((660, 510), 255, np.uint8)
    doc[::7, :] = 0
    doc[:, ::11] = 30
    ref = np.asarray(Image.fromarray(doc).resize((445, 576), Image.BICUBIC))
    got = resize_filter(doc, (576, 445), "bicubic")
    np.testing.assert_array_equal(got, ref)


def test_resize_filter_fallback_conditions():
    from pixparse_tpu.native import resize_filter

    f32 = np.zeros((8, 8), np.float32)
    assert resize_filter(f32, (4, 4), "bicubic") is None  # dtype
    u8 = np.zeros((8, 8), np.uint8)
    assert resize_filter(u8, (4, 4), "lanczos") is None  # unsupported filter
    out = resize_filter(u8, (4, 4), "bilinear")
    assert out.shape == (4, 4)  # 2D in -> 2D out


def test_transforms_resize_routes_through_native():
    from pixparse_tpu.data.transforms import _resize

    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, (300, 220), np.uint8)
    got = _resize(x, (120, 90), "bicubic")
    ref = np.asarray(Image.fromarray(x).resize((90, 120), Image.BICUBIC))
    np.testing.assert_array_equal(got, ref)


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
