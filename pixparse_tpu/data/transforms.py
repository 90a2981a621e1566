"""Document image transforms & augmentations.

Capability parity with reference ``data/transforms.py`` (names 'legacy',
'better', 'nougat'; CropMargin, AlignLongAxis, aspect-preserving
ResizeKeepRatio with train-time scale/ratio jitter, Bitmap thresholding,
Erosion/Dilation morphology, small-probability geometric/photometric
distortions, RandomPad-to-canvas with fill=255, CenterCrop(OrPad)), written
first-party on numpy/PIL/cv2.

Host-side by design: augmentation is branchy per-sample work that belongs on
CPU feeding the device pipeline; the *hot* eval/serving path (resize + pad +
normalize + patchify, no augmentation) additionally has a fused on-device
implementation in :mod:`pixparse_tpu.ops.preprocess`.

All pipelines take a PIL image and return float32 numpy (H, W, C), normalized,
C=1 for grayscale — fixed shape == image_size, which keeps the train step a
single static XLA program.

Note: the reference exports ``create_transforms`` but its tasks hard-code a
plain resize+normalize (``task_cruller_pretrain.py:132-144`` FIXME). Here the
tasks call :func:`create_transforms` properly; 'legacy' reproduces the
hard-coded behaviour.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

_logger = logging.getLogger(__name__)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# --------------------------------------------------------------------------
# primitive ops on uint8 numpy arrays (H, W) or (H, W, C)
# --------------------------------------------------------------------------

def _to_numpy(img: Union[Image.Image, np.ndarray]) -> np.ndarray:
    if isinstance(img, Image.Image):
        return np.asarray(img)
    return img


def _interp_flag(interpolation: str):
    table = {
        "bilinear": Image.BILINEAR,
        "bicubic": Image.BICUBIC,
        "nearest": Image.NEAREST,
        "lanczos": Image.LANCZOS,
    }
    return table.get(interpolation, Image.BICUBIC)


def _resize(img: np.ndarray, size: Tuple[int, int], interpolation: str) -> np.ndarray:
    """Antialiased resize to (h, w). uint8 bilinear/bicubic takes the native
    SIMD path (bit-exact with PIL — tests/test_native_resize.py; the resize is
    the single largest host-CPU cost per document, see native/ header);
    everything else falls back to PIL."""
    from pixparse_tpu.native import resize_filter

    out = resize_filter(img, size, interpolation)
    if out is not None:
        return out
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((size[1], size[0]), _interp_flag(interpolation)))


def crop_margin(img: np.ndarray) -> np.ndarray:
    """Crop to the bounding box of 'ink' (non-background) pixels.

    Background is assumed light (documents); the box is found on the
    min-max-normalized grayscale thresholded at mid-gray
    (behaviour parity: ``data/transforms.py:268-288``)."""
    if img.ndim == 2:
        gray = img.astype(np.float32)
    else:  # PIL 'L' luma weights (reference converts via img.convert('L'))
        gray = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).astype(np.float32)
    gmax, gmin = float(gray.max()), float(gray.min())
    if gmax <= gmin:
        return img
    norm = (gray - gmin) / (gmax - gmin)
    ink = norm < (200.0 / 255.0)  # reference threshold (<200 after 0-255 norm)
    ys, xs = np.nonzero(ink)
    if len(ys) == 0:
        return img
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    return img[y0:y1, x0:x1]


def align_long_axis(img: np.ndarray, target_size: Tuple[int, int]) -> np.ndarray:
    """Rotate 90 degrees when the image's long axis disagrees with the target
    canvas orientation (parity: ``data/transforms.py:291-308``)."""
    th, tw = target_size
    h, w = img.shape[:2]
    if (tw > th and w < h) or (tw < th and w > h):
        img = np.rot90(img, k=3)  # clockwise (reference F.rotate(angle=-90))
    return img


def resize_keep_ratio(
    img: np.ndarray,
    target_size: Tuple[int, int],
    interpolation: str = "bicubic",
    scale: float = 1.0,
    ratio: float = 1.0,
    longest: float = 1.0,
) -> np.ndarray:
    """Aspect-preserving resize (reference ``ResizeKeepRatio.get_params``,
    ``data/transforms.py:362-387``): fit by the longest side (``longest=1``),
    jittered by a common ``scale`` factor and an aspect ``ratio`` factor that
    divides the height factor and multiplies the width factor. NO clamping to
    the target — the result may exceed it (train pads then center-crops)."""
    th, tw = target_size
    h, w = img.shape[:2]
    ratio_h, ratio_w = h / th, w / tw
    fit = max(ratio_h, ratio_w) * longest + min(ratio_h, ratio_w) * (1.0 - longest)
    nh = max(1, round(h * (scale / ratio) / fit))
    nw = max(1, round(w * (scale * ratio) / fit))
    return _resize(img, (nh, nw), interpolation)


def random_pad(
    img: np.ndarray,
    target_size: Tuple[int, int],
    rng: np.random.RandomState,
    fill: int = 255,
    random_placement: bool = True,
) -> np.ndarray:
    """Pad onto a fill-colored canvas, random (train) or centered placement.

    Pad-only, like the reference RandomPad (padding clamped at 0 on oversize
    axes, ``data/transforms.py:434-448``): an axis already >= target is left
    untouched, so resize-jitter overshoot survives to the pipeline's
    CenterCrop instead of being top-left-cropped here."""
    th, tw = target_size
    h, w = img.shape[:2]
    oh, ow = max(th, h), max(tw, w)
    if random_placement:
        top = int(rng.randint(0, oh - h + 1))
        left = int(rng.randint(0, ow - w + 1))
    else:
        top = (oh - h) // 2
        left = (ow - w) // 2
    if (oh, ow) == (h, w):
        return img
    shape = (oh, ow) if img.ndim == 2 else (oh, ow, img.shape[2])
    canvas = np.full(shape, fill, dtype=img.dtype)
    canvas[top:top + h, left:left + w] = img
    return canvas


def _center_crop(img: np.ndarray, target_size: Tuple[int, int]) -> np.ndarray:
    """Plain center crop (reference 'better' train tail: RandomPad has already
    padded to >= target, CenterCrop trims any resize-jitter overshoot)."""
    th, tw = target_size
    h, w = img.shape[:2]
    top = max(0, (h - th) // 2)
    left = max(0, (w - tw) // 2)
    return img[top:top + th, left:left + tw]


def center_crop_or_pad(img: np.ndarray, target_size: Tuple[int, int], fill: int = 255) -> np.ndarray:
    th, tw = target_size
    h, w = img.shape[:2]
    # crop if larger
    if h > th:
        top = (h - th) // 2
        img = img[top:top + th]
    if w > tw:
        left = (w - tw) // 2
        img = img[:, left:left + tw]
    return random_pad(img, target_size, np.random, fill=fill, random_placement=False)


def bitmap(img: np.ndarray, threshold: int = 200) -> np.ndarray:
    """Reference ``Bitmap`` LUT (``data/transforms.py:419-429``): pixels below
    the threshold go to 0, pixels at/above KEEP their value (not 255)."""
    return np.where(img < threshold, 0, img).astype(np.uint8)


def _morph_kernel(rng: Optional[np.random.RandomState], scale) -> np.ndarray:
    """'better' uses a square kernel (PIL Min/MaxFilter(3) == cv2 rect 3x3);
    nougat's alb variants draw an ELLIPSE kernel with per-axis size
    ``np.random.randint(scale[0], scale[1])`` (``transforms.py:487-510``)."""
    if isinstance(scale, (tuple, list)):
        size = tuple(int(rng.randint(scale[0], scale[1])) for _ in range(2))
        if cv2 is not None:
            return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, size)
        return np.ones(size[::-1], np.uint8)
    return np.ones((scale, scale), np.uint8)


def erosion(img: np.ndarray, scale=3, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Min-filter (ink grows on dark-on-light docs)."""
    if cv2 is not None:
        return cv2.erode(img, _morph_kernel(rng, scale))
    return _min_filter(img, scale if isinstance(scale, int) else scale[0])


def dilation(img: np.ndarray, scale=3, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    if cv2 is not None:
        return cv2.dilate(img, _morph_kernel(rng, scale))
    k = scale if isinstance(scale, int) else scale[0]
    return 255 - _min_filter(255 - img, k)


def _min_filter(img: np.ndarray, ksize: int) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view

    # asymmetric padding keeps the output shape for EVEN kernels too (the
    # nougat alb morphology draws sizes from (2, 3)); a symmetric k//2 pad
    # would grow the image by 1px and break static batch shapes downstream
    lo, hi = (ksize - 1) // 2, ksize // 2
    padded = np.pad(img, [(lo, hi), (lo, hi)] + [(0, 0)] * (img.ndim - 2), mode="edge")
    win = sliding_window_view(padded, (ksize, ksize), axis=(0, 1))
    return win.min(axis=(-2, -1)).astype(img.dtype)


def _border_value(img: np.ndarray, fill: int):
    return [fill] * 3 if img.ndim == 3 else fill


def tv_affine(
    img: np.ndarray,
    angle: float = 0.0,
    translate: Tuple[int, int] = (0, 0),
    shear: Tuple[float, float] = (0.0, 0.0),
    scale: float = 1.0,
    fill: int = 255,
    interpolation: int = 2,  # cv2.INTER_CUBIC
) -> np.ndarray:
    """torchvision ``F.affine`` on numpy: the exact inverse-affine matrix from
    torchvision ``_get_inverse_affine_matrix`` applied via cv2
    ``WARP_INVERSE_MAP`` (reference RandomAffine ops,
    ``data/transforms.py:119-137``)."""
    if cv2 is None:
        return img
    import math

    h, w = img.shape[:2]
    cx, cy = w * 0.5, h * 0.5
    tx, ty = translate
    rot = math.radians(angle)
    sx, sy = (math.radians(s) for s in shear)
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    m = [d / scale, -b / scale, 0.0, -c / scale, a / scale, 0.0]
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    return cv2.warpAffine(
        img,
        np.array(m, np.float64).reshape(2, 3),
        (w, h),
        flags=interpolation | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=_border_value(img, fill),
    )


def shift_scale_rotate(
    img: np.ndarray,
    rng: np.random.RandomState,
    shift_x=(0.0, 0.04),
    shift_y=(0.0, 0.03),
    scale_limit=(-0.15, 0.03),
    rotate_limit: float = 2.0,
    fill: int = 255,
    interpolation: int = 2,
) -> np.ndarray:
    """alb ``ShiftScaleRotate`` (nougat pipeline, ``transforms.py:203-212``):
    rotation+scale about center, then fractional shift. Note the ONE-SIDED
    shift ranges the reference uses."""
    if cv2 is None:
        return img
    h, w = img.shape[:2]
    angle = rng.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + rng.uniform(*scale_limit)
    dx = rng.uniform(*shift_x)
    dy = rng.uniform(*shift_y)
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
    m[0, 2] += dx * w
    m[1, 2] += dy * h
    return cv2.warpAffine(
        img, m, (w, h), flags=interpolation,
        borderMode=cv2.BORDER_CONSTANT, borderValue=_border_value(img, fill),
    )


def grid_distortion(
    img: np.ndarray,
    rng: np.random.RandomState,
    num_steps: int = 5,
    distort_limit: float = 0.05,
    fill: int = 255,
    interpolation: int = 2,
) -> np.ndarray:
    """alb ``GridDistortion`` (nougat, ``transforms.py:213-219``): per-cell
    random stretch of a num_steps grid, remapped."""
    if cv2 is None:
        return img
    h, w = img.shape[:2]
    stepsx = 1 + rng.uniform(-distort_limit, distort_limit, num_steps + 1)
    stepsy = 1 + rng.uniform(-distort_limit, distort_limit, num_steps + 1)

    def _axis_map(size: int, steps: np.ndarray) -> np.ndarray:
        step = size // num_steps
        mapping = np.zeros(size, np.float32)
        prev = 0.0
        for idx in range(num_steps + 1):
            start = idx * step
            end = min(start + step, size)
            if start >= size:
                break
            cur = size if end == size and start + step > size else prev + step * steps[idx]
            mapping[start:end] = np.linspace(prev, cur, end - start)
            prev = cur
        return mapping

    map_x = np.tile(_axis_map(w, stepsx), (h, 1))
    map_y = np.tile(_axis_map(h, stepsy)[:, None], (1, w))
    return cv2.remap(
        img, map_x, map_y, interpolation=interpolation,
        borderMode=cv2.BORDER_CONSTANT, borderValue=_border_value(img, fill),
    )


def elastic(
    img: np.ndarray,
    rng: np.random.RandomState,
    alpha: float = 50.0,
    sigma: float = 12.0,
    alpha_affine: float = 0.0,
    fill: int = 255,
    interpolation: int = 2,
) -> np.ndarray:
    """Elastic distortion: gaussian-smoothed random displacement field
    (reference 'better' torchvision ElasticTransform(50, 12) and nougat alb
    ElasticTransform(50, 12, alpha_affine=1.2) magnitudes). ``alpha_affine``
    adds alb's 3-point random affine pre-warp."""
    if cv2 is None:
        return img
    h, w = img.shape[:2]
    if alpha_affine > 0:
        center = np.float32([w, h]) // 2
        sq = min(w, h) // 3
        pts1 = np.float32(
            [center + sq, [center[0] + sq, center[1] - sq], center - sq]
        )
        pts2 = pts1 + rng.uniform(-alpha_affine, alpha_affine, pts1.shape).astype(np.float32)
        img = cv2.warpAffine(
            img, cv2.getAffineTransform(pts1, pts2), (w, h),
            borderMode=cv2.BORDER_CONSTANT, borderValue=_border_value(img, fill),
        )
    dx = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), sigma) * alpha
    dy = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), sigma) * alpha
    x, y = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return cv2.remap(
        img, x + dx, y + dy, interpolation=interpolation,
        borderMode=cv2.BORDER_CONSTANT, borderValue=_border_value(img, fill),
    )


def gaussian_blur(
    img: np.ndarray,
    rng: np.random.RandomState,
    sigma_range: Tuple[float, float] = (0.1, 0.5),
    ksize: int = 3,
) -> np.ndarray:
    """'better': torchvision GaussianBlur(3, sigma=(0.1, 0.5)); nougat: alb
    GaussianBlur((3, 3)) with sigma 0 (cv2 derives 0.8 from the kernel)."""
    if cv2 is None:
        return img
    sigma = rng.uniform(*sigma_range) if sigma_range else 0.0
    return cv2.GaussianBlur(img, (ksize, ksize), sigma)


def color_jitter(
    img: np.ndarray, rng: np.random.RandomState, brightness: float = 0.1, contrast: float = 0.1
) -> np.ndarray:
    """torchvision ColorJitter(0.1, 0.1) ('better', ``transforms.py:146-149``):
    brightness scales the image, contrast blends with the grayscale mean; the
    two apply in random order like torchvision's permutation."""
    x = img.astype(np.float32)
    ops = []
    if brightness:
        b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda v: v * b)
    if contrast:
        c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)

        def _contrast(v):
            if v.ndim == 3 and v.shape[2] == 3:
                mean = (0.299 * v[..., 0] + 0.587 * v[..., 1] + 0.114 * v[..., 2]).mean()
            else:
                mean = v.mean()
            return c * v + (1 - c) * mean

        ops.append(_contrast)
    for i in rng.permutation(len(ops)):
        x = ops[i](x)
    return np.clip(x, 0, 255).astype(np.uint8)


def brightness_contrast(
    img: np.ndarray, rng: np.random.RandomState, brightness: float = 0.1, contrast: float = 0.1
) -> np.ndarray:
    """alb RandomBrightnessContrast(0.1, 0.1, brightness_by_max=True)
    (nougat, ``transforms.py:240``): img*alpha + beta*255."""
    alpha = 1.0 + rng.uniform(-contrast, contrast)
    beta = rng.uniform(-brightness, brightness)
    out = img.astype(np.float32) * alpha + beta * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


def jpeg_compression(img: np.ndarray, rng: np.random.RandomState, quality_range=(95, 101)) -> np.ndarray:
    # reference nougat aug: alb.ImageCompression(95) = quality 95-100
    if cv2 is None:
        return img
    q = int(rng.randint(*quality_range))
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    if not ok:
        return img
    dec = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
    return dec if dec is not None else img


def gaussian_noise(img: np.ndarray, rng: np.random.RandomState, var_limit=(0.0, 20.0)) -> np.ndarray:
    """alb GaussNoise(20) (nougat): variance ~ U(0, 20), sigma = sqrt(var)."""
    sigma = float(np.sqrt(rng.uniform(*var_limit)))
    noise = rng.randn(*img.shape) * sigma
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# pipelines
# --------------------------------------------------------------------------

def _as_float_normalized(img: np.ndarray, mean, std) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    if x.ndim == 2:
        x = x[:, :, None]
    mean = np.asarray(mean, np.float32).reshape(1, 1, -1)
    std = np.asarray(std, np.float32).reshape(1, 1, -1)
    return (x - mean) / std


class ImagePipeline:
    """Composable document transform: PIL -> normalized float32 (H, W, C)."""

    def __init__(
        self,
        name: str,
        image_size: Tuple[int, int],
        training: bool,
        image_mean,
        image_std,
        interpolation: str = "bicubic",
        crop_margin: bool = False,
        align_long_axis: bool = False,
        fill: int = 255,
        seed: Optional[int] = None,
        normalize: bool = True,
    ):
        self.name = name
        self.image_size = tuple(image_size)
        self.training = training
        # normalize=False emits uint8 (H, W, C): the host half of the
        # device_preprocess split (ops/preprocess.py normalizes on device,
        # fused into the encoder program, with a 4x smaller H2D transfer)
        self.normalize = normalize
        self.mean = image_mean if isinstance(image_mean, (tuple, list)) else (image_mean,)
        self.std = image_std if isinstance(image_std, (tuple, list)) else (image_std,)
        self.interpolation = interpolation
        self.crop_margin = crop_margin
        self.align_long_axis = align_long_axis
        self.fill = fill
        self._seed = seed
        import collections
        import threading

        # per-op application counts across all samples/threads (approximate
        # under concurrency; used by distribution-parity tests)
        self.op_counts = collections.Counter()
        self._tl = threading.local()
        self._salt_lock = threading.Lock()
        self._next_salt = 0

    @property
    def rng(self) -> np.random.RandomState:
        # per-thread RNG: loader workers are threads and RandomState is not
        # thread-safe. The salt is a monotonic per-pipeline counter —
        # thread idents collide across concurrent threads (verified
        # empirically) and are allocation-dependent, which would break both
        # stream independence and seeded reproducibility.
        rng = getattr(self._tl, "rng", None)
        if rng is None:
            with self._salt_lock:
                salt = self._next_salt
                self._next_salt += 1
            rng = np.random.RandomState(
                None if self._seed is None else self._seed + salt
            )
            self._tl.rng = rng
        return rng

    def __call__(self, img: Union[Image.Image, np.ndarray]) -> np.ndarray:
        x = _to_numpy(img)
        if x.ndim == 3 and x.shape[2] == 1:
            x = x[:, :, 0]  # native decoder emits (H, W, 1); pipeline works 2D
        if self.name == "legacy":
            return self._finish(_resize(x, self.image_size, self.interpolation))
        return self._document_pipeline(x)

    def _finish(self, x: np.ndarray) -> np.ndarray:
        if not self.normalize:
            if x.ndim == 2:
                x = x[:, :, None]
            return np.ascontiguousarray(x, dtype=np.uint8)
        return _as_float_normalized(x, self.mean, self.std)

    def _apply(self, gate_p: float, rng, name: str, x, fn):
        """RandomApply: fire with probability ``gate_p``, count applications
        (the distribution-parity test reads ``op_counts``)."""
        if rng.rand() < gate_p:
            self.op_counts[name] += 1
            return fn(x)
        return x

    def _document_pipeline(self, x: np.ndarray) -> np.ndarray:
        rng = self.rng
        if self.crop_margin:
            x = crop_margin(x)
        if self.align_long_axis:
            x = align_long_axis(x, self.image_size)

        if not self.training:
            x = resize_keep_ratio(x, self.image_size, self.interpolation)
            x = center_crop_or_pad(x, self.image_size, fill=self.fill)
            return self._finish(x)

        if self.name == "nougat":
            x = self._nougat_train(x, rng)
        else:
            x = self._better_train(x, rng)
        return self._finish(x)

    def _better_train(self, x: np.ndarray, rng) -> np.ndarray:
        """Reference 'better' train ops in order, exact probabilities and
        magnitudes (``/root/reference/src/pixparse/data/transforms.py:100-158``)."""
        fill = self.fill
        # ResizeKeepRatio(longest=1, random_scale_prob=.05 (0.85, 1.04),
        # random_aspect_prob=.05 (0.9, 1.11))
        scale = float(rng.uniform(0.85, 1.04)) if rng.rand() < 0.05 else 1.0
        ratio = float(rng.uniform(0.9, 1.11)) if rng.rand() < 0.05 else 1.0
        x = resize_keep_ratio(x, self.image_size, self.interpolation, scale, ratio)
        x = self._apply(0.05, rng, "bitmap", x, bitmap)
        # RandomChoice(Erosion(3) | Dilation(3)) at p=.02
        x = self._apply(
            0.02, rng, "morph", x,
            lambda v: erosion(v, 3) if rng.rand() < 0.5 else dilation(v, 3),
        )
        # RandomAffine(degrees=0, shear=(0, 3, -3, 0))
        x = self._apply(
            0.05, rng, "shear", x,
            lambda v: tv_affine(
                v, shear=(rng.uniform(0, 3.0), rng.uniform(-3.0, 0)), fill=fill
            ),
        )
        # RandomAffine(degrees=3, translate=(0, 0.04)): tx from 0*w, ty from .04*h
        x = self._apply(
            0.05, rng, "rotate_translate", x,
            lambda v: tv_affine(
                v,
                angle=rng.uniform(-3.0, 3.0),
                translate=(
                    0,
                    int(round(rng.uniform(-0.04, 0.04) * v.shape[0]))
                ),
                fill=fill,
            ),
        )
        x = self._apply(
            0.05, rng, "elastic", x,
            lambda v: elastic(v, rng, alpha=50.0, sigma=12.0, fill=fill),
        )
        x = self._apply(0.05, rng, "color_jitter", x, lambda v: color_jitter(v, rng, 0.1, 0.1))
        x = self._apply(
            0.05, rng, "blur", x, lambda v: gaussian_blur(v, rng, (0.1, 0.5), ksize=3)
        )
        x = random_pad(x, self.image_size, rng, fill=fill, random_placement=True)
        return _center_crop(x, self.image_size)

    def _nougat_train(self, x: np.ndarray, rng) -> np.ndarray:
        """Reference 'nougat' train ops: resize + RandomPad FIRST, then the
        albumentations sequence (``transforms.py:196-243``). Probabilities and
        magnitudes match the reference; geometry ops use cv2 equivalents of
        the alb ops (ellipse morphology kernels, ShiftScaleRotate,
        GridDistortion, affine-pre-warped elastic)."""
        fill = self.fill
        x = resize_keep_ratio(x, self.image_size, self.interpolation)
        x = random_pad(x, self.image_size, rng, fill=fill, random_placement=True)
        x = self._apply(0.05, rng, "bitmap", x, bitmap)
        # alb.OneOf([ErosionAlb((2,3)), DilationAlb((2,3))], p=.02)
        x = self._apply(
            0.02, rng, "morph", x,
            lambda v: erosion(v, (2, 3), rng) if rng.rand() < 0.5 else dilation(v, (2, 3), rng),
        )
        # alb.Affine(shear x (0,3), y (-3,0), cval=255)
        x = self._apply(
            0.03, rng, "shear", x,
            lambda v: tv_affine(
                v, shear=(rng.uniform(0, 3.0), rng.uniform(-3.0, 0)), fill=fill
            ),
        )
        x = self._apply(
            0.03, rng, "shift_scale_rotate", x,
            lambda v: shift_scale_rotate(v, rng, fill=fill),
        )
        x = self._apply(
            0.04, rng, "grid_distortion", x,
            lambda v: grid_distortion(v, rng, fill=fill),
        )
        # alb.Compose([Affine(translate_px=(0,5)), Elastic(50, 12, 1.2)], p=.04)
        x = self._apply(
            0.04, rng, "elastic", x,
            lambda v: elastic(
                tv_affine(
                    v,
                    translate=(int(rng.randint(0, 6)), int(rng.randint(0, 6))),
                    fill=fill,
                ),
                rng, alpha=50.0, sigma=12.0, alpha_affine=1.2, fill=fill,
                interpolation=1,  # alb elastic default INTER_LINEAR
            ),
        )
        x = self._apply(
            0.03, rng, "brightness_contrast", x,
            lambda v: brightness_contrast(v, rng, 0.1, 0.1),
        )
        x = self._apply(0.07, rng, "jpeg", x, lambda v: jpeg_compression(v, rng))
        x = self._apply(0.08, rng, "noise", x, lambda v: gaussian_noise(v, rng))
        x = self._apply(
            0.03, rng, "blur", x,
            lambda v: gaussian_blur(v, rng, sigma_range=None, ksize=3),
        )
        return x


def create_transforms(
    name: str,
    image_size: Tuple[int, int],
    training: bool = False,
    image_mean: Union[float, Sequence[float]] = 0.5,
    image_std: Union[float, Sequence[float]] = 0.5,
    interpolation: str = "bicubic",
    crop_margin: bool = False,
    align_long_axis: bool = False,
    fill: int = 255,
    seed: Optional[int] = None,
    normalize: bool = True,
) -> ImagePipeline:
    """Factory (parity: reference ``data/transforms.py:27-55``): 'legacy'
    (resize+normalize), 'better' (torchvision-equivalent doc pipeline),
    'nougat' (adds compression/noise distortions). ``normalize=False`` keeps
    uint8 output for the on-device normalize path (ops/preprocess.py)."""
    assert name in ("legacy", "better", "nougat"), f"unknown transform set {name}"
    return ImagePipeline(
        name=name,
        image_size=image_size,
        training=training,
        image_mean=image_mean,
        image_std=image_std,
        interpolation=interpolation,
        crop_margin=crop_margin,
        align_long_axis=align_long_axis,
        fill=fill,
        seed=seed,
        normalize=normalize,
    )
