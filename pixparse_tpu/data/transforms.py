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
) -> np.ndarray:
    """Aspect-preserving resize to fit inside target (optionally jittered by
    ``scale`` and aspect ``ratio`` factors, train-time)."""
    th, tw = target_size
    h, w = img.shape[:2]
    fit = min(th / h, tw / w) * scale
    nh = max(1, min(th, round(h * fit * ratio)))
    nw = max(1, min(tw, round(w * fit / ratio)))
    pil = Image.fromarray(img)
    pil = pil.resize((nw, nh), _interp_flag(interpolation))
    return np.asarray(pil)


def random_pad(
    img: np.ndarray,
    target_size: Tuple[int, int],
    rng: np.random.RandomState,
    fill: int = 255,
    random_placement: bool = True,
) -> np.ndarray:
    """Pad onto a fill-colored canvas, random (train) or centered placement."""
    th, tw = target_size
    h, w = img.shape[:2]
    h, w = min(h, th), min(w, tw)
    img = img[:h, :w]
    if random_placement:
        top = int(rng.randint(0, th - h + 1))
        left = int(rng.randint(0, tw - w + 1))
    else:
        top = (th - h) // 2
        left = (tw - w) // 2
    shape = (th, tw) if img.ndim == 2 else (th, tw, img.shape[2])
    canvas = np.full(shape, fill, dtype=img.dtype)
    canvas[top:top + h, left:left + w] = img
    return canvas


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
    """Hard binarization LUT (parity: ``data/transforms.py:416-425``)."""
    return np.where(img < threshold, 0, 255).astype(np.uint8)


def erosion(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    """Min-filter (ink grows on dark-on-light docs)."""
    if cv2 is not None:
        return cv2.erode(img, np.ones((ksize, ksize), np.uint8))
    return _min_filter(img, ksize)


def dilation(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    if cv2 is not None:
        return cv2.dilate(img, np.ones((ksize, ksize), np.uint8))
    return 255 - _min_filter(255 - img, ksize)


def _min_filter(img: np.ndarray, ksize: int) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view

    pad = ksize // 2
    padded = np.pad(img, [(pad, pad), (pad, pad)] + [(0, 0)] * (img.ndim - 2), mode="edge")
    win = sliding_window_view(padded, (ksize, ksize), axis=(0, 1))
    return win.min(axis=(-2, -1)).astype(img.dtype)


def affine(
    img: np.ndarray,
    rng: np.random.RandomState,
    max_rotate: float = 2.0,
    max_shear: float = 2.0,
    max_translate: float = 0.02,
    fill: int = 255,
) -> np.ndarray:
    """Small random rotate/shear/translate (document-safe magnitudes)."""
    if cv2 is None:
        return img
    h, w = img.shape[:2]
    angle = rng.uniform(-max_rotate, max_rotate)
    shear = np.deg2rad(rng.uniform(-max_shear, max_shear))
    tx = rng.uniform(-max_translate, max_translate) * w
    ty = rng.uniform(-max_translate, max_translate) * h
    center = (w / 2, h / 2)
    m = cv2.getRotationMatrix2D(center, angle, 1.0)
    m[0, 1] += np.tan(shear)
    m[0, 2] += tx
    m[1, 2] += ty
    return cv2.warpAffine(
        img, m, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=[fill] * 3 if img.ndim == 3 else fill,
    )


def elastic(
    img: np.ndarray,
    rng: np.random.RandomState,
    alpha: float = 50.0,
    sigma: float = 12.0,
    fill: int = 255,
) -> np.ndarray:
    if cv2 is None:
        return img
    h, w = img.shape[:2]
    dx = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), sigma) * alpha
    dy = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1), (0, 0), sigma) * alpha
    x, y = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return cv2.remap(
        img, x + dx, y + dy, interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=[fill] * 3 if img.ndim == 3 else fill,
    )


def gaussian_blur(img: np.ndarray, rng: np.random.RandomState, max_sigma: float = 1.0) -> np.ndarray:
    if cv2 is None:
        return img
    sigma = rng.uniform(0.1, max_sigma)
    return cv2.GaussianBlur(img, (0, 0), sigma)


def brightness_contrast(
    img: np.ndarray, rng: np.random.RandomState, brightness: float = 0.1, contrast: float = 0.1
) -> np.ndarray:
    b = rng.uniform(1 - brightness, 1 + brightness)
    c = rng.uniform(1 - contrast, 1 + contrast)
    mean = img.mean()
    out = (img.astype(np.float32) - mean) * c + mean * b
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


def gaussian_noise(img: np.ndarray, rng: np.random.RandomState, sigma: float = 8.0) -> np.ndarray:
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
    ):
        self.name = name
        self.image_size = tuple(image_size)
        self.training = training
        self.mean = image_mean if isinstance(image_mean, (tuple, list)) else (image_mean,)
        self.std = image_std if isinstance(image_std, (tuple, list)) else (image_std,)
        self.interpolation = interpolation
        self.crop_margin = crop_margin
        self.align_long_axis = align_long_axis
        self.fill = fill
        self._seed = seed
        import threading

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
            pil = Image.fromarray(x) if not isinstance(img, Image.Image) else img
            pil = pil.resize(
                (self.image_size[1], self.image_size[0]), _interp_flag(self.interpolation)
            )
            return _as_float_normalized(np.asarray(pil), self.mean, self.std)
        return self._document_pipeline(x)

    def _document_pipeline(self, x: np.ndarray) -> np.ndarray:
        rng = self.rng
        if self.crop_margin:
            x = crop_margin(x)
        if self.align_long_axis:
            x = align_long_axis(x, self.image_size)

        if self.training:
            # resize FIRST (reference pipeline order), with jitter applied at
            # the reference's probabilities (random_scale/aspect_prob=0.05 —
            # not every sample)
            scale = float(rng.uniform(0.85, 1.04)) if rng.rand() < 0.05 else 1.0
            ratio = (
                float(np.exp(rng.uniform(np.log(0.9), np.log(1.11))))
                if rng.rand() < 0.05
                else 1.0
            )
            x = resize_keep_ratio(x, self.image_size, self.interpolation, scale, ratio)
            # small-probability distortions at canvas resolution (applying
            # them pre-resize would average them away and cost megapixel cv2)
            if rng.rand() < 0.03:
                x = bitmap(x)
            if rng.rand() < 0.02:
                x = erosion(x)
            if rng.rand() < 0.02:
                x = dilation(x)
            if rng.rand() < 0.05:
                x = affine(x, rng, fill=self.fill)
            if rng.rand() < 0.03:
                x = elastic(x, rng, fill=self.fill)
            if rng.rand() < 0.05:
                x = brightness_contrast(x, rng)
            if rng.rand() < 0.03:
                x = gaussian_blur(x, rng)
            if self.name == "nougat":
                if rng.rand() < 0.03:
                    x = jpeg_compression(x, rng)
                if rng.rand() < 0.03:
                    x = gaussian_noise(x, rng)
            x = random_pad(x, self.image_size, rng, fill=self.fill, random_placement=True)
        else:
            x = resize_keep_ratio(x, self.image_size, self.interpolation)
            x = center_crop_or_pad(x, self.image_size, fill=self.fill)

        return _as_float_normalized(x, self.mean, self.std)


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
) -> ImagePipeline:
    """Factory (parity: reference ``data/transforms.py:27-55``): 'legacy'
    (resize+normalize), 'better' (torchvision-equivalent doc pipeline),
    'nougat' (adds compression/noise distortions)."""
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
    )
