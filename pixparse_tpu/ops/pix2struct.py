"""Pix2Struct variable-resolution patchification.

Pix2Struct (Lee et al. 2022) does not resize documents to a fixed canvas:
each image is rescaled (aspect preserved) so its patch grid fills a fixed
``max_patches`` budget, then every patch carries its (row, col) grid
coordinate. Named as part of the hot preprocessing path by the project
north-star (BASELINE.json); the reference repo itself never implements it
(its models are fixed-canvas ViT — ``models/image_encoder_timm.py``), so this
is a capability extension kept TPU-first:

- the output is STATIC-shape: (max_patches, p*p*C) float patches + int32
  rows/cols + validity mask, pad rows zeroed — one XLA program regardless of
  source aspect ratio,
- :func:`patchify_variable` is the host (numpy) version used by loaders on
  variable-size originals; :func:`patchify_variable_batch` is the jitted
  device version for fixed-size batches (serving).

Grid math follows the published preprocessor: scale = sqrt(max_patches *
(p/h) * (p/w)), grid dims clamped to >= 1, resize to (rows*p, cols*p).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def variable_grid(
    h: int, w: int, patch_size: int, max_patches: int
) -> Tuple[int, int]:
    """(rows, cols) of the patch grid maximizing area within the budget."""
    scale = math.sqrt(max_patches * (patch_size / h) * (patch_size / w))
    rows = max(min(math.floor(scale * h / patch_size), max_patches), 1)
    cols = max(min(math.floor(scale * w / patch_size), max_patches), 1)
    # floor() can still overshoot the budget jointly; shrink the larger dim
    while rows * cols > max_patches:
        if rows >= cols:
            rows -= 1
        else:
            cols -= 1
    return rows, cols


def patchify_variable(
    image: np.ndarray,  # (H, W, C) uint8 or float
    patch_size: int,
    max_patches: int,
    mean=(0.5,),
    std=(0.5,),
) -> Dict[str, np.ndarray]:
    """Host path: variable-size image -> fixed (max_patches, ...) tensors."""
    if image.ndim == 2:
        image = image[:, :, None]
    if image.dtype.kind == "f":
        # accept float images in [0, 1] or [0, 255]; a float image whose max
        # is <= 1.5 is treated as [0, 1] (an all-dark [0, 255] float image is
        # ambiguous — pass uint8 to be explicit)
        scale = 255.0 if image.max() <= 1.5 else 1.0
        image = np.clip(image * scale, 0, 255).astype(np.uint8)
    h, w, c = image.shape
    rows, cols = variable_grid(h, w, patch_size, max_patches)
    th, tw = rows * patch_size, cols * patch_size

    from pixparse_tpu.native import resize_bilinear

    resized = resize_bilinear(image.astype(np.uint8), (th, tw))
    if resized is None:  # PIL fallback
        from PIL import Image

        pil = Image.fromarray(
            image[:, :, 0] if c == 1 else image, "L" if c == 1 else "RGB"
        )
        resized = np.asarray(pil.resize((tw, th), Image.BILINEAR))
        if resized.ndim == 2:
            resized = resized[:, :, None]

    x = resized.astype(np.float32) / 255.0
    mean_a = np.asarray(mean, np.float32).reshape(1, 1, -1)
    std_a = np.asarray(std, np.float32).reshape(1, 1, -1)
    x = (x - mean_a) / std_a

    p = patch_size
    n = rows * cols
    patches = (
        x.reshape(rows, p, cols, p, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n, p * p * c)
    )
    out_patches = np.zeros((max_patches, p * p * c), np.float32)
    out_patches[:n] = patches
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    out_rows = np.zeros((max_patches,), np.int32)
    out_cols = np.zeros((max_patches,), np.int32)
    out_rows[:n] = rr.reshape(-1)
    out_cols[:n] = cc.reshape(-1)
    mask = np.zeros((max_patches,), bool)
    mask[:n] = True
    return {
        "patches": out_patches,
        "rows": out_rows,
        "cols": out_cols,
        "mask": mask,
    }


@functools.partial(
    jax.jit, static_argnames=("patch_size", "max_patches")
)
def patchify_variable_batch(
    images: jax.Array,  # (B, H, W, C) float, already normalized
    patch_size: int,
    max_patches: int,
) -> Dict[str, jax.Array]:
    """Device path for fixed-size batches: one resize+gather XLA program.
    The grid is static per input shape (computed at trace time)."""
    B, H, W, C = images.shape
    rows, cols = variable_grid(H, W, patch_size, max_patches)
    p = patch_size
    th, tw = rows * p, cols * p
    x = jax.image.resize(images, (B, th, tw, C), method="bilinear")
    n = rows * cols
    patches = (
        x.reshape(B, rows, p, cols, p, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, n, p * p * C)
    )
    pad = max_patches - n
    if pad:
        patches = jnp.pad(patches, ((0, 0), (0, pad), (0, 0)))
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0).reshape(-1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1).reshape(-1)
    rr = jnp.pad(rr, (0, pad))
    cc = jnp.pad(cc, (0, pad))
    mask = jnp.arange(max_patches) < n
    return {
        "patches": patches,
        "rows": jnp.broadcast_to(rr, (B, max_patches)),
        "cols": jnp.broadcast_to(cc, (B, max_patches)),
        "mask": jnp.broadcast_to(mask, (B, max_patches)),
    }
