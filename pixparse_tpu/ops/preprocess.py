"""Fused on-device image preprocessing (the hot eval/serving path).

The reference runs decode + resize + pad + normalize per-sample on CPU through
PIL/torchvision (``data/transforms.py`` in /root/reference). For training with
augmentation that is the right place (branchy per-sample work —
:mod:`pixparse_tpu.data.transforms`), but the *eval/serving* hot path
(aspect-preserving resize -> pad-to-canvas -> normalize -> patchify) is
branch-free and batched, so here it runs on device as ONE jitted XLA program:

- uint8 batch lands on device (cheap H2D: 1 byte/px instead of 4),
- ``jax.image.resize``'s gather/matmul lowering, the pad, the normalize and
  the patchify reshape all fuse into the ViT patch-embed matmul program —
  the image tensor makes a single HBM round trip,
- static shapes per (input-size, target-size) signature keep it one compile.

The patchify here is bit-identical to :class:`pixparse_tpu.models.vit.ViT`'s
input stage, so ``preprocess_patchify`` output can feed a patch-embed matmul
directly (serving pipelines skip the intermediate image tensor entirely).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("target_size", "fill"))
def resize_pad_normalize(
    images: jax.Array,  # (B, H, W, C) uint8 or float
    target_size: Tuple[int, int],
    mean: Sequence[float] = (0.5,),
    std: Sequence[float] = (0.5,),
    fill: int = 255,
) -> jax.Array:
    """Aspect-preserving resize + top-left pad-to-canvas + normalize.

    Semantics match the host eval pipeline (``resize_keep_ratio`` +
    ``center_crop_or_pad`` with fill, then normalize) for the common
    shrink-to-fit case, computed batched on device.
    """
    B, H, W, C = images.shape
    th, tw = target_size
    scale = min(th / H, tw / W)
    nh, nw = max(1, round(H * scale)), max(1, round(W * scale))

    x = images.astype(jnp.float32)
    x = jax.image.resize(x, (B, nh, nw, C), method="bilinear")
    # centered placement, matching the host eval pipeline's
    # center_crop_or_pad (a corner-placed image would be spatially shifted
    # relative to what the model saw in training/eval)
    top = (th - nh) // 2
    left = (tw - nw) // 2
    x = jnp.pad(
        x,
        ((0, 0), (top, th - nh - top), (left, tw - nw - left), (0, 0)),
        constant_values=float(fill),
    )
    x = x / 255.0
    mean_a = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    std_a = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    return (x - mean_a) / std_a


@jax.jit
def normalize_images(
    images: jax.Array,  # (B, H, W, C) uint8 or float
    mean: jax.Array,
    std: jax.Array,
) -> jax.Array:
    """Fused uint8 -> normalized float32. The device half of the eval
    ``device_preprocess`` split: the host ships canvas-sized uint8 batches
    (4x smaller H2D) and this fuses into the encoder program."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    return (x - mean) / std


@functools.partial(jax.jit, static_argnames=("patch_size",))
def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, p*p*C), identical pixel order to the ViT patch
    embed (``models/vit.py`` reshape+transpose)."""
    B, H, W, C = images.shape
    p = patch_size
    gh, gw = H // p, W // p
    x = images.reshape(B, gh, p, gw, p, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)


@functools.partial(jax.jit, static_argnames=("target_size", "patch_size", "fill"))
def preprocess_patchify(
    images: jax.Array,
    target_size: Tuple[int, int],
    patch_size: int,
    mean: Sequence[float] = (0.5,),
    std: Sequence[float] = (0.5,),
    fill: int = 255,
) -> jax.Array:
    """Full fused path: raw uint8 batch -> normalized patch sequence ready
    for the patch-embed matmul."""
    x = resize_pad_normalize(images, target_size, mean, std, fill)
    return patchify(x, patch_size)
