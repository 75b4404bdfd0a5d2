"""On-device image preprocessing.

The reference preprocesses on the host with OpenCV (``detect.py:107-129``:
BGR->gray, resize, ``(x-128)/255``) or pushes normalisation into the NPU
runtime config (``rknn_deploy.py:179-180``).  Here the whole chain runs on
the TPU so a streaming pipeline never leaves HBM:

* :func:`bgr_to_gray` reproduces OpenCV's fixed-point BT.601 BGR->gray
  (coefficients 0.299/0.587/0.114, rounded like ``cv2.cvtColor``).
* :func:`downsample2x` is the exact-factor-2 bilinear resize
  (512x640 -> 256x320 is the only resize the reference dataset needs); with
  half-pixel centres a factor-2 bilinear reduction is the mean of each 2x2
  block, matching ``cv2.resize(INTER_LINEAR)`` up to fixed-point rounding.
* :func:`normalize` is the ``(x - 128) / 255`` step (``detect.py:124``,
  ``detect_dataset.py:155`` + ``:115``).

For arbitrary resize factors use :func:`resize_bilinear` (jax.image, half-pixel
centres — same geometry as OpenCV, float arithmetic).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# OpenCV CV_BGR2GRAY fixed-point coefficients: round(c * 2^14)
_CV_B = 1868  # 0.114
_CV_G = 9617  # 0.587
_CV_R = 4899  # 0.299
_CV_SHIFT = 14


def bgr_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) uint8 BGR -> (..., H, W) uint8 gray, cv2-exact."""
    img = img.astype(jnp.int32)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    acc = b * _CV_B + g * _CV_G + r * _CV_R + (1 << (_CV_SHIFT - 1))
    return (acc >> _CV_SHIFT).astype(jnp.uint8)


def downsample2x(img: jax.Array) -> jax.Array:
    """Exact 2x bilinear downsample of (..., H, W) uint8/float.

    With half-pixel centres, destination pixel (i, j) samples source position
    (2i + 0.5, 2j + 0.5) — the average of the 2x2 block.  Rounds to nearest
    like OpenCV's fixed-point path.
    """
    x = img.astype(jnp.int32)
    h, w = x.shape[-2], x.shape[-1]
    x = x.reshape(*x.shape[:-2], h // 2, 2, w // 2, 2)
    s = x.sum(axis=(-3, -1))
    return ((s + 2) >> 2).astype(jnp.uint8)


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """General bilinear resize (half-pixel centres) of (..., H, W)."""
    out_shape = (*img.shape[:-2], *out_hw)
    y = jax.image.resize(img.astype(jnp.float32), out_shape, method="linear")
    if jnp.issubdtype(img.dtype, jnp.integer):
        y = jnp.round(y).clip(0, 255).astype(img.dtype)
    return y


def normalize(img: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (..., H, W[, C]) -> normalised float ``(x - 128) / 255``."""
    return (img.astype(dtype) - 128.0) / 255.0


def preprocess_device(
    bgr_batch: jax.Array,
    input_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jax.Array:
    """Full on-device preprocess: (B, H0, W0, 3) uint8 BGR -> (B, H, W, 1).

    Equivalent of the reference host chain ``detect.py:107-129``.  Uses the
    exact 2x kernel when the ratio is exactly 2, general bilinear otherwise.
    """
    gray = bgr_to_gray(bgr_batch)  # (B, H0, W0)
    h0, w0 = gray.shape[-2], gray.shape[-1]
    h, w = input_hw
    if (h0, w0) == (h, w):
        pass
    elif h0 == 2 * h and w0 == 2 * w:
        gray = downsample2x(gray)
    else:
        gray = resize_bilinear(gray, (h, w))
    return normalize(gray, dtype)[..., None]
