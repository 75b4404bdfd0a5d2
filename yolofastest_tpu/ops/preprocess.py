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

from typing import Tuple

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


def _cv2_linear_taps(src: int, dst: int):
    """cv2 INTER_LINEAR tap indices + fixed-point coefficients for one axis.

    Mirrors OpenCV's 8U resize: half-pixel centres ``f = (d+0.5)*src/dst-0.5``,
    floor split, boundary clamp, coefficients rounded to the
    ``INTER_RESIZE_COEF_SCALE`` (2048) fixed-point grid.  Computed with numpy
    at trace time (static shapes) so they bake in as constants.
    """
    import numpy as np

    d = np.arange(dst, dtype=np.float64)
    f = (d + 0.5) * (src / dst) - 0.5
    s = np.floor(f).astype(np.int64)
    frac = f - s
    s0 = np.clip(s, 0, max(src - 2, 0))
    frac = np.clip(f - s0, 0.0, 1.0)  # boundary: duplicate edge pixel
    a1 = np.rint(frac * 2048.0).astype(np.int32)
    a0 = np.rint((1.0 - frac) * 2048.0).astype(np.int32)
    return s0.astype(np.int32), a0, a1


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """General bilinear resize (half-pixel centres) of (..., H, W).

    uint8 inputs go through the cv2 fixed-point scheme: 2048-scale separable
    coefficients and the SIMD vertical cast
    ``(((b0*(t0>>4))>>16) + ((b1*(t1>>4))>>16) + 2) >> 2`` (OpenCV
    ``resize.cpp`` HResizeLinear / VResizeLinearVec_32s8u for 8U).
    Bit-exact vs ``cv2.resize(INTER_LINEAR)`` for downscales; ±1 grey level
    on <0.2% of pixels for upscales (cv2's single-tap edge handling).
    Float inputs use jax.image (same geometry, float arithmetic).
    """
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    if not jnp.issubdtype(img.dtype, jnp.integer):
        out_shape = (*img.shape[:-2], *out_hw)
        return jax.image.resize(img.astype(jnp.float32), out_shape, method="linear")

    sx, ax0, ax1 = _cv2_linear_taps(w, ow)
    sy, ay0, ay1 = _cv2_linear_taps(h, oh)
    x = img.astype(jnp.int32)
    # horizontal pass: int32 rows at coefficient scale 2048
    t = (jnp.take(x, jnp.asarray(sx), axis=-1) * jnp.asarray(ax0)
         + jnp.take(x, jnp.asarray(jnp.minimum(sx + 1, w - 1)), axis=-1)
         * jnp.asarray(ax1))
    # vertical pass + cv2's SIMD fixed-point cast (VResizeLinearVec_32s8u)
    t0 = jnp.take(t, jnp.asarray(sy), axis=-2)
    t1 = jnp.take(t, jnp.asarray(jnp.minimum(sy + 1, h - 1)), axis=-2)
    b0 = jnp.asarray(ay0)[:, None]
    b1 = jnp.asarray(ay1)[:, None]
    out = (((b0 * (t0 >> 4)) >> 16) + ((b1 * (t1 >> 4)) >> 16) + 2) >> 2
    return jnp.clip(out, 0, 255).astype(img.dtype)


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
