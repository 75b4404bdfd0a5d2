"""Box coordinate utilities and IOU — vectorised, jittable.

Capability-equivalent of the reference's ``utils/general.py:8-52`` and the
scalar IOU in ``detect.py:28-39`` / ``YOLO_ncnn.cpp:221-234``, as pure array
ops (no loops, no host round-trips).

The reference uses *two* IOU conventions:

* postprocess NMS (``detect.py:28-39``): plain ``(x2-x1)`` areas, and
* training/validation (``utils/general.py:44-48``): a ``+1`` pixel
  convention on widths/heights.

``pixel_offset`` selects between them.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyxy2xywh(x):
    """(x1,y1,x2,y2) -> (cx,cy,w,h) along the last axis."""
    x1, y1, x2, y2 = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def xywh2xyxy(x):
    """(cx,cy,w,h) -> (x1,y1,x2,y2) along the last axis."""
    cx, cy, w, h = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def iou_pairwise(a, b, pixel_offset: float = 0.0, eps: float = 0.0):
    """Element-wise IOU of two broadcast-compatible xyxy box arrays.

    ``pixel_offset=1`` reproduces the reference training convention
    (``utils/general.py:44-48``); ``0`` reproduces the postprocess NMS
    (``detect.py:28-39``).
    """
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.clip(ix2 - ix1 + pixel_offset, 0.0, None)
    ih = jnp.clip(iy2 - iy1 + pixel_offset, 0.0, None)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0] + pixel_offset) * (a[..., 3] - a[..., 1] + pixel_offset)
    area_b = (b[..., 2] - b[..., 0] + pixel_offset) * (b[..., 3] - b[..., 1] + pixel_offset)
    return inter / (area_a + area_b - inter + eps)


def box_iou_matrix(a, b, pixel_offset: float = 0.0, eps: float = 0.0):
    """Full IOU matrix between ``a`` (..., N, 4) and ``b`` (..., M, 4) ->
    (..., N, M)."""
    return iou_pairwise(
        a[..., :, None, :], b[..., None, :, :], pixel_offset=pixel_offset, eps=eps
    )
