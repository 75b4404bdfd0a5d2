"""Streaming detection: overlapped H2D / compute / D2H over a frame stream.

The production-serving shape of the detect pipeline (BASELINE.json:
"batched streaming inference ... all stay on-chip").  JAX dispatch is
asynchronous, so the pipeline below gets transfer/compute overlap for free:

  put(batch k+1)  |  compute(batch k)  |  fetch(batch k-1)

by keeping one batch in flight and only materialising results one step
behind.  The reference processes one image at a time, synchronously
(``detect.py:141-192``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolofastest_tpu.configs import Config
from yolofastest_tpu.models import YoloFastest
from yolofastest_tpu.ops import (batched_nms, decode_heads, normalize,
                                 unpack_detections)


class StreamingDetector:
    """Iterator-in, iterator-out batched detection with one batch in flight.

    Args:
      config: framework config.
      variables: flax variables.
      compute_dtype: jnp.bfloat16 for deployment throughput.
      fold_bn: fold BatchNorm into the convs (the deployment graph the
        batched Detector/bench headline also use) instead of flax apply.

    ``__call__`` consumes an iterable of uint8 gray frame batches
    ``(B, H, W)`` (fixed B for a single compilation) and yields detection
    dicts as host numpy arrays, in order.
    """

    def __init__(self, config: Config, variables: Dict[str, Any],
                 compute_dtype=jnp.bfloat16, fold_bn: bool = False):
        io = config.io
        self.config = config
        if fold_bn:
            from yolofastest_tpu.models import fold_batchnorm, folded_apply

            folded = fold_batchnorm(jax.device_get(
                jax.tree.map(jnp.asarray, variables)))
            self.variables = jax.tree.map(jnp.asarray, folded)
            apply_fn = lambda v, imgs: folded_apply(v, imgs, compute_dtype)
        else:
            self.variables = jax.tree.map(jnp.asarray, variables)
            model = YoloFastest(num_cls=io.num_cls, num_anchors=io.num_anchors,
                                compute_dtype=compute_dtype)
            apply_fn = lambda v, imgs: model.apply(v, imgs, train=False)

        @jax.jit
        def pipeline(variables, frames):
            imgs = normalize(frames, compute_dtype)[..., None]
            heads = apply_fn(variables, imgs)
            boxes, conf, cls_score, cls_idx, valid = decode_heads(
                heads, io.anchors, io.input_hw, io.conf_thre, io.max_decode
            )
            # packed: the whole detection set is ONE array -> one D2H fetch
            # per batch instead of six (each dict leaf is a transfer)
            return batched_nms(boxes, conf, cls_score, cls_idx, valid,
                               iou_thre=io.nms_thre, max_det=io.max_det,
                               packed=True)

        self._pipeline = pipeline

    def __call__(self, frame_batches: Iterable[np.ndarray]) -> Iterator[Dict[str, np.ndarray]]:
        pending = None
        for frames in frame_batches:
            out = self._pipeline(self.variables, jnp.asarray(frames))
            if pending is not None:
                yield unpack_detections(np.asarray(pending))  # fetch k-1 while k runs
            pending = out
        if pending is not None:
            yield unpack_detections(np.asarray(pending))
