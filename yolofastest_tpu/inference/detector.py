"""End-to-end detection pipeline: preprocess -> backbone -> decode -> NMS.

Capability-equivalent of the reference's three inference front-ends —
``Detect_YOLO`` on PC (``src/detect.py:87-192``), the C++ NCNN runtime
(``ncnn_deploy/src/YOLO_ncnn.cpp:23-80``) and the RKNN NPU pipeline
(``rknn_deploy.py:159-255``) — as **one** jitted XLA program.  Everything
after image load runs on device; the only host work is cv2 file IO (and
optionally preprocessing, for bit-parity with the reference's cv2 path).

Two entry points:

* :meth:`Detector.run` — normalised net-input batch -> detections (the core
  jitted fn; used by tests, benchmarks and the evaluator).
* :meth:`Detector.batch_detect` — directory-in, annotated-images-out with the
  reference's per-image timing-log format (``detect.py:177-192``), so logs
  diff against the committed ``test_result/*`` fixtures.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolofastest_tpu.configs import Config
from yolofastest_tpu.models import load_torch_checkpoint
from yolofastest_tpu.ops import (batched_nms, decode_heads, preprocess_device,
                                 unpack_detections)
from yolofastest_tpu.utils.visualize import CLASS_COLORS, plot_one_box


class Detector:
    """YOLO-Fastest detector with a fully on-device pipeline.

    Args:
      config: framework config (anchors, thresholds, shapes).
      variables: flax variables ({'params', 'batch_stats'}).  Alternatively
        pass ``torch_checkpoint=`` to convert a reference ``.pth`` on the fly.
      compute_dtype: jnp.float32 for parity, jnp.bfloat16 for speed.
      backend: ``'fp'`` (default), ``'int8'`` (per-layer int8 weights+inputs)
        or ``'int8-fused'`` (end-to-end int8 activations) — the first-class
        quantised deployment modes mirroring the reference's NPU path.
      calibration: for int8 backends — a (N, H, W, 1) float batch (or list of
        batches) of net-input images to derive activation scales from.
      calibration_cache: optional JSON path; scales are loaded from it when it
        exists, else computed from ``calibration`` and saved to it.
      calib_method: activation-scale calibration algorithm for the int8
        backends — 'amax' (default), 'mse', 'percentile' or 'entropy'
        (see :func:`yolofastest_tpu.quant.calibrate`); ignored on a
        calibration-cache hit (the cache already holds final scales).
      calib_percentile: percentile for ``calib_method='percentile'``.
      keep_fp: for the int8 backends — folded-graph layer names that run
        the fp kernel instead of int8 (mixed precision; pick them with
        :func:`yolofastest_tpu.quant.layer_sensitivity` / the
        ``sensitivity`` CLI).
      tta: horizontal-flip test-time augmentation (beyond-reference).  The
        batch and its mirror run through the backbone as ONE doubled batch
        (a single XLA program — the flip is a device-side reverse, and the
        2B batch keeps the MXU fed), flipped-pass boxes are un-mirrored, and
        both candidate sets merge conf-sorted into one NMS.  ~2x device
        FLOPs for a recall boost on boundary detections.
    """

    def __init__(
        self,
        config: Config,
        variables: Optional[Dict[str, Any]] = None,
        torch_checkpoint: Optional[str] = None,
        compute_dtype=jnp.float32,
        logger=None,
        fold_bn: bool = False,
        backend: str = "fp",
        calibration=None,
        calibration_cache: Optional[str] = None,
        arch: str = "fastest",
        tta: bool = False,
        calib_method: str = "amax",
        calib_percentile: float = 99.99,
        keep_fp: Sequence[str] = (),
        int8_artifact: Optional[str] = None,
    ):
        if int8_artifact is not None:
            # Shipped int8 zoo artifact (quant/zoo.py): refined folded
            # weights + frozen scales replace the fold+calibrate path below
            # — the full-recall deployment config, CLI `--int8-zoo`.
            if backend not in ("int8", "int8-fused"):
                raise ValueError("int8_artifact needs an int8 backend")
            if keep_fp:
                raise ValueError("int8_artifact and keep_fp are exclusive "
                                 "(the artifact IS the deployment config)")
            from yolofastest_tpu.quant import load_int8_zoo

            zoo8 = load_int8_zoo(int8_artifact)
            if zoo8 is None:
                raise ValueError(f"int8 artifact not found: {int8_artifact}")
        if variables is None:
            if torch_checkpoint is None:
                raise ValueError("need variables or torch_checkpoint")
            variables = load_torch_checkpoint(torch_checkpoint)
        if backend not in ("fp", "int8", "int8-fused"):
            raise ValueError(f"unknown backend {backend!r}")
        if keep_fp and backend not in ("int8", "int8-fused"):
            raise ValueError(
                "keep_fp (mixed precision) applies to the int8 backends "
                "(int8 / int8-fused) only")
        if arch not in ("fastest", "lite"):
            raise ValueError(f"unknown arch {arch!r}")
        self.config = config
        self.backend = backend
        self.arch = arch
        self.tta = tta
        self.variables = jax.tree.map(jnp.asarray, variables)
        from yolofastest_tpu.models import build_model

        self.model = build_model(
            num_cls=config.io.num_cls,
            num_anchors=config.io.num_anchors,
            compute_dtype=compute_dtype,
            arch=arch,
            variables=variables,
        )
        self.logger = logger

        io = config.io

        if backend in ("int8", "int8-fused"):
            from yolofastest_tpu.models import fold_batchnorm
            from yolofastest_tpu.quant import calibrate, quantize_weights
            from yolofastest_tpu.quant.ptq import (
                quantized_apply,
                quantized_apply_fused,
            )

            if int8_artifact is not None:
                # the artifact defines the whole deployment, including its
                # hybrid (keep-fp) layer set
                folded, scales, keep_fp = zoo8
            else:
                folded = fold_batchnorm(jax.device_get(self.variables))
                scales = self._load_or_calibrate(
                    folded, calibration, calibration_cache,
                    functools.partial(calibrate, arch=arch,
                                      method=calib_method,
                                      percentile=calib_percentile),
                )
            qparams = jax.tree.map(jnp.asarray, quantize_weights(folded))
            self.act_scales = scales
            if keep_fp:
                # Mixed precision: the named layers run the fp folded kernel
                # (RKNN "hybrid quantization" / TensorRT per-layer precision
                # analogue — see quant/sensitivity.py for the sweep that
                # picks them).
                from yolofastest_tpu.quant.sensitivity import (
                    quantized_apply_fused_mixed,
                    quantized_apply_mixed,
                )

                unknown = set(keep_fp) - set(qparams)
                if unknown:
                    raise ValueError(
                        f"unknown keep_fp layer(s): {sorted(unknown)}")
                keep_fp = tuple(keep_fp)
                fp_sub = jax.tree.map(
                    jnp.asarray, {k: folded[k] for k in keep_fp})
                self.variables = {"q": qparams, "fp": fp_sub}
                apply_mixed = (quantized_apply_fused_mixed
                               if backend == "int8-fused"
                               else quantized_apply_mixed)

                def _apply(variables, images):
                    return _as_heads(apply_mixed(
                        variables["q"], variables["fp"], scales, images,
                        fp_layers=keep_fp, arch=arch))
            else:
                self.variables = qparams
                apply_q = (quantized_apply_fused if backend == "int8-fused"
                           else quantized_apply)

                def _apply(variables, images):
                    return _as_heads(
                        apply_q(variables, scales, images, arch=arch))
        elif fold_bn:
            # Deployment mode: run the BN-folded graph (the converted-model
            # analogue, models/graph.py) — skips the BN arithmetic entirely.
            from yolofastest_tpu.models import (fold_batchnorm, folded_apply,
                                                folded_apply_lite)

            folded = jax.tree.map(
                jnp.asarray, fold_batchnorm(jax.device_get(self.variables))
            )
            self.variables = folded
            apply_folded = folded_apply if arch == "fastest" else folded_apply_lite

            def _apply(variables, images):
                return _as_heads(apply_folded(variables, images, compute_dtype))
        else:
            def _apply(variables, images):
                return _as_heads(self.model.apply(variables, images, train=False))

        def _detect(variables, images, packed):
            if tta:
                images = jnp.concatenate([images, images[:, :, ::-1, :]], 0)
            heads = _apply(variables, images)
            boxes, conf, cls_score, cls_idx, valid = decode_heads(
                heads, io.anchors, io.input_hw, io.conf_thre, io.max_decode
            )
            if tta:
                boxes, conf, cls_score, cls_idx, valid = _merge_tta(
                    boxes, conf, cls_score, cls_idx, valid,
                    float(io.input_hw[1]))
            return batched_nms(
                boxes, conf, cls_score, cls_idx, valid,
                iou_thre=io.nms_thre, max_det=io.max_det, packed=packed,
            )

        @jax.jit
        def _run(variables, images):
            return _detect(variables, images, packed=False)

        @jax.jit
        def _run_packed(variables, images):
            return _detect(variables, images, packed=True)

        @jax.jit
        def _run_raw(variables, bgr_batch):
            images = preprocess_device(bgr_batch, io.input_hw, compute_dtype)
            return _detect(variables, images, packed=False)

        self._run = _run
        self._run_packed = _run_packed
        self._run_raw = _run_raw
        self._warm: set = set()

    @staticmethod
    def _load_or_calibrate(folded, calibration, cache_path, calibrate_fn):
        import json

        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                return {k: float(v) for k, v in json.load(f).items()}
        if calibration is None:
            raise ValueError(
                "int8 backends need calibration= batches (or an existing "
                "calibration_cache file)"
            )
        batches = calibration if isinstance(calibration, (list, tuple)) else [calibration]
        scales = calibrate_fn(folded, [np.asarray(b, np.float32) for b in batches])
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump(scales, f, indent=1)
        return scales

    def warmup(self, batch_size: int = 1) -> None:
        """Compile + execute the pipeline once at this batch shape so timed
        runs measure steady-state latency, not compilation (the reference's
        first-image numbers always include warm caches)."""
        if batch_size in self._warm:
            return
        io = self.config.io
        dummy = jnp.zeros((batch_size, *io.input_hw, io.input_channels), jnp.float32)
        np.asarray(self._run_packed(self.variables, dummy))  # true D2H sync
        self._warm.add(batch_size)

    # ------------------------------------------------------------------ core
    def run(self, images) -> Dict[str, jax.Array]:
        """Detect on a normalised net-input batch (B, H, W, 1) float."""
        return self._run(self.variables, images)

    def run_packed(self, images) -> jax.Array:
        """Like :meth:`run` but returns ONE (B, max_det, 8) array — a single
        device->host transfer instead of six (each dict leaf is a separate
        fetch; through a remote runtime each fetch is a round-trip).
        Decode on host with :func:`yolofastest_tpu.ops.unpack_detections`."""
        return self._run_packed(self.variables, images)

    def run_raw(self, bgr_batch) -> Dict[str, jax.Array]:
        """Detect on raw (B, H0, W0, 3) uint8 BGR frames — preprocessing
        (gray, resize, normalise) fused on device."""
        return self._run_raw(self.variables, bgr_batch)

    # ------------------------------------------------------------- host utils
    def preprocess_host(self, img_path: str):
        """Reference-exact host preprocessing via cv2 (detect.py:107-129)."""
        return load_net_input(img_path, self.config.io)

    def adjust_coords(self, boxes: np.ndarray) -> np.ndarray:
        """Net-input coords -> original-image coords (detect.py:131-139)."""
        io = self.config.io
        scale_h = io.origin_img_shape[0] / io.input_shape[0]
        scale_w = io.origin_img_shape[1] / io.input_shape[1]
        out = boxes.astype(np.float64).copy()
        out[..., [0, 2]] = np.round(out[..., [0, 2]] * scale_w)
        out[..., [1, 3]] = np.round(out[..., [1, 3]] * scale_h)
        return out

    def batch_detect(self, data_path: str, result_path: str,
                     batch_size: int = 1, overlap: bool = True) -> float:
        """Directory-in, annotated-results-out with reference-format timing
        logs (detect.py:141-192).  Returns the average total time in ms.

        The jit is warmed up BEFORE the timed loop, so every logged number is
        steady-state end-to-end latency: host array -> device (H2D through
        the runtime) -> detect program -> detections fetched back (D2H).

        With ``batch_size > 1``, images run through the device in chunks of
        that size (one compiled shape; a short tail is padded) and the
        per-image time is the amortised chunk time — the throughput
        deployment mode the per-image reference runtimes can't do.

        ``overlap`` (default) software-pipelines the loop one chunk deep:
        chunk k's host work (cv2 decode + preprocess of k+1, then draw/save
        of k) runs while chunk k's device program executes, so the logged
        infer time is dispatch + residual device wait.  Like the reference
        logs, preprocessing is excluded from the timed region either way.
        """
        import cv2

        os.makedirs(result_path, exist_ok=True)
        io = self.config.io
        names = sorted(f for f in os.listdir(data_path) if f.lower().endswith((".jpg", ".png", ".bmp")))
        log = self.logger.info if self.logger else print
        self.warmup(batch_size)
        totals = [0.0]  # mutable for the closure

        def finalize(pending) -> None:
            chunk_names, chunk, out, dispatch_ms = pending
            n_valid = len(chunk)
            start = time.time()
            packed = np.asarray(out)  # ONE D2H (residual wait)
            infer_mark = time.time()
            det = unpack_detections(packed)
            infer_time = (dispatch_ms + (infer_mark - start) * 1e3) / n_valid

            all_rows = detections_to_lists(det)[:n_valid]
            post_time = (time.time() - infer_mark) * 1e3 / n_valid

            for k, rows in enumerate(all_rows):
                filename = chunk_names[k]
                ori = chunk[k][1]
                total = infer_time + post_time
                totals[0] += total

                if not rows:
                    cv2.imwrite(os.path.join(result_path, "result_" + filename), ori)
                    log("image_name:%s -> no targets, infer time:%.2fms, post_process time:%.2fms, total time:%.2fms"
                        % (filename, infer_time, post_time, total))
                    continue

                if io.input_shape[:2] != io.origin_img_shape[:2]:
                    for r in rows:
                        r[:4] = self.adjust_coords(np.asarray(r[:4], np.float64))
                for x1, y1, x2, y2, conf, cls_score, cls_idx in rows:
                    label = "%s %.2f" % (io.class_names[int(cls_idx)], conf * cls_score)
                    plot_one_box([x1, y1, x2, y2], ori,
                                 color=CLASS_COLORS[int(cls_idx) % len(CLASS_COLORS)],
                                 label=label, line_thickness=3)
                cv2.imwrite(os.path.join(result_path, "result_" + filename), ori)
                log("image_name:%s -> detect finished, infer time:%.2fms, post_process time:%.2fms, total time:%.2fms"
                    % (filename, infer_time, post_time, total))

        pending = None
        for c0 in range(0, len(names), batch_size):
            # decode/preprocess per chunk (constant host memory on large
            # directories); with overlap this host work hides under the
            # previous chunk's device execution
            chunk = [self.preprocess_host(os.path.join(data_path, f))
                     for f in names[c0 : c0 + batch_size]]
            n_valid = len(chunk)
            net_in = np.concatenate([p[0] for p in chunk])
            if n_valid < batch_size:  # pad tail to the compiled shape
                net_in = np.concatenate(
                    [net_in, np.zeros((batch_size - n_valid, *net_in.shape[1:]),
                                      net_in.dtype)]
                )

            t0 = time.time()
            out = self.run_packed(jnp.asarray(net_in))  # async dispatch
            dispatch_ms = (time.time() - t0) * 1e3
            if pending is not None:
                finalize(pending)
            pending = (names[c0 : c0 + batch_size], chunk, out, dispatch_ms)
            if not overlap:
                finalize(pending)
                pending = None
        if pending is not None:
            finalize(pending)

        avg = totals[0] / max(len(names), 1)
        log("detect avg_time: %.2fms" % avg)
        return avg


def _merge_tta(boxes, conf, cls_score, cls_idx, valid, w: float):
    """Merge a (2B, K, ...) candidate set from a [batch; mirrored batch]
    forward into (B, 2K, ...): un-mirror the flipped half's x coordinates
    and re-sort by confidence (greedy NMS requires conf-descending input,
    and two concatenated sorted halves are not sorted)."""
    b = boxes.shape[0] // 2
    bf = boxes[b:]
    bf = jnp.stack([w - bf[..., 2], bf[..., 1], w - bf[..., 0], bf[..., 3]],
                   axis=-1)
    boxes = jnp.concatenate([boxes[:b], bf], axis=1)
    conf = jnp.concatenate([conf[:b], conf[b:]], axis=1)
    cls_score = jnp.concatenate([cls_score[:b], cls_score[b:]], axis=1)
    cls_idx = jnp.concatenate([cls_idx[:b], cls_idx[b:]], axis=1)
    valid = jnp.concatenate([valid[:b], valid[b:]], axis=1)
    _, order = jax.lax.top_k(jnp.where(valid, conf, -1.0), conf.shape[1])
    take = lambda t: jnp.take_along_axis(  # noqa: E731
        t, order[..., None] if t.ndim == 3 else order, axis=1)
    return take(boxes), take(conf), take(cls_score), take(cls_idx), take(valid)


def _as_heads(out):
    """Normalise a model output to a tuple of heads (lite emits one array)."""
    return out if isinstance(out, (tuple, list)) else (out,)


def image_to_net_input(ori: np.ndarray, io) -> np.ndarray:
    """Decoded image array -> ``(H, W, C)`` float32 net input — the
    reference-exact preprocess (detect.py:107-129): grayscale iff the config
    wants one channel, resize to the net shape, ``(x - 128) / 255``.  The
    ONE host preprocess implementation; detect, serve and the CLI native
    loop all call it so they cannot drift."""
    import cv2

    img = cv2.cvtColor(ori, cv2.COLOR_BGR2GRAY) if io.input_channels == 1 else ori
    if img.shape[:2] != io.input_hw:
        img = cv2.resize(img, (io.input_hw[1], io.input_hw[0]))
    net_in = (img.astype(np.float32) - 128.0) / 255.0
    return net_in[:, :, None] if net_in.ndim == 2 else net_in


def load_net_input(img_path: str, io) -> Tuple[np.ndarray, np.ndarray]:
    """Read + reference-exact preprocess one image (detect.py:107-129).

    Returns ``((1, H, W, 1) float32 net input, original BGR image)``.
    Module-level so calibration and tools can preprocess without building a
    Detector first.
    """
    import cv2

    ori = cv2.imread(img_path)
    if ori is None:
        raise FileNotFoundError(
            f"cannot decode image {img_path!r} (cv2.imread returned None)"
        )
    return image_to_net_input(ori, io)[None], ori


def detections_to_lists(det: Dict[str, np.ndarray]) -> List[List[List[float]]]:
    """Fixed-size detection tensors -> per-image python lists
    ``[x1, y1, x2, y2, conf, cls_score, cls_idx]`` (valid rows only)."""
    det = jax.tree.map(np.asarray, det)
    out: List[List[List[float]]] = []
    for b in range(det["boxes"].shape[0]):
        rows = []
        for i in range(det["boxes"].shape[1]):
            if not det["valid"][b, i]:
                continue
            x1, y1, x2, y2 = det["boxes"][b, i]
            rows.append([
                float(x1), float(y1), float(x2), float(y2),
                float(det["conf"][b, i]), float(det["cls_score"][b, i]),
                int(det["cls_idx"][b, i]),
            ])
        out.append(rows)
    return out
