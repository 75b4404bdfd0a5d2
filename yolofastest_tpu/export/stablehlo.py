"""Serialised-graph export via ``jax.export`` (StableHLO).

The TPU-native analogue of the reference's converter zoo —
``pytorch_to_onnx.py`` (ONNX), ``pytorch_to_caffe.py`` (Caffe op
interception) and ``rknn_deploy.export_pytorch_model`` (TorchScript trace):
one exporter that serialises the *jitted* inference computation (weights
baked in as constants, like the reference's exported graphs) to a portable
StableHLO artifact any PJRT runtime can load — no tracing hacks, no
monkey-patching, versioned and shape-checked by jax.export itself.

Two graphs are exported:

* ``export_folded_forward`` — the clean conv-only graph (inputs ->
  head_large, head_small), mirroring the reference's exported networks
  which also keep postprocessing outside the graph (SURVEY.md §3.5);
* ``export_detect_pipeline`` — the full fused detect program (normalise ->
  backbone -> decode -> NMS), something no reference converter could
  express.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import export as jexport

from yolofastest_tpu.configs import Config
from yolofastest_tpu.models import build_model
from yolofastest_tpu.models.graph import folded_apply, folded_apply_lite
from yolofastest_tpu.ops import batched_nms, decode_heads, normalize


def _export_fn(fn: Callable, example_args) -> jexport.Exported:
    return jexport.export(jax.jit(fn))(*example_args)


def export_folded_forward(
    folded: Dict[str, Any], config: Config, batch: int = 1,
    compute_dtype=jnp.float32, arch: str = "fastest",
) -> jexport.Exported:
    """Folded graph, weights baked in: (B,H,W,1) float -> head tuple
    ((large, small) for the two-head arch; (small,) for lite)."""
    io = config.io
    folded = jax.tree.map(jnp.asarray, folded)
    apply_folded = folded_apply if arch == "fastest" else folded_apply_lite

    def fn(x):
        heads = apply_folded(folded, x, compute_dtype)
        heads = heads if isinstance(heads, (tuple, list)) else (heads,)
        return tuple(h.astype(jnp.float32) for h in heads)

    x = jnp.zeros((batch, *io.input_hw, io.input_channels), jnp.float32)
    return _export_fn(fn, (x,))


def export_detect_pipeline(
    variables: Dict[str, Any], config: Config, batch: int = 1,
    compute_dtype=jnp.float32, arch: str = "fastest",
) -> jexport.Exported:
    """Full pipeline, weights baked in: (B,H,W) uint8 gray -> detection dict."""
    io = config.io
    model = build_model(num_cls=io.num_cls, num_anchors=io.num_anchors,
                        compute_dtype=compute_dtype, arch=arch,
                        variables=variables)
    variables = jax.tree.map(jnp.asarray, variables)

    def fn(frames):
        imgs = normalize(frames, compute_dtype)[..., None]
        heads = model.apply(variables, imgs, train=False)
        heads = heads if isinstance(heads, (tuple, list)) else (heads,)
        boxes, conf, cls_score, cls_idx, valid = decode_heads(
            heads, io.anchors, io.input_hw, io.conf_thre, io.max_decode
        )
        return batched_nms(boxes, conf, cls_score, cls_idx, valid,
                           iou_thre=io.nms_thre, max_det=io.max_det)

    frames = jnp.zeros((batch, *io.input_hw), jnp.uint8)
    return _export_fn(fn, (frames,))


def export_int8_forward(
    variables: Dict[str, Any],
    config: Config,
    calibration,
    batch: int = 1,
    fused: bool = False,
    arch: str = "fastest",
    folded: Optional[Dict[str, Any]] = None,
    act_scales: Optional[Dict[str, float]] = None,
) -> jexport.Exported:
    """int8 deployment graph, quantised weights AND activation scales baked
    in: (B,H,W,1) float net input -> float head tuple ((large, small), or
    (small,) for lite).

    The serialised analogue of the reference's quantised-NPU artifact
    (``rknn.build(do_quantization=...)``, ``rknn_deploy.py:43`` — which the
    reference left at fp16); ``calibration`` is a batch (or list of batches)
    of net-input images, exactly like RKNN's calibration dataset list.

    ``folded`` / ``act_scales`` override the internal fold + calibrate —
    used to ship QAT-refined weights at their frozen training scales
    (``quant/qat.py``).
    """
    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.quant import calibrate, quantize_weights
    from yolofastest_tpu.quant.ptq import quantized_apply, quantized_apply_fused

    io = config.io
    if folded is None:
        folded = fold_batchnorm(jax.device_get(jax.tree.map(jnp.asarray, variables)))
    batches = calibration if isinstance(calibration, (list, tuple)) else [calibration]
    scales = calibrate(folded, batches, arch=arch) if act_scales is None else act_scales
    qparams = jax.tree.map(jnp.asarray, quantize_weights(folded))
    apply_q = quantized_apply_fused if fused else quantized_apply

    def fn(x):
        heads = apply_q(qparams, scales, x, arch=arch)
        heads = heads if isinstance(heads, (tuple, list)) else (heads,)
        return tuple(h.astype(jnp.float32) for h in heads)

    x = jnp.zeros((batch, *io.input_hw, io.input_channels), jnp.float32)
    return _export_fn(fn, (x,))


def save_exported(exported: jexport.Exported, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def save_exported_mlir(exported: jexport.Exported, path: str) -> None:
    """Write the module's *textual* StableHLO alongside the serialized
    artifact.  The text form is what the native consumer ``cpp/runner/
    shlo_runner.cpp`` (``yf_shlo``) parses and interprets — the analogue of
    the reference's ncnn runtime consuming its converted artifacts
    (``main.cpp:7-59``) for the exported compiled graph itself."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(exported.mlir_module())


def load_exported(path: str) -> jexport.Exported:
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
