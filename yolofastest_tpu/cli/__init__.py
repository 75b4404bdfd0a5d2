"""Command-line interface: ``python -m yolofastest_tpu <command>``.

The reference has no CLI — every entry point is a hard-coded ``__main__``
block edited in place (``detect.py:196-203``, ``main.cpp:10-13``,
``rknn_deploy.py:160-163``; SURVEY.md §5 flags the duplication hazard).
Here one typed config (``configs/``) + argparse drive every workflow:

  detect    batch-detect a directory (jax | native-C++ | int8 backend)
  video     video file -> annotated video (any backend, batches in flight)
  serve     HTTP detection server with dynamic batching (any backend)
  train     full training run with validation + orbax checkpoints
  eval      mAP of a weights file on a VOC/COCO dataset
  export    weights -> StableHLO + ONNX + TorchScript + native .yfb (+ int8)
  convert   reference .pth -> zoo .npz
  txt2xml   custom txt labels -> VOC XML (reference utils/txt2xml.py)
  voc2coco  VOC-layout dataset -> COCO layout
  anchors   k-means auto-anchors from a dataset's GT boxes
  prune     structured channel pruning (res-block expansion channels)
  sensitivity  per-layer int8 damage table + --keep-fp suggestion
  info      model summary (per-layer shapes, params, MACs)
"""


from __future__ import annotations

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _check_arch_weights,
    _load_weights,
    _load_calibration,
    _make_index,
    _calib_kwargs,
    _int8_cache_path,
    _resolve_jax_int8_calibration,
    _native_int8_scales,
    _parse_keep_fp,
    _build_engine,
    _add_calib_method_flags,
)
from yolofastest_tpu.cli.detect import cmd_detect
from yolofastest_tpu.cli.serve import cmd_serve, cmd_video
from yolofastest_tpu.cli.train import cmd_train
from yolofastest_tpu.cli.evaluate import cmd_eval
from yolofastest_tpu.cli.export import cmd_export, cmd_convert
from yolofastest_tpu.cli.quantize import cmd_prune, cmd_sensitivity
from yolofastest_tpu.cli.datatools import cmd_voc2coco, cmd_txt2xml, cmd_anchors
from yolofastest_tpu.cli.info import cmd_info
from yolofastest_tpu.cli.parser import _NO_JAX_COMMANDS, build_parser, main

__all__ = [
    "main",
    "build_parser",
    "_NO_JAX_COMMANDS",
    "cmd_anchors",
    "cmd_convert",
    "cmd_detect",
    "cmd_eval",
    "cmd_export",
    "cmd_info",
    "cmd_prune",
    "cmd_sensitivity",
    "cmd_serve",
    "cmd_train",
    "cmd_txt2xml",
    "cmd_video",
    "cmd_voc2coco",
    "_check_arch_config",
    "_get_config",
    "_check_arch_weights",
    "_load_weights",
    "_load_calibration",
    "_make_index",
    "_calib_kwargs",
    "_int8_cache_path",
    "_resolve_jax_int8_calibration",
    "_native_int8_scales",
    "_parse_keep_fp",
    "_build_engine",
    "_add_calib_method_flags",
]
