"""`eval` command (mAP on a dataset, any backend, COCO modes).

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import sys

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _load_weights,
    _make_index,
    _build_engine,
)


def cmd_eval(args) -> int:
    from yolofastest_tpu.data import DetectionLoader
    from yolofastest_tpu.eval import MAPEvaluator
    from yolofastest_tpu.utils.logging import config_logger

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    if getattr(args, "max_det", None) is not None:
        # e.g. --max-det 100 for COCO's standard AR budget (the preset cap
        # is 64); keep the decode pool at least 2x the kept set
        import dataclasses

        if args.max_det < 1:
            raise SystemExit(f"--max-det must be >= 1, got {args.max_det}")
        cfg = dataclasses.replace(
            cfg, io=dataclasses.replace(
                cfg.io, max_det=args.max_det,
                max_decode=max(cfg.io.max_decode, 2 * args.max_det)))
    logger = config_logger(args.log_dir, "eval_info.log")
    idx = _make_index(args.val_dir, cfg.io.class_names, logger,
                      fmt=args.format)
    loader = DetectionLoader(idx, cfg, augment=False, shuffle=False,
                             drop_last=False)
    iou_thresholds = None
    strict_kw = {}
    if getattr(args, "coco_map", False):
        from yolofastest_tpu.eval import COCO_IOU_GRID
        iou_thresholds = COCO_IOU_GRID
        if getattr(args, "coco_strict", False):
            # pycocotools' exact conventions (standard IOU, 101-pt AP) —
            # cross-validated in tests/test_map_cocoeval.py
            strict_kw = dict(iou_convention="coco",
                             ap_interpolation="coco101")
    elif getattr(args, "coco_strict", False):
        print("--coco-strict needs --coco-map", file=sys.stderr)
        return 2
    backend = getattr(args, "backend", "train")
    if backend == "train" and getattr(args, "tta", False):
        print("--tta scores the DEPLOYED pipeline; pick a deployment "
              "backend (e.g. --backend fp)", file=sys.stderr)
        return 2
    if backend == "train" and getattr(args, "int8_zoo", None):
        print("--int8-zoo scores the SHIPPED int8 deployment; pick an int8 "
              "backend (e.g. --backend int8)", file=sys.stderr)
        return 2
    if backend == "train":
        # Reference-parity path: the training-loop evaluator (float boxes,
        # validate.py conventions) on the raw checkpoint.
        evaluator = MAPEvaluator(cfg, loader, logger=logger, arch=args.arch,
                                 iou_thresholds=iou_thresholds, **strict_kw)
        import jax
        import jax.numpy as jnp

        variables = jax.tree.map(
            jnp.asarray, _load_weights(args.weights, getattr(args, "arch", None)))
    else:
        # Deployment mAP: score what the deployed artifact actually detects
        # (BN-folded graph, detect-path rounding/NMS) — through the jax
        # fp/int8 pipelines or the C++ engine.  The reference never scores
        # its deployed detectors against GT.
        from yolofastest_tpu.eval import make_backend_eval_fn

        backend = "fp" if backend == "jax" else backend  # legacy alias
        engine = _build_engine(args, cfg, backend, args.calib_data)
        if engine is None:
            return 2
        evaluator = MAPEvaluator(
            cfg, loader, logger=logger, arch=args.arch,
            eval_fn=make_backend_eval_fn(engine, max_det=cfg.io.max_det),
            iou_thresholds=iou_thresholds, **strict_kw)
        variables = None
    mAP = evaluator(variables, epoch=0)
    print(f"mAP: {mAP:.4f}")
    if "mAP_grid" in getattr(evaluator, "last_metrics", {}):
        print(f"mAP@[.50:.95]: {evaluator.last_metrics['mAP_grid']:.4f}")
    if getattr(args, "json_out", None):
        import json

        with open(args.json_out, "w") as f:
            json.dump({"config": args.config, "arch": args.arch,
                       "backend": backend, "weights": args.weights,
                       **evaluator.last_metrics}, f, indent=1)
        print("wrote", args.json_out)
    return 0


