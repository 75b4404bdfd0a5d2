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

import argparse
import os
import sys


def _check_arch_config(cfg, arch: str) -> None:
    """Fail fast on arch/config mismatch: the lite arch emits ONE head, so
    it needs a one-anchor-group (lite-*) preset and vice versa — otherwise
    decode/loss would pair heads with the wrong anchor groups."""
    n_heads = 1 if arch == "lite" else 2
    n_groups = len(cfg.io.anchors)
    if n_heads != n_groups:
        raise SystemExit(
            f"--arch {arch} produces {n_heads} head(s) but the config has "
            f"{n_groups} anchor group(s); use "
            f"{'a lite-* config preset' if arch == 'lite' else 'a non-lite config preset'}"
        )


def _get_config(args):
    """Resolve the command's Config: ``--config-json FILE`` (a serialized
    ``Config.to_json``, e.g. written by ``anchors --out``) wins over the
    ``--config`` preset name."""
    from yolofastest_tpu.configs import Config, get_config

    if getattr(args, "config_json", None):
        with open(args.config_json) as f:
            return Config.from_json(f.read())
    return get_config(args.config)


def _check_arch_weights(variables, arch: str, path: str) -> None:
    """Fail fast when the loaded weights' head set contradicts --arch (a
    lite tree walked as the two-head graph dies with a raw KeyError
    otherwise)."""
    two_head = "head_4" in variables.get("params", {})
    if two_head != (arch != "lite"):
        kind = "two-head" if two_head else "single-head (lite)"
        want = "fastest" if two_head else "lite"
        raise SystemExit(f"{path} holds a {kind} model but --arch is "
                         f"{arch!r}; pass --arch {want}")


def _load_weights(path: str, arch: str = None):
    from yolofastest_tpu.models import load_variables
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    if os.path.isdir(path):
        # an orbax epoch_* checkpoint dir straight from `train` — deploys the
        # EMA model when the run kept one (what validation scored)
        from yolofastest_tpu.train import checkpoint_variables

        variables = checkpoint_variables(path)
    elif path.endswith(".pth"):
        variables = load_torch_checkpoint(path)
    elif path.endswith(".onnx"):
        from yolofastest_tpu.export import import_onnx

        variables = import_onnx(path)[0]
    else:
        variables = load_variables(path)
    if arch is not None:
        _check_arch_weights(variables, arch, path)
    return variables


def _load_calibration(data_dir: str, io, k: int = 8):
    """First ``k`` images of a directory as one net-input batch (the int8
    calibration recipe shared by detect/export), or ``None`` after a
    printed message when the directory holds no readable images."""
    import numpy as np

    from yolofastest_tpu.inference.detector import load_net_input

    names = sorted(f for f in os.listdir(data_dir)
                   if f.lower().endswith((".jpg", ".png", ".bmp")))[:k]
    if not names:
        print(f"no calibration images (.jpg/.png/.bmp) in {data_dir}")
        return None
    return np.concatenate([load_net_input(os.path.join(data_dir, n), io)[0]
                           for n in names])


def _make_index(root: str, class_names, logger=None, fmt: str = "auto"):
    """Dataset index for ``root``: VOC (``<root>/xml``) or COCO
    (``<root>/annotations.json``).  ``fmt='auto'`` picks by layout."""
    from yolofastest_tpu.data import COCOIndex, VOCIndex

    if fmt == "auto":
        fmt = ("coco" if os.path.exists(os.path.join(root, "annotations.json"))
               else "voc")
    if fmt == "coco":
        return COCOIndex(root, class_names, logger)
    return VOCIndex(root, class_names, logger)


def _calib_kwargs(args) -> dict:
    """Calibration-algorithm kwargs shared by every int8 entry point."""
    return {"method": getattr(args, "calib_method", "amax"),
            "percentile": getattr(args, "calib_percentile", 99.99)}


def _int8_cache_path(args) -> str:
    """Default scale-cache path encodes the calibration method (amax keeps
    the historical bare ``.calib.json`` so committed caches stay valid)."""
    if args.calibration_cache:
        return args.calibration_cache
    method = getattr(args, "calib_method", "amax")
    if method == "percentile":
        suffix = ".calib-percentile%g.json" % getattr(args, "calib_percentile", 99.99)
    elif method != "amax":
        suffix = f".calib-{method}.json"
    else:
        suffix = ".calib.json"
    return os.path.splitext(args.weights)[0] + suffix


def _resolve_jax_int8_calibration(args, cfg, data_dir):
    """Cache-or-calibrate resolution for the jax int8 backends, shared by
    detect/serve.  Returns ``(calibration_batch_or_None, cache_path)`` for
    ``Detector(...)`` — calibration is None on a cache hit (the Detector
    loads the file) — or ``None`` after a printed message on error."""
    cache = _int8_cache_path(args)
    if os.path.exists(cache):
        return None, cache
    if not data_dir:
        print("int8 calibration needs images: pass --calib-data (or reuse "
              f"an existing cache at {cache})", file=sys.stderr)
        return None
    cal = _load_calibration(data_dir, cfg.io)
    if cal is None:
        return None
    return cal, cache


def _native_int8_scales(args, cfg, folded, data_dir):
    """Activation scales for the native int8 engine, honoring the SAME
    cache file as the jax int8 backends (so one calibration serves every
    backend).  Calibrates from ``data_dir`` images on a cache miss and
    writes the cache; returns ``None`` after a printed message on error."""
    import json

    from yolofastest_tpu.quant import calibrate

    cache = _int8_cache_path(args)
    if os.path.exists(cache):
        with open(cache) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    if not data_dir:
        print("native-int8 calibration needs images: pass a data/--calib-data "
              f"directory (or reuse an existing cache at {cache})",
              file=sys.stderr)
        return None
    cal = _load_calibration(data_dir, cfg.io)
    if cal is None:
        return None
    scales = calibrate(folded, [cal], arch=args.arch, **_calib_kwargs(args))
    with open(cache, "w") as f:
        json.dump(scales, f, indent=1)
    return scales


def _parse_keep_fp(args, backend) -> tuple:
    """``--keep-fp a,b,c`` -> layer-name tuple.  Returns ``None`` after a
    printed message when the flag is set on a backend that can't mix."""
    keep = tuple(s for s in (getattr(args, "keep_fp", None) or "").split(",")
                 if s)
    if keep and backend != "int8":
        print("--keep-fp (mixed precision) applies to --backend int8 only",
              file=sys.stderr)
        return None
    return keep


def cmd_detect(args) -> int:
    from yolofastest_tpu.utils.logging import config_logger

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    logger = config_logger(args.out, "detect_info.log")
    os.makedirs(args.out, exist_ok=True)

    if args.backend in ("native", "native-int8"):
        if getattr(args, "tta", False):
            print("--tta runs the flip pass on device; it applies to the "
                  "jax backends (fp/int8/int8-fused), not the C++ engine")
            return 2
        if getattr(args, "sliced", None):
            print("--sliced batches all tiles through one device program; "
                  "it applies to the jax backends, not the C++ engine")
            return 2
        import time

        import cv2

        from yolofastest_tpu.export import save_native_weights
        from yolofastest_tpu.models import fold_batchnorm
        from yolofastest_tpu.native import NativeEngine
        from yolofastest_tpu.utils.visualize import CLASS_COLORS, plot_one_box

        folded = fold_batchnorm(
            _load_weights(args.weights, getattr(args, "arch", None)))
        yfb = os.path.join(args.out, "model.yfb")
        if args.backend == "native-int8":
            # int8-arithmetic C++ engine: quantised weights + activation
            # scales from the shared calibration cache (calibrated on the
            # first target images on a cache miss — the same
            # static-quantisation recipe as the jax int8 backends)
            from yolofastest_tpu.quant import quantize_weights

            scales = _native_int8_scales(args, cfg, folded, args.data)
            if scales is None:
                return 2
            save_native_weights(quantize_weights(folded), yfb,
                                act_scales=scales)
        else:
            save_native_weights(folded, yfb)
        eng = NativeEngine(yfb, cfg)
        io = cfg.io
        names = sorted(f for f in os.listdir(args.data) if f.lower().endswith(".jpg"))
        avg = 0.0
        from yolofastest_tpu.inference.detector import image_to_net_input

        for fn in names:
            ori = cv2.imread(os.path.join(args.data, fn))
            img = image_to_net_input(ori, io)[..., 0]
            t0 = time.time()
            rows = eng.detect(img)
            total = (time.time() - t0) * 1e3
            avg += total
            sh = ori.shape[0] / io.input_hw[0]
            sw = ori.shape[1] / io.input_hw[1]
            for x1, y1, x2, y2, conf, cls_score, cls in rows:
                plot_one_box([x1 * sw, y1 * sh, x2 * sw, y2 * sh], ori,
                             color=CLASS_COLORS[int(cls) % 3],
                             label="%s %.2f" % (io.class_names[int(cls)], conf * cls_score),
                             line_thickness=3)
            cv2.imwrite(os.path.join(args.out, "result_" + fn), ori)
            logger.info("image_name:%s -> total time:%.2fms" % (fn, total))
        logger.info("detect avg_time: %.2fms" % (avg / max(len(names), 1)))
        return 0

    from yolofastest_tpu.inference import Detector

    variables = _load_weights(args.weights, getattr(args, "arch", None))
    backend = "fp" if args.backend == "jax" else args.backend  # legacy alias
    keep_fp = _parse_keep_fp(args, backend)
    if keep_fp is None:
        return 2
    calibration = None
    cache = None
    if backend in ("int8", "int8-fused"):
        # Calibration scales are cached next to the weights; recomputed from
        # the first few target images only when no cache exists yet.
        resolved = _resolve_jax_int8_calibration(args, cfg, args.data)
        if resolved is None:
            return 2
        calibration, cache = resolved

    ck = _calib_kwargs(args)
    detector = Detector(cfg, variables=variables, logger=logger,
                        fold_bn=args.fold_bn, backend=backend,
                        calibration=calibration, calibration_cache=cache,
                        arch=args.arch, tta=getattr(args, "tta", False),
                        calib_method=ck["method"],
                        calib_percentile=ck["percentile"],
                        keep_fp=keep_fp)
    if getattr(args, "sliced", None):
        return _sliced_detect_dir(args, cfg, detector, logger)
    detector.batch_detect(args.data, args.out, batch_size=args.batch)
    return 0


def _sliced_detect_dir(args, cfg, detector, logger) -> int:
    """detect --sliced RxC: tiled detection over every image in --data.
    All R*C tiles of an image run as ONE batch through the detector's
    jitted program; results are origin-pixel boxes after the global NMS."""
    import time

    import cv2

    from yolofastest_tpu.inference.sliced import sliced_detect
    from yolofastest_tpu.utils.visualize import CLASS_COLORS, plot_one_box

    try:
        rows, cols = (int(v) for v in args.sliced.lower().split("x"))
    except ValueError:
        print(f"--sliced expects RxC (e.g. 2x3), got {args.sliced!r}")
        return 2
    io = cfg.io
    names = sorted(f for f in os.listdir(args.data)
                   if f.lower().endswith(".jpg"))
    avg = 0.0
    for fn in names:
        ori = cv2.imread(os.path.join(args.data, fn))
        t0 = time.time()
        det = sliced_detect(detector, ori, (rows, cols), args.slice_overlap)
        total = (time.time() - t0) * 1e3
        avg += total
        for b, conf, cs, cls in zip(det["boxes"], det["conf"],
                                    det["cls_score"], det["cls_idx"]):
            plot_one_box(list(b), ori, color=CLASS_COLORS[int(cls) % 3],
                         label="%s %.2f" % (io.class_names[int(cls)],
                                            conf * cs),
                         line_thickness=3)
        cv2.imwrite(os.path.join(args.out, "result_" + fn), ori)
        logger.info("image_name:%s -> total time:%.2fms (%d dets, "
                    "%dx%d tiles)" % (fn, total, det["count"], rows, cols))
    logger.info("detect avg_time: %.2fms" % (avg / max(len(names), 1)))
    return 0


def _build_engine(args, cfg, backend, calib_data):
    """Deployment engine for serve/eval: a ``Detector`` (jax fp/int8
    pipelines) or a ``NativeEngine`` (C++ fp32/int8-VNNI).  Returns ``None``
    after a printed message on error."""
    if backend in ("native", "native-int8"):
        if getattr(args, "tta", False):
            print("--tta runs the flip pass on device; it applies to the "
                  "jax backends (fp/int8/int8-fused), not the C++ engine")
            return None
        import tempfile

        from yolofastest_tpu.export import save_native_weights
        from yolofastest_tpu.models import fold_batchnorm
        from yolofastest_tpu.native import NativeEngine

        folded = fold_batchnorm(
            _load_weights(args.weights, getattr(args, "arch", None)))
        # The engine loads everything into memory at construction, so the
        # .yfb staging file can be deleted immediately (no /tmp litter
        # across restarts).
        with tempfile.TemporaryDirectory(prefix="yf_engine_") as td:
            yfb = os.path.join(td, "model.yfb")
            if backend == "native-int8":
                from yolofastest_tpu.quant import quantize_weights

                scales = _native_int8_scales(args, cfg, folded, calib_data)
                if scales is None:
                    return None
                save_native_weights(quantize_weights(folded), yfb,
                                    act_scales=scales)
            else:
                save_native_weights(folded, yfb)
            return NativeEngine(yfb, cfg)

    from yolofastest_tpu.inference import Detector

    keep_fp = _parse_keep_fp(args, backend)
    if keep_fp is None:
        return None
    calibration = None
    cache = None
    if backend in ("int8", "int8-fused"):
        resolved = _resolve_jax_int8_calibration(args, cfg, calib_data)
        if resolved is None:
            return None
        calibration, cache = resolved
    ck = _calib_kwargs(args)
    return Detector(cfg, variables=_load_weights(args.weights,
                                                  getattr(args, "arch", None)),
                    fold_bn=True, backend=backend,
                    calibration=calibration, calibration_cache=cache,
                    arch=args.arch, tta=getattr(args, "tta", False),
                    calib_method=ck["method"],
                    calib_percentile=ck["percentile"],
                    keep_fp=keep_fp)


def cmd_serve(args) -> int:
    """HTTP detection server with dynamic batching (the serving-traffic
    analogue of the reference's one-image-at-a-time detect loops —
    ``detect.py:141-192``; see ``inference/server.py``)."""

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    backend = "fp" if args.backend == "jax" else args.backend  # legacy alias
    engine = _build_engine(args, cfg, backend, args.calib_data)
    if engine is None:
        return 2

    from yolofastest_tpu.inference import (DetectionServer, DynamicBatcher,
                                           make_batch_fn)

    batcher = DynamicBatcher(make_batch_fn(engine, max_det=cfg.io.max_det),
                             cfg.io.input_hw,
                             max_batch=args.max_batch,
                             window_ms=args.window_ms)
    server = DetectionServer(batcher, cfg, host=args.host, port=args.port,
                             arch=args.arch, backend=backend)
    print(f"serving on http://{args.host}:{server.port} "
          "(POST /detect, GET /healthz, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()
    return 0


def cmd_video(args) -> int:
    """Video file -> annotated video, through any deployment backend (the
    embedded camera-board use case the reference targets but never ships;
    see ``inference/video.py``)."""
    import json

    from yolofastest_tpu.utils.logging import config_logger

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    os.makedirs(args.out, exist_ok=True)
    logger = config_logger(args.out, "video_info.log")
    backend = "fp" if args.backend == "jax" else args.backend  # legacy alias
    engine = _build_engine(args, cfg, backend, args.calib_data)
    if engine is None:
        return 2

    from yolofastest_tpu.inference import IoUTracker, detect_video

    tracker = None
    if args.track:
        tracker = IoUTracker(iou_thre=args.track_iou,
                             max_age=args.track_max_age)
    stem, ext = os.path.splitext(os.path.basename(args.video))
    if ext.lower() not in (".mp4", ".m4v", ".avi"):
        ext = ".avi"
    out_path = os.path.join(args.out, "result_" + stem + ext)
    stats = detect_video(engine, cfg, args.video, out_path,
                         batch_size=args.batch, depth=args.depth,
                         tracker=tracker, logger=logger)
    print(json.dumps(stats))
    return 0


def cmd_train(args) -> int:
    import dataclasses

    from yolofastest_tpu.data import DetectionLoader, VOCIndex
    from yolofastest_tpu.eval import MAPEvaluator
    from yolofastest_tpu.train import Trainer
    from yolofastest_tpu.utils.logging import config_logger
    from yolofastest_tpu.utils.metrics import MetricsWriter

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    tr = dataclasses.replace(
        cfg.train,
        total_epochs=args.epochs or cfg.train.total_epochs,
        batch_size=args.batch_size or cfg.train.batch_size,
        max_to_keep=(cfg.train.max_to_keep if args.max_to_keep is None
                     else args.max_to_keep),
        lr0=(cfg.train.lr0 if args.lr is None else args.lr),
        warmup_min_iters=(cfg.train.warmup_min_iters
                          if args.warmup_min_iters is None
                          else args.warmup_min_iters),
        ema_decay=(cfg.train.ema_decay if args.ema is None else args.ema),
        ema_ramp=(cfg.train.ema_ramp if args.ema_ramp is None
                  else args.ema_ramp),
        multiscale_steps=(cfg.train.multiscale_steps
                          if args.multiscale is None else args.multiscale),
    )
    cfg = dataclasses.replace(cfg, train=tr)
    if getattr(args, "mosaic", None):
        cfg = dataclasses.replace(
            cfg, augment=dataclasses.replace(cfg.augment, mosaic=args.mosaic))

    logger = config_logger(args.log_dir, "train_info.log")
    logger.info("Start....")
    if cfg.train.multiscale_steps > 0:
        from yolofastest_tpu.data import multiscale_buckets

        logger.info("multi-scale training: buckets %s, redrawn every %d "
                    "batches" % (list(multiscale_buckets(cfg)),
                                 cfg.train.multiscale_every))

    train_idx = _make_index(args.train_dir, cfg.io.class_names, logger,
                            fmt=args.format)
    loader = DetectionLoader(train_idx, cfg, seed=cfg.train.seed,
                             cache=args.cache_images)

    validator = None
    if args.val_dir:
        val_idx = _make_index(args.val_dir, cfg.io.class_names, logger,
                              fmt=args.format)
        val_loader = DetectionLoader(val_idx, cfg, augment=False,
                                     shuffle=False, drop_last=False)
        iou_thresholds = None
        if getattr(args, "coco_map", False):
            from yolofastest_tpu.eval import COCO_IOU_GRID
            iou_thresholds = COCO_IOU_GRID
        validator = MAPEvaluator(cfg, val_loader, logger=logger,
                                 arch=args.arch,
                                 iou_thresholds=iou_thresholds)

    variables = (_load_weights(args.pretrained, args.arch)
                 if args.pretrained else None)
    if variables is not None:
        logger.info("Load pretrained model %s" % args.pretrained)
    else:
        logger.info("initialize model")

    distill_fn = None
    if args.distill_teacher:
        from yolofastest_tpu.train import make_teacher_fn

        distill_fn = make_teacher_fn(
            _load_weights(args.distill_teacher, args.distill_arch),
            arch=args.distill_arch)
        logger.info("Distilling from %s (%s) with weight %g"
                    % (args.distill_teacher, args.distill_arch,
                       args.distill_weight))

    import jax.numpy as jnp

    try:
        trainer = Trainer(cfg, batch_per_epoch=len(loader),
                          variables=variables, logger=logger, arch=args.arch,
                          distill_fn=distill_fn,
                          distill_weight=args.distill_weight,
                          freeze=args.freeze,
                          compute_dtype=(jnp.bfloat16 if args.bf16
                                         else jnp.float32))
    except ValueError as e:
        if args.freeze and "--freeze" in str(e):
            raise SystemExit(str(e))
        raise
    start_epoch = 0
    if args.resume:
        path = args.resume
        if path == "latest":
            # elastic restart: rerun the same command after a crash and
            # training picks up at the next epoch with full state
            import re

            cands = sorted(
                (int(m.group(1)), d)
                for d in (os.listdir(args.checkpoint_dir)
                          if os.path.isdir(args.checkpoint_dir) else [])
                if (m := re.fullmatch(r"epoch_(\d+)", d))
            )
            path = os.path.join(args.checkpoint_dir, cands[-1][1]) if cands else None
        if path:
            trainer.restore_checkpoint(path)
            start_epoch = int(trainer.state.step) // max(len(loader), 1)
            logger.info("Resumed full state from %s (epoch %d)" % (path, start_epoch))
        else:
            logger.info("No checkpoint to resume; starting fresh")

    metrics = MetricsWriter(args.log_dir)
    trainer.fit(loader, validator=validator,
                checkpoint_dir=args.checkpoint_dir, metrics_writer=metrics,
                start_epoch=start_epoch)
    metrics.close()
    return 0


def cmd_eval(args) -> int:
    from yolofastest_tpu.data import DetectionLoader, VOCIndex
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


def cmd_export(args) -> int:
    from yolofastest_tpu.export import (
        export_detect_pipeline,
        export_folded_forward,
        export_int8_forward,
        export_onnx,
        save_exported,
        save_native_weights,
    )
    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.quant import quantize_weights

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    arch = getattr(args, "arch", "fastest")
    variables = _load_weights(args.weights, getattr(args, "arch", None))
    folded = fold_batchnorm(variables)
    os.makedirs(args.out, exist_ok=True)

    cal = None
    act_scales = None
    if args.calib_data:
        from yolofastest_tpu.quant import calibrate

        # a missing/empty calib dir skips the int8 extras but must not
        # abort the main artifacts below
        cal = _load_calibration(args.calib_data, cfg.io)
        if cal is not None:
            act_scales = calibrate(folded, [cal], arch=arch,
                                   **_calib_kwargs(args))

    # the int8 artifacts may come from QAT-refined weights; the fp
    # artifacts always ship the original checkpoint
    int8_src = folded
    if getattr(args, "qat_steps", 0) > 0:
        if act_scales is None:
            print("--qat-steps needs --calib-data (skipping QAT)")
        else:
            from yolofastest_tpu.quant import qat_finetune

            int8_src, hist = qat_finetune(folded, act_scales, [cal],
                                          arch=arch, steps=args.qat_steps,
                                          lr=args.qat_lr)
            # qat_finetune ships the LOWEST-loss iterate (STE trajectories
            # are noisy), so report min(hist) — that is the exported point
            print("QAT distillation: loss %.3e -> %.3e (best of %d steps)"
                  % (hist[0], min(hist), len(hist)))

    save_native_weights(folded, os.path.join(args.out, "model.yfb"))
    print("wrote", os.path.join(args.out, "model.yfb"))
    # with --calib-data, the int8 .yfb also carries activation scales, so
    # the C++ engine runs real int8 arithmetic on it (cpp/src/ops_int8.cpp)
    qparams = quantize_weights(int8_src)
    save_native_weights(qparams, os.path.join(args.out, "model_int8.yfb"),
                        act_scales=act_scales)
    print("wrote", os.path.join(args.out, "model_int8.yfb"))

    graph_arch = "yolofastest" if arch == "fastest" else "yolofastest-lite"
    export_onnx(folded, cfg.io.input_hw, os.path.join(args.out, "model.onnx"),
                arch=graph_arch)
    print("wrote", os.path.join(args.out, "model.onnx"))
    from yolofastest_tpu.export import export_onnx_detect

    export_onnx_detect(folded, cfg, os.path.join(args.out, "detect.onnx"),
                       arch=graph_arch)
    print("wrote", os.path.join(args.out, "detect.onnx"))
    from yolofastest_tpu.export import export_ncnn

    export_ncnn(folded, cfg.io.input_hw, os.path.join(args.out, "model.param"),
                os.path.join(args.out, "model.bin"), arch=graph_arch)
    print("wrote", os.path.join(args.out, "model.param"),
          "+", os.path.join(args.out, "model.bin"))
    from yolofastest_tpu.export import export_caffe

    export_caffe(folded, cfg.io.input_hw,
                 os.path.join(args.out, "model.prototxt"),
                 os.path.join(args.out, "model.caffemodel"), arch=graph_arch)
    print("wrote", os.path.join(args.out, "model.prototxt"),
          "+", os.path.join(args.out, "model.caffemodel"))
    if act_scales is not None:
        from yolofastest_tpu.export import export_onnx_qdq

        export_onnx_qdq(qparams, act_scales, cfg.io.input_hw,
                        os.path.join(args.out, "model_int8.onnx"),
                        arch=graph_arch)
        print("wrote", os.path.join(args.out, "model_int8.onnx"))
        from yolofastest_tpu.export import export_ncnn_table

        # calibration table for ncnn's own int8 compiler: ncnn2int8
        # model.param model.bin out.param out.bin model.table
        # The table MUST be derived from the same weights the shipped
        # model.param/model.bin carry (the original fp `folded` tree): with
        # --qat-steps, `qparams` holds QAT-refined weights whose reduced
        # amax multipliers would clip the fp weights ncnn2int8 actually
        # quantises. The QAT refinement ships in the self-contained int8
        # artifacts (model_int8.yfb / model_int8.onnx) instead.
        table_qparams = qparams if int8_src is folded else quantize_weights(folded)
        export_ncnn_table(table_qparams, act_scales,
                          os.path.join(args.out, "model.table"),
                          arch=graph_arch)
        print("wrote", os.path.join(args.out, "model.table"))

    try:
        from yolofastest_tpu.export import export_torchscript

        export_torchscript(folded, cfg.io.input_hw,
                           os.path.join(args.out, "model.pt"), batch=args.batch,
                           arch=graph_arch)
        print("wrote", os.path.join(args.out, "model.pt"))
    except ImportError:
        print("torch not available; skipping model.pt")

    exp = export_folded_forward(folded, cfg, batch=args.batch, arch=arch)
    save_exported(exp, os.path.join(args.out, "forward.stablehlo"))
    print("wrote", os.path.join(args.out, "forward.stablehlo"))
    from yolofastest_tpu.export import save_exported_mlir

    # textual twin for the native consumer (cpp/build/yf_shlo)
    save_exported_mlir(exp, os.path.join(args.out, "forward.mlir"))
    print("wrote", os.path.join(args.out, "forward.mlir"))
    exp = export_detect_pipeline(variables, cfg, batch=args.batch, arch=arch)
    save_exported(exp, os.path.join(args.out, "detect.stablehlo"))
    print("wrote", os.path.join(args.out, "detect.stablehlo"))

    if cal is not None:
        # int8_src/act_scales carry the QAT refinement when --qat-steps ran
        exp = export_int8_forward(variables, cfg, cal, batch=args.batch,
                                  arch=arch, folded=int8_src,
                                  act_scales=act_scales)
        save_exported(exp, os.path.join(args.out, "forward_int8.stablehlo"))
        print("wrote", os.path.join(args.out, "forward_int8.stablehlo"))
    return 0


def cmd_convert(args) -> int:
    from yolofastest_tpu.models import save_variables

    given = [o for o in ("pth", "ncnn", "onnx") if getattr(args, o, None)]
    if len(given) != 1:
        print("convert: give exactly one of --pth / --ncnn / --onnx")
        return 2
    if args.ncnn:
        from yolofastest_tpu.export import import_ncnn
        from yolofastest_tpu.models import unfold_to_variables

        folded, arch = import_ncnn(args.ncnn)
        variables = unfold_to_variables(folded)
        save_variables(variables, args.out)
        print(f"{args.ncnn} ({arch}) -> {args.out}")
        print("note: batch norms are identity-lifted from the folded "
              "artifact; fine-tuning will re-estimate running stats")
        return 0
    if args.onnx:
        from yolofastest_tpu.export import import_onnx

        variables, arch, bn_preserved = import_onnx(args.onnx)
        save_variables(variables, args.out)
        print(f"{args.onnx} ({arch}) -> {args.out}")
        if not bn_preserved:
            print("note: batch norms are identity-lifted from the folded "
                  "artifact; fine-tuning will re-estimate running stats")
        return 0
    variables = _load_weights(args.pth)
    save_variables(variables, args.out)
    print(f"{args.pth} -> {args.out}")
    return 0


def cmd_prune(args) -> int:
    """Structured channel pruning (models/prune.py): drop the lowest-
    importance fraction of every res block's expansion channels and write a
    plain (smaller) weights tree.  The pruned checkpoint runs on every
    backend unchanged (shapes drive all of them) and fine-tunes via
    ``train --pretrained <out>`` (pass it again with ``--resume`` — the
    restore needs matching widths)."""
    from yolofastest_tpu.models import fold_batchnorm, save_variables
    from yolofastest_tpu.models.prune import prune_variables
    from yolofastest_tpu.models.summary import summarize

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    variables = _load_weights(args.weights, args.arch)
    pruned, report = prune_variables(variables, args.ratio,
                                     min_keep=args.min_keep,
                                     round_to=args.round_to)

    walk_arch = "yolofastest" if args.arch == "fastest" else "yolofastest-lite"
    before = summarize(fold_batchnorm(variables), cfg.io.input_hw, walk_arch)
    after = summarize(fold_batchnorm(pruned), cfg.io.input_hw, walk_arch)

    print(f"{'block':<10} {'before':>7} {'after':>6}")
    for name, (old, new) in report.items():
        mark = "" if new == old else f"  (-{old - new})"
        print(f"{name:<10} {old:>7} {new:>6}{mark}")
    dp = 1.0 - after["total_params"] / before["total_params"]
    dm = 1.0 - after["total_macs"] / before["total_macs"]
    print(f"params {before['total_params']:,} -> {after['total_params']:,} "
          f"(-{dp:.1%})")
    print(f"MACs   {before['total_macs']:,} -> {after['total_macs']:,} "
          f"(-{dm:.1%})")

    save_variables(pruned, args.out)
    print(f"wrote {args.out}")
    return 0


def cmd_sensitivity(args) -> int:
    """Per-layer int8 sensitivity table (quant/sensitivity.py): quantise ONE
    layer at a time, measure head-logit damage vs the fp folded graph, rank
    worst-first, and print the ``--keep-fp`` line that deploys the worst K
    in float (RKNN "hybrid quantization" analogue)."""
    import json

    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.quant import layer_sensitivity

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    folded = fold_batchnorm(_load_weights(args.weights, args.arch))
    cal = _load_calibration(args.data, cfg.io, k=args.images)
    if cal is None:
        return 2
    act_scales = None
    cache = _int8_cache_path(args)
    if os.path.exists(cache):
        # One calibration serves every int8 entry point (same cache file as
        # detect/eval/export); a miss calibrates fresh from --data below.
        with open(cache) as f:
            act_scales = {k: float(v) for k, v in json.load(f).items()}
        print(f"calibration scales: {cache}")
    rows = layer_sensitivity(folded, [cal], arch=args.arch,
                             act_scales=act_scales, **_calib_kwargs(args))
    print(f"{'layer':<14} {'mean|d|':>12} {'max|d|':>12}")
    for r in rows:
        print(f"{r['layer']:<14} {r['mean_abs']:>12.6f} {r['max_abs']:>12.6f}")
    worst = ",".join(r["layer"] for r in rows[:args.top])
    print(f"\nsuggested mixed-precision deployment (worst {args.top}):")
    print(f"  --backend int8 --keep-fp {worst}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json_out}")
    return 0


def cmd_voc2coco(args) -> int:
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.data import voc_to_coco

    names = get_config(args.config).io.class_names
    n = voc_to_coco(args.src, args.dst, names)
    print(f"converted {n} images -> {args.dst} (COCO layout)")
    return 0


def cmd_txt2xml(args) -> int:
    from yolofastest_tpu.data.txt2xml import convert_txt_dataset

    n = convert_txt_dataset(args.src, args.dst, class_id_base=args.class_id_base)
    print(f"converted {n} label files -> {args.dst}")
    return 0


def cmd_anchors(args) -> int:
    """K-means auto-anchors from a dataset (the reference hand-picks its
    anchor groups, ``_config.py:5-9``; this derives them for any dataset)."""
    import dataclasses

    import numpy as np

    from yolofastest_tpu.data import (anchor_groups, collect_wh,
                                      kmeans_anchors, mean_best_iou)

    cfg = _get_config(args)
    idx = _make_index(args.data, cfg.io.class_names, fmt=args.format)
    wh = collect_wh(idx, cfg)
    num_scales = len(cfg.io.strides)
    k = args.num or num_scales * cfg.io.num_anchors
    anchors = kmeans_anchors(wh, k, seed=args.seed)
    groups = anchor_groups(anchors, num_scales)

    old_fit = mean_best_iou(wh, np.array(cfg.io.anchors).reshape(-1, 2))
    new_fit = mean_best_iou(wh, anchors)
    print(f"{len(wh)} GT boxes from {len(idx)} images "
          f"({args.data}, net input {cfg.io.input_hw})")
    for s, (g, stride) in enumerate(zip(groups, cfg.io.strides)):
        print(f"scale {s} (stride {stride}): "
              + ", ".join(f"({w:g}, {h:g})" for w, h in g))
    print(f"mean best-IoU: {new_fit:.4f} (preset anchors: {old_fit:.4f})")

    if args.out:
        new_cfg = dataclasses.replace(
            cfg, io=dataclasses.replace(cfg.io, anchors=groups))
        with open(args.out, "w") as f:
            f.write(new_cfg.to_json())
        print(f"wrote config with the new anchors -> {args.out}")
    return 0


def cmd_info(args) -> int:
    """Model summary (per-layer shapes/params/MACs from the deployment
    topology walk) — the reference has no model introspection at all."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.models.summary import (device_cost_analysis,
                                                format_summary, summarize)

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    arch = "yolofastest-lite" if args.arch == "lite" else "yolofastest"
    if args.weights:
        variables = _load_weights(args.weights, getattr(args, "arch", None))
    else:
        # shapes/params only need channel counts: init a fresh model
        if args.arch == "lite":
            from yolofastest_tpu.models import YoloFastestLite as _Cls
        else:
            from yolofastest_tpu.models import YoloFastest as _Cls
        model = _Cls(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 96, 1), jnp.float32),
                               train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    s = summarize(folded, cfg.io.input_hw, arch=arch)
    cost = None
    if args.device_cost:
        cost = device_cost_analysis(folded, cfg.io.input_hw, arch=arch,
                                    batch=args.batch)
    print(format_summary(s, device_cost=cost))
    if args.json_out:
        out = dict(s)
        if cost:
            out["device_cost"] = cost
        with open(args.json_out, "w") as f:
            _json.dump(out, f, indent=1)
        print("wrote", args.json_out)
    return 0


def _add_calib_method_flags(p) -> None:
    """Calibration-algorithm knobs shared by every int8-capable command
    (mirrors RKNN-Toolkit's quantized_algorithm normal/mmse/kl_divergence)."""
    p.add_argument("--calib-method", default="amax",
                   choices=["amax", "mse", "percentile", "entropy"],
                   help="int8 activation-scale algorithm: amax (exact range"
                        ", default), mse (min-quant-error clip — measured "
                        "best on the zoo checkpoint), percentile, entropy "
                        "(KL). Non-amax methods get their own cache file "
                        "suffix")
    p.add_argument("--calib-percentile", type=float, default=99.99,
                   help="clip percentile for --calib-method percentile")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="yolofastest_tpu")
    p.add_argument("--compile-cache", default=None, metavar="DIR|off",
                   help="persistent XLA compilation-cache directory shared "
                        "across processes (default: $YF_COMPILE_CACHE, then "
                        "~/.cache/yolofastest_tpu/xla; 'off' disables) — "
                        "turns a repeat invocation's 20-60 s jit compiles "
                        "into deserializes")
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("detect", help="batch-detect a directory of images")
    d.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    d.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    d.add_argument("--weights", required=True, help=".npz zoo file or reference .pth")
    d.add_argument("--data", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--arch", default="fastest", choices=["fastest", "lite"],
                   help="model architecture (lite = single-head variant; "
                        "use with --config lite-256x320)")
    d.add_argument("--backend", default="fp",
                   choices=["fp", "jax", "native", "native-int8", "int8",
                            "int8-fused"],
                   help="native = fp32 C++ engine; native-int8 = C++ engine "
                        "with int8 VNNI arithmetic on the 1x1 convs "
                        "(calibrates on the first 8 target images)")
    d.add_argument("--fold-bn", action="store_true",
                   help="run the BN-folded deployment graph (fp backend)")
    d.add_argument("--batch", type=int, default=1,
                   help="device batch size for the detect pipeline (>1 = "
                        "throughput mode, amortised per-image timing)")
    d.add_argument("--tta", action="store_true", help="horizontal-flip test-time augmentation (jax backends): the mirrored batch rides the same device program and both candidate sets merge into one NMS — a recall boost for ~2x device FLOPs")
    d.add_argument("--sliced", default=None, metavar="RxC",
                   help="tiled (SAHI-style) detection for large frames: "
                        "split each image into an RxC grid of overlapping "
                        "crops, run ALL tiles as one batch through the "
                        "jitted program, merge in one global NMS (jax "
                        "backends; small objects keep their pixels)")
    d.add_argument("--slice-overlap", type=float, default=0.2,
                   help="fraction of tile extent shared by neighbouring "
                        "tiles (default 0.2)")
    d.add_argument("--keep-fp", default=None, metavar="L1,L2,...",
                   help="mixed precision for --backend int8: these folded-"
                        "graph layers run the fp kernel (pick them with the "
                        "'sensitivity' subcommand)")
    d.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    _add_calib_method_flags(d)
    d.set_defaults(fn=cmd_detect)

    s = sub.add_parser("serve",
                       help="HTTP detection server with dynamic batching")
    s.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    s.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    s.add_argument("--weights", required=True, help=".npz zoo file or reference .pth")
    s.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    s.add_argument("--backend", default="fp",
                   choices=["fp", "jax", "native", "native-int8", "int8",
                            "int8-fused"],
                   help="fp (BN-folded jax) is the TPU serving path; "
                        "native/native-int8 serve through the C++ engine")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000,
                   help="TCP port (0 = pick a free one, printed at start)")
    s.add_argument("--max-batch", type=int, default=8,
                   help="device batch capacity; concurrent requests coalesce "
                        "up to this many per dispatch")
    s.add_argument("--window-ms", type=float, default=5.0,
                   help="how long to wait for co-arriving requests after the "
                        "first (idle-latency floor)")
    s.add_argument("--calib-data", default=None,
                   help="calibration image dir for the int8 backends")
    s.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    _add_calib_method_flags(s)
    s.set_defaults(fn=cmd_serve)

    v = sub.add_parser("video",
                       help="detect over a video file -> annotated video")
    v.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    v.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    v.add_argument("--weights", required=True, help=".npz zoo file or reference .pth")
    v.add_argument("--video", required=True,
                   help="input video path, stream URL, or camera index "
                        "(e.g. 0)")
    v.add_argument("--out", required=True, help="output directory")
    v.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    v.add_argument("--backend", default="fp",
                   choices=["fp", "jax", "native", "native-int8", "int8",
                            "int8-fused"],
                   help="fp (BN-folded jax) batches frames on device; "
                        "native/native-int8 run the C++ engine per frame")
    v.add_argument("--batch", type=int, default=8,
                   help="frames per device dispatch (jax backends)")
    v.add_argument("--depth", type=int, default=2,
                   help="batches in flight before the first fetch (jax "
                        "backends; overlaps H2D/compute/D2H)")
    v.add_argument("--tta", action="store_true", help="horizontal-flip test-time augmentation (jax backends): the mirrored batch rides the same device program and both candidate sets merge into one NMS — a recall boost for ~2x device FLOPs")
    v.add_argument("--calib-data", default=None,
                   help="calibration image dir for the int8 backends")
    v.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    v.add_argument("--track", action="store_true",
                   help="annotate stable track IDs (SORT-style IoU "
                        "tracker) instead of independent detections")
    v.add_argument("--track-iou", type=float, default=0.3,
                   help="association IoU gate for --track")
    v.add_argument("--track-max-age", type=int, default=10,
                   help="frames a track coasts unmatched before dropping")
    _add_calib_method_flags(v)
    v.set_defaults(fn=cmd_video)

    t = sub.add_parser("train", help="train on a VOC-XML or COCO dataset")
    t.add_argument("--format", default="auto",
                   choices=["auto", "voc", "coco"],
                   help="dataset layout: voc = <dir>/img + <dir>/xml, "
                        "coco = <dir>/img + <dir>/annotations.json; "
                        "auto picks by the annotations.json presence")
    t.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    t.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    t.add_argument("--train-dir", required=True)
    t.add_argument("--val-dir", default=None)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--pretrained", default=None)
    t.add_argument("--resume", default=None,
                   help="orbax checkpoint dir to resume, or 'latest' to pick "
                        "the newest epoch in --checkpoint-dir")
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    t.add_argument("--max-to-keep", type=int, default=None,
                   help="rotate old epoch checkpoints, keeping the newest N "
                        "(0 keeps all; default from config)")
    t.add_argument("--lr", type=float, default=None,
                   help="initial learning rate (default from config)")
    t.add_argument("--cache-images", action="store_true",
                   help="keep decoded net-input images in RAM after first "
                        "use (N*H*W bytes; epochs >= 2 skip jpeg decode — "
                        "the host input pipeline is the usual TPU training "
                        "bottleneck)")
    t.add_argument("--coco-map", action="store_true",
                   help="validation additionally reports COCO-style "
                        "mAP@[.50:.95] (headline mAP stays @0.5)")
    t.add_argument("--mosaic", type=float, default=None,
                   help="probability of 4-image mosaic augmentation per "
                        "example (beyond-reference; default 0 = reference "
                        "pipeline unchanged)")
    t.add_argument("--multiscale", type=int, nargs="?", const=2, default=None,
                   metavar="STEPS",
                   help="multi-scale training: every train.multiscale_every "
                        "batches draw the input (H, W) from input_hw +/- "
                        "k*32, k <= STEPS (beyond-reference; each bucket is "
                        "one extra cached compile of the train step). Bare "
                        "--multiscale means 2 steps each side")
    t.add_argument("--freeze", default=None, metavar="SPEC",
                   help="pin modules during training: 'backbone' (everything "
                        "but the heads — the fine-tune workflow) or comma-"
                        "separated module-name prefixes from `info` (e.g. "
                        "'conv0' or 'res1,res2'). Frozen leaves stay bitwise "
                        "unchanged (XLA drops their backward pass; BN stats "
                        "pinned too); checkpoints stay resume-compatible "
                        "across --freeze settings")
    t.add_argument("--ema", type=float, nargs="?", const=0.9995, default=None,
                   metavar="DECAY",
                   help="keep an exponential moving average of the model "
                        "(beyond-reference); validation and checkpointed "
                        "deployment weights then use the EMA. Bare --ema "
                        "means decay 0.9995")
    t.add_argument("--ema-ramp", type=int, default=None,
                   help="EMA decay ramp-in length in steps (default 2000)")
    t.add_argument("--warmup-min-iters", type=int, default=None,
                   help="linear LR warmup lower bound in iterations; the "
                        "reference hard-codes max(3*steps_per_epoch, 1000) "
                        "(train.py:81) which never completes on small "
                        "datasets — lower it for short runs")
    t.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv compute in the train step (params, "
                        "loss and BN stats stay fp32) - the MXU-native "
                        "dtype; the deployed graphs already run bf16")
    t.add_argument("--distill-teacher", default=None,
                   help="zoo .npz checkpoint whose head logits supervise the "
                        "student alongside the label loss (e.g. the full "
                        "model teaching --arch lite)")
    t.add_argument("--distill-arch", default="fastest",
                   choices=["fastest", "lite"],
                   help="architecture of --distill-teacher")
    t.add_argument("--distill-weight", type=float, default=1.0,
                   help="weight of the teacher-MSE term in the total loss")
    t.add_argument("--log-dir", default="logs")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="mAP on a VOC-XML or COCO val set")
    e.add_argument("--format", default="auto",
                   choices=["auto", "voc", "coco"],
                   help="dataset layout (see train --format)")
    e.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    e.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    e.add_argument("--weights", required=True)
    e.add_argument("--val-dir", required=True)
    e.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    e.add_argument("--backend", default="train",
                   choices=["train", "fp", "jax", "int8", "int8-fused",
                            "native", "native-int8"],
                   help="train (default) = the training-loop evaluator "
                        "(reference validate.py parity); any other choice "
                        "scores the DEPLOYED pipeline (BN-folded, detect-"
                        "path NMS) through that backend")
    e.add_argument("--max-det", type=int, default=None,
                   help="override the per-image detection budget (config "
                        "default 64) — e.g. 100 for the standard COCO AR "
                        "cap; the decode pool grows to at least 2x this")
    e.add_argument("--coco-map", action="store_true",
                   help="additionally report COCO-style mAP@[.50:.95] "
                        "(10 IOU thresholds; headline mAP stays @0.5)")
    e.add_argument("--coco-strict", action="store_true",
                   help="with --coco-map: pycocotools' exact conventions — "
                        "standard IOU (no +1px) matching and 101-point AP "
                        "interpolation")
    e.add_argument("--tta", action="store_true",
                   help="horizontal-flip test-time augmentation (deployed "
                        "jax backends fp/int8/int8-fused): mirrored batch in "
                        "the same device program, merged into one NMS")
    e.add_argument("--json-out", default=None,
                   help="also write the full metrics dict (per-class AP, "
                        "target counts, detection rate, per-IOU grid) as "
                        "JSON to this path")
    e.add_argument("--calib-data", default=None,
                   help="calibration image dir for the int8 backends")
    e.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    e.add_argument("--keep-fp", default=None, metavar="L1,L2,...",
                   help="mixed precision for --backend int8: these folded-"
                        "graph layers run the fp kernel (pick them with the "
                        "'sensitivity' subcommand)")
    e.add_argument("--log-dir", default="logs")
    _add_calib_method_flags(e)
    e.set_defaults(fn=cmd_eval)

    x = sub.add_parser("export",
                       help="export StableHLO + ONNX + TorchScript + native .yfb")
    x.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    x.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    x.add_argument("--weights", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--batch", type=int, default=1)
    x.add_argument("--arch", default="fastest", choices=["fastest", "lite"],
                   help="model architecture; every artifact is emitted for "
                        "both (lite = single-head topology)")
    x.add_argument("--calib-data", default=None,
                   help="directory of calibration .jpg images; when given, "
                        "also exports the int8 graph (forward_int8.stablehlo)")
    x.add_argument("--qat-steps", type=int, default=0,
                   help="quantisation-aware distillation steps on the "
                        "calibration images before emitting the int8 "
                        "artifacts (needs --calib-data; fp artifacts keep "
                        "the original weights)")
    x.add_argument("--qat-lr", type=float, default=1e-4,
                   help="Adam learning rate for --qat-steps")
    _add_calib_method_flags(x)
    x.set_defaults(fn=cmd_export)

    i = sub.add_parser("info", help="model summary: per-layer shapes, "
                       "params, MACs (optionally XLA compiled cost)")
    i.add_argument("--config", default="256x320")
    i.add_argument("--config-json")
    i.add_argument("--arch", choices=["fastest", "lite"], default="fastest")
    i.add_argument("--weights", help="optional .npz/.pth/.onnx/checkpoint "
                   "dir; fresh init when omitted (shapes need only channel "
                   "counts)")
    i.add_argument("--device-cost", action="store_true",
                   help="also compile the folded forward and report XLA's "
                        "FLOPs / HBM-bytes per image")
    i.add_argument("--batch", type=int, default=8,
                   help="batch for --device-cost")
    i.add_argument("--json-out", help="also dump the summary dict as JSON")
    i.set_defaults(fn=cmd_info)

    c = sub.add_parser("convert",
                       help="reference .pth, orbax checkpoint dir, ncnn "
                            ".param/.bin, or .onnx -> zoo .npz")
    c.add_argument("--pth",
                   help="reference .pth, a .npz, or a train-run epoch_N "
                        "checkpoint dir (extracts the EMA model when the "
                        "run kept one)")
    c.add_argument("--ncnn",
                   help="ncnn .param path (matching .bin alongside) — "
                        "imports a compiled deployment artifact, incl. the "
                        "reference's shipped models/ncnn/*-opt files; arch "
                        "is auto-detected")
    c.add_argument("--onnx",
                   help=".onnx path — imports torch-exported graphs (BN "
                        "preserved -> exact unfolded variables, incl. the "
                        "reference's shipped models/onnx files) and our own "
                        "BN-folded exports; arch is auto-detected")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_convert)

    pr = sub.add_parser(
        "prune",
        help="structured channel pruning: drop the lowest-importance "
             "fraction of every res block's expansion channels; the "
             "pruned .npz runs/fine-tunes on every backend unchanged")
    pr.add_argument("--weights", required=True,
                    help=".npz / .pth / .onnx / epoch_N checkpoint dir")
    pr.add_argument("--ratio", type=float, required=True,
                    help="fraction of inner channels to remove per block, "
                         "in [0, 1)")
    pr.add_argument("--min-keep", type=int, default=4,
                    help="floor on kept channels per block (default 4)")
    pr.add_argument("--round-to", type=int, default=4,
                    help="kept widths round UP to this multiple (default 4)")
    pr.add_argument("--arch", choices=["fastest", "lite"], default="fastest")
    pr.add_argument("--config", default="256x320")
    pr.add_argument("--config-json")
    pr.add_argument("--out", required=True, help="output .npz path")
    pr.set_defaults(fn=cmd_prune)

    sn = sub.add_parser(
        "sensitivity",
        help="per-layer int8 sensitivity: quantise one layer at a time, "
             "rank the head-logit damage, suggest a --keep-fp set for "
             "mixed-precision deployment")
    sn.add_argument("--config", default="256x320",
                    choices=["256x320", "512x640", "lite-256x320",
                             "lite-512x640"])
    sn.add_argument("--config-json", default=None,
                    help="Config JSON file; overrides --config")
    sn.add_argument("--weights", required=True,
                    help=".npz / .pth / .onnx / epoch_N checkpoint dir")
    sn.add_argument("--data", required=True,
                    help="probe/calibration image directory")
    sn.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    sn.add_argument("--images", type=int, default=8,
                    help="probe batch size (first N images of --data)")
    sn.add_argument("--top", type=int, default=5,
                    help="size of the suggested --keep-fp set")
    sn.add_argument("--json-out", default=None,
                    help="also write the ranked table as JSON")
    sn.add_argument("--calibration-cache", default=None,
                    help="JSON file for int8 activation scales (default: "
                         "<weights>.calib.json; reused when it exists)")
    _add_calib_method_flags(sn)
    sn.set_defaults(fn=cmd_sensitivity)

    vc = sub.add_parser("voc2coco",
                        help="VOC-layout dataset -> COCO layout "
                             "(img/ + annotations.json)")
    vc.add_argument("--config", default="256x320",
                    choices=["256x320", "512x640", "lite-256x320",
                             "lite-512x640"],
                    help="supplies the class-name list for category ids")
    vc.add_argument("--src", required=True, help="VOC root (img/ + xml/)")
    vc.add_argument("--dst", required=True, help="output COCO root")
    vc.set_defaults(fn=cmd_voc2coco)

    tx = sub.add_parser("txt2xml", help="custom txt labels -> VOC XML dataset")
    tx.add_argument("--src", required=True)
    tx.add_argument("--dst", required=True)
    tx.add_argument("--class-id-base", type=int, default=0)
    tx.set_defaults(fn=cmd_txt2xml)

    an = sub.add_parser("anchors",
                        help="k-means auto-anchors from a dataset's GT boxes")
    an.add_argument("--config", default="256x320",
                    choices=["256x320", "512x640", "lite-256x320",
                             "lite-512x640"],
                    help="supplies net-input size, strides and the preset "
                         "anchors to compare against")
    an.add_argument("--data", required=True, help="VOC or COCO dataset root")
    an.add_argument("--format", default="auto", choices=["auto", "voc", "coco"])
    an.add_argument("--num", type=int, default=None,
                    help="total anchor count (default: scales * "
                         "anchors-per-scale from the config)")
    an.add_argument("--seed", type=int, default=0)
    an.add_argument("--out", default=None,
                    help="write a full config JSON carrying the new anchors "
                         "(consumable via train/eval --config-json)")
    an.set_defaults(fn=cmd_anchors)
    return p


# Pure host-side converters never touch jax; keep them import-light.
_NO_JAX_COMMANDS = {"txt2xml", "voc2coco"}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command not in _NO_JAX_COMMANDS:
        from yolofastest_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
