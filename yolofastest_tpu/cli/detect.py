"""`detect` command (batch image detection, all backends, sliced mode).

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import os

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _load_weights,
    _calib_kwargs,
    _resolve_jax_int8_calibration,
    _resolve_int8_zoo,
    _native_int8_scales,
    _parse_keep_fp,
)


def cmd_detect(args) -> int:
    from yolofastest_tpu.utils.logging import config_logger

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    logger = config_logger(args.out, "detect_info.log")
    os.makedirs(args.out, exist_ok=True)

    zoo8 = _resolve_int8_zoo(args, "fp" if args.backend == "jax" else args.backend)
    if zoo8 == "error":
        return 2
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

        # with --int8-zoo the artifact supplies the (refined) folded tree;
        # folding --weights would be discarded work
        folded = None if zoo8 else fold_batchnorm(
            _load_weights(args.weights, getattr(args, "arch", None)))
        yfb = os.path.join(args.out, "model.yfb")
        if args.backend == "native-int8":
            # int8-arithmetic C++ engine: quantised weights + activation
            # scales from the shared calibration cache (calibrated on the
            # first target images on a cache miss — the same
            # static-quantisation recipe as the jax int8 backends)
            from yolofastest_tpu.quant import load_int8_zoo, mixed_native_tree

            keep_fp8 = ()
            if zoo8:
                folded, scales, keep_fp8 = load_int8_zoo(zoo8)
            else:
                scales = _native_int8_scales(args, cfg, folded, args.data)
                if scales is None:
                    return 2
            tree, nscales = mixed_native_tree(folded, scales, keep_fp8)
            save_native_weights(tree, yfb, act_scales=nscales,
                                io_config=cfg.io)
        else:
            save_native_weights(folded, yfb, io_config=cfg.io)
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
    if backend in ("int8", "int8-fused") and not zoo8:
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
                        keep_fp=keep_fp, int8_artifact=zoo8)
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


