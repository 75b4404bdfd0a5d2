"""`serve` (HTTP server) and `video` commands.

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import os

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _build_engine,
)


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


