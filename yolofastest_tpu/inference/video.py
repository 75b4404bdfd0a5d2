"""Video detection: file in -> annotated video out, batches overlapped.

The embedded use case the reference's repo targets (an RK3399Pro camera
board) but never ships code for — its three front-ends all detect still
images one at a time (``detect.py:141-192``, ``ncnn_deploy/main.cpp``,
``rknn_deploy.py:159-255``).  Here a video file streams through the SAME
deployment engines the rest of the framework uses (duck-typed exactly like
:func:`yolofastest_tpu.eval.make_backend_eval_fn`):

* a jax :class:`~yolofastest_tpu.inference.Detector` (fp / int8 /
  int8-fused) via its packed single-transfer path, with ``depth`` batches
  kept in flight so H2D + compute + D2H overlap — jax dispatch is async,
  the result array is only materialised ``depth`` batches later;
* the C++ :class:`~yolofastest_tpu.native.NativeEngine` (fp32 / int8-VNNI),
  synchronous per frame.

Output is an annotated video at the source fps plus per-batch timing in the
reference's log format; the summary records the realtime factor (effective
fps / source fps).
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Any, Dict, Iterator, List, Tuple

import numpy as np

from yolofastest_tpu.configs import Config
from yolofastest_tpu.utils.visualize import CLASS_COLORS, plot_one_box

# codec by container: mp4v for .mp4, MJPG for everything else (both verified
# present in the opencv build; MJPG is intra-only so single-frame artifacts
# stay inspectable)
_FOURCC = {".mp4": "mp4v", ".m4v": "mp4v"}


def iter_frame_batches(cap, io, batch_size: int
                       ) -> Iterator[Tuple[np.ndarray, List[np.ndarray], int]]:
    """Yield ``(net_batch (B,H,W,C) float32, originals, n_valid)`` from an
    opened ``cv2.VideoCapture``; the tail batch is zero-padded to the fixed
    ``batch_size`` (one compiled shape)."""
    from yolofastest_tpu.inference.detector import image_to_net_input

    eof = False
    while not eof:
        originals: List[np.ndarray] = []
        nets: List[np.ndarray] = []
        while len(originals) < batch_size:
            ok, frame = cap.read()
            if not ok:
                eof = True
                break
            originals.append(frame)
            nets.append(image_to_net_input(frame, io))
        if not originals:
            return
        n_valid = len(originals)
        while len(nets) < batch_size:
            nets.append(np.zeros_like(nets[0]))
        yield np.stack(nets), originals, n_valid


# per-ID colors: distinct-ish BGR from a low-discrepancy walk over hue-like
# channel mixes (deterministic, no palette table to run out of)
def _track_color(tid: int) -> list:
    return [32 + (tid * 67) % 224, 32 + (tid * 97) % 224,
            32 + (tid * 131) % 224]


def _draw_tracked(frame: np.ndarray, tracked, io) -> int:
    """Annotate one original frame with stable-ID track boxes in place."""
    sh = frame.shape[0] / io.input_hw[0]
    sw = frame.shape[1] / io.input_hw[1]
    for tb in tracked:
        x1, y1, x2, y2 = tb.box
        plot_one_box([round(x1 * sw), round(y1 * sh),
                      round(x2 * sw), round(y2 * sh)], frame,
                     color=_track_color(tb.tid),
                     label="#%d %s %.2f" % (tb.tid, io.class_names[tb.cls],
                                            tb.score),
                     line_thickness=3)
    return len(tracked)


def _draw(frame: np.ndarray, det: Dict[str, np.ndarray], b: int, io) -> int:
    """Annotate one original frame in place; returns the detection count."""
    sh = frame.shape[0] / io.input_hw[0]
    sw = frame.shape[1] / io.input_hw[1]
    n = int(det["count"][b])
    for i in range(n):
        x1, y1, x2, y2 = det["boxes"][b, i]
        cls = int(det["cls_idx"][b, i])
        score = float(det["conf"][b, i]) * float(det["cls_score"][b, i])
        plot_one_box([round(x1 * sw), round(y1 * sh),
                      round(x2 * sw), round(y2 * sh)], frame,
                     color=CLASS_COLORS[cls % len(CLASS_COLORS)],
                     label="%s %.2f" % (io.class_names[cls], score),
                     line_thickness=3)
    return n


def detect_video(engine, config: Config, src: str, out_path: str,
                 batch_size: int = 8, depth: int = 2, tracker=None,
                 logger=None) -> Dict[str, Any]:
    """Run a deployment engine over a video file; write the annotated video.

    Args:
      engine: ``Detector`` (any jax backend; overlapped via ``depth``) or
        ``NativeEngine`` (per frame).
      src: input video path, stream URL (RTSP/HTTP), or an integer camera
        index as int or digit-string ("0" = first camera) — anything
        cv2.VideoCapture opens.
      out_path: annotated output video path (codec from the extension).
      batch_size: frames per device dispatch (jax engines).
      depth: in-flight batches before the first fetch (jax engines; 1 =
        synchronous, same semantics as ``StreamingDetector``).
      tracker: optional :class:`~yolofastest_tpu.inference.IoUTracker`;
        when given, frames are annotated with stable track IDs instead of
        raw detections (frames are always fetched/consumed in stream order
        — the in-flight deque is FIFO — so the tracker sees a sequential
        stream even at ``depth > 1``).

    Returns a stats dict: frames, avg_ms (per frame, steady-state wall
    clock), fps (effective), src_fps, realtime_x (fps / src_fps), and —
    with a tracker — tracks (distinct IDs ever created).
    """
    import cv2

    io = config.io
    if isinstance(src, str) and src.isdigit():
        src = int(src)  # camera index, e.g. CLI --video 0
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        cap.release()
        raise FileNotFoundError(f"cannot open video source {src!r}")
    is_jax = hasattr(engine, "run_packed")
    if not is_jax and not hasattr(engine, "detect"):
        cap.release()
        raise TypeError(f"cannot drive {type(engine).__name__} over video")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fourcc = _FOURCC.get(os.path.splitext(out_path)[1].lower(), "MJPG")
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*fourcc),
                             src_fps, (w, h))
    if not writer.isOpened():
        cap.release()
        raise RuntimeError(f"cannot open video writer for {out_path!r} "
                           f"(codec {fourcc})")

    frames_done = 0
    det_total = 0
    t0 = None  # set after the first dispatch so jit compile isn't timed

    def emit(frame: np.ndarray, det: Dict[str, np.ndarray], b: int) -> int:
        """Annotate + write one frame; raw detections or tracked IDs."""
        if tracker is None:
            n = _draw(frame, det, b, io)
        else:
            k = int(det["count"][b])
            score = det["conf"][b, :k] * det["cls_score"][b, :k]
            tracked = tracker.update(det["boxes"][b, :k],
                                     det["cls_idx"][b, :k], score)
            n = _draw_tracked(frame, tracked, io)
        writer.write(frame)
        return n
    try:
        if is_jax:
            from yolofastest_tpu.ops import unpack_detections

            def finish(item):
                nonlocal frames_done, det_total
                packed, originals, n_valid = item
                det = unpack_detections(np.asarray(packed))
                for b, frame in enumerate(originals[:n_valid]):
                    det_total += emit(frame, det, b)
                frames_done += n_valid
                if logger is not None:
                    logger.info("video batch done -> frames:%d" % frames_done)

            inflight: deque = deque()
            for nets, originals, n_valid in iter_frame_batches(
                    cap, io, batch_size):
                inflight.append(
                    (engine.run_packed(nets), originals, n_valid))
                if t0 is None:  # first dispatch issued: timing starts here
                    t0 = time.time()
                if len(inflight) >= depth:
                    finish(inflight.popleft())
            while inflight:
                finish(inflight.popleft())
        else:
            for nets, originals, n_valid in iter_frame_batches(
                    cap, io, batch_size):
                if t0 is None:
                    t0 = time.time()
                for b, frame in enumerate(originals[:n_valid]):
                    img = nets[b, ..., 0] if nets.shape[-1] == 1 else nets[b]
                    rows = engine.detect(img, max_det=io.max_det)
                    det = {  # one-frame det dict in the standard layout
                        "boxes": np.asarray([r[0:4] for r in rows],
                                            np.float32).reshape(1, -1, 4),
                        "conf": np.asarray([[r[4] for r in rows]], np.float32),
                        "cls_score": np.asarray([[r[5] for r in rows]],
                                                np.float32),
                        "cls_idx": np.asarray([[int(r[6]) for r in rows]],
                                              np.int32),
                        "count": np.asarray([len(rows)], np.int32)}
                    det_total += emit(frame, det, 0)
                frames_done += n_valid
                if logger is not None:
                    logger.info("video batch done -> frames:%d" % frames_done)
        elapsed = (time.time() - t0) if t0 is not None else 0.0
    finally:
        cap.release()
        writer.release()

    avg_ms = elapsed * 1e3 / frames_done if frames_done else 0.0
    fps = frames_done / elapsed if elapsed > 0 else 0.0
    stats = {"frames": frames_done, "detections": det_total,
             "avg_ms": avg_ms, "fps": fps, "src_fps": float(src_fps),
             "realtime_x": fps / src_fps if src_fps else 0.0,
             "out": out_path}
    if tracker is not None:
        stats["tracks"] = tracker.total_tracks
    if logger is not None:
        logger.info(
            "video done -> frames:%d detections:%d avg_time:%.2fms "
            "fps:%.1f (source %.1f fps, %.1fx realtime)" %
            (stats["frames"], det_total, avg_ms, fps, src_fps,
             stats["realtime_x"]))
    return stats
