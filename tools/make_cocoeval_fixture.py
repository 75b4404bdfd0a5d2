"""Generate the pycocotools cross-validation fixture for
``tests/test_map_cocoeval.py`` (round-3 verdict item 5).

Builds a synthetic detection problem (12 images, 3 classes, GT spanning the
small/medium/large COCO area buckets, jittered true positives + false
positives + empty images), runs the vendored canonical evaluator
(``tools/cocoeval_ref.py``) over it, and stores BOTH the problem and the
canonical AP/AR tensors in ``tests/fixtures/cocoeval_ref.npz``.

The numbers are deliberately produced with the same float32 rounding the
MAPEvaluator sees (targets/boxes/scores stored float32, GT xyxy rebuilt
from the float32 normalized targets with the evaluator's exact formula), so
the test can assert equality at ~1e-9 rather than a sloppy tolerance.

Regenerate with: python tools/make_cocoeval_fixture.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.cocoeval_ref import CocoEvalRef

H, W = 256, 320
NUM_CLS = 3
N_IMG = 12
MAX_BOXES = 64
MAX_DET = 64
IOU_THRS = [round(0.5 + 0.05 * i, 2) for i in range(10)]
MAX_DETS = (1, 10, MAX_DET)


def make_problem(seed=20260820):
    rng = np.random.default_rng(seed)
    targets = np.zeros((N_IMG, MAX_BOXES, 6), np.float32)
    det_boxes = np.zeros((N_IMG, MAX_DET, 4), np.float32)
    det_conf = np.zeros((N_IMG, MAX_DET), np.float32)
    det_cls = np.zeros((N_IMG, MAX_DET), np.int32)
    det_count = np.zeros((N_IMG,), np.int32)

    for b in range(N_IMG):
        dets = []
        if b == 10:   # image with no GT but false positives
            n_gt = 0
        else:
            n_gt = int(rng.integers(1, 7))
        boxes = []
        for _ in range(n_gt):
            bucket = rng.integers(0, 3)
            if bucket == 0:          # small (< 32^2)
                bw, bh = rng.uniform(8, 28, 2)
            elif bucket == 1:        # medium
                bw, bh = rng.uniform(36, 90, 2)
            else:                    # large (> 96^2)
                bw = rng.uniform(100, 200)
                bh = rng.uniform(100, min(200, H - 10))
            x1 = rng.uniform(0, W - bw - 1)
            y1 = rng.uniform(0, H - bh - 1)
            cls = int(rng.integers(0, NUM_CLS))
            boxes.append((x1, y1, x1 + bw, y1 + bh, cls))
        # normalized (xc, yc, w, h) float32 targets — the loader format
        for i, (x1, y1, x2, y2, cls) in enumerate(boxes):
            targets[b, i] = [(x1 + x2) / 2 / W, (y1 + y2) / 2 / H,
                             (x2 - x1) / W, (y2 - y1) / H, cls, 255.0]
        # detections: jittered TPs at assorted IOUs + FPs
        for (x1, y1, x2, y2, cls) in boxes:
            if rng.uniform() < 0.85:
                bw, bh = x2 - x1, y2 - y1
                s = rng.uniform(0.02, 0.45)  # jitter scale -> IOU spread
                jx, jy = rng.normal(0, s * bw), rng.normal(0, s * bh)
                jw, jh = rng.uniform(1 - s, 1 + s, 2)
                nx1 = x1 + jx
                ny1 = y1 + jy
                nx2 = nx1 + bw * jw
                ny2 = ny1 + bh * jh
                c = cls if rng.uniform() < 0.9 else int(rng.integers(0, NUM_CLS))
                dets.append((nx1, ny1, nx2, ny2, rng.uniform(0.05, 1.0), c))
            if rng.uniform() < 0.3:   # duplicate det on the same GT
                dets.append((x1 + rng.normal(0, 3), y1 + rng.normal(0, 3),
                             x2 + rng.normal(0, 3), y2 + rng.normal(0, 3),
                             rng.uniform(0.05, 1.0), cls))
        if b == 11 and boxes:  # exercises maxDet=10 truncation: 12 higher-
            # score FPs push a low-score TP below the top-10 cut
            x1, y1, x2, y2, cls = boxes[0]
            dets.append((x1 + 2, y1 + 2, x2 - 2, y2 - 2, 0.04, cls))  # TP
            for _ in range(12):
                fx = rng.uniform(0, W - 40)
                fy = rng.uniform(0, H - 40)
                dets.append((fx, fy, fx + rng.uniform(12, 35),
                             fy + rng.uniform(12, 35),
                             rng.uniform(0.5, 1.0), cls))
        for _ in range(int(rng.integers(0, 4))):  # pure false positives
            bw, bh = rng.uniform(10, 120, 2)
            x1 = rng.uniform(0, W - bw - 1)
            y1 = rng.uniform(0, H - bh - 1)
            dets.append((x1, y1, x1 + bw, y1 + bh, rng.uniform(0.05, 1.0),
                         int(rng.integers(0, NUM_CLS))))
        dets.sort(key=lambda d: -d[4])  # NMS output order: conf descending
        for i, (x1, y1, x2, y2, sc, c) in enumerate(dets[:MAX_DET]):
            det_boxes[b, i] = [x1, y1, x2, y2]
            det_conf[b, i] = sc
            det_cls[b, i] = c
        det_count[b] = min(len(dets), MAX_DET)
    return targets, det_boxes, det_conf, det_cls, det_count


def rebuilt_gt_xyxy(targets_b: np.ndarray) -> np.ndarray:
    """EXACTLY the MAPEvaluator reconstruction (float32 in, float32 ops)."""
    gt = targets_b[targets_b[:, 5] > 1]
    if not len(gt):
        return np.zeros((0, 4), np.float32)
    return np.stack([(gt[:, 0] - gt[:, 2] / 2) * W,
                     (gt[:, 1] - gt[:, 3] / 2) * H,
                     (gt[:, 0] + gt[:, 2] / 2) * W,
                     (gt[:, 1] + gt[:, 3] / 2) * H], axis=1)


def main():
    targets, det_boxes, det_conf, det_cls, det_count = make_problem()

    gt = {}
    dt = {}
    for b in range(N_IMG):
        boxes = rebuilt_gt_xyxy(targets[b])
        cls = targets[b][targets[b][:, 5] > 1][:, 4].astype(int)
        gt[b] = [{"bbox": boxes[i], "cat": int(cls[i])} for i in range(len(boxes))]
        dt[b] = [{"bbox": det_boxes[b, i].astype(np.float64),
                  "cat": int(det_cls[b, i]),
                  "score": np.float64(det_conf[b, i])}
                 for i in range(det_count[b])]

    ev = CocoEvalRef(gt, dt, NUM_CLS, iou_thrs=IOU_THRS, max_dets=MAX_DETS)
    res = ev.run()

    out = {
        "targets": targets, "det_boxes": det_boxes, "det_conf": det_conf,
        "det_cls": det_cls, "det_count": det_count,
        "iou_thrs": np.asarray(IOU_THRS),
        "max_dets": np.asarray(MAX_DETS),
    }
    for area in ("all", "small", "medium", "large"):
        for k in MAX_DETS:
            out[f"ap_{area}_{k}"] = res["ap"][area][k]
            out[f"ar_{area}_{k}"] = res["ar"][area][k]
    path = os.path.join(REPO, "tests", "fixtures", "cocoeval_ref.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)
    m = CocoEvalRef.mean
    print("canonical AP@[.50:.95] (all, maxDet=%d): %.6f"
          % (MAX_DET, m(res["ap"]["all"][MAX_DET])))
    for area in ("small", "medium", "large"):
        print("  AP_%s: %.6f  AR_%s: %.6f" % (
            area, m(res["ap"][area][MAX_DET]), area, m(res["ar"][area][MAX_DET])))
    for k in MAX_DETS:
        print("  AR@%d: %.6f" % (k, m(res["ar"]["all"][k])))


if __name__ == "__main__":
    main()
