"""COCO-style mAP@[.50:.95] (MAPEvaluator ``iou_thresholds``).

Beyond-reference: ``validate.py`` scores one IOU threshold; the evaluator
here sweeps a grid in ONE pass over the val set (one IOU matrix per image,
greedy matching vectorised across thresholds, each threshold with its own
used-GT mask).  Headline metrics (per-class AP lines, returned mAP,
detection rate) stay the reference's mAP@``iou_val_thre``.

Tests: a hand-computed two-threshold case (including the subtle
per-threshold mask independence: a GT claimed by detection A at 0.5 is still
claimable by detection B at 0.75 where A missed), grid == per-threshold
single runs (vectorisation correctness), and the COCO grid surface.
"""

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.eval import COCO_IOU_GRID, MAPEvaluator


def _make_inputs(gt_rows, det_boxes, det_conf, det_cls, cfg):
    """One-image loader + injected eval_fn from explicit GT/detections.

    gt_rows: [(x1, y1, x2, y2, cls), ...] in input-resolution pixels.
    det_*:   parallel detection lists (conf-descending, as NMS emits).
    """
    h, w = cfg.io.input_hw
    imgs = np.zeros((1, h, w, 1), np.float32)
    targets = np.zeros((1, cfg.train.max_boxes, 6), np.float32)
    for i, (x1, y1, x2, y2, c) in enumerate(gt_rows):
        targets[0, i] = [(x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                         (x2 - x1) / w, (y2 - y1) / h, c, 255.0]
    n = len(det_boxes)
    pad = max(n, 1)
    det = {
        "boxes": np.zeros((1, pad, 4), np.float32),
        "conf": np.zeros((1, pad), np.float32),
        "cls_idx": np.zeros((1, pad), np.int32),
        "count": np.array([n], np.int32),
    }
    det["boxes"][0, :n] = det_boxes
    det["conf"][0, :n] = det_conf
    det["cls_idx"][0, :n] = det_cls
    return [(imgs, targets)], (lambda variables, _imgs: det)


def test_two_threshold_hand_case():
    """GT (0,0,100,100); det A conf .9 IOU 71/101≈.703, det B conf .8 IOU 1.

    t=0.50: A (higher conf, greedy-first) claims the GT -> TP; B FP.  AP 1.0
            (the TP outranks the FP in the PR sweep).
    t=0.75: A misses (0.703 < 0.75) but must NOT block B — per-threshold
            used-masks are independent -> B TP behind A's FP.  AP 0.5.
    """
    cfg = get_config("256x320")
    loader, eval_fn = _make_inputs(
        gt_rows=[(0, 0, 100, 100, 0)],
        det_boxes=[(0, 0, 100, 70), (0, 0, 100, 100)],
        det_conf=[0.9, 0.8],
        det_cls=[0, 0],
        cfg=cfg,
    )
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn,
                      iou_thresholds=(0.5, 0.75))
    mAP = ev(None)
    n_cls = cfg.io.num_cls
    assert abs(mAP - 1.0 / n_cls) < 1e-12          # headline = mean @0.5
    m = ev.last_metrics
    assert abs(m["mAP_per_iou"][0.5] - 1.0 / n_cls) < 1e-12
    assert abs(m["mAP_per_iou"][0.75] - 0.5 / n_cls) < 1e-12
    assert abs(m["mAP_grid"] - 0.75 / n_cls) < 1e-12
    assert m["detection_rate"] == 1.0               # at ts[0]
    assert m["per_class_ap"][0] == 1.0 and m["per_class_ap"][1:] == [0.0, 0.0]


def test_grid_matches_single_threshold_runs():
    """Vectorised multi-threshold matching == N independent single-threshold
    evaluations, on a randomized multi-image, multi-class scene."""
    cfg = get_config("256x320")
    rng = np.random.default_rng(3)
    h, w = cfg.io.input_hw
    n_img, n_gt, n_det = 4, 6, 12
    imgs = np.zeros((n_img, h, w, 1), np.float32)
    targets = np.zeros((n_img, cfg.train.max_boxes, 6), np.float32)
    dets = {
        "boxes": np.zeros((n_img, n_det, 4), np.float32),
        "conf": rng.uniform(0.05, 1.0, (n_img, n_det)).astype(np.float32),
        "cls_idx": rng.integers(0, cfg.io.num_cls,
                                (n_img, n_det)).astype(np.int32),
        "count": np.full((n_img,), n_det, np.int32),
    }
    dets["conf"][:] = -np.sort(-dets["conf"], axis=1)  # NMS emits conf-desc
    for b in range(n_img):
        for i in range(n_gt):
            x1, y1 = rng.uniform(0, w - 80), rng.uniform(0, h - 80)
            bw, bh = rng.uniform(20, 80), rng.uniform(20, 80)
            targets[b, i] = [(x1 + bw / 2) / w, (y1 + bh / 2) / h,
                             bw / w, bh / h,
                             rng.integers(0, cfg.io.num_cls), 255.0]
            # detections: jittered copies of GTs (overlapping, ambiguous)
        gx1 = (targets[b, :n_gt, 0] - targets[b, :n_gt, 2] / 2) * w
        gy1 = (targets[b, :n_gt, 1] - targets[b, :n_gt, 3] / 2) * h
        for i in range(n_det):
            g = rng.integers(0, n_gt)
            jit = rng.uniform(-15, 15, 4)
            bw, bh = targets[b, g, 2] * w, targets[b, g, 3] * h
            dets["boxes"][b, i] = [gx1[g] + jit[0], gy1[g] + jit[1],
                                   gx1[g] + bw + jit[2], gy1[g] + bh + jit[3]]

    loader = [(imgs, targets)]
    eval_fn = lambda variables, _imgs: dets  # noqa: E731
    grid = (0.5, 0.6, 0.75, 0.9)
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn, iou_thresholds=grid)
    ev(None)
    per_iou = ev.last_metrics["mAP_per_iou"]
    for t in grid:
        single = MAPEvaluator(cfg, loader, eval_fn=eval_fn,
                              iou_thresholds=(t,))
        m_t = single(None)
        assert abs(per_iou[t] - m_t) < 1e-12, (t, per_iou[t], m_t)
    # default run (config iou_val_thre=0.5) == grid headline
    default = MAPEvaluator(cfg, loader, eval_fn=eval_fn)
    assert abs(default(None) - per_iou[0.5]) < 1e-12
    assert "mAP_grid" not in default.last_metrics  # single-threshold: no grid


def test_coco_grid_surface():
    cfg = get_config("256x320")
    assert COCO_IOU_GRID == (0.5, 0.55, 0.6, 0.65, 0.7,
                             0.75, 0.8, 0.85, 0.9, 0.95)
    loader, eval_fn = _make_inputs(
        gt_rows=[(10, 10, 90, 90, 1)],
        det_boxes=[(10, 10, 90, 90)],
        det_conf=[0.7],
        det_cls=[1],
        cfg=cfg,
    )
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn,
                      iou_thresholds=COCO_IOU_GRID)
    mAP = ev(None)
    m = ev.last_metrics
    assert len(m["mAP_per_iou"]) == 10
    # perfect detection: AP 1.0 at every threshold for class 1
    assert abs(m["mAP_grid"] - 1.0 / cfg.io.num_cls) < 1e-12
    assert abs(mAP - 1.0 / cfg.io.num_cls) < 1e-12


def test_size_range_ap_ar_hand_case():
    """Small + large GT, one exact det each: per-size AP/AR = 1.0, the empty
    medium range reports -1 (pycocotools' sentinel), and AR@1 sees only the
    top-1 det per class (half the GT)."""
    cfg = get_config("256x320")
    loader, eval_fn = _make_inputs(
        gt_rows=[(0, 0, 20, 20, 0),      # area 400  -> small (<32^2)
                 (0, 0, 120, 120, 0)],   # area 14400 -> large (>96^2)
        det_boxes=[(0, 0, 20, 20), (0, 0, 120, 120)],
        det_conf=[0.9, 0.8],
        det_cls=[0, 0],
        cfg=cfg,
    )
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn, iou_thresholds=(0.5, 0.75))
    ev(None)
    m = ev.last_metrics
    assert m["AP_small"] == 1.0 and m["AP_large"] == 1.0
    assert m["AP_medium"] == -1.0 and m["AR_medium"] == -1.0
    assert m["AR_small"] == 1.0 and m["AR_large"] == 1.0
    # det pad width is 2 here -> budgets (1, 2, 10)
    assert m["AR_maxdets"] == {1: 0.5, 2: 1.0, 10: 1.0}


def test_out_of_range_unmatched_det_is_ignored_not_fp():
    """cocoeval ignore semantics: an unmatched detection whose box lies
    outside the size range is ignored there — AP_small stays 1.0 while the
    all-range headline AP eats the FP (0.5)."""
    cfg = get_config("256x320")
    loader, eval_fn = _make_inputs(
        gt_rows=[(0, 0, 20, 20, 0)],                       # small GT
        det_boxes=[(100, 100, 300, 300), (0, 0, 20, 20)],  # spurious large FP first
        det_conf=[0.95, 0.5],
        det_cls=[0, 0],
        cfg=cfg,
    )
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn, iou_thresholds=(0.5, 0.75))
    ev(None)
    m = ev.last_metrics
    assert m["per_class_ap"][0] == 0.5           # headline: FP outranks TP
    assert m["AP_small"] == 1.0                  # FP out of range -> ignored
    assert m["AP_large"] == -1.0                 # no GT in range at all
    assert m["AR_maxdets"] == {1: 0.0, 2: 1.0, 10: 1.0}


def test_match_prefers_non_ignored_gt():
    """A det overlapping an in-range GT (IOU .687) and an ignored
    out-of-range GT (IOU .729, higher) must take the in-range one —
    cocoeval scans non-ignored GT first."""
    cfg = get_config("256x320")
    loader, eval_fn = _make_inputs(
        gt_rows=[(0, 0, 28, 28, 0),    # area 784  -> small
                 (0, 0, 40, 40, 0)],   # area 1600 -> medium (ignored in small)
        det_boxes=[(0, 0, 34, 34)],    # +1px IOU: .687 vs small, .729 vs medium
        det_conf=[0.9],
        det_cls=[0],
        cfg=cfg,
    )
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn, iou_thresholds=(0.5, 0.75))
    ev(None)
    m = ev.last_metrics
    # t=.5: TP on the small GT (prefer non-ignored). t=.75: unmatched, det
    # area 1156 is out of the small range -> ignored, so no FP either; AP
    # at .75 is 0 with 1 GT -> mean (1.0 + 0.0)/2.
    assert abs(m["AP_small"] - 0.5) < 1e-12
    assert abs(m["AR_small"] - 0.5) < 1e-12


def test_single_threshold_mode_has_no_coco_extras():
    cfg = get_config("256x320")
    loader, eval_fn = _make_inputs(
        gt_rows=[(0, 0, 20, 20, 0)],
        det_boxes=[(0, 0, 20, 20)], det_conf=[0.9], det_cls=[0], cfg=cfg)
    ev = MAPEvaluator(cfg, loader, eval_fn=eval_fn)
    ev(None)
    assert "AP_small" not in ev.last_metrics
    assert "AR_maxdets" not in ev.last_metrics


@pytest.mark.slow
def test_eval_max_det_override(tmp_path):
    """`eval --max-det 100` raises the AR budget to COCO's standard cap
    (config preset is 64).  The baseline run (no flag) must report the
    config's {1, 10, 64} budgets — which also proves the scene produced
    detections (zero detections would fall back to the hardcoded
    {1, 10, 100} set and make the override assertion vacuous)."""
    import json
    import os

    import cv2

    from yolofastest_tpu.cli import main
    from yolofastest_tpu.data import write_voc_xml
    from yolofastest_tpu.models import zoo_path

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    cfg = get_config("256x320")
    root = tmp_path / "val"
    (root / "img").mkdir(parents=True)
    (root / "xml").mkdir()
    h0, w0, _ = cfg.io.origin_img_shape
    img = np.full((h0, w0, 3), 30, np.uint8)
    img[50:120, 80:220] = 170
    cv2.imwrite(str(root / "img" / "a.jpg"), img)
    write_voc_xml(str(root / "xml" / "a.xml"), "a.jpg", (h0, w0),
                  [(cfg.io.class_names[0], 80, 50, 220, 120)])
    j = str(tmp_path / "m.json")
    rc = main(["eval", "--config", "256x320", "--weights", zoo_path("256x320"),
               "--val-dir", str(root), "--coco-map",
               "--json-out", j, "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    base = json.load(open(j))
    assert set(base["AR_maxdets"]) == {"1", "10", "64"}  # non-vacuous
    rc = main(["eval", "--config", "256x320", "--weights", zoo_path("256x320"),
               "--val-dir", str(root), "--coco-map", "--max-det", "100",
               "--json-out", j, "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    m = json.load(open(j))
    assert set(m["AR_maxdets"]) == {"1", "10", "100"}
