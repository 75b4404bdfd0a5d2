"""Cross-validation of the COCO-summary evaluator against the canonical
pycocotools algorithm (round-3 verdict item 5).

pycocotools is not installable in this image, so the oracle is a vendored
faithful reimplementation of its evaluateImg/accumulate/summarize pipeline
(``tools/cocoeval_ref.py``), run offline by ``tools/make_cocoeval_fixture.py``
over a synthetic detection problem (TP jitter across the IOU grid, FPs,
empty images, a maxDet-truncation burst, all three size buckets).  Here the
REAL ``MAPEvaluator`` — in strict-COCO mode (standard IOU, 101-point AP) —
consumes the same problem through a stub eval_fn/loader and must reproduce
the canonical numbers to ~1e-9:

  * mAP@[.50:.95] + per-threshold means (area all, maxDet=64)
  * per-class AP column at IOU 0.5
  * AP/AR small / medium / large (ignore semantics)
  * AR at detection budgets {1, 10, 64} (incl. a case where the 10-budget
    actually truncates)
"""

import dataclasses
import os

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.eval import COCO_IOU_GRID, MAPEvaluator

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
FIXTURE = os.path.join(FIXTURES, "cocoeval_ref.npz")

BATCH = 4


class _StubLoader:
    """Yields (imgs, targets) batches for the synthetic problem."""

    def __init__(self, targets, input_hw):
        self.targets = targets
        self.input_hw = input_hw
        self.batch_size = BATCH

    def __iter__(self):
        n = len(self.targets)
        for i in range(0, n, BATCH):
            imgs = np.zeros((min(BATCH, n - i), *self.input_hw, 1), np.float32)
            yield imgs, self.targets[i:i + BATCH]


def _mean_not_neg1(x):
    v = x[x > -1]
    return float(v.mean()) if v.size else -1.0


def test_strict_coco_matches_canonical_cocoeval():
    fx = np.load(FIXTURE)
    cfg = get_config("256x320")
    assert cfg.io.input_hw == (256, 320)  # fixture geometry
    cfg = dataclasses.replace(
        cfg, io=dataclasses.replace(cfg.io, max_det=int(fx["max_dets"][-1])))

    det_boxes, det_conf = fx["det_boxes"], fx["det_conf"]
    det_cls, det_count = fx["det_cls"], fx["det_count"]
    batches = []
    for i in range(0, len(det_count), BATCH):
        sl = slice(i, i + BATCH)
        batches.append({"boxes": det_boxes[sl], "conf": det_conf[sl],
                        "cls_idx": det_cls[sl], "count": det_count[sl]})
    calls = iter(batches)

    def eval_fn(_variables, _imgs):
        return next(calls)

    ev = MAPEvaluator(cfg, _StubLoader(fx["targets"], cfg.io.input_hw),
                      eval_fn=eval_fn, iou_thresholds=COCO_IOU_GRID,
                      iou_convention="coco", ap_interpolation="coco101")
    ev(None, epoch=0)
    m = ev.last_metrics

    k_full = int(fx["max_dets"][-1])
    ap_all = fx[f"ap_all_{k_full}"]   # (T, C), -1 where class has no GT
    ar_all = {int(k): fx[f"ar_all_{int(k)}"] for k in fx["max_dets"]}

    # every class has GT in the fixture -> plain means are valid
    assert (ap_all > -1).all()
    np.testing.assert_allclose(m["mAP_grid"], ap_all.mean(), atol=1e-9)
    got_per_iou = np.array([m["mAP_per_iou"][float(t)] for t in fx["iou_thrs"]])
    np.testing.assert_allclose(got_per_iou, ap_all.mean(axis=1), atol=1e-9)
    # headline column: per-class AP at IOU 0.5
    np.testing.assert_allclose(m["per_class_ap"], ap_all[0], atol=1e-9)

    for area in ("small", "medium", "large"):
        np.testing.assert_allclose(
            m[f"AP_{area}"], _mean_not_neg1(fx[f"ap_{area}_{k_full}"]),
            atol=1e-9, err_msg=f"AP_{area}")
        np.testing.assert_allclose(
            m[f"AR_{area}"], _mean_not_neg1(fx[f"ar_{area}_{k_full}"]),
            atol=1e-9, err_msg=f"AR_{area}")

    for k, mat in ar_all.items():
        np.testing.assert_allclose(m["AR_maxdets"][k], _mean_not_neg1(mat),
                                   atol=1e-9, err_msg=f"AR@{k}")
    # the fixture's burst case must make the 10-budget really truncate
    assert m["AR_maxdets"][10] < m["AR_maxdets"][k_full]


def test_strict_coco_options_validated():
    cfg = get_config("256x320")
    with pytest.raises(ValueError, match="iou_convention"):
        MAPEvaluator(cfg, None, eval_fn=lambda *a: None,
                     iou_convention="bogus")
    with pytest.raises(ValueError, match="ap_interpolation"):
        MAPEvaluator(cfg, None, eval_fn=lambda *a: None,
                     ap_interpolation="bogus")
