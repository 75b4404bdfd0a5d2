"""Trained YoloFastest-lite zoo checkpoints: golden-recall locks.

The reference defines YoloFastest_lite but never ships trained weights for
it; ours (``weights/yolofastest_lite_{256x320,512x640}.npz`` — the zoo
covers the full {fastest, lite} x {256x320, 512x640} matrix) were
fine-tuned on the bundled test set with the reference detector's golden
detections as pseudo-GT, after grafting the converted full-model
backbone+head_5 (the lite parameter tree is a strict subset of the full
one) — see docs/train_demo_lite/ and docs/train_demo_lite512/.  These
tests lock the committed artifacts: the lite pipeline must recover >=90%
of the golden detections at IOU>0.5 with the same class.
"""

import os

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.inference import Detector
from yolofastest_tpu.models import load_variables, zoo_path

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_lite_zoo_recovers_golden_detections(res):
    lite_weights = zoo_path(f"lite_{res}")
    if not os.path.exists(lite_weights):
        pytest.skip("lite zoo weights not present")
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))

    cfg = get_config(f"lite-{res}")
    det_obj = Detector(cfg, variables=load_variables(lite_weights), arch="lite")
    import jax

    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    det = jax.tree.map(np.asarray, det_obj.run(imgs))

    golden = fx["boxes"]
    matched = 0
    for row in golden:
        b = int(row[0])
        for i in range(int(det["count"][b])):
            if (int(det["cls_idx"][b, i]) == int(row[7])
                    and _iou(det["boxes"][b, i], row[1:5]) > 0.5):
                matched += 1
                break
    recall = matched / len(golden)
    assert recall >= 0.9, f"lite recovered only {recall:.2%} of golden boxes"
