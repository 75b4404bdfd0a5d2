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


@pytest.mark.slow
def test_lite512_zoo_through_native_engine(tmp_path):
    """The lite-512x640 checkpoint rides the full deployment chain: folded
    export -> .yfb -> C++ engine -> deployment mAP 1.0 / full detection
    rate on the pseudo-GT set it was fine-tuned on."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(repo, "cpp", "build", "libyf.so")):
        pytest.skip("native library not built")
    lite_weights = zoo_path("lite_512x640")
    if not os.path.exists(lite_weights):
        pytest.skip("lite-512 zoo weights not present")

    # rebuild the pseudo-GT val set (20 originals + golden boxes as GT)
    ft = tmp_path / "ft"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_finetune_set.py"),
         "--res", "512x640", "--out", str(ft), "--copies", "1"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    from yolofastest_tpu.data import DetectionLoader, VOCIndex
    from yolofastest_tpu.eval import MAPEvaluator, make_backend_eval_fn
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.native import NativeEngine

    cfg = get_config("lite-512x640")
    folded = fold_batchnorm(load_variables(lite_weights))
    yfb = str(tmp_path / "m.yfb")
    save_native_weights(folded, yfb)
    engine = NativeEngine(yfb, cfg)
    idx = VOCIndex(str(ft / "val"), cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, augment=False, shuffle=False,
                             drop_last=False)
    ev = MAPEvaluator(cfg, loader,
                      eval_fn=make_backend_eval_fn(engine,
                                                   max_det=cfg.io.max_det))
    mAP = ev(None)
    assert mAP >= 0.95, mAP
    assert ev.last_metrics["detection_rate"] >= 0.95
