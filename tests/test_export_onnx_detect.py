"""detect.onnx — the FULL detect pipeline in the portable format.

`model.onnx` (like the reference's exports) stops at head logits and
leaves decode/NMS to hand-written consumer code; `export_onnx_detect`
ships raw-frames-in → NMS-out as standard ONNX ops (Sigmoid/Exp decode,
class-aware NonMaxSuppression), so any ONNX runtime produces final
detections with zero framework code.

Parity is asserted at detection level (standard IOU vs the device NMS's
+1px convention, float boxes vs detect.py's integer rounding — documented
divergences), against the committed golden detections of the reference
pipeline, via the from-scratch numpy consumer `tools/onnx_check.py`.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import export_onnx_detect
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
sys.path.insert(0, os.path.join(REPO, "tools"))


def _consume(path, imgs):
    from onnx_check import load_model, run

    nodes, init, g_in, g_out = load_model(path)
    assert g_in == ["image"]
    assert g_out == ["boxes", "scores", "selected"]
    return run(nodes, init, {g_in[0]: imgs})


def _detections(env):
    """selected rows -> per-image [(x1, y1, x2, y2, cls, score), ...]."""
    out = {}
    for b, c, i in env["selected"]:
        xc, yc, w, h = env["boxes"][int(b), int(i)]
        out.setdefault(int(b), []).append(
            (xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2, int(c),
             float(env["scores"][int(b), int(c), int(i)])))
    return out


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(ua, 1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_detect_onnx_reproduces_golden_detections(tmp_path, res):
    """Every committed golden detection (reference pipeline output) is
    reproduced by the pure-numpy ONNX consumer: same class, IOU > 0.8,
    conf within 0.05 — and no more than one spurious extra per image."""
    cfg = get_config(res)
    folded = fold_batchnorm(load_variables(zoo_path(res)))
    p = str(tmp_path / "detect.onnx")
    export_onnx_detect(folded, cfg, p)

    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = fx["pre_imgs"].astype(np.float32)[:, None, :, :]
    env = _consume(p, imgs)
    dets = _detections(env)

    golden = fx["boxes"]  # [img_idx, x1, y1, x2, y2, conf, cls_score, cls]
    matched = 0
    for row in golden:
        b = int(row[0])
        hit = any(d[4] == int(row[7]) and abs(d[5] - row[5]) < 0.05
                  and _iou(d[:4], row[1:5]) > 0.8
                  for d in dets.get(b, []))
        matched += hit
    assert matched == len(golden), f"{matched}/{len(golden)} golden matched"
    n_det = sum(len(v) for v in dets.values())
    assert n_det <= len(golden) + imgs.shape[0]  # no detection spray


def test_lite_detect_onnx_single_head(tmp_path):
    cfg = get_config("lite-256x320")
    folded = fold_batchnorm(load_variables(zoo_path("lite_256x320")))
    p = str(tmp_path / "detect.onnx")
    export_onnx_detect(folded, cfg, p, arch="yolofastest-lite")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 1, 256, 320)).astype(np.float32)
    env = _consume(p, imgs)
    assert env["boxes"].shape == (2, 3 * 8 * 10, 4)
    assert env["scores"].shape == (2, cfg.io.num_cls, 3 * 8 * 10)
    assert env["selected"].ndim == 2 and env["selected"].shape[1] == 3


def test_detect_onnx_fresh_process_consumer(tmp_path):
    """The standalone checker consumes detect.onnx in a process that never
    imports the framework (same discipline as test_export_onnx)."""
    cfg = get_config("256x320")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    p = str(tmp_path / "detect.onnx")
    export_onnx_detect(folded, cfg, p)
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs_path = str(tmp_path / "imgs.npy")
    np.save(imgs_path, fx["pre_imgs"][:2].astype(np.float32)[:, None, :, :])
    out = str(tmp_path / "out.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "onnx_check.py"),
         p, imgs_path, out],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "ONNX_CONSUMED_OK" in r.stdout
    got = np.load(out)
    assert got["selected"].shape[1] == 3 and len(got["selected"]) >= 3


def test_detect_onnx_reimports_as_folded_graph(tmp_path):
    """The decode/NMS tail doesn't disturb the weighted-node order, so even
    detect.onnx lifts back into variables via import_onnx."""
    import jax

    from yolofastest_tpu.export import import_onnx
    from yolofastest_tpu.models import unfold_to_variables

    cfg = get_config("256x320")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    p = str(tmp_path / "detect.onnx")
    export_onnx_detect(folded, cfg, p)
    variables, arch, bn_preserved = import_onnx(p)
    assert arch == "yolofastest" and bn_preserved is False
    want = unfold_to_variables(
        jax.tree.map(lambda a: np.asarray(a, np.float32), folded))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(want)[0]):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
