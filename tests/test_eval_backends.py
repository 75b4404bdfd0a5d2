"""Deployment mAP: the SAME evaluator scoring the deployed pipelines.

``make_backend_eval_fn`` adapts a deployment engine (jax ``Detector`` or the
C++ ``NativeEngine``) into ``MAPEvaluator``'s eval_fn slot, so mAP /
detection-rate can be measured through every backend a user can actually
ship — something the reference cannot do at all (its ``validate.py``
evaluator is welded to the torch training model; the deployed ncnn/NPU
detectors are never scored against GT).

The GT here is the pseudo-GT set used by the committed training demos: the
reference detector's own golden detections (``tests/fixtures``) written as
VOC XML over the 20 bundled images.  A correct deployment backend must
re-detect its own pseudo-GT at mAP ~1.0.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.data import DetectionLoader, VOCIndex, write_voc_xml
from yolofastest_tpu.eval import MAPEvaluator, make_backend_eval_fn
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "cpp", "build", "libyf.so")
REF_DATA = "/root/reference/test_data"
CLASS_NAMES = ("carrier", "defender", "destroyer")


@pytest.fixture(scope="module")
def pseudo_gt_dir(tmp_path_factory):
    """20 bundled images + golden detections as VOC-XML pseudo-GT."""
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference test images not present")
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    names = [str(n) for n in fx["image_names"]]
    boxes = fx["boxes"]  # [img_idx, x1, y1, x2, y2, conf, cls_score, cls]
    root = tmp_path_factory.mktemp("pseudo_gt")
    img_dir, xml_dir = root / "img", root / "xml"
    img_dir.mkdir()
    xml_dir.mkdir()
    sh = sw = 512 / 256  # golden boxes are net-input coords; originals 512x640
    for idx, name in enumerate(names):
        rows = boxes[boxes[:, 0] == idx]
        if not len(rows):
            continue
        objs = [(CLASS_NAMES[int(r[7])],
                 r[1] * sw, r[2] * sh, r[3] * sw, r[4] * sh) for r in rows]
        shutil.copy(os.path.join(REF_DATA, name), img_dir / name)
        write_voc_xml(str(xml_dir / (os.path.splitext(name)[0] + ".xml")),
                      name, (512, 640), objs)
    return str(root)


def _loader(cfg, root):
    idx = VOCIndex(root, cfg.io.class_names)
    return DetectionLoader(idx, cfg, batch_size=4, augment=False,
                           shuffle=False, drop_last=False)


def _run(cfg, loader, eval_fn):
    evaluator = MAPEvaluator(cfg, loader, eval_fn=eval_fn)
    mAP = evaluator(None, epoch=0)
    return mAP, evaluator.last_metrics


def test_backend_eval_fn_adapter_contract():
    # duck-typed per-image engine: rows land in the right det-dict slots,
    # padding stays zero, count is per image
    class Stub:
        def detect(self, img, max_det=64):
            return [[1.0, 2.0, 3.0, 4.0, 0.9, 0.8, 2]]

    fn = make_backend_eval_fn(Stub(), max_det=8)
    det = fn(None, np.zeros((3, 16, 16, 1), np.float32))
    assert det["boxes"].shape == (3, 8, 4)
    assert det["count"].tolist() == [1, 1, 1]
    assert det["cls_idx"][0, 0] == 2 and det["conf"][1, 0] == np.float32(0.9)
    assert not det["conf"][:, 1:].any()
    with pytest.raises(TypeError):
        make_backend_eval_fn(object())


def test_native_deployment_map(pseudo_gt_dir):
    if not os.path.exists(LIB):
        built = subprocess.run([os.path.join(REPO, "cpp", "build.sh")],
                               capture_output=True)
        if built.returncode != 0 or not os.path.exists(LIB):
            pytest.skip("native library not built and build failed")
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.native import NativeEngine

    cfg = get_config("256x320")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    yfb = os.path.join(pseudo_gt_dir, "model.yfb")
    save_native_weights(folded, yfb)
    engine = NativeEngine(yfb, cfg)
    mAP, metrics = _run(cfg, _loader(cfg, pseudo_gt_dir),
                        make_backend_eval_fn(engine, max_det=cfg.io.max_det))
    # the deployed C++ engine must re-detect its own pseudo-GT essentially
    # perfectly (loader resize vs detect resize differ only in jpeg decode)
    assert mAP > 0.95, metrics
    assert metrics["detection_rate"] > 0.95, metrics


def test_jax_deployment_map(pseudo_gt_dir):
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.inference import Detector

    cfg = get_config("256x320")
    det = Detector(cfg, variables=load_variables(zoo_path("256x320")),
                   fold_bn=True, backend="fp")
    mAP, metrics = _run(cfg, _loader(cfg, pseudo_gt_dir),
                        make_backend_eval_fn(det, max_det=cfg.io.max_det))
    assert mAP > 0.95, metrics
    assert metrics["detection_rate"] > 0.95, metrics
