"""Horizontal-flip test-time augmentation (Detector(tta=True)).

Beyond-reference capability: the reference's detect front-ends run one
forward per image (``detect.py:141-192``).  TTA runs the batch and its
mirror as ONE doubled device batch, un-mirrors the flipped candidates and
merges both sets into a single NMS.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REF_PTH = "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth"


def test_merge_tta_mirror_math_and_sort_order():
    from yolofastest_tpu.inference.detector import _merge_tta

    w = 96.0
    # one image, normal pass has 2 candidates, flipped pass has 2
    boxes = jnp.asarray([
        [[10.0, 5.0, 20.0, 15.0], [30.0, 8.0, 40.0, 18.0]],   # normal
        [[60.0, 5.0, 70.0, 15.0], [0.0, 0.0, 0.0, 0.0]],      # flipped
    ])
    conf = jnp.asarray([[0.9, 0.5], [0.7, 0.1]])
    cls_score = jnp.asarray([[0.8, 0.6], [0.4, 0.2]])
    cls_idx = jnp.asarray([[0, 1], [2, 0]], dtype=jnp.int32)
    valid = jnp.asarray([[True, True], [True, False]])
    b, c, s, i, v = jax.tree.map(
        np.asarray, _merge_tta(boxes, conf, cls_score, cls_idx, valid, w))
    assert b.shape == (1, 4, 4)
    # conf-descending with the invalid row sorted last
    np.testing.assert_allclose(c[0], [0.9, 0.7, 0.5, 0.1])
    np.testing.assert_array_equal(v[0], [True, True, True, False])
    # the 0.7 candidate came from the flipped pass: x1' = w-x2, x2' = w-x1
    np.testing.assert_allclose(b[0, 1], [96.0 - 70.0, 5.0, 96.0 - 60.0, 15.0])
    np.testing.assert_array_equal(i[0], [0, 2, 1, 0])
    np.testing.assert_allclose(s[0], [0.8, 0.4, 0.6, 0.2])


def test_tta_is_flip_equivariant():
    """TTA(x) and TTA(flip(x)) see the SAME candidate pool (mirrored), so
    the final detections must be each other's mirrors.

    Needs the REAL checkpoint: an untrained net saturates conf to exactly
    1.0 everywhere, and greedy NMS under thousands of exact ties is
    legitimately order-dependent (the two TTA orderings break ties toward
    different twins) — equivariance only holds with distinct confidences.
    """
    if not os.path.exists(REF_PTH):
        pytest.skip("reference checkpoint not mounted")
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector, detections_to_lists

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    cfg = get_config("256x320")
    det = Detector(cfg, torch_checkpoint=REF_PTH, fold_bn=True, tta=True)
    x = (fx["pre_imgs"][:4].astype(np.float32)[..., None] - 128.0) / 255.0
    a = detections_to_lists(det.run(jnp.asarray(x)))
    bm = detections_to_lists(det.run(jnp.asarray(x[:, :, ::-1, :])))
    w = cfg.io.input_hw[1]

    def matches(da, db):
        # set comparison (row order may differ between the two runs):
        # identity is (class, conf, cls_score, mirrored box)
        mirrored = [w - db[2], db[1], w - db[0], db[3]]
        return (int(da[6]) == int(db[6])
                and np.allclose(da[4:6], db[4:6], rtol=1e-3)
                and np.allclose(da[:4], mirrored, atol=1.0))

    for ra, rb in zip(a, bm):
        assert len(ra) == len(rb) > 0
        for da in ra:
            assert any(matches(da, db) for db in rb), (da, rb)


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def test_tta_keeps_golden_recall():
    """TTA must not LOSE any golden detection.  It only adds candidates,
    but when the mirrored twin of a detection wins NMS the surviving box
    shifts a few pixels — so matching is detection-level (class + IOU>=0.5
    vs the golden box), the same criterion the quantised backends are held
    to, not the ±1px fp-parity criterion."""
    if not os.path.exists(REF_PTH):
        pytest.skip("reference checkpoint not mounted")
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector, detections_to_lists

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    det = Detector(get_config("256x320"), torch_checkpoint=REF_PTH,
                   fold_bn=True, tta=True)
    imgs = fx["pre_imgs"].astype(np.float32)[..., None]
    rows = detections_to_lists(det.run(jnp.asarray((imgs - 128.0) / 255.0)))
    golden = fx["boxes"]
    found = 0
    for g in golden:
        b = int(g[0])
        found += any(
            int(r[6]) == int(g[7]) and _iou(r[:4], g[1:5]) >= 0.5
            for r in rows[b]
        )
    assert found == len(golden)
