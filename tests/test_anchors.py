"""Auto-anchor (IoU k-means) tests: cluster recovery, fit metric, grouping,
and the CLI round trip into a train/eval-consumable config JSON.

The reference hand-picks its anchor groups (``_config.py:5-9``) with no
derivation tool; ``yolofastest_tpu/data/anchors.py`` is the beyond-reference
equivalent of YOLO auto-anchor.
"""

import json
import os

import numpy as np
import pytest

from yolofastest_tpu.configs import Config, get_config
from yolofastest_tpu.data.anchors import (anchor_groups, collect_wh,
                                          kmeans_anchors, mean_best_iou,
                                          shape_iou)


def test_shape_iou_matches_manual():
    wh = np.array([[10.0, 20.0]])
    an = np.array([[10.0, 20.0], [20.0, 10.0], [5.0, 5.0]])
    got = shape_iou(wh, an)[0]
    # identical shapes -> 1; (20,10): inter 10*10=100, union 200+200-100=300
    np.testing.assert_allclose(got, [1.0, 100 / 300, 25 / 200], rtol=1e-6)


def test_kmeans_recovers_planted_clusters():
    rng = np.random.default_rng(0)
    truth = np.array([[12, 14], [40, 30], [90, 120]], np.float32)
    wh = np.concatenate([
        t + rng.normal(0, 0.5, (200, 2)).astype(np.float32) for t in truth
    ])
    anchors = kmeans_anchors(wh, k=3, seed=1)
    # sorted by area ascending == truth order; each within ~1px of a center
    np.testing.assert_allclose(anchors, truth, atol=1.5)
    assert mean_best_iou(wh, anchors) > 0.95


def test_kmeans_deterministic_and_validates():
    rng = np.random.default_rng(2)
    wh = rng.uniform(5, 200, (100, 2)).astype(np.float32)
    a1 = kmeans_anchors(wh, 6, seed=3)
    a2 = kmeans_anchors(wh, 6, seed=3)
    np.testing.assert_array_equal(a1, a2)
    areas = a1[:, 0] * a1[:, 1]
    assert (np.diff(areas) >= 0).all()
    with pytest.raises(ValueError, match="at least"):
        kmeans_anchors(wh[:3], 6)


def test_anchor_groups_layout():
    anchors = np.array([[1, 1], [2, 2], [3, 3], [4, 4], [5, 5], [6, 6]],
                       np.float32)
    groups = anchor_groups(anchors, 2)
    assert groups == (((1, 1), (2, 2), (3, 3)), ((4, 4), (5, 5), (6, 6)))
    with pytest.raises(ValueError, match="split"):
        anchor_groups(anchors, 4)


def test_collect_wh_scales_to_net_input():
    cfg = get_config("256x320")  # origin 512x640 -> net 256x320 = 0.5x
    labels = np.array([[0, 100, 100, 200, 150]], np.float32)  # w=100, h=50
    index = [("a.jpg", labels), ("b.jpg", np.zeros((0, 5), np.float32))]
    wh = collect_wh(index, cfg)
    np.testing.assert_allclose(wh, [[50.0, 25.0]])
    with pytest.raises(ValueError, match="no ground-truth"):
        collect_wh([("a.jpg", np.zeros((0, 5), np.float32))], cfg)


def test_cli_anchors_writes_consumable_config(tmp_path):
    """anchors --out writes a Config JSON whose anchors beat the preset on
    the synthetic set, and which Config.from_json round-trips."""
    import cv2

    from yolofastest_tpu.cli import main

    root = tmp_path / "data"
    os.makedirs(root / "img")
    os.makedirs(root / "xml")
    from yolofastest_tpu.data import write_voc_xml

    rng = np.random.default_rng(0)
    names = get_config("256x320").io.class_names
    for i in range(8):
        img = rng.integers(0, 40, (512, 640, 3), np.uint8)
        boxes = []
        for _ in range(3):
            bw, bh = int(rng.integers(30, 90)), int(rng.integers(30, 90))
            x1 = int(rng.integers(0, 640 - bw))
            y1 = int(rng.integers(0, 512 - bh))
            boxes.append((names[0], x1, y1, x1 + bw, y1 + bh))
        stem = f"im_{i}"
        cv2.imwrite(str(root / "img" / (stem + ".jpg")), img)
        write_voc_xml(str(root / "xml" / (stem + ".xml")), stem + ".jpg",
                      (512, 640), boxes)

    out = tmp_path / "anchors.json"
    rc = main(["anchors", "--data", str(root), "--out", str(out)])
    assert rc == 0

    cfg = Config.from_json(out.read_text())
    assert len(cfg.io.anchors) == 2 and len(cfg.io.anchors[0]) == 3
    # the derived anchors fit the synthetic boxes at least as well as the
    # ship-dataset presets
    from yolofastest_tpu.data import VOCIndex

    wh = collect_wh(VOCIndex(str(root), names), cfg)
    new = mean_best_iou(wh, np.array(cfg.io.anchors).reshape(-1, 2))
    old = mean_best_iou(
        wh, np.array(get_config("256x320").io.anchors).reshape(-1, 2))
    assert new >= old
    # sanity: the JSON itself is a full config (train/eval --config-json)
    raw = json.loads(out.read_text())
    assert "io" in raw and "train" in raw and "augment" in raw
