"""Sliced (tiled) inference: grid geometry, origin-pixel mapping, cross-tile
duplicate merging, and an end-to-end run on a real golden image.

Beyond-reference capability (the reference squeezes every frame to one net
input, ``detect.py:107-129``); see ``inference/sliced.py``.
"""

import os

import numpy as np
import pytest

from yolofastest_tpu.configs import IOConfig, Config, get_config
from yolofastest_tpu.inference import sliced_detect, tile_grid
from yolofastest_tpu.inference.sliced import _greedy_nms

REF_DATA = "/root/reference/test_data"


def _io():
    return IOConfig(input_shape=(64, 96, 1), origin_img_shape=(128, 192, 3),
                    anchors=(((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),
                             ((60.0, 40.0), (50.0, 50.0), (40.0, 60.0))))


def test_tile_grid_geometry():
    # 1x1 degrades to the whole image
    assert tile_grid((100, 200), (1, 1)) == [(0, 0, 100, 200)]

    windows = tile_grid((100, 200), (2, 2), overlap=0.2)
    assert len(windows) == 4
    ys = sorted({(y0, y1) for y0, x0, y1, x1 in windows})
    xs = sorted({(x0, x1) for y0, x0, y1, x1 in windows})
    # first tile starts at 0, last ends at the edge, interiors covered
    assert ys[0][0] == 0 and ys[-1][1] == 100
    assert xs[0][0] == 0 and xs[-1][1] == 200
    assert ys[0][1] > ys[1][0] and xs[0][1] > xs[1][0]  # overlap exists
    # overlap fraction ~0.2 of the tile extent
    t = ys[0][1] - ys[0][0]
    assert abs((ys[0][1] - ys[1][0]) / t - 0.2) < 0.05

    with pytest.raises(ValueError):
        tile_grid((100, 200), (2, 2), overlap=1.0)
    with pytest.raises(ValueError):
        tile_grid((100, 200), (0, 2))


def test_greedy_nms_is_class_aware_and_score_ordered():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10],
                      [40, 40, 50, 50]], np.float64)
    scores = np.array([0.5, 0.9, 0.8, 0.7], np.float32)
    cls = np.array([0, 0, 1, 0], np.int32)
    keep = _greedy_nms(boxes, scores, cls, iou_thre=0.4)
    # best same-class box wins its overlap; the other class survives
    assert list(keep) == [1, 2, 3]


class _StubDetector:
    """Emits one fixed origin-space detection from every tile that fully
    contains it — the cross-tile duplicate case the global NMS must merge."""

    def __init__(self, io, origin_hw, grid, overlap, box, cls_idx=1):
        self.config = Config(io=io)
        self.windows = tile_grid(origin_hw, grid, overlap)
        self.box = box
        self.cls_idx = cls_idx

    def run_packed(self, batch):
        io = self.config.io
        net_h, net_w = io.input_hw
        out = np.zeros((batch.shape[0], io.max_det, 8), np.float32)
        bx1, by1, bx2, by2 = self.box
        for k, (y0, x0, y1, x1) in enumerate(self.windows):
            if bx1 >= x0 and bx2 <= x1 and by1 >= y0 and by2 <= y1:
                sx, sy = net_w / (x1 - x0), net_h / (y1 - y0)
                out[k, 0] = [(bx1 - x0) * sx, (by1 - y0) * sy,
                             (bx2 - x0) * sx, (by2 - y0) * sy,
                             0.9, 0.8, self.cls_idx, 1.0]
        return out


def test_sliced_maps_boxes_to_origin_and_merges_duplicates():
    io = _io()
    origin_hw, grid, overlap = (256, 384), (2, 2), 0.5
    box = (150, 100, 200, 140)  # inside the overlap band: >= 2 tiles see it
    stub = _StubDetector(io, origin_hw, grid, overlap, box)
    n_dup = sum(1 for y0, x0, y1, x1 in stub.windows
                if box[0] >= x0 and box[2] <= x1
                and box[1] >= y0 and box[3] <= y1)
    assert n_dup >= 2  # the scenario actually exercises duplicate merging

    ori = np.zeros((*origin_hw, 3), np.uint8)
    det = sliced_detect(stub, ori, grid, overlap)
    assert det["count"] == 1  # duplicates merged by the global NMS
    np.testing.assert_allclose(det["boxes"][0], box, atol=2)  # px rounding
    assert int(det["cls_idx"][0]) == 1


def test_sliced_empty_image_returns_empty_dict():
    io = _io()
    stub = _StubDetector(io, (128, 192), (2, 2), 0.2, box=(-10, -10, -5, -5))
    det = sliced_detect(stub, np.zeros((128, 192, 3), np.uint8), (2, 2), 0.2)
    assert det["count"] == 0 and det["boxes"].shape == (0, 4)


@pytest.mark.slow
def test_sliced_runs_real_checkpoint_on_golden_image():
    import cv2

    from yolofastest_tpu.inference import Detector
    from yolofastest_tpu.models import load_variables, zoo_path

    cfg = get_config("256x320")
    detector = Detector(cfg, variables=load_variables(zoo_path("256x320")),
                        fold_bn=True)
    name = sorted(f for f in os.listdir(REF_DATA)
                  if f.endswith(".jpg"))[0]
    ori = cv2.imread(os.path.join(REF_DATA, name))
    det = sliced_detect(detector, ori, grid=(2, 2), overlap=0.2)
    h0, w0 = ori.shape[:2]
    assert det["count"] == len(det["boxes"])
    if det["count"]:
        b = det["boxes"]
        assert (b[:, [0, 2]] <= w0 + 1).all() and (b[:, [1, 3]] <= h0 + 1).all()
        assert (b >= -1).all()
        assert ((det["conf"] > 0) & (det["conf"] <= 1)).all()
