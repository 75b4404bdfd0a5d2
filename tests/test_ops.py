"""Unit tests for the vectorised ops against simple reference implementations."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from yolofastest_tpu.ops import (
    batched_nms,
    bgr_to_gray,
    box_iou_matrix,
    downsample2x,
    iou_pairwise,
    normalize,
    xywh2xyxy,
    xyxy2xywh,
)

pytestmark = pytest.mark.gate


def _naive_iou(b1, b2):
    """detect.py:28-39 semantics (no +1, no clamp-to-zero-then-multiply)."""
    iw = min(b1[2], b2[2]) - max(b1[0], b2[0])
    ih = min(b1[3], b2[3]) - max(b1[1], b2[1])
    inter = iw * ih if (iw > 0 and ih > 0) else 0.0
    union = (b1[2] - b1[0]) * (b1[3] - b1[1]) + (b2[2] - b2[0]) * (b2[3] - b2[1]) - inter
    return inter / union


def _naive_perclass_nms(rows, nms_thre, num_cls=3):
    """detect.py:158-169 flow: split by class, sort by conf, greedy suppress."""
    out = []
    for c in range(num_cls):
        lst = sorted([r for r in rows if r[6] == c], key=lambda r: -r[4])
        while lst:
            best = lst.pop(0)
            out.append(best)
            lst = [r for r in lst if _naive_iou(r, best) <= nms_thre]
    return out


def test_coord_roundtrip():
    rng = np.random.RandomState(0)
    xywh = rng.uniform(1, 100, (16, 4)).astype(np.float32)
    back = xyxy2xywh(xywh2xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(np.asarray(back), xywh, rtol=1e-5, atol=1e-4)


def test_iou_matches_naive():
    rng = np.random.RandomState(1)
    a = np.sort(rng.uniform(0, 100, (32, 2, 2)), axis=1).transpose(0, 2, 1).reshape(32, 4)
    a = a[:, [0, 2, 1, 3]]  # (x1, x2, y1, y2) -> (x1, y1, x2, y2)
    got = np.asarray(box_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    for i in range(8):
        for j in range(8):
            assert abs(got[i, j] - _naive_iou(a[i], a[j])) < 1e-5


def test_iou_plus_one_convention():
    # utils/general.py:44-48 (+1 pixel on widths/heights)
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    got = float(iou_pairwise(a, a, pixel_offset=1.0)[0])
    assert abs(got - 1.0) < 1e-6
    b = jnp.asarray([[0.0, 0.0, 4.0, 9.0]])
    got = float(iou_pairwise(a, b, pixel_offset=1.0)[0])
    assert abs(got - 50.0 / 100.0) < 1e-6


def test_batched_nms_matches_naive_perclass():
    rng = np.random.RandomState(7)
    k = 48
    boxes, rows = [], []
    for i in range(k):
        x1, y1 = rng.uniform(0, 200, 2)
        w, h = rng.uniform(10, 80, 2)
        conf = rng.uniform(0.5, 1.0)
        cls_score = rng.uniform(0.3, 1.0)
        cls = rng.randint(0, 3)
        boxes.append([x1, y1, x1 + w, y1 + h])
        rows.append([x1, y1, x1 + w, y1 + h, conf, cls_score, cls])
    boxes = np.array(boxes, np.float32)
    conf = np.array([r[4] for r in rows], np.float32)
    cls_score = np.array([r[5] for r in rows], np.float32)
    cls_idx = np.array([r[6] for r in rows], np.int32)

    order = np.argsort(-conf, kind="stable")  # decode guarantees conf-descending
    out = batched_nms(
        jnp.asarray(boxes[order][None]),
        jnp.asarray(conf[order][None]),
        jnp.asarray(cls_score[order][None]),
        jnp.asarray(cls_idx[order][None]),
        jnp.ones((1, k), bool),
        iou_thre=0.2,
        max_det=64,
    )
    kept = [
        (round(float(out["boxes"][0, i, 0]), 3), round(float(out["conf"][0, i]), 5))
        for i in range(64)
        if out["valid"][0, i]
    ]
    naive = _naive_perclass_nms(rows, 0.2)
    expected = sorted((round(r[0], 3), round(r[4], 5)) for r in naive)
    assert sorted(kept) == expected


def test_bgr_to_gray_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 80, 3), np.uint8)
    ours = np.asarray(bgr_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_downsample2x_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (128, 160), np.uint8)
    ours = np.asarray(downsample2x(jnp.asarray(img)))
    ref = cv2.resize(img, (80, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_normalize():
    img = jnp.asarray(np.array([[0, 128, 255]], np.uint8))
    out = np.asarray(normalize(img))
    np.testing.assert_allclose(out, [[-128 / 255, 0.0, 127 / 255]], atol=1e-6)


def test_batched_nms_packed_equals_dict():
    from yolofastest_tpu.ops import batched_nms, unpack_detections

    rng = np.random.RandomState(11)
    b, k = 3, 32
    boxes = np.sort(rng.uniform(0, 100, (b, k, 2, 2)), axis=2).reshape(b, k, 4)
    boxes = np.concatenate([boxes[..., [0, 2]], boxes[..., [1, 3]]], -1)[..., [0, 2, 1, 3]]
    conf = -np.sort(-rng.uniform(0, 1, (b, k))).astype(np.float32)
    cls_score = rng.uniform(0, 1, (b, k)).astype(np.float32)
    cls_idx = rng.randint(0, 3, (b, k)).astype(np.int32)
    valid = conf > 0.3

    args = (jnp.asarray(boxes, jnp.float32), jnp.asarray(conf),
            jnp.asarray(cls_score), jnp.asarray(cls_idx), jnp.asarray(valid))
    d = jax.tree.map(np.asarray, batched_nms(*args, iou_thre=0.2))
    p = unpack_detections(batched_nms(*args, iou_thre=0.2, packed=True))
    for key in ("boxes", "conf", "cls_score", "cls_idx", "valid", "count"):
        np.testing.assert_array_equal(d[key], p[key], err_msg=key)


@pytest.mark.parametrize("src_hw,dst_hw", [
    ((384, 480), (256, 320)),   # 1.5x down
    ((480, 600), (256, 320)),   # 1.875x down
    ((300, 400), (256, 320)),   # mixed ~1.17x/1.25x down
    ((200, 256), (256, 320)),   # upscale
    ((512, 640), (256, 320)),   # the 2x case through the general kernel
])
def test_resize_bilinear_matches_cv2(src_hw, dst_hw):
    """General-ratio resize must match cv2.resize(INTER_LINEAR) within +-1
    grey level (cv2's own SIMD and scalar paths differ by that margin)."""
    cv2 = pytest.importorskip("cv2")
    from yolofastest_tpu.ops.preprocess import resize_bilinear

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, src_hw, np.uint8)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), dst_hw))
    ref = cv2.resize(img, (dst_hw[1], dst_hw[0]), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}, frac>0 {np.mean(diff > 0):.4f}"
    assert np.mean(diff > 0) < 0.002  # bit-exact for downscales; <0.2% edge
    if src_hw[0] >= dst_hw[0] and src_hw[1] >= dst_hw[1]:
        assert diff.max() == 0  # downscales are bit-exact


def test_resize_bilinear_batched_axes():
    from yolofastest_tpu.ops.preprocess import resize_bilinear

    rng = np.random.RandomState(6)
    imgs = rng.randint(0, 256, (3, 96, 128), np.uint8)
    out = np.asarray(resize_bilinear(jnp.asarray(imgs), (64, 80)))
    assert out.shape == (3, 64, 80)
    one = np.asarray(resize_bilinear(jnp.asarray(imgs[1]), (64, 80)))
    np.testing.assert_array_equal(out[1], one)


def test_decode_heads_rejects_mismatched_anchor_groups():
    from yolofastest_tpu.ops import decode_heads

    head = jnp.zeros((1, 4, 4, 24))
    anchors = (((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),) * 2
    with pytest.raises(ValueError, match="anchor group"):
        decode_heads((head,), anchors, (64, 64), 0.5, 16)
